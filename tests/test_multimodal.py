"""Multimodal binary-column plumbing: real PNG decode, actor-pool
signature, stubbed audio/video decode seams (SURVEY.md training-data ops)."""

from __future__ import annotations

import pytest

from datacat_ray.pipelines.multimodal import (
    AudioFrameSampler,
    ImageDecoder,
    audio_frames,
    image_metadata,
    make_fake_audio,
    make_fake_image,
)


def test_image_header_roundtrip():
    import pyarrow as pa

    payloads = [make_fake_image(i) for i in range(5)] + [b"junk", None]
    batch = pa.table({"doc_id": list(range(7)), "image": pa.array(payloads, pa.binary())})
    out = ImageDecoder()(batch)
    valid = out["valid"].to_pylist()
    assert valid == [True] * 5 + [False, False]
    assert all(w > 0 for w in out["width"].to_pylist()[:5])
    # pixel-derived stat present and sane (mean luma of an 8-bit image)
    assert all(0 < l < 255 for l in out["mean_luma"].to_pylist()[:5])
    # deterministic: same seed → same payload → same sha
    assert make_fake_image(3) == make_fake_image(3)


def test_png_codec_byte_exact():
    """Pure-stdlib PNG round-trip: decode(encode(x)) == x for grey, RGB
    and RGBA; junk rejected; filtered rows reconstruct correctly."""
    import numpy as np

    from datacat_ray.functions.png import _chunk, decode_png, encode_png

    rng = np.random.RandomState(7)
    for shape in [(5, 9), (11, 4, 3), (6, 6, 4)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        out = decode_png(encode_png(arr))
        want = arr[:, :, None] if arr.ndim == 2 else arr
        assert (out == want).all()
    with pytest.raises(ValueError):
        decode_png(b"junk")

    # hand-build an IDAT exercising Sub(1), Up(2), Average(3), Paeth(4)
    import struct
    import zlib

    w, h = 4, 5
    rows = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for r, ft in enumerate([0, 1, 2, 3, 4]):
        cur = rows[r].reshape(-1).astype(np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur.copy()
            enc[3:] = (cur[3:] - cur[:-3]) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            enc = cur.copy()
            for i in range(w * 3):
                left = cur[i - 3] if i >= 3 else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
        else:
            from datacat_ray.functions.png import _paeth

            enc = cur.copy()
            for i in range(w * 3):
                left = int(cur[i - 3]) if i >= 3 else 0
                ul = int(prev[i - 3]) if i >= 3 else 0
                enc[i] = (cur[i] - _paeth(left, int(prev[i]), ul)) % 256
        raw += bytes([ft]) + bytes(enc.astype(np.uint8))
        prev = cur
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (sig + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    assert (decode_png(png) == rows).all()


def test_audio_wav_decode_real():
    """WAV/PCM decode is real (stdlib wave): sample rate round-trips and
    the dominant sine frequency is recoverable from the decoded samples."""
    import numpy as np

    sr, pcm = AudioFrameSampler.decode_samples(make_fake_audio(0))
    assert sr in (8000, 16000, 44100) and len(pcm) > sr // 8
    assert np.abs(pcm).max() <= 1.0
    # the fixture is sine+noise: spectral peak stands far above the floor
    spec = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    assert spec.max() > 20 * np.median(spec)


def test_audio_frame_grid():
    import pyarrow as pa

    batch = pa.table({
        "doc_id": [1, 2],
        "audio": pa.array([make_fake_audio(1), b"bad"], pa.binary()),
    })
    out = AudioFrameSampler(frame_sec=1.0)(batch)
    rows = out.to_pylist()
    good, bad = rows
    assert good["valid"] and not bad["valid"]
    # frame grid: 1s spacing covering the duration
    offs = good["frame_offsets_ms"]
    assert offs[0] == 0 and all(b - a == 1000 for a, b in zip(offs, offs[1:]))
    assert good["n_frames"] == len(offs)
    assert offs[-1] < good["duration_ms"]


def test_pipelines_over_driver_testdata(ray_session):
    img = image_metadata("/root/testdata/sf0.001")
    assert img.count() == 500
    aud = audio_frames("/root/testdata/sf0.001")
    t = aud.take(5)
    assert all(r["valid"] for r in t)


def test_video_frame_sampling(ray_session):
    import pyarrow as pa

    from datacat_ray.pipelines.multimodal import (
        VideoFrameSampler,
        make_fake_video,
        video_frames,
    )

    batch = pa.table({"doc_id": [1, 2],
                      "video": pa.array([make_fake_video(1), b"x"], pa.binary())})
    out = VideoFrameSampler(sample_sec=2.0)(batch).to_pylist()
    good, bad = out
    assert good["valid"] and not bad["valid"]
    step = 2 * good["fps"]
    fr = good["sampled_frames"]
    assert fr[0] == 0 and all(b - a == step for a, b in zip(fr, fr[1:]))
    assert fr[-1] < good["n_frames"]
    # frame decode is REAL: pixels come back and per-frame luma is emitted
    px = VideoFrameSampler.decode_frames(make_fake_video(0), [0])[0]
    assert px.shape == (16, 16, 3) and px.dtype.name == "uint8"
    assert len(good["frame_luma"]) == len(fr)
    assert all(0 < l < 255 for l in good["frame_luma"])
    with pytest.raises(ValueError):
        VideoFrameSampler.decode_frames(b"junk", [0])
    # seed%3==2 payloads are MJPEG (compressed seam runs at corpus scale);
    # both codecs must sample as valid rows, here decoded without ffmpeg
    import datacat_ray.functions.avi as A

    assert A.avi_compression(make_fake_video(2)) == A.MJPG_FOURCC
    old = A._FFMPEG
    A._FFMPEG = False
    try:
        mj = VideoFrameSampler(sample_sec=2.0)(
            pa.table({"doc_id": [5],
                      "video": pa.array([make_fake_video(5)], pa.binary())})
        ).to_pylist()[0]
    finally:
        A._FFMPEG = old
    assert mj["valid"] and len(mj["frame_luma"]) == len(mj["sampled_frames"])
    assert video_frames("/root/testdata/sf0.001").count() == 500


def test_extract_image_assets_cap_and_quotes():
    """S12/O2 web-text form: document-order src extraction across quote
    styles, capped at the per-document asset limit."""
    from datacat_ray.pipelines.multimodal import extract_image_assets

    html = (
        '<p>x</p><img src="https://a/1.png"><IMG SRC=\'https://a/2.png\'>'
        "<img alt=y src=https://a/3.png><img src=https://a/4.png>"
    )
    assert extract_image_assets(html, limit=3) == [
        "https://a/1.png", "https://a/2.png", "https://a/3.png"
    ]
    assert extract_image_assets(html, limit=10)[-1] == "https://a/4.png"
    assert extract_image_assets("", 3) == []
    assert extract_image_assets("<img>no src here</img>", 3) == []


def test_image_assets_ignores_data_src():
    from datacat_ray.pipelines.multimodal import extract_image_assets

    html = '<img data-src="https://lazy/x.png"><img src="https://a/1.png">'
    assert extract_image_assets(html, 3) == ["https://a/1.png"]


def test_image_assets_quote_aware_attrs():
    """src extraction survives '>' inside earlier quoted attribute values
    and never extracts a 'src=' that sits inside another attr's value."""
    from datacat_ray.pipelines.multimodal import extract_image_assets

    assert extract_image_assets(
        '<img alt="Size > 100" src="big.png">', 3) == ["big.png"]
    assert extract_image_assets(
        '<img title="use src=evil.png here" src="real.png">', 3
    ) == ["real.png"]
    assert extract_image_assets('<img alt="x" SRC=bare.png />', 3) == [
        "bare.png"
    ]


def test_sampler_fuzz_poison_row_contract(ray_session):
    """Fuzz every sampler's decode path: mutated valid payloads and raw
    garbage must become poison rows, never an exception out of
    __call__ (one bad document must not kill a Ray task). Deterministic
    seeds; both video codecs covered with ffmpeg forced off."""
    import numpy as np

    import datacat_ray.functions.avi as A
    import pyarrow as pa

    from datacat_ray.functions.png import encode_png
    from datacat_ray.pipelines.multimodal import (
        AudioFrameSampler,
        ImageDecoder,
        VideoFrameSampler,
        make_fake_audio,
        make_fake_video,
    )

    rng = np.random.RandomState(42)

    def mutate(b):
        x = bytearray(b)
        for _ in range(rng.randint(1, 5)):
            x[rng.randint(0, len(x))] = rng.randint(0, 256)
        return bytes(x)

    cases = (
        ("image", ImageDecoder(),
         encode_png(rng.randint(0, 256, (12, 9, 3), dtype=np.uint8))),
        ("audio", AudioFrameSampler(), make_fake_audio(3)),
        ("video", VideoFrameSampler(), make_fake_video(1)),  # BI_RGB
        ("video", VideoFrameSampler(), make_fake_video(2)),  # MJPEG
    )
    old = A._FFMPEG
    A._FFMPEG = False
    try:
        for col, sampler, base in cases:
            for i in range(80):
                payload = (
                    mutate(base) if i < 60
                    else bytes(rng.randint(0, 256, rng.randint(0, 150),
                               dtype=np.uint8))
                )
                t = pa.table({
                    "doc_id": pa.array([1], pa.int64()),
                    col: pa.array([payload], pa.binary()),
                })
                out = sampler(t)  # must not raise
                assert out.num_rows == 1
    finally:
        A._FFMPEG = old
