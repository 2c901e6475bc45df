"""Multimodal binary-column plumbing: header parse, actor-pool signature,
stubbed decode seams (SURVEY.md training-data ops — image/audio)."""

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
    # deterministic: same seed → same payload → same sha
    assert make_fake_image(3) == make_fake_image(3)


def test_image_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        ImageDecoder.decode_pixels(make_fake_image(0))
    with pytest.raises(NotImplementedError):
        AudioFrameSampler.decode_samples(make_fake_audio(0))


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
    import pytest
    with pytest.raises(NotImplementedError):
        VideoFrameSampler.decode_frame(make_fake_video(0), 0)
    assert video_frames("/root/testdata/sf0.001").count() == 500
