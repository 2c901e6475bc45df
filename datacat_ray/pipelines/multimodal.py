"""Multimodal column plumbing (training-data ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages (per-actor init,
small batches for wide binary rows, typed output schema).

IMAGES are fully real: fixtures emit genuine PNG bytes and the decode
stage inflates them with the pure-stdlib codec (``functions/png.py``) and
derives pixel statistics (mean luma). AUDIO is real stdlib WAV/PCM.
VIDEO is a REAL container format: uncompressed-DIB AVI (RIFF), written
and parsed by the pure-Python codec in ``functions/avi.py`` — only the
compressed-codec swap (ffmpeg/decord) remains a documented seam.
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

import numpy as np
import pyarrow as pa

import ray.data

from datacat_ray.functions.png import decode_png, encode_png


def make_fake_image(seed: int) -> bytes:
    """Deterministic REAL PNG payload: seeded gradient + noise RGB image
    (small sizes — fixture cost, not realism, bounds them)."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    w = int(rng.randint(32, 96))
    h = int(rng.randint(32, 96))
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    arr = np.stack(
        [
            np.broadcast_to(x, (h, w)),
            np.broadcast_to(y, (h, w)),
            rng.randint(0, 256, size=(h, w)).astype(np.float64),
        ],
        axis=2,
    ).astype(np.uint8)
    return encode_png(arr)


def synth_images_dataset(sf_dir: str) -> "ray.data.Dataset":
    """Wrap the documents table into a multimodal table
    (doc_id, image: binary) — deterministic per doc_id."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "image": pa.array([make_fake_image(i) for i in ids], type=pa.binary()),
            }
        )

    return ds.map_batches(_mk, batch_format="pyarrow")


_LUMA = np.array([0.299, 0.587, 0.114])


class ImageDecoder:
    """Actor-pool stage: REAL PNG decode + pixel feature extraction.

    ``__init__`` is where a heavier deployment loads its codec / model ONCE
    per actor (the warm-state pattern, SURVEY.md ST1); the stdlib PNG codec
    needs no warm state but the seam stays."""

    def __init__(self) -> None:
        self.decode = decode_png  # real codec/model load goes here

    @staticmethod
    def decode_pixels(payload: bytes) -> "np.ndarray":
        """PNG bytes → uint8 (h, w, c) via the pure-stdlib codec."""
        return decode_png(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["image"].to_pylist()
        widths, heights, channels, n_bytes, sha8 = [], [], [], [], []
        luma, valid = [], []
        for p in payloads:
            n_bytes.append(len(p) if p else 0)
            sha8.append(hashlib.sha256(p or b"").hexdigest()[:16])
            try:
                px = self.decode_pixels(p)
                h, w, c = px.shape
                rgb = px[:, :, :3] if c >= 3 else px.repeat(3, axis=2)[:, :, :3]
                mean_luma = float((rgb.astype(np.float64) @ _LUMA).mean())
                widths.append(w)
                heights.append(h)
                channels.append(c)
                luma.append(round(mean_luma, 6))
                valid.append(True)
            except (ValueError, zlib.error, struct.error):
                widths.append(0)
                heights.append(0)
                channels.append(0)
                luma.append(0.0)
                valid.append(False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "channels": pa.array(channels, type=pa.int32()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "sha8": pa.array(sha8, type=pa.string()),
                "mean_luma": pa.array(luma, type=pa.float64()),
                "valid": pa.array(valid, type=pa.bool_()),
            }
        )


def image_metadata(sf_dir: str) -> "ray.data.Dataset":
    """The multimodal pipeline: synth binary column → actor-pool decode
    stage. Batch size is SMALL (wide binary rows: batch × concurrency must
    fit the worker heap)."""
    ds = synth_images_dataset(sf_dir)
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# page image assets (S12 sink + O2 count limit, web-text form)
# ---------------------------------------------------------------------------

ASSET_LIMIT = 3  # O2 per-document asset cap (reference: asset-count limit
# on saved page images, DatacatSegmenterParser asset path)

# img tag spans with quote-aware attribute regions (a quote opens a span
# only in value position, same rule as the dom scanner's _TAG_RE)
_IMG_TAG_RE = re.compile(
    r"<img\b((?:=\s*\"[^\"]*\"|=\s*'[^']*'|[^>])*)>", re.I
)
# sequential attribute tokenizer: values (quoted or bare) are consumed as
# part of their attribute, so 'src=' INSIDE another attribute's value can
# never be mistaken for the src attribute
_ATTR_RE = re.compile(
    r"([a-zA-Z][\w-]*)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)


def extract_image_assets(html: str, limit: int = ASSET_LIMIT) -> list[str]:
    """Document-order <img src> urls, capped at ``limit`` (the reference
    saves page image assets with a per-document count limit — S12/O2; in
    the web-text model assets are url references, not embedded bitmaps)."""
    out = []
    for tag in _IMG_TAG_RE.finditer(html or ""):
        for a in _ATTR_RE.finditer(tag.group(1)):
            if a.group(1).lower() == "src":
                v = a.group(2) or a.group(3) or a.group(4) or ""
                out.append(v)
                break
        if len(out) >= limit:
            break
    return out


def image_assets(sf_dir: str, limit: int = ASSET_LIMIT) -> "ray.data.Dataset":
    """(doc_id, asset_idx, asset_url): page assets extracted from the html
    of the wrapped pages table — the S12 asset sink surface, oracle-checked
    because the wrapper embeds a deterministic asset set per doc_id."""
    from datacat_ray.fixtures import pages_from_documents

    pages = pages_from_documents(sf_dir)
    ds = ray.data.from_arrow(pages)

    def _assets(t: pa.Table) -> pa.Table:
        doc_ids, idxs, urls = [], [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            doc = int(url.rsplit("/", 1)[1])
            for i, a in enumerate(
                extract_image_assets(html.decode("utf-8"), limit)
            ):
                doc_ids.append(doc)
                idxs.append(i)
                urls.append(a)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "asset_idx": pa.array(idxs, type=pa.int64()),
                "asset_url": pa.array(urls, type=pa.string()),
            }
        )

    return ds.map_batches(_assets, batch_format="pyarrow")


IMAGE_ASSETS_SQL = f"""
    SELECT doc_id,
           unnest(range(least(doc_id % 5, {ASSET_LIMIT}))) AS asset_idx,
           'https://img.example.org/' || doc_id || '/'
               || unnest(range(least(doc_id % 5, {ASSET_LIMIT}))) || '.png'
               AS asset_url
    FROM documents
"""


# ---------------------------------------------------------------------------
# audio: REAL WAV/PCM payloads (stdlib wave module), frame-sample actor stage
# ---------------------------------------------------------------------------


def make_fake_audio(seed: int) -> bytes:
    """Deterministic REAL WAV payload: 16-bit mono PCM (seeded sine +
    noise). Durations stay sub-second — fixture cost bounds them; the
    header still reports real sample counts for the frame grid."""
    import io
    import wave

    rng = np.random.RandomState((seed * 31 + 7) & 0x7FFFFFFF)
    sr = int(rng.choice([8000, 16000, 44100]))
    n = int(rng.randint(sr // 4, sr * 3))  # 0.25-3 s
    t = np.arange(n, dtype=np.float64) / sr
    freq = float(rng.uniform(100, 1000))
    sig = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioFrameSampler:
    """Actor-pool stage: REAL WAV parse (stdlib ``wave``) + PCM decode,
    deterministic ``frame_sec``-spaced frame grid with per-frame RMS
    energy — the feature-extraction shape of an audio training pipeline
    (per-actor init, small batches for wide binary rows, nested list
    output column)."""

    def __init__(self, frame_sec: float = 1.0) -> None:
        self.frame_sec = frame_sec  # heavier codec/model load goes here

    @staticmethod
    def decode_samples(payload: bytes) -> tuple[int, "np.ndarray"]:
        """WAV bytes → (sample_rate, float64 mono samples in [-1, 1]).
        16-bit PCM only (the fixture format); anything else raises."""
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM supported")
            sr = w.getframerate()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        if ch > 1:
            pcm = pcm.reshape(-1, ch).mean(axis=1)
        return sr, pcm

    def __call__(self, batch: pa.Table) -> pa.Table:
        import wave

        rows = {"doc_id": [], "sample_rate": [], "duration_ms": [],
                "n_frames": [], "frame_offsets_ms": [], "frame_rms": [],
                "valid": []}
        for doc_id, p in zip(batch["doc_id"].to_pylist(),
                             batch["audio"].to_pylist()):
            rows["doc_id"].append(doc_id)
            try:
                sr, pcm = self.decode_samples(p)
                dur_ms = len(pcm) * 1000 // sr
                step_ms = int(self.frame_sec * 1000)
                offsets = list(range(0, max(dur_ms, 1), step_ms))
                step = int(self.frame_sec * sr)
                rms = []
                for o in offsets:
                    seg = pcm[o * sr // 1000 : o * sr // 1000 + step]
                    # a zero-frame-but-valid WAV yields an empty segment:
                    # emit 0.0, not NaN
                    rms.append(
                        round(float(np.sqrt(np.mean(seg ** 2))), 6)
                        if len(seg) else 0.0
                    )
                rows["sample_rate"].append(sr)
                rows["duration_ms"].append(dur_ms)
                rows["n_frames"].append(len(offsets))
                rows["frame_offsets_ms"].append(offsets)
                rows["frame_rms"].append(rms)
                rows["valid"].append(True)
            except (wave.Error, EOFError, ValueError, TypeError, AttributeError):
                rows["sample_rate"].append(0)
                rows["duration_ms"].append(0)
                rows["n_frames"].append(0)
                rows["frame_offsets_ms"].append([])
                rows["frame_rms"].append([])
                rows["valid"].append(False)
        return pa.Table.from_pydict(
            rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("sample_rate", pa.int32()),
                 ("duration_ms", pa.int64()), ("n_frames", pa.int32()),
                 ("frame_offsets_ms", pa.list_(pa.int64())),
                 ("frame_rms", pa.list_(pa.float64())),
                 ("valid", pa.bool_())]
            ),
        )


# ---------------------------------------------------------------------------
# video: REAL uncompressed-DIB AVI container (RIFF), frame-sample stage
# ---------------------------------------------------------------------------

# The payload is a standards-conformant Microsoft AVI ('vids'/'DIB ' BI_RGB
# stream, functions/avi.py) — a format that exists outside this repo and
# that ffprobe/any player reads. A production deployment swaps the
# uncompressed frame plane for an ffmpeg/decord codec behind the same
# decode_frames seam — the frame-sampling plan, per-payload batched
# decode, and per-frame stats are the same shape either way.

from datacat_ray.functions.avi import (  # noqa: E402 — section-local import
    decode_video_frames,
    encode_avi,
    encode_avi_mjpeg,
    parse_avi_header,
)


def make_fake_video(seed: int) -> bytes:
    """Deterministic REAL AVI payload (tiny frames, a moving gradient) so
    container parse + frame decode are exercised on a genuine format.
    Every third seed emits an MJPEG stream (baseline JPEG frames, 4:2:0)
    instead of uncompressed BI_RGB, so the driver-visible ``video_frames``
    pipeline runs BOTH codec paths of the decode seam at corpus scale —
    not just in unit tests."""
    rng = np.random.RandomState((seed * 53 + 11) & 0x7FFFFFFF)
    fps = int(rng.choice([24, 25, 30]))
    n_frames = int(rng.randint(8, 25))
    w = h = 16
    base = rng.randint(0, 200)
    frames = []
    for i in range(n_frames):
        x = np.linspace(0, 255, w)[None, :]
        y = np.linspace(0, 255, h)[:, None]
        arr = np.stack(
            [
                np.broadcast_to((x + 10 * i) % 256, (h, w)),
                np.broadcast_to(y, (h, w)),
                np.full((h, w), (base + 5 * i) % 256, dtype=np.float64),
            ],
            axis=2,
        ).astype(np.uint8)
        frames.append(arr)
    if seed % 3 == 2:
        return encode_avi_mjpeg(frames, fps, quality=95, subsampling="420")
    return encode_avi(frames, fps)


class VideoFrameSampler:
    """Actor-pool stage: parse the frame container, plan a deterministic
    every-``sample_sec`` frame grid, and REALLY decode the sampled frames
    (stdlib PNG codec) to emit per-frame mean luma — the frame-sampling
    feature-extraction shape of a video training pipeline. Per-actor init,
    small batches for wide binary rows, nested output columns."""

    def __init__(self, sample_sec: float = 2.0) -> None:
        self.sample_sec = sample_sec  # heavier codec init goes here

    @staticmethod
    def decode_frames(payload: bytes, frame_idxs: list[int]) -> list:
        """AVI bytes + frame indices → uint8 (h, w, 3) RGB pixels per
        index. Routes through the BATCHED codec seam: BI_RGB decodes in
        pure Python; compressed codecs use ONE ffmpeg subprocess for the
        whole sampled grid when installed, else raise ``UnsupportedCodec``
        (→ the document's ``valid=False`` poison-row path)."""
        return decode_video_frames(payload, frame_idxs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "width": [], "height": [], "fps": [],
                "n_frames": [], "sampled_frames": [], "frame_luma": [],
                "valid": []}
        for doc_id, p in zip(batch["doc_id"].to_pylist(),
                             batch["video"].to_pylist()):
            rows["doc_id"].append(doc_id)
            try:
                n, w, h, fps = parse_avi_header(p)
                step = max(1, int(self.sample_sec * fps))
                sampled = list(range(0, n, step))
                luma = []
                for px in self.decode_frames(p, sampled):
                    rgb = px[:, :, :3].astype(np.float64)
                    luma.append(round(float((rgb @ _LUMA).mean()), 6))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["fps"].append(fps)
                rows["n_frames"].append(n)
                rows["sampled_frames"].append(sampled)
                rows["frame_luma"].append(luma)
                rows["valid"].append(True)
            except (ValueError, struct.error):
                rows["width"].append(0)
                rows["height"].append(0)
                rows["fps"].append(0)
                rows["n_frames"].append(0)
                rows["sampled_frames"].append([])
                rows["frame_luma"].append([])
                rows["valid"].append(False)
        return pa.Table.from_pydict(
            rows,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("width", pa.int32()),
                 ("height", pa.int32()), ("fps", pa.int32()),
                 ("n_frames", pa.int32()),
                 ("sampled_frames", pa.list_(pa.int32())),
                 ("frame_luma", pa.list_(pa.float64())),
                 ("valid", pa.bool_())]
            ),
        )


def video_frames(sf_dir: str, sample_sec: float = 2.0) -> "ray.data.Dataset":
    """Video multimodal pipeline: synth binary column → frame-sampling
    actor pool."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"],
             "video": pa.array([make_fake_video(i) for i in ids], type=pa.binary())}
        )

    return ds.map_batches(_mk, batch_format="pyarrow").map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"sample_sec": sample_sec},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
        num_cpus=1,
    )


def audio_frames(sf_dir: str, frame_sec: float = 1.0) -> "ray.data.Dataset":
    """Audio multimodal pipeline: synth binary column → frame-sampling
    actor pool (small batches — wide binary rows)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"],
             "audio": pa.array([make_fake_audio(i) for i in ids], type=pa.binary())}
        )

    return ds.map_batches(_mk, batch_format="pyarrow").map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs={"frame_sec": frame_sec},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
        num_cpus=1,
    )
