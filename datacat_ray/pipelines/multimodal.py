"""Multimodal column plumbing (training-data ops).

Image/audio payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract kernels are STUBBED (no imaging/audio libraries in
this environment — clearly marked below), but every piece of Ray-side
plumbing is real and tested: schema, actor-pool signature, per-actor init,
small batch sizes for wide binary rows, and the output layout.

The synthetic payloads carry a parseable 16-byte header
(magic ``DCRI``, width, height, channels) so header-parse metadata is real
even though pixel decode is faked.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray.data

_MAGIC = b"DCRI"
_HEADER = struct.Struct("<4sIII")  # magic, width, height, channels


def make_fake_image(seed: int) -> bytes:
    """Deterministic fake image payload: real header + pseudo-random body."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    w = int(rng.randint(64, 512))
    h = int(rng.randint(64, 512))
    c = 3
    body = rng.bytes(min(w * h // 16, 4096))
    return _HEADER.pack(_MAGIC, w, h, c) + body


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


class ImageDecoder:
    """Actor-pool stage: decode + feature-extract image payloads.

    ``__init__`` is where a real deployment loads the codec / model ONCE per
    actor (the warm-state pattern, SURVEY.md ST1). Here it only prepares the
    header parser; ``decode_pixels`` is the STUB seam."""

    def __init__(self) -> None:
        self.header = _HEADER  # real codec/model load goes here

    @staticmethod
    def decode_pixels(payload: bytes) -> "np.ndarray":
        """STUB: pixel decode needs an imaging library absent from this
        environment. The deterministic stand-in below keeps the downstream
        plumbing (shapes, dtypes) real; swap for PIL/cv2 in production."""
        raise NotImplementedError(
            "pixel decode requires an imaging library (PIL/cv2) — "
            "not available in this environment"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["image"].to_pylist()
        widths, heights, channels, n_bytes, sha8, valid = [], [], [], [], [], []
        for p in payloads:
            n_bytes.append(len(p) if p else 0)
            sha8.append(hashlib.sha256(p or b"").hexdigest()[:16])
            if p and len(p) >= _HEADER.size and p[:4] == _MAGIC:
                _, w, h, c = _HEADER.unpack_from(p)
                widths.append(w)
                heights.append(h)
                channels.append(c)
                valid.append(True)
            else:
                widths.append(0)
                heights.append(0)
                channels.append(0)
                valid.append(False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "channels": pa.array(channels, type=pa.int32()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "sha8": pa.array(sha8, type=pa.string()),
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
