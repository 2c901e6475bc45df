"""Pure-Python AVI codec: RIFF structure, odd-width row padding,
round-trip, and the sampler's malformed-payload path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datacat_ray.functions.avi import (
    decode_avi_frame,
    encode_avi,
    parse_avi_header,
)


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("h,w", [(16, 16), (13, 17), (5, 1), (1, 7)])
def test_avi_roundtrip_all_shapes(h, w):
    frames = _frames(4, h, w, seed=h * 100 + w)
    p = encode_avi(frames, 30)
    assert parse_avi_header(p) == (4, w, h, 30)
    for i, f in enumerate(frames):
        assert (decode_avi_frame(p, i) == f).all()


def test_avi_riff_structure():
    p = encode_avi(_frames(3, 8, 8), 24)
    assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
    # declared RIFF size covers the whole file
    (size,) = struct.unpack_from("<I", p, 4)
    assert 8 + size == len(p)
    # has an idx1 index with one 16-byte entry per frame
    assert b"idx1" in p
    assert b"00db" in p


def test_avi_rejects_garbage_and_bad_index():
    with pytest.raises(ValueError):
        parse_avi_header(b"not an avi at all----")
    p = encode_avi(_frames(2, 4, 4), 25)
    with pytest.raises(ValueError):
        decode_avi_frame(p, 2)
    with pytest.raises(ValueError):
        decode_avi_frame(p, -1)


def test_video_sampler_invalid_payload_row(ray_session):
    from datacat_ray.pipelines.multimodal import VideoFrameSampler

    import pyarrow as pa

    t = pa.Table.from_pydict(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "video": pa.array([b"garbage", None], pa.binary())}
    )
    out = VideoFrameSampler()(t)
    assert out["valid"].to_pylist() == [False, False]
    assert out["n_frames"].to_pylist() == [0, 0]
