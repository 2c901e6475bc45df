"""Vector aggregation + clustering ops over the embeddings table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_embeddings(tmp_path, vecs, labels):
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


def test_label_centroids_exact(ray_session, tmp_path):
    from datacat_ray.pipelines.similarity import label_centroids

    vecs = [[1.0, 2.0], [3.0, 4.0], [5.0, -6.0], [0.25, 0.75]]
    labels = [0, 0, 1, 1]
    d = _write_embeddings(tmp_path, vecs, labels)
    out = label_centroids(d)
    got = {
        (l, dim): v
        for l, dim, v in zip(
            out["label"].to_pylist(),
            out["dim"].to_pylist(),
            out["centroid_micros"].to_pylist(),
        )
    }
    assert got == {
        (0, 0): 2_000_000,
        (0, 1): 3_000_000,
        (1, 0): 2_625_000,
        (1, 1): -2_625_000,
    }


def test_label_centroids_split_invariant(ray_session):
    """Exact float64 accumulation ⇒ identical micros for any batch split."""
    import ray.data
    from ray.data import DataContext

    from datacat_ray.pipelines.similarity import label_centroids

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        a = label_centroids(SF).to_pylist()
        ctx.target_max_block_size = 16 * 1024  # force many tiny blocks
        b = label_centroids(SF).to_pylist()
    finally:
        ctx.target_max_block_size = old
    assert a == b
