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


def test_kmeans_matches_numpy_reference(ray_session):
    """Exact partial sums make distributed Lloyd's bit-deterministic: the
    Ray result must EQUAL a serial numpy run of the same algorithm."""
    from datacat_ray.pipelines.similarity import kmeans_clusters

    k, iters = 8, 3
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_clusters(SF, k=k, iters=iters).take_all()
    }

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cent = mat[ids < k][np.argsort(ids[ids < k])].copy()

    def assign(m, c):
        d2 = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(mat, cent)
        for j in range(k):
            if (a == j).any():
                cent[j] = mat[a == j].sum(axis=0) / (a == j).sum()
    want = dict(zip(ids.tolist(), assign(mat, cent).tolist()))
    assert got == want


def test_kmeans_split_invariant(ray_session):
    import ray.data
    from ray.data import DataContext

    from datacat_ray.pipelines.similarity import kmeans_clusters

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        a = sorted(map(tuple, (r.values() for r in
                               kmeans_clusters(SF, k=5, iters=2).take_all())))
        ctx.target_max_block_size = 16 * 1024
        b = sorted(map(tuple, (r.values() for r in
                               kmeans_clusters(SF, k=5, iters=2).take_all())))
    finally:
        ctx.target_max_block_size = old
    assert a == b


def test_approx_users_per_type(ray_session):
    import duckdb

    from datacat_ray.pipelines.sketches import approx_users_per_type

    out = approx_users_per_type(SF)
    got = {
        k: (e, a)
        for k, e, a in zip(
            out["event_type"].to_pylist(),
            out["exact"].to_pylist(),
            out["approx"].to_pylist(),
        )
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k, (e, a) in got.items():
        assert e == want[k], k
        assert abs(a - e) <= max(5, 0.1 * e), (k, a, e)  # ~1.6% typical


def test_embedding_neardup_pairs_exact_precision(ray_session, tmp_path):
    """r4: the embedding near-dup path streams straight off the parquet
    read (no full-table ``materialize()``). Pinned behavior: every emitted
    pair's cosine matches the brute-force value and clears the threshold
    (exact precision), and planted colinear duplicates — which land in the
    same LSH bucket in every table by construction — are all recalled."""
    from datacat_ray.pipelines.dedup_ops import embedding_neardup_pairs

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((40, 16))
    vecs[10] = vecs[3]          # exact duplicate: cosine 1.0
    vecs[25] = 2.5 * vecs[7]    # scaled duplicate: cosine 1.0
    d = _write_embeddings(
        tmp_path, [list(map(float, v)) for v in vecs], [0] * len(vecs)
    )

    out = embedding_neardup_pairs(d, threshold=0.9).to_pandas()
    got = {
        (int(a), int(b)): c
        for a, b, c in zip(out["vec_a"], out["vec_b"], out["cosine"])
    }
    assert {(3, 10), (7, 25)} <= set(got)

    # brute-force oracle over the float32 values actually stored
    stored = np.array(
        pq.read_table(f"{d}/embeddings.parquet")["embedding"].to_pylist(),
        dtype=np.float64,
    )
    unit = stored / np.linalg.norm(stored, axis=1, keepdims=True)
    for (a, b), c in got.items():
        ref = float(unit[a] @ unit[b])
        assert ref >= 0.9 - 1e-9, (a, b, ref)
        assert abs(ref - c) < 1e-5, (a, b, ref, c)
