"""Distributed connected components (min-label propagation) for
neardup_clusters, pinned equal to the driver union-find, plus the
candidate-id broadcast cap and its join fallback."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datacat_ray.pipelines import dedup_ops
from datacat_ray.pipelines.dedup_ops import (
    BroadcastIdSetTooLarge,
    _fetch_candidate_values,
    label_propagation_parquet,
    minhash_candidate_pairs,
    neardup_clusters,
)

SF = "/root/testdata/sf0.001"


def _uf_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


def _run_lp(tmp_path, edges: list[tuple[int, int]]) -> dict[int, int]:
    edir = str(tmp_path / "edges")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        ),
        os.path.join(edir, "part-0.parquet"),
    )
    lab_dir = label_propagation_parquet(edir, str(tmp_path / "lp"))
    assert lab_dir is not None
    got: dict[int, int] = {}
    for f in sorted(os.listdir(lab_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(lab_dir, f))
        got.update(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    return got


def test_lp_chain_clique_and_isolated_pair(ray_session, tmp_path):
    # a long chain (multi-round convergence), a clique, a 2-cycle, and a
    # disjoint pair with non-contiguous ids
    chain = [(i, i + 1) for i in range(100, 120)]
    clique = [(a, b) for a in (7, 8, 9, 10) for b in (7, 8, 9, 10) if a < b]
    extra = [(500, 42), (9000, 8999)]
    edges = chain + clique + extra
    got = _run_lp(tmp_path, edges)
    assert got == _uf_reference(edges)
    # every chain member collapses to the chain min, not a neighbor's id
    assert all(got[i] == 100 for i in range(100, 121))


def test_lp_empty_edge_list(ray_session, tmp_path):
    edir = str(tmp_path / "edges")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        ),
        os.path.join(edir, "part-0.parquet"),
    )
    assert label_propagation_parquet(edir, str(tmp_path / "lp")) is None


def test_neardup_clusters_distributed_equals_driver(ray_session, tmp_path):
    drv = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(SF, mode="driver").take_all()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(
            SF, mode="distributed", work_dir=str(tmp_path / "lp")
        ).take_all()
    }
    assert drv == dist
    assert len(drv) > 0
    # at least one real (non-singleton) cluster exists in the fixture corpus
    assert any(d != c for d, c in drv.items())


def test_fetch_candidate_values_id_cap(ray_session):
    import ray.data

    cands = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_a": pa.array([1, 2, 3], pa.int64()),
             "doc_b": pa.array([4, 5, 6], pa.int64())}
        )
    )
    src = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": pa.array(range(10), pa.int64()),
             "text": [f"t{i}" for i in range(10)]}
        )
    )
    with pytest.raises(BroadcastIdSetTooLarge):
        _fetch_candidate_values(
            cands, ("doc_a", "doc_b"), src, "doc_id", "text", max_ids=3
        )


def test_minhash_broadcast_overflow_falls_back_to_join(
    ray_session, monkeypatch
):
    base = sorted(
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in minhash_candidate_pairs(SF, threshold=0.7).take_all()
    )
    real = _fetch_candidate_values

    def tiny_cap(*args, **kwargs):
        kwargs["max_ids"] = 1  # force the mid-stream overflow
        return real(*args, **kwargs)

    monkeypatch.setattr(dedup_ops, "_fetch_candidate_values", tiny_cap)
    via_join = sorted(
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
        for r in minhash_candidate_pairs(SF, threshold=0.7).take_all()
    )
    assert via_join == base
    assert len(base) > 0


def test_lp_resume_from_checkpoint(ray_session, tmp_path):
    chain = [(i, i + 1) for i in range(0, 40)]  # needs several rounds
    edir = str(tmp_path / "edges")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(
            {"doc_a": pa.array([a for a, _ in chain], pa.int64()),
             "doc_b": pa.array([b for _, b in chain], pa.int64())}
        ),
        os.path.join(edir, "part-0.parquet"),
    )
    work = str(tmp_path / "lp")
    # interrupt: too-small round budget raises but leaves checkpoints
    with pytest.raises(RuntimeError):
        label_propagation_parquet(edir, work, max_rounds=1)
    done = [d for d in os.listdir(work) if d.startswith("round-")]
    assert done, "interrupted run must leave a checkpointed round"
    # resume: picks up from the checkpoint and converges correctly
    lab_dir = label_propagation_parquet(edir, work, max_rounds=64)
    got: dict[int, int] = {}
    for f in sorted(os.listdir(lab_dir)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(lab_dir, f))
            got.update(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    assert got == _uf_reference(chain)
    # converged checkpoint short-circuits: same dir comes straight back
    assert label_propagation_parquet(edir, work, max_rounds=64) == lab_dir


def test_neardup_distributed_refuses_foreign_work_dir(ray_session, tmp_path):
    work = tmp_path / "lp"
    work.mkdir()
    (work / "precious_data.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to clear"):
        neardup_clusters(
            SF, mode="distributed", work_dir=str(work)
        ).take_all()
    assert (work / "precious_data.txt").exists()
