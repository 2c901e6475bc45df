"""Scale probe for the distributed connected-components path
(label_propagation_parquet): synthesize a pair graph far bigger than any
fixture emits — long chains (worst case for naive propagation) plus
boilerplate-style near-cliques — run the propagation, and report rounds,
wall time, and correctness vs a driver union-find.

Usage: python scripts/lp_scale_probe.py [n_edges] [num_cpus]
Prints one JSON line. Round count growing ~log(chain length) is the
Hash-to-Min acceleration working; the union-find equality is the
correctness pin at a size the unit tests don't reach.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from datacat_ray.pipelines.dedup_ops import label_propagation_parquet

    rng = np.random.RandomState(7)
    # 60% chain edges: CONTIGUOUS 1000-edge chains (diameter ~1000 — the
    # worst case naive propagation needs ~1000 rounds for); 40% star edges
    # into 200-member hubs (boilerplate-cluster breadth)
    n_chain = int(n_edges * 0.6)
    chain_len = 1_000
    n_chains = max(1, n_chain // chain_len)
    base = (np.arange(n_chains, dtype=np.int64) * 1_000_000)[:, None]
    i = np.arange(chain_len, dtype=np.int64)[None, :]
    a1 = (base + i).ravel()
    b1 = a1 + 1
    n_star = n_edges - len(a1)
    hub_ids = 5_000_000_000 + rng.randint(0, 20_000, size=n_star) * 200
    b2 = hub_ids + 1 + rng.randint(0, 199, size=n_star)
    a = np.concatenate([a1, hub_ids]).astype(np.int64)
    b = np.concatenate([b1, b2]).astype(np.int64)

    work = "/tmp/datacat_lp_probe"
    shutil.rmtree(work, ignore_errors=True)
    edir = os.path.join(work, "edges")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(
            {"doc_id_a": pa.array(a), "doc_id_b": pa.array(b)}
        ).rename_columns(["doc_a", "doc_b"]),
        os.path.join(edir, "edges.parquet"),
    )

    t0 = time.time()
    lab_dir = label_propagation_parquet(edir, work, max_rounds=64)
    lp_sec = round(time.time() - t0, 2)
    rounds = int(lab_dir.rsplit("-", 1)[1]) + 1

    # driver union-find reference
    t0 = time.time()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {}
    for n in set(a.tolist()) | set(b.tolist()):
        want[n] = find(n)
    uf_sec = round(time.time() - t0, 2)

    got: dict[int, int] = {}
    for f in sorted(os.listdir(lab_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(lab_dir, f))
        got.update(zip(t["node"].to_numpy().tolist(),
                       t["label"].to_numpy().tolist()))
    match = got == want

    print(json.dumps({
        "n_edges": int(n_edges),
        "n_nodes": len(want),
        "rounds": rounds,
        "lp_sec": lp_sec,
        "uf_sec": uf_sec,
        "matches_union_find": match,
        "num_cpus": cpus,
    }))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return 0 if match else 1


if __name__ == "__main__":
    sys.exit(main())
