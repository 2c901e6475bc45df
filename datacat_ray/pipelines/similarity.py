"""Similarity search over the ``embeddings`` table (training-data ops).

- Brute-force cosine top-k: the baseline — a numpy matmul per batch against
  a broadcast query matrix (``ray.put`` once, read per task), then a
  distributed top-k (per-batch local top-k → global sort-limit on the tiny
  candidate set). Never materializes the full similarity column.
- IVF-style variant: the scale path — vectors are bucketed by a coarse
  deterministic quantizer (sign pattern over the leading dimensions); the
  query probes only matching buckets. Recall < 1 by construction; the
  partitioning assumption (bucket key reused across queries) is the point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _load_query_vec(sf_dir: str, query_vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    v = np.array(t["embedding"][ids.index(query_vec_id)].as_py(), dtype=np.float64)
    n = np.linalg.norm(v)
    return v / (n if n else 1.0)


def brute_force_topk(
    sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> pa.Table:
    """(vec_id, rank): the k nearest vectors to the query by cosine
    similarity (the query itself excluded). Ties broken by vec_id ascending
    — deterministic and mirrored in the oracle SQL."""
    q = _load_query_vec(sf_dir, query_vec_id)
    q_ref = ray.put(q)

    def _local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = np.array(batch["vec_id"].to_pylist(), dtype=np.int64)
        embs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        sims = (embs @ qv) / norms
        mask = ids != query_vec_id
        ids, sims = ids[mask], sims[mask]
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
            ids, sims = ids[part], sims[part]
        return pa.Table.from_pydict(
            {"vec_id": pa.array(ids), "sim": pa.array(sims)}
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_local_topk, batch_format="pyarrow")
    # global merge: candidates are ≤ k per batch — tiny
    top = ds.sort(["sim", "vec_id"], descending=[True, False]).limit(k)
    rows = top.take_all()
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], type=pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), type=pa.int64()),
        }
    )


def multi_query_topk(
    sf_dir: str, query_vec_ids: tuple[int, ...] = (0, 1, 2, 3), k: int = 5
) -> pa.Table:
    """Batched similarity search: one (Q, dim) query matrix broadcast via
    ``ray.put``, ONE numpy matmul per data batch against all queries
    simultaneously, per-query local top-k → tiny global merge. This is the
    scale shape for model-training retrieval (Q in the thousands): the data
    side streams once regardless of Q.

    Returns (query_vec_id, vec_id, rank) with rank ties broken by vec_id —
    mirrored in the oracle SQL."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = t["vec_id"].to_pylist()
    Q = np.array(
        [t["embedding"][ids_all.index(q)].as_py() for q in query_vec_ids],
        dtype=np.float64,
    )
    Qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn[Qn == 0] = 1.0
    q_ref = ray.put(Q / Qn)
    qids = np.array(query_vec_ids, dtype=np.int64)

    def _local(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)  # (Q, dim)
        ids = np.array(batch["vec_id"].to_pylist(), dtype=np.int64)
        embs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (embs / norms) @ Qm.T  # (n, Q)
        out_q, out_v, out_s = [], [], []
        for qi in range(Qm.shape[0]):
            col = sims[:, qi]
            mask = ids != qids[qi]
            cids, csims = ids[mask], col[mask]
            if len(cids) > k:
                part = np.argpartition(-csims, k)[:k]
                cids, csims = cids[part], csims[part]
            out_q.extend([int(qids[qi])] * len(cids))
            out_v.extend(cids.tolist())
            out_s.extend(csims.tolist())
        return pa.Table.from_pydict(
            {
                "query_vec_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_local, batch_format="pyarrow")
    # global merge on the tiny candidate set (≤ Q*k per batch)
    cand = ds.to_pandas()
    cand = cand.sort_values(
        ["query_vec_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    cand["rank"] = cand.groupby("query_vec_id").cumcount() + 1
    top = cand[cand["rank"] <= k]
    return pa.Table.from_pydict(
        {
            "query_vec_id": pa.array(top["query_vec_id"].tolist(), type=pa.int64()),
            "vec_id": pa.array(top["vec_id"].tolist(), type=pa.int64()),
            "rank": pa.array(top["rank"].tolist(), type=pa.int64()),
        }
    )


# IVF-style coarse quantization ------------------------------------------------

IVF_BITS = 6  # 64 coarse buckets from sign pattern of leading dims


def ivf_bucket_of(unit: np.ndarray) -> np.ndarray:
    bits = (unit[:, :IVF_BITS] > 0).astype(np.int64)
    return bits @ (1 << np.arange(IVF_BITS))


def ivf_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pa.Table:
    """Approximate top-k probing only the query's coarse bucket (plus
    Hamming-1 neighbor buckets for recall)."""
    q = _load_query_vec(sf_dir, query_vec_id)
    qb = int(ivf_bucket_of(q[None, :])[0])
    probe = {qb} | {qb ^ (1 << i) for i in range(IVF_BITS)}
    q_ref = ray.put(q)

    def _probe_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = np.array(batch["vec_id"].to_pylist(), dtype=np.int64)
        embs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(embs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = embs / norms
        buckets = ivf_bucket_of(unit)
        mask = np.isin(buckets, list(probe)) & (ids != query_vec_id)
        ids, unit = ids[mask], unit[mask]
        sims = unit @ qv
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
            ids, sims = ids[part], sims[part]
        return pa.Table.from_pydict({"vec_id": pa.array(ids), "sim": pa.array(sims)})

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_probe_topk, batch_format="pyarrow")
    rows = ds.sort(["sim", "vec_id"], descending=[True, False]).limit(k).take_all()
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in rows], type=pa.int64()),
            "rank": pa.array(list(range(1, len(rows) + 1)), type=pa.int64()),
        }
    )
