"""Sequence packing: assign documents to fixed-length training sequences.

The GPT-style pretraining layout concatenates the token stream of all
documents in a fixed global order (doc_id) and slices it into ``seq_len``-
token sequences; each document's placement is fully determined by the
EXCLUSIVE prefix sum of token counts over all earlier documents. This is
the one training-data op whose result depends on a *global scan*, so its
distributed shape matters more than most:

1. **Count pass** (narrow): tokenize each doc once, emit
   ``(doc_id, n_tokens, __bucket)`` where the bucket is a CONTIGUOUS
   doc_id range (``doc_id * P // (max_id + 1)`` — range partitioning, not
   hash, because prefix order must be preserved across buckets). Max
   doc_id comes from parquet row-group statistics — metadata only, no
   data read.
2. **Bucket subtotals**: a map-side partial sum per batch (≤ P tiny rows
   per batch) then one small ``groupby(__bucket).sum`` — the shuffle
   exchanges P partials, not row counts.
3. **Exclusive scan over bucket subtotals on the driver** — P numbers,
   O(P) work regardless of corpus size.
4. **Placement pass**: one hash shuffle of the narrow counts on
   ``__bucket``, then a vectorized per-bucket kernel (sort by doc_id,
   ``np.cumsum``, add the bucket's scan offset). O(P) Python calls.

The narrow count table is materialized between passes 1 and 4 so the text
is tokenized exactly once: at 10^12 docs that is ~24 TB of (int64×3) in
the object store — the same order as any shuffle of the key space, and
Ray spills it; pass ``two_pass="recompute"`` to trade a second tokenize
of the full corpus for zero spill instead.

The reference has no packing op (its corpus loop is one-file-one-doc,
``EngineDatacat.java:135-144``); this is part of the beyond-reference
LLM-pipeline family (driver query ``pack_sequences``, DuckDB window-sum
oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

DEFAULT_SEQ_LEN = 2048
DEFAULT_BUCKETS = 64


def max_doc_id(path: str, column: str = "doc_id") -> int:
    """Max of an int column from parquet row-group statistics (metadata
    pages only — nothing is decoded). Falls back to a narrow scan if a
    writer omitted statistics."""
    import os

    import pyarrow.parquet as pq

    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path))
         if f.endswith(".parquet")]
        if os.path.isdir(path) else [path]
    )
    best: int | None = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                import pyarrow.dataset as pads

                t = pads.dataset(files, format="parquet").to_table(
                    columns=[column])
                return int(pc.max(t[column]).as_py())
            best = st.max if best is None else max(best, st.max)
    if best is None:
        raise ValueError(f"no rows found for max({column}) under {path}")
    return int(best)


def _range_bucket(ids: np.ndarray, hi: int, n_buckets: int) -> np.ndarray:
    """Contiguous range partition of [0, hi] into n_buckets (order-
    preserving across buckets, unlike a hash)."""
    return (ids.astype(np.int64) * n_buckets // (hi + 1)).astype(np.int32)


def pack_sequences(
    sf_dir: str,
    seq_len: int = DEFAULT_SEQ_LEN,
    n_buckets: int = DEFAULT_BUCKETS,
    two_pass: str = "materialize",
) -> "ray.data.Dataset":
    """(doc_id, n_tokens, chunk_id, chunk_pos): each doc's target training
    sequence (``chunk_id``) and token offset within it (``chunk_pos``)
    under concat-and-slice packing in doc_id order at ``seq_len`` tokens
    per sequence. Token counts use the whitespace tokenizer shared with
    ``token_count`` (identical to the oracle's regexp split)."""
    from datacat_ray.pipelines.text_analysis import ascii_tokens

    path = f"{sf_dir}/documents.parquet"
    hi = max_doc_id(path)

    def _count(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        counts = np.fromiter(
            (len(ascii_tokens(x)) for x in t["text"].to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "__bucket": pa.array(_range_bucket(ids, hi, n_buckets)),
            }
        )

    counts = ray.data.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(_count, batch_format="pyarrow")
    if two_pass == "materialize":
        counts = counts.materialize()  # tokenize once; narrow table spills

    # bucket subtotals: map-side partial (≤ n_buckets rows per batch) then
    # one tiny groupby — the exchange moves partials, not docs
    def _partial(t: pa.Table) -> pa.Table:
        return t.group_by(["__bucket"]).aggregate([("n_tokens", "sum")])

    subtotal_rows = (
        counts.map_batches(_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .aggregate(Sum("n_tokens_sum", alias_name="bucket_tokens"))
        .take_all()  # ≤ n_buckets rows — O(P), corpus-size independent
    )
    subtotals = {r["__bucket"]: r["bucket_tokens"] for r in subtotal_rows}
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(subtotals):
        offsets[b] = acc
        acc += int(subtotals[b])

    def _place(g: pa.Table) -> pa.Table:
        b = int(g["__bucket"][0].as_py())
        order = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        ids = pc.take(g["doc_id"], order).combine_chunks().to_numpy()
        nt = pc.take(g["n_tokens"], order).combine_chunks().to_numpy()
        before = offsets[b] + np.cumsum(nt) - nt  # exclusive prefix sum
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "chunk_id": pa.array(before // seq_len, pa.int64()),
                "chunk_pos": pa.array(before % seq_len, pa.int64()),
            }
        )

    return counts.groupby("__bucket").map_groups(
        _place, batch_format="pyarrow"
    )


def pack_sequences_sql(seq_len: int = DEFAULT_SEQ_LEN) -> str:
    return rf"""
        WITH t AS (
            SELECT doc_id,
                   len(list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\s+'),
                       x -> x <> '')) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS before
            FROM t
        )
        SELECT doc_id, n_tokens,
               CAST(before // {seq_len} AS BIGINT) AS chunk_id,
               CAST(before % {seq_len} AS BIGINT)  AS chunk_pos
        FROM c
    """
