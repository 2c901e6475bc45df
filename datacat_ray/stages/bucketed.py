"""Bucketed vectorized per-key kernels — the engine's standard replacement
for ``groupby(key).map_groups(python_udf)``.

``groupby(key).map_groups`` costs one Python call per DISTINCT key plus a
sort-shuffle on the raw key; at 10^8 users that is 10^8 UDF invocations
(measured 33 s of a 34 s pipeline at 5k urls in ``stages/dedup.py``). The
bucketed shape instead hashes the key into a small int bucket column, runs
ONE hash shuffle on the int, and applies a numpy/Arrow kernel once per
bucket with key-boundary masks — O(buckets) Python calls, identical
per-key semantics because every row of a key lands in the same bucket.

Used by ``latest_events`` / ``user_sessions`` / ``asof_purchase_attribution``
(``pipelines/dedup_ops.py``, ``pipelines/relational.py``) and mirrored by
the url-dedup kernels in ``stages/dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 64  # shuffle partitions; scale ~ cluster cores × 2

_BCAST_CACHE: dict = {}
_BCAST_ORDER: list = []


def cached_ref(ref, max_entries: int = 4):
    """Per-worker deserialization cache for broadcast objects: ``ray.get``
    of a large dict/set re-deserializes it EVERY call, so a per-batch
    closure must go through this instead (one deserialization per worker
    per object, small bounded LRU — a stage pair alternating two refs must
    not thrash a single-slot cache). Trade-off: up to ``max_entries``
    deserialized objects stay pinned per long-lived worker after their
    pipelines finish; the bound keeps that a constant, and the object-store
    copies are freed by Ray independently."""
    import ray as _ray

    k = ref.hex()
    if k in _BCAST_CACHE:
        _BCAST_ORDER.remove(k)
        _BCAST_ORDER.append(k)
        return _BCAST_CACHE[k]
    v = _ray.get(ref)
    _BCAST_CACHE[k] = v
    _BCAST_ORDER.append(k)
    while len(_BCAST_ORDER) > max_entries:
        _BCAST_CACHE.pop(_BCAST_ORDER.pop(0), None)
    return v


def int_bucket_codes(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """The integer-key bucket function of ``add_bucket``, exposed so
    write-side partitioners and read-side lookups (e.g. the paragraph-dedup
    prefilter) can never diverge on the mapping."""
    k = keys.astype(np.uint64)
    h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def add_bucket(
    t: pa.Table, key: str, n_buckets: int = DEFAULT_BUCKETS
) -> pa.Table:
    """Append a deterministic int32 ``__bucket`` column derived from ``key``.

    Integer keys: multiplicative (Knuth) hash then modulo — plain ``k % P``
    would map a sequential id space onto buckets in lockstep with any
    id-correlated skew. String keys: vectorized 64-bit hash via polars
    (stable across processes, pinned seed)."""
    # drop pandas schema metadata: the shuffle's schema-dedup hashing chokes
    # on the unhashable metadata dict and logs a warning per reduce task
    t = t.replace_schema_metadata(None)
    col = t[key]
    if pa.types.is_integer(col.type):
        # view-cast via numpy: negative int64 keys (e.g. signed content
        # hashes) must wrap, not overflow-error as pc.cast would
        k = col.combine_chunks().to_numpy(zero_copy_only=False)
        b = int_bucket_codes(k, n_buckets)
    else:
        import polars as pl

        s = pl.from_arrow(col.combine_chunks())
        b = (s.hash(seed=20260817) % n_buckets).cast(pl.Int32).to_numpy()
    return t.append_column("__bucket", pa.array(b, type=pa.int32()))


def sorted_key_bounds(uid: np.ndarray) -> np.ndarray:
    """Start indices of each key run in a key-sorted array."""
    if len(uid) == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.empty(len(uid), dtype=bool)
    starts[0] = True
    starts[1:] = uid[1:] != uid[:-1]
    return np.flatnonzero(starts)


def keep_first_k(
    t: pa.Table, key: str, order_cols: list[str], k: int
) -> pa.Table:
    """Vectorized per-key rank filter: keep each key's first ``k`` rows in
    (key, *order_cols) ascending order — ``row_number() OVER (PARTITION BY
    key ORDER BY order_cols) <= k`` without a per-key Python call. Rank
    within a key run is ``arange(n) - repeat(run_start, run_len)``."""
    n = t.num_rows
    if n == 0 or k <= 0:
        return t.slice(0, 0) if k <= 0 else t
    order = pc.sort_indices(
        t,
        sort_keys=[(key, "ascending")] + [(c, "ascending") for c in order_cols],
    )
    sorted_keys = pc.take(t[key], order).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    starts = sorted_key_bounds(sorted_keys)
    run_len = np.diff(np.append(starts, n))
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, run_len)
    return t.take(pc.take(order, pa.array(np.flatnonzero(rank < k))))


def keep_last(t: pa.Table, key: str, order_cols: list[str]) -> pa.Table:
    """Vectorized keep-max-per-key: stable sort by (key, *order_cols) with
    nulls FIRST (a null order value never wins), keep each key's last row."""
    n = t.num_rows
    if n <= 1:
        return t
    order = pc.sort_indices(
        t,
        sort_keys=[(key, "ascending")] + [(c, "ascending") for c in order_cols],
        null_placement="at_start",
    )
    sorted_keys = pc.take(t[key], order).combine_chunks()
    differs = pc.not_equal(
        sorted_keys.slice(1), sorted_keys.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    keep = np.ones(n, dtype=bool)
    keep[: n - 1] = differs
    return t.take(pc.take(order, pa.array(np.flatnonzero(keep))))
