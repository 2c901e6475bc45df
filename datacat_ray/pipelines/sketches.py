"""Distributed sketches (training-data ops — cardinality estimation).

The reference has no approx/sketch operators (SURVEY.md §2.5 "distinct /
sketches: none"); at 10^12 documents exact distinct counts of high-card
columns (urls, shingles, tokens) are shuffle-bound, so a mergeable sketch
is a first-class primitive. HyperLogLog here: per-batch register arrays
(vectorized numpy), merged by elementwise max — an associative/commutative
combine, so it composes as map_batches partials + a tiny driver fold (or a
tree reduce at cluster scale) with NO shuffle of raw values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

HLL_P = 12  # 2^12 = 4096 registers → ~1.6% standard error
_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import polars as pl

    s = pl.from_arrow(arr)
    return s.hash(seed=20260819).to_numpy().astype(np.uint64)


def hll_registers(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """One batch → 4096-register uint8 array, fully vectorized: bucket =
    top P hash bits, rank = leading-zero count of the rest + 1
    (via log2 on the remaining 52-bit value)."""
    h = _hash64(values)
    bucket = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = h << np.uint64(HLL_P) | np.uint64((1 << HLL_P) - 1)  # pad low bits
    # leading zeros of `rest` within 64 bits; rest != 0 by construction
    lz = 63 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    rank = (lz + 1).astype(np.uint8)
    regs = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for p in parts:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)  # small-range correction
    return float(est)


def approx_distinct(
    ds: "ray.data.Dataset", column: str
) -> tuple[int, float]:
    """(approx_distinct, relative_error_bound). Each batch contributes a
    register partial; partials merge on the driver (4 KB each — at cluster
    scale a tree reduce, never a value shuffle)."""

    def _partial(t: pa.Table) -> pa.Table:
        regs = hll_registers(t[column])
        return pa.Table.from_pydict({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = [
        np.frombuffer(row["regs"], dtype=np.uint8)
        for row in ds.map_batches(_partial, batch_format="pyarrow").take_all()
    ]
    est = hll_estimate(hll_merge(parts))
    return round(est), 1.04 / (_M ** 0.5)


def approx_distinct_users(sf_dir: str) -> pa.Table:
    """Approx vs exact distinct user_id over events (the exact side is the
    correctness anchor; the approx side is the 10^12-scale path)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    approx, err = approx_distinct(ds, "user_id")
    exact = len(ds.unique("user_id"))
    return pa.Table.from_pydict(
        {
            "exact": pa.array([exact], pa.int64()),
            "approx": pa.array([approx], pa.int64()),
            "rel_error_bound": pa.array([round(err, 4)], pa.float64()),
        }
    )


def grouped_hll_partials(
    t: pa.Table, key: str, column: str
) -> pa.Table:
    """One batch → ≤ |keys-in-batch| rows of (key, 4 KB register blob):
    the per-group HLL partial. Vectorized per group slice after one sort."""
    import pyarrow.compute as pc

    order = pc.sort_indices(t, sort_keys=[(key, "ascending")])
    t = t.take(order)
    keys = t[key].to_pylist()
    out_k, out_r = [], []
    i = 0
    while i < len(keys):
        j = i
        while j < len(keys) and keys[j] == keys[i]:
            j += 1
        out_k.append(keys[i])
        out_r.append(hll_registers(t[column].slice(i, j - i)).tobytes())
        i = j
    return pa.Table.from_pydict(
        {key: pa.array(out_k), "regs": pa.array(out_r, pa.binary())}
    )


def approx_users_per_type(sf_dir: str) -> pa.Table:
    """Approx distinct user_id per event_type — the grouped-sketch shape:
    per-batch (event_type, registers) partials, merged per key by
    elementwise max. The exchange is |event_types| × 4 KB blobs per batch,
    never raw user_ids; the exact side rides along as the correctness
    anchor (grouped nunique is cheap at test scale, shuffle-bound at
    10^12)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    parts: dict[str, list[np.ndarray]] = {}

    def _partial(t: pa.Table) -> pa.Table:
        return grouped_hll_partials(t, "event_type", "user_id")

    for b in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1024
    ):
        for k, r in zip(b["event_type"].to_pylist(), b["regs"].to_pylist()):
            parts.setdefault(k, []).append(np.frombuffer(r, dtype=np.uint8))

    # exact anchor: distributed distinct-pairs (local distinct → one
    # two-key groupby) then a per-type count — never raw rows driver-side
    from ray.data.aggregate import Sum

    pairs = ds.map_batches(
        lambda t: t.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow",
    )
    exact_rows = (
        pairs.groupby(["event_type", "user_id"])
        .count()
        .map_batches(
            lambda t: t.group_by(["event_type"]).aggregate(
                [("user_id", "count")]
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(Sum("user_id_count", alias_name="exact"))
        .take_all()
    )
    exact = {r["event_type"]: r["exact"] for r in exact_rows}

    keys = sorted(parts)
    return pa.Table.from_pydict(
        {
            "event_type": pa.array(keys, pa.string()),
            "exact": pa.array([exact[k] for k in keys], pa.int64()),
            "approx": pa.array(
                [round(hll_estimate(hll_merge(parts[k]))) for k in keys],
                pa.int64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min-guided exact heavy hitters
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 8192  # counters per row
HEAVY_MIN_EVENTS = 75
# fixed odd multipliers / offsets (splitmix-derived constants) — the d
# independent universal hashes h_i(x) = ((a_i*x + b_i) * mix) >> s mod w
_CMS_A = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5], dtype=np.uint64,
)
_CMS_B = np.array(
    [0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0x123456789ABCDEF1,
     0xFEDCBA9876543211], dtype=np.uint64,
)


def _cms_buckets(keys: np.ndarray) -> np.ndarray:
    """(d, n) bucket indices for int64 keys — fully vectorized."""
    x = keys.astype(np.uint64)
    out = np.empty((CMS_D, len(x)), dtype=np.int64)
    for i in range(CMS_D):
        h = (x * _CMS_A[i] + _CMS_B[i])
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        out[i] = (h % np.uint64(CMS_W)).astype(np.int64)
    return out


def cms_partial(keys: np.ndarray, weights: np.ndarray | None = None) -> np.ndarray:
    """One batch → (d, w) int64 Count-Min partial. Mergeable by +."""
    sk = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(keys):
        b = _cms_buckets(keys)
        w = weights if weights is not None else np.ones(len(keys), np.int64)
        for i in range(CMS_D):
            np.add.at(sk[i], b[i], w)
    return sk


def cms_estimate(sk: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) — NEVER underestimates the true
    count, so threshold pruning keeps every true heavy hitter."""
    if not len(keys):
        return np.zeros(0, dtype=np.int64)
    b = _cms_buckets(keys)
    ests = np.stack([sk[i][b[i]] for i in range(CMS_D)])
    return ests.min(axis=0)


def heavy_hitter_users(
    sf_dir: str, min_events: int = HEAVY_MIN_EVENTS
) -> "ray.data.Dataset":
    """Exact heavy hitters (users with ≥ ``min_events`` events), sketch-
    pruned: pass 1 folds per-batch Count-Min partials (256 KB each, merged
    by + — a tree reduce at cluster scale, never a key shuffle); pass 2
    broadcasts the merged sketch, keeps only keys whose corpus-wide
    ESTIMATE clears the threshold (deterministic under any batching — the
    estimate comes from the full-corpus sketch, and CMS never
    underestimates, so no true heavy key is pruned), and runs the exact
    count groupby over that tiny survivor set. The full-vocabulary shuffle
    of a naive HAVING-count query never happens; the exchange is
    |survivors| partial rows. False positives from sketch collisions are
    removed by the exact final filter, so output == SQL HAVING exactly."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from datacat_ray.stages.bucketed import cached_ref

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"sk": pa.array([cms_partial(keys).tobytes()], pa.binary())}
        )

    merged = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for row in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        merged += np.frombuffer(row["sk"], dtype=np.int64).reshape(CMS_D, CMS_W)
    ref = _ray.put(merged)

    def _survivors(t: pa.Table) -> pa.Table:
        sk = cached_ref(ref)
        p = t.group_by(["user_id"]).aggregate([([], "count_all")])
        keys = p["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = cms_estimate(sk, keys) >= min_events
        return p.filter(pa.array(keep, pa.bool_()))

    out = (
        ds.map_batches(_survivors, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("count_all", alias_name="n"))
    )
    def _exact_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["n"], pa.scalar(min_events)))

    return out.map_batches(_exact_filter, batch_format="pyarrow")


def heavy_hitter_users_sql(min_events: int = HEAVY_MIN_EVENTS) -> str:
    return f"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id HAVING COUNT(*) >= {min_events}
    """


# ---------------------------------------------------------------------------
# DDSketch-style mergeable quantiles (relative-error guarantee)
# ---------------------------------------------------------------------------

DD_GAMMA = 1.02  # ±2% relative-error bins
_DD_BINS = 4096
_DD_OFFSET = 2048
_DD_LN_G = np.log(DD_GAMMA)


def dd_partial(values: np.ndarray) -> np.ndarray:
    """One batch of POSITIVE values → int64[_DD_BINS] log-bin histogram.
    Mergeable by +, deterministic, fixed 32 KB regardless of batch size."""
    v = values[np.isfinite(values) & (values > 0)]
    if not len(v):
        return np.zeros(_DD_BINS, dtype=np.int64)
    idx = np.clip(
        np.ceil(np.log(v) / _DD_LN_G).astype(np.int64) + _DD_OFFSET,
        0, _DD_BINS - 1,
    )
    return np.bincount(idx, minlength=_DD_BINS).astype(np.int64)


def dd_quantile(bins: np.ndarray, q: float) -> float:
    """Quantile estimate: first bin whose cumulative count passes the
    rank; returned as the bin's gamma-midpoint 2·γ^i/(γ+1) — within a
    γ-factor of the true quantile by construction."""
    n = int(bins.sum())
    if n == 0:
        return float("nan")
    rank = max(1, int(np.ceil(q * n)))
    i = int(np.searchsorted(np.cumsum(bins), rank))
    exp = i - _DD_OFFSET
    return float(2.0 * DD_GAMMA ** exp / (DD_GAMMA + 1.0))


def approx_value_percentiles(sf_dir: str) -> pa.Table:
    """Approximate p50/p95/p99 of events.value from a mergeable DDSketch-
    style log-histogram: each batch contributes one 32 KB bin row, partials
    add (tree reduce at cluster scale — the raw values never shuffle, and
    unlike the exact-quantile operators nothing is ever sorted). The
    relative-error bound (γ−1)·100 % rides along; the guarantee is pinned
    against exact numpy quantiles in tests/test_sketches_dd.py."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def _partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict(
            {"bins": pa.array([dd_partial(v).tobytes()], pa.binary())}
        )

    merged = np.zeros(_DD_BINS, dtype=np.int64)
    for row in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        merged += np.frombuffer(row["bins"], dtype=np.int64)
    return pa.Table.from_pydict(
        {
            "p50_approx": pa.array([round(dd_quantile(merged, 0.50), 6)]),
            "p95_approx": pa.array([round(dd_quantile(merged, 0.95), 6)]),
            "p99_approx": pa.array([round(dd_quantile(merged, 0.99), 6)]),
            "rel_error_pct": pa.array([round((DD_GAMMA - 1) * 100, 2)]),
            "n": pa.array([int(merged.sum())], pa.int64()),
        }
    )


APPROX_VALUE_PERCENTILES_SQL = f"""
    WITH b AS (
        SELECT LEAST(GREATEST(
            CAST(ceil(ln(value) / ln({DD_GAMMA})) AS BIGINT) + {_DD_OFFSET},
            0), {_DD_BINS - 1}) AS bin
        FROM events WHERE value > 0 AND isfinite(value)
    ),
    c AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY bin),
    cum AS (
        SELECT bin, SUM(n) OVER (ORDER BY bin) AS cn,
               SUM(n) OVER () AS total
        FROM c
    )
    SELECT
        (SELECT ROUND(2 * POWER({DD_GAMMA}, bin - {_DD_OFFSET})
                      / ({DD_GAMMA} + 1), 6)
         FROM cum WHERE cn >= GREATEST(1, ceil(0.50 * total))
         ORDER BY bin LIMIT 1) AS p50_approx,
        (SELECT ROUND(2 * POWER({DD_GAMMA}, bin - {_DD_OFFSET})
                      / ({DD_GAMMA} + 1), 6)
         FROM cum WHERE cn >= GREATEST(1, ceil(0.95 * total))
         ORDER BY bin LIMIT 1) AS p95_approx,
        (SELECT ROUND(2 * POWER({DD_GAMMA}, bin - {_DD_OFFSET})
                      / ({DD_GAMMA} + 1), 6)
         FROM cum WHERE cn >= GREATEST(1, ceil(0.99 * total))
         ORDER BY bin LIMIT 1) AS p99_approx,
        ROUND(({DD_GAMMA} - 1) * 100, 2) AS rel_error_pct,
        (SELECT CAST(SUM(n) AS BIGINT) FROM c) AS n
"""
