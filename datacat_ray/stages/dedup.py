"""Per-url capture dedup: keep the latest ``warc_ts`` (SURVEY.md D1).

The reference has no dedup (one file = one document); the north rule adds
dedup by url keeping the latest capture BEFORE extraction. This is the
pipeline's single required all-to-all shuffle (key = ``url``).

Scale strategy (SURVEY.md §7.3):

1. **Within-batch pre-dedup** (``map_batches``, vectorized): drops stale
   captures that happen to co-locate in a read fragment — in Common-Crawl
   layouts captures of a url cluster in the same segment files, so this
   eliminates most duplicate volume before any data moves.
2. **Hash-shuffle group dedup** (``groupby(key).map_groups``): exact global
   winner per url. Ties on ``warc_ts`` break deterministically (last row in
   (ts, stable-order) sort wins).

The wide ``html`` column crosses the shuffle exactly once and only for rows
that survive step 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _dedup_batch(batch: pa.Table, key: str, ts: str) -> pa.Table:
    """Vectorized within-batch keep-latest: stable sort by (key, ts) then
    keep each key's last occurrence."""
    n = batch.num_rows
    if n <= 1:
        return batch
    order = pc.sort_indices(
        batch, sort_keys=[(key, "ascending"), (ts, "ascending")]
    )
    sorted_keys = pc.take(batch[key], order).combine_chunks()
    # a sorted row wins if the NEXT sorted row has a different key (or none)
    differs = pc.not_equal(
        sorted_keys.slice(1), sorted_keys.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    keep = np.ones(n, dtype=bool)
    keep[: n - 1] = differs
    winners = pc.take(order, pa.array(np.flatnonzero(keep)))
    return batch.take(winners)


def _take_latest_group(group: pa.Table, ts: str) -> pa.Table:
    i = pc.sort_indices(group, sort_keys=[(ts, "ascending")])[-1].as_py()
    return group.slice(i, 1)


def dedup_latest(
    ds: "ray.data.Dataset", key: str = "url", ts: str = "warc_ts"
) -> "ray.data.Dataset":
    """Keep, per ``key``, the single row with the largest ``ts``."""
    ds = ds.map_batches(
        lambda b: _dedup_batch(b, key, ts), batch_format="pyarrow"
    )
    return ds.groupby(key).map_groups(
        lambda g: _take_latest_group(g, ts), batch_format="pyarrow"
    )
