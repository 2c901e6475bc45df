"""Per-key exact median at unbounded key cardinality
(relational.user_value_median)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datacat_ray.pipelines.relational import user_value_median


def test_user_value_median_matches_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    uid = rng.integers(0, 40, size=500).astype(np.int64)
    val = rng.normal(10.0, 3.0, size=500)
    val[::17] = np.nan  # nulls dropped on both sides
    t = pa.table(
        {"event_id": pa.array(range(500), pa.int64()),
         "user_id": pa.array(uid),
         "value": pa.array([None if np.isnan(v) else v for v in val],
                           pa.float64())}
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    got = {r["user_id"]: (r["p50_micros"], r["n"])
           for r in user_value_median(str(tmp_path)).take_all()}
    for u in np.unique(uid):
        vals = val[(uid == u) & ~np.isnan(val)]
        if not len(vals):
            assert u not in got
            continue
        p50, n = got[u]
        want = int(np.floor(np.percentile(vals, 50, method="linear") * 1e6
                            + 0.5))
        assert (p50, n) == (want, len(vals)), u
