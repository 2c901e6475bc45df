"""Count-Min-guided exact heavy hitters (sketches.heavy_hitter_users)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datacat_ray.pipelines.sketches import (
    cms_estimate,
    cms_partial,
    heavy_hitter_users,
)


def test_cms_never_underestimates():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=5000).astype(np.int64)
    sk = cms_partial(keys)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(sk, uniq)
    assert (est >= true).all()


def test_cms_partials_merge_by_sum():
    keys = np.arange(100, dtype=np.int64)
    whole = cms_partial(keys)
    halves = cms_partial(keys[:50]) + cms_partial(keys[50:])
    assert (whole == halves).all()


def test_heavy_hitter_pipeline(ray_session, tmp_path):
    # user 1: 10 events, user 2: 3, user 3: 5  → threshold 5 keeps {1, 3}
    uid = [1] * 10 + [2] * 3 + [3] * 5
    t = pa.table(
        {"event_id": pa.array(range(len(uid)), pa.int64()),
         "user_id": pa.array(uid, pa.int64()),
         "event_type": pa.array(["view"] * len(uid))}
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    rows = sorted(
        (r["user_id"], r["n"])
        for r in heavy_hitter_users(str(tmp_path), min_events=5).take_all()
    )
    assert rows == [(1, 10), (3, 5)]
