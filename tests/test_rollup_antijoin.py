"""Shuffle anti-join (customers_without_urgent_orders) and hierarchical
ROLLUP (revenue_rollup) — relational.py round-2 additions."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from datacat_ray.pipelines.relational import (
    customers_without_urgent_orders,
    revenue_rollup,
)

SF = "/root/testdata/sf0.001"


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(tmp_path, f"{name}.parquet"))


def test_anti_join_small(ray_session, tmp_path):
    _write(
        tmp_path,
        "customer",
        pa.table(
            {"c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
             "c_name": ["a", "b", "c", "d"],
             "c_mktsegment": ["X"] * 4}
        ),
    )
    # cust 1 has an urgent order; cust 2 only non-urgent; 3/4 no orders
    _write(
        tmp_path,
        "orders",
        pa.table(
            {"o_orderkey": pa.array([10, 11, 12], pa.int64()),
             "o_custkey": pa.array([1, 1, 2], pa.int64()),
             "o_orderpriority": ["1-URGENT", "5-LOW", "3-MEDIUM"]}
        ),
    )
    rows = sorted(
        (r["c_custkey"], r["c_name"])
        for r in customers_without_urgent_orders(str(tmp_path)).take_all()
    )
    assert rows == [(2, "b"), (3, "c"), (4, "d")]


def test_rollup_levels_consistent(ray_session):
    rows = revenue_rollup(SF).take_all()
    fine = [r for r in rows if r["r_name"] and r["n_name"]]
    subs = [r for r in rows if r["r_name"] and not r["n_name"]]
    tot = [r for r in rows if not r["r_name"] and not r["n_name"]]
    assert len(tot) == 1 and len(subs) >= 1 and len(fine) >= len(subs)
    for s in subs:
        nats = [f for f in fine if f["r_name"] == s["r_name"]]
        assert sum(f["revenue_cents"] for f in nats) == s["revenue_cents"]
        assert sum(f["n_items"] for f in nats) == s["n_items"]
    assert sum(s["revenue_cents"] for s in subs) == tot[0]["revenue_cents"]
    assert sum(s["n_items"] for s in subs) == tot[0]["n_items"]


def test_intersect_small(ray_session, tmp_path):
    from datacat_ray.pipelines.relational import error_purchase_days

    # user 1: error+purchase same day; user 2: error only; user 3:
    # purchase day 1, error day 2 (no overlap)
    ts = ["2025-01-01 03:00:00", "2025-01-01 09:00:00",
          "2025-01-01 04:00:00",
          "2025-01-01 05:00:00", "2025-01-02 05:00:00"]
    t = pa.table(
        {"event_id": pa.array(range(5), pa.int64()),
         "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
         "ts": pa.array([__import__("datetime").datetime.fromisoformat(x)
                         for x in ts],
                        pa.timestamp("us")),
         "event_type": ["error", "purchase", "error", "purchase", "error"]}
    )
    _write(tmp_path, "events", t)
    rows = [(r["user_id"], r["day"])
            for r in error_purchase_days(str(tmp_path)).take_all()]
    assert rows == [(1, "2025-01-01")]
