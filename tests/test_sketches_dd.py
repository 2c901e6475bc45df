"""DDSketch-style mergeable quantiles (sketches.approx_value_percentiles)."""

import numpy as np
import pyarrow.parquet as pq

from datacat_ray.pipelines.sketches import (
    DD_GAMMA,
    approx_value_percentiles,
    dd_partial,
    dd_quantile,
)

SF = "/root/testdata/sf0.001"


def test_dd_partials_merge_by_sum():
    rng = np.random.default_rng(3)
    v = rng.lognormal(1.0, 1.5, size=4000)
    whole = dd_partial(v)
    halves = dd_partial(v[:2000]) + dd_partial(v[2000:])
    assert (whole == halves).all()


def test_dd_relative_error_guarantee():
    rng = np.random.default_rng(4)
    v = rng.lognormal(1.0, 1.5, size=20000)
    bins = dd_partial(v)
    for q in (0.5, 0.95, 0.99):
        approx = dd_quantile(bins, q)
        exact = np.quantile(v, q)
        assert abs(approx / exact - 1.0) <= (DD_GAMMA - 1.0) + 1e-9, q


def test_approx_value_percentiles_vs_exact(ray_session):
    t = approx_value_percentiles(SF)
    v = pq.read_table(f"{SF}/events.parquet", columns=["value"])[
        "value"
    ].to_numpy()
    v = v[np.isfinite(v) & (v > 0)]
    assert t["n"][0].as_py() == len(v)
    for col, q in (("p50_approx", 0.5), ("p95_approx", 0.95),
                   ("p99_approx", 0.99)):
        approx = t[col][0].as_py()
        exact = float(np.quantile(v, q))
        assert abs(approx / exact - 1.0) <= (DD_GAMMA - 1.0) + 1e-6, (col, approx, exact)
