"""matrix_stats (exact co-moment partials) and auto_date_histogram
(interval ladder) semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_assets_ray.sources.dates import (
    AUTO_INTERVALS_US,
    auto_interval_us,
)
from elasticsearch_assets_ray.stages.relational import matrix_stats


def _ds(n=500, seed=0, with_nulls=False):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, 1000, n)
    y = 3 * x + rng.integers(-50, 50, n)
    rows = [{"x": int(a), "y": int(b)} for a, b in zip(x, y)]
    if with_nulls:
        rows[0]["x"] = None
        rows[1]["y"] = None
    return ray.data.from_items(rows), x, y


def test_matrix_stats_vs_numpy(ray_session):
    ds, x, y = _ds()
    t = matrix_stats(ds, ["x", "y"])
    got = {
        (s, a, b): v
        for s, a, b, v in zip(
            t["stat"].to_pylist(),
            t["fx"].to_pylist(),
            t["fy"].to_pylist(),
            t["value_r"].to_pylist(),
        )
    }
    n = len(x)
    assert got[("count", "x", "x")] == n
    # value_r is rounded to 6 decimals — compare at that granularity
    assert got[("mean", "x", "x")] == pytest.approx(x.mean(), abs=1e-6)
    assert got[("variance", "y", "y")] == pytest.approx(y.var(ddof=1), abs=1e-6)
    assert got[("covariance", "x", "y")] == pytest.approx(
        np.cov(x, y, ddof=1)[0, 1], abs=1e-6
    )
    assert got[("correlation", "x", "y")] == pytest.approx(
        np.corrcoef(x, y)[0, 1], abs=1e-6
    )


def test_matrix_stats_skips_incomplete_rows(ray_session):
    ds, x, y = _ds(with_nulls=True)
    t = matrix_stats(ds, ["x", "y"])
    counts = [
        v
        for s, v in zip(t["stat"].to_pylist(), t["value_r"].to_pylist())
        if s == "count"
    ]
    assert counts == [len(x) - 2.0, len(x) - 2.0]


def test_matrix_stats_needs_two_rows(ray_session):
    ds = ray.data.from_items([{"x": 1, "y": 2}])
    with pytest.raises(ValueError):
        matrix_stats(ds, ["x", "y"])


def test_auto_interval_ladder():
    day = 86_400_000_000
    # 100 days of data, target 20 → 7d gives ceil ~15 buckets
    assert auto_interval_us(0, 100 * day - 1, 20) == 7 * day
    # tiny span → finest rung
    assert auto_interval_us(0, 10, 20) == AUTO_INTERVALS_US[0]
    # enormous span → coarsest rung even if target unmet
    assert auto_interval_us(0, 10**6 * day, 3) == AUTO_INTERVALS_US[-1]
    # the chosen rung's bucket count actually fits
    for span_days in (1, 30, 500, 5000):
        i = auto_interval_us(0, span_days * day, 20)
        assert (span_days * day) // i + 1 <= 20 or i == AUTO_INTERVALS_US[-1]
    with pytest.raises(ValueError):
        auto_interval_us(0, 1, 0)


def test_auto_interval_sql_twin():
    import duckdb

    from elasticsearch_assets_ray.sources.dates import auto_interval_sql

    con = duckdb.connect()
    case = auto_interval_sql(20)
    day = 86_400_000_000
    for mn, mx in ((0, 100 * day - 1), (5 * day, 6 * day), (0, 40_000 * day)):
        got = con.sql(
            f"SELECT {case} AS i FROM (SELECT {mn}::BIGINT AS mn, {mx}::BIGINT AS mx)"
        ).fetchone()[0]
        assert got == auto_interval_us(mn, mx, 20)
