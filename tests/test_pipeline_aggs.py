"""ES pipeline aggregations: reduce-phase transforms over merged bucket
tables (derivative / cumulative_sum / moving_fn / serial_diff /
bucket_selector / bucket_sort / sibling *_bucket)."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query import pipeline_aggs as pl


def _buckets(ns):
    return pa.table(
        {
            "day": pa.array(list(range(len(ns))), pa.int64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def test_derivative_and_serial_diff():
    t = _buckets([10, 13, 9, 9, 20])
    d = pl.derivative(t, "n")["n_deriv"].to_pylist()
    assert d == [None, 3, -4, 0, 11]
    s2 = pl.serial_diff(t, "n", lag=2)["n_diff2"].to_pylist()
    assert s2 == [None, None, -1, -4, 11]
    with pytest.raises(ValueError):
        pl.serial_diff(t, "n", lag=0)


def test_derivative_float_metric():
    t = pa.table({"n": pa.array([1.5, 2.25], pa.float64())})
    assert pl.derivative(t, "n")["n_deriv"].to_pylist() == [None, 0.75]


def test_cumulative_sum():
    t = _buckets([1, 2, 3])
    assert pl.cumulative_sum(t, "n")["n_cumsum"].to_pylist() == [1, 3, 6]


def test_moving_fn_default_shift_excludes_current():
    # ES shift=0: window for bucket i is [i-window, i) — current excluded
    t = _buckets([2, 4, 6, 8])
    m = pl.moving_fn(t, "n", window=2)["n_mavg"].to_pylist()
    assert m[0] is None  # empty window
    assert m[1] == 2.0  # [2]
    assert m[2] == 3.0  # [2, 4]
    assert m[3] == 5.0  # [4, 6]


def test_moving_fn_shift_one_includes_current():
    t = _buckets([2, 4, 6, 8])
    m = pl.moving_fn(t, "n", window=2, shift=1)["n_mavg"].to_pylist()
    assert m == [2.0, 3.0, 5.0, 7.0]


def test_moving_fn_kinds_and_validation():
    t = _buckets([5, 1, 9])
    assert pl.moving_fn(t, "n", 3, fn="sum", shift=1)["n_msum"].to_pylist() == [
        5.0,
        6.0,
        15.0,
    ]
    assert pl.moving_fn(t, "n", 3, fn="min", shift=1)["n_mmin"].to_pylist() == [
        5.0,
        1.0,
        1.0,
    ]
    assert pl.moving_fn(t, "n", 3, fn="max", shift=1)["n_mmax"].to_pylist() == [
        5.0,
        5.0,
        9.0,
    ]
    with pytest.raises(ValueError):
        pl.moving_fn(t, "n", 0)
    with pytest.raises(ValueError):
        pl.moving_fn(t, "n", 2, fn="median")


def test_bucket_selector_and_sort():
    t = _buckets([10, 3, 7, 7, 1])
    kept = pl.bucket_selector(t, "n", "gte", 7)
    assert kept["day"].to_pylist() == [0, 2, 3]
    top = pl.bucket_sort(kept, [("n", "descending"), ("day", "ascending")], size=2)
    assert top["day"].to_pylist() == [0, 2]
    paged = pl.bucket_sort(kept, [("n", "descending"), ("day", "ascending")], size=2, from_=1)
    assert paged["day"].to_pylist() == [2, 3]


def test_sibling_stats():
    t = _buckets([4, 6, 2])
    s = pl.sibling_stats(t, "n")
    assert s == {"count": 3, "min": 2, "max": 6, "sum": 12, "avg": 4.0}
    assert pl.sibling_stats(_buckets([]), "n")["count"] == 0


def test_pipeline_daily_matches_oracle(sf_dir):
    """The registry's tall pipeline table equals its DuckDB window-SQL
    oracle row for row (the driver gate's exact comparison)."""
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    t = R.QUERIES["pipeline_daily"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    o = con.sql(R.ORACLES["pipeline_daily"]).df()
    cols = sorted(t.columns)
    assert sorted(o.columns) == cols
    a = t[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = o[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c].astype(a[c].dtype)
        assert ((av == bv) | (av.isna() & bv.isna())).all(), c


def test_bucket_script_and_gap_policy():
    """bucket_script: vectorized metric-of-metrics; null inputs stay null."""
    import numpy as np
    import pyarrow as pa

    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    t = pa.table(
        {"n": pa.array([2.0, None, 6.0]), "d": pa.array([4.0, 5.0, 12.0])}
    )
    out = pl.bucket_script(t, ["n", "d"], lambda n, d: n / d, "r")
    assert out["r"].to_pylist() == [0.5, None, 0.5]


def test_normalize_methods():
    import numpy as np
    import pyarrow as pa
    import pytest

    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    t = pa.table({"n": pa.array([1.0, 3.0, 4.0])})
    assert pl.normalize(t, "n", "rescale_0_1")["n_norm"].to_pylist() == [
        0.0,
        2 / 3,
        1.0,
    ]
    assert pl.normalize(t, "n", "rescale_0_100")["n_norm"].to_pylist() == [
        0.0,
        (2 / 3) * 100.0,
        100.0,
    ]
    assert pl.normalize(t, "n", "percent_of_sum")["n_norm"].to_pylist() == [
        0.125,
        0.375,
        0.5,
    ]
    sm = pl.normalize(t, "n", "softmax")["n_norm"].to_numpy()
    np.testing.assert_allclose(sm.sum(), 1.0)
    z = pl.normalize(t, "n", "z-score")["n_norm"].to_numpy()
    np.testing.assert_allclose(z.mean(), 0.0, atol=1e-12)
    with pytest.raises(ValueError):
        pl.normalize(t, "n", "bogus")
    # constant series: range-based methods degrade to zeros, not NaN
    c = pa.table({"n": pa.array([5.0, 5.0])})
    assert pl.normalize(c, "n", "rescale_0_1")["n_norm"].to_pylist() == [0.0, 0.0]
    assert pl.normalize(c, "n", "z-score")["n_norm"].to_pylist() == [0.0, 0.0]


def test_cumulative_cardinality_finalizer():
    import pyarrow as pa

    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    t = pa.table({"day": [3, 1, 2], "first_seen": [2, 5, 0]})
    out = pl.cumulative_cardinality(t, "day", "first_seen")
    assert out["day"].to_pylist() == [1, 2, 3]
    assert out["cumulative_cardinality"].to_pylist() == [5, 5, 7]


def test_moving_percentiles_exact_window():
    """moving_percentiles: trailing window incl. current bucket, exact
    quantile_cont interpolation over the merged (value, count) unit."""
    import pyarrow as pa

    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    t = pa.table(
        {
            "day": [1, 1, 2, 2, 3],
            "value": [1.0, 3.0, 5.0, 3.0, 7.0],
            "count": [1, 1, 1, 1, 2],
        }
    )
    out = pl.moving_percentiles(t, "day", window=2, percent=50.0)
    assert out["day"].to_pylist() == [1, 2, 3]
    # day1: {1,3} -> 2.0 ; day2: {1,3,5,3} -> 3.0 ; day3: {5,3,7,7} -> 6.0
    assert out["value"].to_pylist() == [2.0, 3.0, 6.0]


def test_rate_agg():
    """ES rate agg: fixed-interval rescale, calendar units rejected."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pt

    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    t = pa.table({"day": pa.array([0, 1, 2]), "n": pa.array([24, 48, 0])})
    r = pl.rate(t, "n", bucket="day", unit="hour")
    assert r["n_rate_hour"].to_pylist() == [1.0, 2.0, 0.0]
    r = pl.rate(t, "n", bucket="day", unit="week")
    assert r["n_rate_week"].to_pylist() == [168.0, 336.0, 0.0]
    # per-minute rate of an hourly bucket
    r = pl.rate(t, "n", bucket="hour", unit="minute")
    assert r["n_rate_minute"].to_pylist() == [0.4, 0.8, 0.0]
    with _pt.raises(ValueError, match="fixed-length"):
        pl.rate(t, "n", bucket="day", unit="month")
