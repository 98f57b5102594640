"""boxplot / percentile_ranks / string_stats / t_test / geo_centroid /
geotile_grid aggregation units."""

import math

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.query.engine import (
    boxplot_from_value_counts,
    percentile_ranks_from_value_counts,
)


def _vc(values):
    v, c = np.unique(np.asarray(values, dtype=np.float64), return_counts=True)
    return pa.table({"value": pa.array(v), "count": pa.array(c.astype(np.int64))})


def test_boxplot_quartiles_and_whiskers():
    # 1..9 plus a far outlier
    bx = boxplot_from_value_counts(_vc(list(range(1, 10)) + [100]))
    assert bx["min"] == 1.0 and bx["max"] == 100.0
    assert bx["q2"] == (5 + 6) / 2
    q1, q3 = bx["q1"], bx["q3"]
    assert q1 == 3.25 and q3 == 7.75  # numpy linear interpolation
    # upper whisker excludes the outlier (fence = q3 + 1.5*IQR = 14.5)
    assert bx["upper"] == 9.0 and bx["lower"] == 1.0


def test_percentile_ranks_midpoint_convention():
    pr = percentile_ranks_from_value_counts(_vc([1, 2, 2, 3]), (2.0, 0.0, 5.0))
    d = dict(zip(pr["value"].to_pylist(), pr["rank"].to_pylist()))
    assert d[2.0] == 100.0 * (1 + 0.5 * 2) / 4
    assert d[0.0] == 0.0 and d[5.0] == 100.0


def test_string_stats_entropy(ray_session):
    import ray.data

    from elasticsearch_assets_ray.stages.textstats import string_stats

    t = pa.table({"s": pa.array(["ab", "ab", "b", None], pa.string())})
    st = string_stats(ray.data.from_arrow(t), "s")
    assert st["count"] == 3
    assert st["min_length"] == 1 and st["max_length"] == 2
    assert abs(st["avg_length"] - 5 / 3) < 1e-12
    # chars: a=2, b=3 -> entropy over p=(2/5, 3/5)
    exp = -(2 / 5 * math.log2(2 / 5) + 3 / 5 * math.log2(3 / 5))
    assert abs(st["entropy"] - exp) < 1e-9


def test_t_test_matches_hand_welch(ray_session, sf_dir):
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    t = R.QUERIES["t_test_values"](sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    df = con.sql(
        "SELECT event_type, count(*) n, avg(value) m, var_samp(value) v "
        "FROM events WHERE event_type IN ('click','view') GROUP BY 1 ORDER BY 1"
    ).df()
    (n1, m1, v1), (n2, m2, v2) = df[["n", "m", "v"]].itertuples(index=False)
    exp = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert abs(t["t_r"][0].as_py() - round(exp, 6)) <= 1e-6


def test_geo_centroid_bounds(ray_session):
    import ray.data

    from elasticsearch_assets_ray.sources.geo import geo_centroid_bounds

    t = pa.table(
        {
            "lat": pa.array([0.0, 10.0, -20.0], pa.float64()),
            "lon": pa.array([5.0, 15.0, -30.0], pa.float64()),
        }
    )
    cb = geo_centroid_bounds(ray.data.from_arrow(t), "lat", "lon")
    assert cb["count"] == 3
    assert abs(cb["centroid_lat"] - (-10 / 3)) < 1e-12
    assert cb["top"] == 10.0 and cb["bottom"] == -20.0
    assert cb["left"] == -30.0 and cb["right"] == 15.0


def test_geotile_encode_known_tiles():
    from elasticsearch_assets_ray.sources.geo import geotile_encode

    # equator / prime meridian at zoom 1 -> tile 1/1/1's corner (x=1,y=1
    # is the SE quadrant; (0,0) lies on the boundary, floor puts it there)
    x, y = geotile_encode(np.array([0.0]), np.array([0.0]), 1)
    assert (int(x[0]), int(y[0])) == (1, 1)
    # NW hemisphere point
    x, y = geotile_encode(np.array([45.0]), np.array([-90.0]), 2)
    assert (int(x[0]), int(y[0])) == (1, 1)
    # poles clamp instead of diverging
    x, y = geotile_encode(np.array([90.0, -90.0]), np.array([0.0, 0.0]), 3)
    assert int(y[0]) == 0 and int(y[1]) == 7


def test_geotile_grid_counts(ray_session):
    import ray.data

    from elasticsearch_assets_ray.sources.geo import geotile_grid

    t = pa.table(
        {
            "lat": pa.array([45.0, 45.0, -45.0], pa.float64()),
            "lon": pa.array([-90.0, -89.0, 90.0], pa.float64()),
        }
    )
    g = geotile_grid(ray.data.from_arrow(t), "lat", "lon", zoom=2)
    d = dict(zip(g["tile"].to_pylist(), g["count"].to_pylist()))
    # lon -90 sits exactly on the x=1 boundary, -89 inside it -> same tile
    assert d == {"2/1/1": 2, "2/3/2": 1}
