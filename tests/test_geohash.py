"""Geohash grid aggregation: canonical test vectors, edge clamping, and
the generated SQL twin (bit-identical cells — geohash has no
transcendentals, which is why it's the oracle-checked grid)."""

import numpy as np
import pytest

from elasticsearch_assets_ray.sources.geo import (
    geohash_encode,
    geohash_grid,
    geohash_grid_sql,
)


def test_canonical_vectors():
    # the two classic published examples
    assert geohash_encode(np.array([57.64911]), np.array([10.40744]), 11)[0] == (
        "u4pruydqqvj"
    )
    assert geohash_encode(np.array([42.605]), np.array([-5.603]), 5)[0] == "ezs42"


def test_prefix_property():
    """A finer geohash refines (is prefixed by) the coarser one."""
    lat = np.array([48.8566, -33.8688, 35.6762])
    lon = np.array([2.3522, 151.2093, 139.6503])
    g8 = geohash_encode(lat, lon, 8)
    for p in (1, 3, 5):
        gp = geohash_encode(lat, lon, p)
        assert all(f.startswith(c) for f, c in zip(g8, gp))


def test_poles_and_antimeridian_clamped():
    g = geohash_encode(np.array([90.0, -90.0]), np.array([180.0, -180.0]), 4)
    assert list(g) == ["zzzz", "0000"]


def test_precision_validated():
    with pytest.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 0)
    with pytest.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 13)


@pytest.mark.parametrize("precision", [1, 2, 5])
def test_sql_twin_bit_identical(precision):
    import duckdb

    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 200)
    lon = rng.uniform(-180, 180, 200)
    want = geohash_encode(lat, lon, precision)
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"lat": lat, "lon": lon}),
    )
    cell = geohash_grid_sql("lat", "lon", precision)
    got = con.sql(f"SELECT {cell} AS g FROM pts").df()["g"].to_numpy()
    assert (got == want).all()


def test_geohash_grid_dataset(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    lat = rng.uniform(-90, 90, 1000)
    lon = rng.uniform(-180, 180, 1000)
    ds = ray.data.from_items(
        [{"lat": float(a), "lon": float(o)} for a, o in zip(lat, lon)]
    )
    t = geohash_grid(ds, "lat", "lon", precision=1)
    # exact counts vs numpy
    import collections

    want = collections.Counter(geohash_encode(lat, lon, 1))
    got = dict(zip(t["geohash"].to_pylist(), t["count"].to_pylist()))
    assert got == dict(want)
    # ES bucket order: count desc, cell asc
    rows = list(zip(t["count"].to_pylist(), t["geohash"].to_pylist()))
    assert rows == sorted(rows, key=lambda cv: (-cv[0], cv[1]))


def test_point_in_polygon_crossing_number():
    """geo_polygon membership: classic ray-casting on a diamond."""
    import numpy as np
    import pytest

    from elasticsearch_assets_ray.sources.geo import point_in_polygon

    # diamond centered at origin (no horizontal edges)
    poly = [(1.0, 0.0), (0.0, 1.0), (-1.0, 0.0), (0.0, -1.0)]
    lat = np.array([0.0, 0.9, 0.0, 2.0, -0.49, 0.51])
    lon = np.array([0.0, 0.0, 0.99, 0.0, 0.49, 0.51])
    got = point_in_polygon(lat, lon, poly).tolist()
    assert got == [True, True, True, False, True, False]
    # degenerate polygons rejected
    with pytest.raises(ValueError):
        point_in_polygon(lat, lon, [(0.0, 0.0), (1.0, 1.0)])
    with pytest.raises(ValueError):
        point_in_polygon(lat, lon, [(0.0, 0.0), (0.0, 2.0), (1.0, 1.0)])


def test_geo_line_tracks(ray_session):
    """geo_line: per-group track of the first `size` points in sort
    order, integer deci-degree coordinates."""
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.sources.geo import geo_line

    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b"],
            "lat10": [10, 20, 30, -5, -6],
            "lon10": [1, 2, 3, 7, 8],
            "ts": [3, 1, 2, 1, 2],
            "id": [30, 10, 20, 1, 2],
        }
    )
    out = geo_line(
        ray.data.from_arrow(t), "g", "lat10", "lon10", ["ts", "id"], size=2
    )
    assert out["value"].to_pylist() == ["a#20:2;30:3", "b#-5:7;-6:8"]
    assert out["count"].to_pylist() == [2, 2]
