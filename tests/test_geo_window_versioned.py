"""Q5 geo surface, F4 result-window guard, K6 retry-on-conflict."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_geo_box_filter_validation_and_filtering(ray_session, tmp_path):
    from elasticsearch_assets_ray.sources.geo import geo_box_filter

    with pytest.raises(ValueError):
        geo_box_filter("lat", "lon", top=-5, left=0, bottom=5, right=10)
    t = pa.table(
        {
            "id": pa.array(range(4), pa.int64()),
            "lat": pa.array([0.0, 50.0, -20.0, 10.0]),
            "lon": pa.array([0.0, 0.0, 0.0, 100.0]),
        }
    )
    filt = geo_box_filter("lat", "lon", top=30, left=-60, bottom=-10, right=40)
    assert t.filter(filt)["id"].to_pylist() == [0]


def test_haversine_known_distance():
    from elasticsearch_assets_ray.sources.geo import haversine_km

    # Paris (48.8566, 2.3522) → London (51.5074, -0.1278) ≈ 343.5 km
    d = haversine_km(np.array([48.8566]), np.array([2.3522]), 51.5074, -0.1278)
    assert abs(d[0] - 343.5) < 1.0
    # zero distance
    assert haversine_km(np.array([10.0]), np.array([20.0]), 10.0, 20.0)[0] == 0.0


def test_geo_distance_topk(ray_session):
    import ray.data

    from elasticsearch_assets_ray.sources.geo import geo_distance_topk, haversine_km

    rng = np.random.default_rng(7)
    n = 500
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    t = pa.table(
        {"id": pa.array(range(n), pa.int64()), "lat": pa.array(lat), "lon": pa.array(lon)}
    )
    res = geo_distance_topk(
        ray.data.from_arrow(t).repartition(4), "lat", "lon",
        point=(10.0, 20.0), k=5, id_col="id",
    )
    d_all = haversine_km(lat, lon, 10.0, 20.0)
    exp = np.lexsort((np.arange(n), d_all))[:5]
    assert res["id"].to_pylist() == [int(i) for i in exp]
    assert np.allclose(res["distance_km"].to_numpy(), d_all[exp])


def test_result_window_guard(tmp_path):
    from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"k": pa.array(["a"] * 20)}), p)
    api = ReaderAPI(p, key_col="k", max_result_window=10)
    with pytest.raises(ValueError, match="result window"):
        api.fetch(ReaderSlice(keys=["a"], limit=11))
    assert api.fetch(ReaderSlice(keys=["a"], limit=10)).num_rows == 10
    # unbounded by default: over-window limits are served, not rejected
    assert ReaderAPI(p, key_col="k").fetch(ReaderSlice(keys=["a"], limit=11)).num_rows == 11


def test_versioned_store_retry_on_conflict(ray_session):
    import ray

    from elasticsearch_assets_ray.state.versioned import VersionedStore, update_with_retry

    store = VersionedStore.remote()
    assert update_with_retry(store, "k", lambda v: (v or 0) + 1) == 1
    assert update_with_retry(store, "k", lambda v: v + 10) == 11
    v, val = ray.get(store.get.remote("k"))
    assert (v, val) == (2, 11)

    # concurrent increments: every one lands exactly once (CAS retries)
    @ray.remote
    def bump(s):
        from elasticsearch_assets_ray.state.versioned import update_with_retry as u

        return u(s, "ctr", lambda v: (v or 0) + 1, retries=50)

    ray.get([bump.remote(store) for _ in range(8)])
    assert ray.get(store.get.remote("ctr"))[1] == 8

    # retries exhausted surfaces the reference's conflict error
    with pytest.raises(RuntimeError, match="conflict"):
        # force conflicts by writing behind the reader's back
        def fight(v):
            ray.get(store.put_if_version.remote("f", 0, ray.get(store.get.remote("f"))[0]))
            return (v or 0) + 1

        update_with_retry(store, "f", fight, retries=2)


def test_geo_distance_agg_overlapping_ranges(ray_session):
    """Overlapping ranges count independently; round-6 bucketing; open
    ends; partial-batch accumulation survives concatenated partials."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.sources.geo import geo_distance_agg, haversine_km

    rng = np.random.default_rng(3)
    lat = rng.uniform(-60, 60, 500)
    lon = rng.uniform(-170, 170, 500)
    ds = ray.data.from_arrow(
        pa.table({"lat": pa.array(lat), "lon": pa.array(lon)})
    ).repartition(8)
    ranges = [(None, 4000.0), (2000.0, 8000.0), (4000.0, None)]
    out = geo_distance_agg(ds, "lat", "lon", point=(10.0, 20.0), ranges=ranges)
    km = np.round(haversine_km(lat, lon, 10.0, 20.0), 6)
    want = [
        int((km < 4000.0).sum()),
        int(((km >= 2000.0) & (km < 8000.0)).sum()),
        int((km >= 4000.0).sum()),
    ]
    assert out["count"].to_pylist() == want
    assert out["value"].to_pylist() == ["*-4000.0", "2000.0-8000.0", "4000.0-*"]
    # overlap really counted twice
    assert sum(want) > 500
