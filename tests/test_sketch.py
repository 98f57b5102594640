"""HyperLogLog sketch: accuracy within theoretical bounds, merge =
union, distributed partial-register path."""

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.stages.sketch import HLL, distinct_count_hll


def test_hll_accuracy_bands():
    # standard error ~ 1.04/sqrt(2^14) ≈ 0.81%; assert within 4 sigma
    for n in (100, 5_000, 200_000):
        h = HLL(p=14)
        h.add(np.arange(n, dtype=np.int64) * 7 + 3)
        err = abs(h.count() - n) / n
        assert err < 0.033, (n, h.count())


def test_hll_duplicates_do_not_inflate():
    h = HLL(p=14)
    vals = np.arange(1000, dtype=np.int64)
    for _ in range(5):
        h.add(vals)
    assert abs(h.count() - 1000) / 1000 < 0.033


def test_hll_merge_is_union():
    a, b, u = HLL(), HLL(), HLL()
    va = np.arange(0, 60_000, dtype=np.int64)
    vb = np.arange(40_000, 100_000, dtype=np.int64)  # 20k overlap
    a.add(va)
    b.add(vb)
    u.add(np.concatenate([va, vb]))
    merged = HLL.from_bytes(a.to_bytes()).merge(b)
    assert merged.count() == u.count()  # register-max == union, exactly
    assert abs(merged.count() - 100_000) / 100_000 < 0.033


def test_distinct_count_hll_dataset(ray_session):
    import ray.data

    n = 50_000
    t = pa.table({"user": pa.array(np.arange(n, dtype=np.int64) % 17_000)})
    ds = ray.data.from_arrow(t).repartition(8)
    est = distinct_count_hll(ds, "user")
    assert abs(est - 17_000) / 17_000 < 0.033


def test_hll_linear_counting_small_range():
    h = HLL(p=14)
    h.add(np.arange(300, dtype=np.int64))
    assert abs(h.count() - 300) <= 6  # linear-counting regime: near exact


def test_grouped_distinct_hll_accuracy(ray_session):
    """Per-key sketches track exact per-key distincts within the HLL
    error band; keys arriving across many batches merge by register-max."""
    import ray.data

    rng = np.random.default_rng(23)
    n = 120_000
    keys = rng.integers(0, 7, n)
    # per-key distinct pools of very different sizes
    vals = rng.integers(0, (keys + 1) * 500, n) + keys * 10_000_000
    t = pa.table({"day": pa.array(keys.astype("int64")), "user": pa.array(vals.astype("int64"))})
    ds = ray.data.from_arrow(t).repartition(16)
    from elasticsearch_assets_ray.stages.sketch import grouped_distinct_hll

    out = grouped_distinct_hll(ds, "day", "user", p=12)
    got = dict(zip(out["key"].to_pylist(), out["distinct"].to_pylist()))
    import collections

    exact = collections.defaultdict(set)
    for k, v in zip(keys.tolist(), vals.tolist()):
        exact[k].add(v)
    assert sorted(got) == sorted(exact)
    for k in exact:
        e = len(exact[k])
        # 4 sigma at p=12: 4 * 1.04/sqrt(4096) ~ 6.5%
        assert abs(got[k] - e) <= max(0.065 * e, 8), (k, got[k], e)


def test_grouped_distinct_hll_skips_nulls(ray_session):
    import ray.data

    t = pa.table(
        {
            "day": pa.array([1, 1, None, 2], pa.int64()),
            "user": pa.array([10, None, 5, 20], pa.int64()),
        }
    )
    from elasticsearch_assets_ray.stages.sketch import grouped_distinct_hll

    out = grouped_distinct_hll(ray.data.from_arrow(t), "day", "user", p=8)
    got = dict(zip(out["key"].to_pylist(), out["distinct"].to_pylist()))
    assert got == {1: 1, 2: 1}


def test_events_daily_hll_matches_sql_register_replica(ray_session):
    """The grouped-HLL gate is exact-by-construction: the DuckDB oracle
    rebuilds the registers (splitmix64 + bin()-length ranks) and must
    land on the SAME integers, not just inside an error band."""
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    rdf = R.QUERIES["events_daily_hll"](sf).to_pandas().sort_values("day")
    odf = con.sql(R.ORACLES["events_daily_hll"]).df().sort_values("day")
    assert rdf["n_users_approx"].tolist() == odf["n_users_approx"].tolist()
    assert len(rdf) > 0
