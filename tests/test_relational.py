"""partial_agg / broadcast_join / topk vs DuckDB ground truth."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from elasticsearch_assets_ray.stages.relational import (
    AggSpec,
    broadcast_join,
    partial_agg,
    topk,
)


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def test_partial_agg_matches_duckdb(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet")
    agg = partial_agg(
        ds,
        ["l_returnflag"],
        [
            AggSpec("cnt", "l_quantity", "count"),
            AggSpec("sum_qty_c", "l_quantity", "sum_cents"),
            AggSpec("min_q", "l_quantity", "min"),
            AggSpec("max_q", "l_quantity", "max"),
            AggSpec("avg_q", "l_quantity", "mean"),
        ],
    )
    got = _collect(agg).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    want = duckdb.sql(
        f"""SELECT l_returnflag, count(*) AS cnt,
            sum(CAST(round(l_quantity*100) AS BIGINT)) AS sum_qty_c,
            min(l_quantity) AS min_q, max(l_quantity) AS max_q,
            sum(l_quantity)/count(*) AS avg_q
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert list(got["l_returnflag"]) == list(want["l_returnflag"])
    assert list(got["cnt"]) == list(want["cnt"])
    assert list(got["sum_qty_c"]) == list(want["sum_qty_c"])
    assert np.allclose(got["avg_q"], want["avg_q"])


def test_broadcast_join_types(sf_dir):
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    inner = _collect(
        broadcast_join(orders, cust, ["o_custkey"], right_keys=["c_custkey"])
    )
    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    assert inner.num_rows == n_orders  # FK fully covered
    assert "c_mktsegment" in inner.column_names

    half = cust.slice(0, cust.num_rows // 2)
    semi = _collect(
        broadcast_join(orders, half, ["o_custkey"], right_keys=["c_custkey"], join_type="semi")
    )
    anti = _collect(
        broadcast_join(orders, half, ["o_custkey"], right_keys=["c_custkey"], join_type="anti")
    )
    assert semi.num_rows + anti.num_rows == n_orders
    assert set(semi.column_names) == {"o_orderkey", "o_custkey"}


def test_topk_matches_sort(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    got = topk(ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 7)
    want = duckdb.sql(
        f"""SELECT o_orderkey, o_totalprice FROM '{sf_dir}/orders.parquet'
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 7"""
    ).df()
    assert got["o_orderkey"].to_pylist() == list(want["o_orderkey"])


def test_events_daily_matches_pandas(ray_session, sf_dir):
    """date_histogram + exact cardinality gate kernel vs pandas."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from elasticsearch_assets_ray.pipelines.registry import q_events_daily

    out = q_events_daily(sf_dir)
    df = out.to_pandas().sort_values("day").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    ref = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")
        .agg(n_events=("user_id", "size"), n_users=("user_id", "nunique"))
        .reset_index()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert df["day"].tolist() == ref["day"].tolist()
    assert df["n_events"].tolist() == ref["n_events"].tolist()
    assert df["n_users"].tolist() == ref["n_users"].tolist()
    assert (df["n_users"] <= df["n_events"]).all()


def test_events_daily_null_users_excluded(ray_session, monkeypatch, tmp_path):
    """count(DISTINCT user) excludes nulls while n_events counts all
    rows — the SQL semantics the oracle uses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.pipelines.registry import q_events_daily

    t = pa.table(
        {
            "ts": pa.array(
                [pa.scalar(0).cast(pa.timestamp("us"))] * 0
                + [i * 3_600_000_000 for i in range(6)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 2, None, None, 3], pa.int64()),
        }
    )
    d = tmp_path / "evnull"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = q_events_daily(str(d))
    assert out.num_rows == 1
    assert out["n_events"][0].as_py() == 6   # nulls count as events
    assert out["n_users"][0].as_py() == 3    # nulls are not users


def test_approx_terms_agg_contract(ray_session):
    """ES terms-agg accuracy contract: per-shard top-shard_size
    truncation, merged counts, per-bucket doc_count_error_upper_bound,
    sum_other_doc_count — hand-checked on a 2-shard layout."""
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.stages.relational import approx_terms_agg

    ids = [0, 2, 4, 6, 8, 10, 1, 3, 5, 7, 12, 14, 9, 11, 13]
    keys = ["a", "a", "a", "b", "b", "c", "a", "b", "b", "b", "d", "d", "c", "c", "d"]
    ds = ray.data.from_arrow(pa.table({"id": ids, "k": keys}))
    out = approx_terms_agg(ds, "k", "id", size=2, shard_size=2, n_shards=2)
    # shard0 (even ids): a3 b2 c1 d2 → returns a3, b2 (key-asc tie), last 2
    # shard1 (odd ids):  a1 b3 c2 d1 → returns b3, c2, last 2
    # merged: b=5 (both shards, err 0), a=3 (missing shard1, err 2)
    # total 15 → other = 15 − 8 = 7; global bound = 2 + 2 = 4
    assert out.to_pydict() == {
        "value": ["b", "a", "__other__"],
        "count": [5, 3, 7],
        "error_bound": [0, 2, 4],
    }
    # ES invariant: merged count ≤ true count ≤ merged + error_bound
    import collections

    true = collections.Counter(keys)
    for v, c, e in zip(
        out["value"].to_pylist(), out["count"].to_pylist(), out["error_bound"].to_pylist()
    ):
        if v == "__other__":
            continue
        assert c <= true[v] <= c + e
    # a shard with a COMPLETE list contributes no error: big shard_size
    exact = approx_terms_agg(ds, "k", "id", size=4, shard_size=10, n_shards=2)
    d = exact.to_pydict()
    assert d["error_bound"] == [0, 0, 0, 0, 0]
    got = dict(zip(d["value"], d["count"]))
    assert {k: got[k] for k in true} == dict(true)
    assert got["__other__"] == 0
    # null keys skipped (ES missing semantics)
    ds2 = ray.data.from_arrow(
        pa.table({"id": [1, 2, 3], "k": pa.array(["a", None, "a"])})
    )
    out2 = approx_terms_agg(ds2, "k", "id", size=2, shard_size=2, n_shards=2)
    g = dict(zip(out2["value"].to_pylist(), out2["count"].to_pylist()))
    assert g == {"a": 2, "__other__": 0}


def test_tpch_q6_oracle_parity(ray_session, sf_dir):
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    got = R.QUERIES["tpch_q6"](sf_dir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    want = con.sql(R.ORACLES["tpch_q6"]).df()
    assert int(got["n"][0].as_py()) == int(want["n"][0]) > 0
    assert float(got["revenue"][0].as_py()) == float(want["revenue"][0])


def test_tpch_q3_oracle_parity(ray_session, sf_dir):
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    got = R.QUERIES["tpch_q3"](sf_dir).to_pandas()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.sql(R.ORACLES["tpch_q3"]).df()
    assert len(got) == len(want) == 10
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    np.testing.assert_array_equal(
        got["revenue"].to_numpy(), want["revenue"].to_numpy()
    )
    # revenue is descending with orderkey tie-break
    rv = got["revenue"].to_numpy()
    assert (rv[:-1] >= rv[1:]).all()


def test_tpch_q5_oracle_parity(ray_session, sf_dir):
    import duckdb

    from elasticsearch_assets_ray.pipelines import registry as R

    got = R.QUERIES["tpch_q5"](sf_dir).to_pandas()
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = (
        con.sql(R.ORACLES["tpch_q5"]).df()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert got["c_mktsegment"].tolist() == want["c_mktsegment"].tolist()
    np.testing.assert_array_equal(
        got["revenue"].to_numpy(), want["revenue"].to_numpy()
    )
    np.testing.assert_array_equal(
        got["n_orders"].to_numpy(), want["n_orders"].to_numpy()
    )
