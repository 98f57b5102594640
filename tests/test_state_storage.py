"""DocstoreCache — the elasticsearch_state_storage analog (T1)."""

import duckdb
import pyarrow as pa
import ray.data

from elasticsearch_assets_ray.state.storage import DocstoreCache


def test_mget_enrich_matches_join(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    out = ds.map_batches(
        DocstoreCache,
        fn_constructor_kwargs=dict(
            store_path=f"{sf_dir}/customer.parquet",
            key_col="c_custkey",
            value_cols=["c_name"],
            batch_key_col="user_id",
        ),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    got = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).to_pandas()
    want = duckdb.sql(
        f"""SELECT e.event_id, c.c_name FROM '{sf_dir}/events.parquet' e
            LEFT JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = e.user_id"""
    ).df()
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    assert list(g["c_name"].fillna("~")) == list(w["c_name"].fillna("~"))


def test_lru_hit_tracking_and_mset(sf_dir):
    c = DocstoreCache(
        store_path=f"{sf_dir}/customer.parquet",
        key_col="c_custkey",
        value_cols=["c_name"],
        cache_size=4,
    )
    c.mget([0, 1, 2])
    assert c.misses == 3 and c.hits == 0
    c.mget([1, 2])
    assert c.hits == 2
    c.mget([3, 4])  # evicts oldest (cache_size 4)
    assert len(c.cache) <= 4
    c.mset({99: ("synthetic",)})
    assert c.mget([99])[99] == ("synthetic",)
