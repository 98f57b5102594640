"""Bulk-action semantics (the ES index/create/update/upsert/delete
analogs, reference ElasticsearchBulkSender.ts) against DuckDB oracles."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from elasticsearch_assets_ray.stages import bulk


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


def _events(sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def test_last_writer_wins(sf_dir):
    got = _collect(
        bulk.last_writer_wins(_events(sf_dir), "user_id", "ts", tie_break="event_id")
    )
    want = duckdb.sql(
        f"""SELECT * FROM '{sf_dir}/events.parquet'
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)=1"""
    ).df()
    g = got.to_pandas().sort_values("user_id").reset_index(drop=True)
    w = want.sort_values("user_id").reset_index(drop=True)
    assert list(g["event_id"]) == list(w["event_id"])


def test_keep_first(sf_dir):
    got = _collect(bulk.keep_first(_events(sf_dir), "user_id", "ts", tie_break="event_id"))
    want = duckdb.sql(
        f"""SELECT * FROM '{sf_dir}/events.parquet'
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)=1"""
    ).df()
    g = got.to_pandas().sort_values("user_id").reset_index(drop=True)
    w = want.sort_values("user_id").reset_index(drop=True)
    assert list(g["event_id"]) == list(w["event_id"])


def test_delete_keys(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    dels = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64())})
    got = _collect(bulk.delete_keys(docs, dels, "doc_id"))
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert got.num_rows == n - 4
    assert not set([0, 1, 2, 3]) & set(got["doc_id"].to_pylist())


def test_update_fields_and_upsert(sf_dir):
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    upd = pa.table(
        {
            "c_custkey": pa.array([0, 1, 999999], pa.int64()),
            "c_acctbal": pa.array([1.5, 2.5, 9.9], pa.float64()),
        }
    )
    updated = _collect(bulk.update_fields(cust, upd.slice(0, 2), "c_custkey", ["c_acctbal"]))
    m = dict(zip(updated["c_custkey"].to_pylist(), updated["c_acctbal"].to_pylist()))
    assert m[0] == 1.5 and m[1] == 2.5
    base = pq.read_table(f"{sf_dir}/customer.parquet")
    assert updated.num_rows == base.num_rows

    up = _collect(bulk.upsert(cust, upd, "c_custkey", ["c_acctbal"]))
    assert up.num_rows == base.num_rows + 1  # 999999 inserted
    m2 = dict(zip(up["c_custkey"].to_pylist(), up["c_acctbal"].to_pylist()))
    assert m2[999999] == 9.9


def test_routed_write(sf_dir, tmp_path):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = str(tmp_path / "routed")
    bulk.routed_write(docs, out, "lang")
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert langs == {"en", "de", "fr", "es", "zh"}
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    back = ray.data.read_parquet(out)
    assert back.count() == n


def test_dead_letter_split():
    t = pa.table(
        {
            "k": pa.array([1, None, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", None, "d"]),
        }
    )
    ok, dead = bulk.dead_letter_split(ray.data.from_arrow(t), ["v"], "k")
    ok_t = _collect(ok)
    dead_t = _collect(dead)
    assert ok_t["k"].to_pylist() == [1, 4]
    assert dead_t.num_rows == 2
    assert "__ok" not in ok_t.column_names


def test_rekey_one_pass(ray_session):
    """_delete_id paired re-key: old id deleted, record indexed under the
    new key, existing rows at the new key overwritten — one pass."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from elasticsearch_assets_ray.stages.bulk import rekey

    base = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    # move id 2 → 10 (fresh key) and id 3 → 4 (overwrites existing 4)
    moves = pa.table(
        {
            "_delete_id": pa.array([2, 3], pa.int64()),
            "id": pa.array([10, 4], pa.int64()),
            "v": pa.array(["b2", "c2"]),
        }
    )
    out = (
        pa.concat_tables(
            list(rekey(ray.data.from_arrow(base), moves, "id").iter_batches(batch_format="pyarrow"))
        )
        .sort_by([("id", "ascending")])
    )
    assert out["id"].to_pylist() == [1, 4, 5, 10]
    assert out["v"].to_pylist() == ["a", "c2", "e", "b2"]


def test_rekey_rejects_duplicate_new_keys(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from elasticsearch_assets_ray.stages.bulk import rekey

    base = pa.table({"id": pa.array([1], pa.int64()), "v": pa.array(["a"])})
    moves = pa.table(
        {
            "_delete_id": pa.array([1, 1], pa.int64()),
            "id": pa.array([2, 2], pa.int64()),
            "v": pa.array(["x", "y"]),
        }
    )
    with pytest.raises(ValueError, match="duplicate new keys"):
        rekey(ray.data.from_arrow(base), moves, "id")


def test_update_fields_rejects_duplicate_update_keys(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from elasticsearch_assets_ray.stages.bulk import update_fields

    base = pa.table({"id": pa.array([1, 2], pa.int64()), "v": pa.array([0.0, 0.0])})
    upd = pa.table({"id": pa.array([1, 1], pa.int64()), "v": pa.array([1.0, 2.0])})
    with pytest.raises(ValueError, match="duplicate keys"):
        update_fields(ray.data.from_arrow(base), upd, "id", ["v"])


def test_update_by_query(ray_session):
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    from elasticsearch_assets_ray.stages import bulk as bulk_ops

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "source": pa.array(["a", "b", "c", "d"]),
            }
        )
    )

    def tag(t):
        return {"source": pc.binary_join_element_wise(t["source"], "x", "-")}

    # duplicate matched ids must not duplicate rows (np.unique inside)
    out = bulk_ops.update_by_query(
        ds, "doc_id", np.array([2, 4, 4]), tag
    ).take_all()
    got = {r["doc_id"]: r["source"] for r in out}
    assert got == {1: "a", 2: "b-x", 3: "c", 4: "d-x"}
    assert len(out) == 4
