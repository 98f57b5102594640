"""Driver contract pins: entry()/queries()/oracle_sql() shape, key
consistency, and that nothing in the import path owns a Ray session."""

import importlib.util
import sys

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_oracle_keys_subset_of_queries(entry_mod):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)
    assert len(qs) >= 25
    assert len(os_) >= 20
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_oracle_sql_parses_in_duckdb(entry_mod, sf_dir):
    """Every oracle must at least PREPARE against the real views."""
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in entry_mod.oracle_sql().items():
        con.sql(f"SELECT * FROM ({sql}) LIMIT 0")  # parse + bind, no exec


def test_entry_runs_and_is_stable(entry_mod, ray_session):
    t1 = entry_mod.entry()
    t2 = entry_mod.entry()
    assert t1.num_rows >= 1
    assert t1.column_names == ["query_id", "doc_id", "rank", "score_r"]
    assert t1.equals(t2)  # deterministic across calls
