"""ES join-field semantics (has_child / has_parent / children agg) vs
DuckDB ground truth, plus kernel-level edge cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from elasticsearch_assets_ray.pipelines import registry as R
from elasticsearch_assets_ray.stages.parentchild import (
    has_child,
    has_parent,
)


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_has_child_matches_oracle(sf_dir):
    got = R.QUERIES["has_child_orders"](sf_dir).to_pandas()
    con = _con(sf_dir)
    want = con.sql(R.ORACLES["has_child_orders"]).df()
    assert list(got["o_orderkey"]) == list(want["o_orderkey"])
    assert list(got["n_children"]) == list(want["n_children"])
    assert list(got["score"]) == list(want["score"])  # exact: cents/100.0


def test_has_parent_matches_oracle(sf_dir):
    got = R.QUERIES["has_parent_lines"](sf_dir).to_pandas()
    con = _con(sf_dir)
    want = con.sql(R.ORACLES["has_parent_lines"]).df()
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])
    assert list(got["l_linenumber"]) == list(want["l_linenumber"])
    assert list(got["score"]) == list(want["score"])


def test_children_agg_matches_oracle(sf_dir):
    got = R.QUERIES["children_by_priority"](sf_dir).to_pandas()
    con = _con(sf_dir)
    want = con.sql(R.ORACLES["children_by_priority"]).df()
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    assert list(got["n_children"]) == list(want["n_children"])
    assert list(got["revenue_cents"]) == list(want["revenue_cents"])
    assert np.allclose(got["avg_price"], want["avg_price"])
    assert list(got["avg_price"]) == list(want["avg_price"])  # exact mirror


def _tiny():
    parents = ray.data.from_arrow(
        pa.table({"pk": [1, 2, 3, 4], "tag": ["a", "b", "c", "d"]})
    ).repartition(2)
    children = ray.data.from_arrow(
        pa.table(
            {
                "ck": [1, 1, 1, 2, 2, 3, 9],
                "v": [100, 200, 300, 50, 60, 10, 999],
            }
        )
    ).repartition(3)
    return parents, children


def _all_kids_fn():
    # defined as a closure so cloudpickle ships it by VALUE — a test-module
    # top-level function is pickled by reference and isn't importable on
    # Ray workers
    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {"ck": b["ck"], "score_cents": pc.cast(b["v"], pa.int64())}
        )

    return fn


def _t(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


@pytest.mark.parametrize(
    "mode,want",
    [
        ("none", {1: 0.0, 2: 0.0, 3: 0.0}),
        ("sum", {1: 6.0, 2: 1.1, 3: 0.1}),
        ("max", {1: 3.0, 2: 0.6, 3: 0.1}),
        ("min", {1: 1.0, 2: 0.5, 3: 0.1}),
        ("avg", {1: 2.0, 2: 0.55, 3: 0.1}),
    ],
)
def test_score_modes(mode, want):
    parents, children = _tiny()
    out = _t(
        has_child(
            parents,
            children,
            parent_key="pk",
            child_key="ck",
            child_fn=_all_kids_fn(),
            score_mode=mode,
            num_partitions=3,
        )
    )
    got = dict(zip(out["pk"].to_pylist(), out["score"].to_pylist()))
    assert got == pytest.approx(want)
    # parent 4 has no children, child 9 has no parent: neither appears
    assert 4 not in got and 9 not in got


def test_min_max_children_bounds():
    parents, children = _tiny()
    kw = dict(parent_key="pk", child_key="ck", child_fn=_all_kids_fn())
    only3 = _t(has_child(parents, children, min_children=3, **kw))
    assert only3["pk"].to_pylist() == [1]
    upto2 = _t(has_child(parents, children, max_children=2, **kw))
    assert sorted(upto2["pk"].to_pylist()) == [2, 3]
    with pytest.raises(ValueError):
        has_child(parents, children, min_children=0, **kw)
    with pytest.raises(ValueError):
        has_child(parents, children, score_mode="mul", **kw)


def test_has_parent_propagates_score():
    parents, children = _tiny()

    def pfn(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["pk"], value_set=pa.array([1, 3])))
        return pa.table(
            {
                "pk": t["pk"],
                "score_cents": pc.cast(pc.multiply(t["pk"], 100), pa.int64()),
            }
        )

    out = _t(
        has_parent(
            parents,
            children,
            parent_key="pk",
            child_key="ck",
            parent_fn=pfn,
        )
    )
    rows = sorted(zip(out["ck"].to_pylist(), out["score"].to_pylist()))
    assert rows == [(1, 1.0), (1, 1.0), (1, 1.0), (3, 3.0)]


def test_has_child_no_matches_is_empty():
    parents, children = _tiny()

    def none_fn(b: pa.Table) -> pa.Table:
        t = b.slice(0, 0)
        return pa.table(
            {"ck": t["ck"], "score_cents": pc.cast(t["v"], pa.int64())}
        )

    out = has_child(
        parents, children, parent_key="pk", child_key="ck", child_fn=none_fn
    )
    assert out.count() == 0
