"""Rank-identity of the engine (both pruned and exhaustive paths) against
the in-repo brute-force BM25 oracle — the north_rule correctness gate."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from elasticsearch_assets_ray.corpus import REFERENCE_QUERIES
from elasticsearch_assets_ray.query.engine import QueryEngineActor, Searcher
from elasticsearch_assets_ray.query.oracle import OracleIndex


@pytest.fixture(scope="module")
def oracle(built_index):
    idx_dir, _ = built_index
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    return OracleIndex(doc, content_col="content", id_col="doc_id")


@pytest.fixture(scope="module")
def searchers(built_index):
    idx_dir, _ = built_index
    return Searcher(idx_dir, prune=True), Searcher(idx_dir, prune=False)


@pytest.mark.parametrize("query", REFERENCE_QUERIES)
def test_topk_rank_identical(query, oracle, searchers, built_index):
    pruned, exact = searchers
    oi, osc = oracle.topk(query, 10)
    for s in (pruned, exact):
        r = s.search(query, 10)
        assert np.array_equal(r["doc_id"].to_numpy(), oi), query
        # BIT-identical scores, not approximate
        assert np.array_equal(r["score"].to_numpy(), osc), query


@pytest.mark.parametrize("query", REFERENCE_QUERIES[:6])
def test_all_scores_identical(query, oracle, searchers):
    _, exact = searchers
    ai, asc = oracle.all_scores(query)
    t = exact.all_scores(query)
    ei, esc = t["doc_id"].to_numpy(), t["score"].to_numpy()
    o1, o2 = np.argsort(ai), np.argsort(ei)
    assert np.array_equal(ai[o1], ei[o2])
    assert np.array_equal(asc[o1], esc[o2])


def test_k_larger_than_matches(oracle, searchers):
    pruned, _ = searchers
    q = "+xyzzynotaterm"
    assert pruned.search(q, 10).num_rows == 0
    q2 = "logger"
    oi, osc = oracle.topk(q2, 100_000)
    r = pruned.search(q2, 100_000)
    assert np.array_equal(r["doc_id"].to_numpy(), oi)


def test_actor_pool_batch_serving(built_index, ray_session):
    """QueryEngineActor over a query table matches per-query search."""
    import ray.data

    idx_dir, _ = built_index
    queries = [{"query_id": i, "query": q} for i, q in enumerate(REFERENCE_QUERIES)]
    ds = ray.data.from_items(queries)
    out = ds.map_batches(
        QueryEngineActor,
        fn_constructor_kwargs={"index_dir": idx_dir, "k": 5},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    s = Searcher(idx_dir)
    for i, q in enumerate(REFERENCE_QUERIES):
        sub = out[out.query_id == i].sort_values("rank")
        r = s.search(q, 5)
        assert sub.doc_id.tolist() == r["doc_id"].to_pylist()
        assert sub.score.tolist() == r["score"].to_pylist()


def test_hydrate_roundtrip(built_index, searchers):
    pruned, _ = searchers
    r = pruned.search("import config", 5)
    docs = pruned.hydrate(r["doc_id"].to_numpy(), columns=["doc_id", "repo", "path"])
    assert docs.num_rows == 5
    assert docs["doc_id"].to_pylist() == r["doc_id"].to_pylist()


@pytest.mark.parametrize("query", REFERENCE_QUERIES[:6])
def test_cold_mode_rank_identical(query, oracle, built_index):
    """shard_resident=False (filtered-parquet term reads, memory bounded
    by query terms) returns bit-identical results."""
    idx_dir, _ = built_index
    cold = Searcher(idx_dir, shard_resident=False)
    assert not cold._shard_cache  # nothing resident
    oi, osc = oracle.topk(query, 10)
    r = cold.search(query, 10)
    assert np.array_equal(r["doc_id"].to_numpy(), oi), query
    assert np.array_equal(r["score"].to_numpy(), osc), query
    assert not cold._shard_cache  # STILL nothing resident


def test_cold_mode_prefix(built_index):
    idx_dir, _ = built_index
    warm = Searcher(idx_dir)
    cold = Searcher(idx_dir, shard_resident=False)
    assert cold.expand_prefix("de") == warm.expand_prefix("de")
    a = warm.search("def* load", 10)
    b = cold.search("def* load", 10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
