"""ES retriever-tree API: dispatch parity against the direct primitives,
on both serving paths."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query import retrievers as rt
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher


@pytest.fixture(scope="module")
def single(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.fixture(scope="module")
def sharded(built_index):
    idx, _ = built_index
    return ShardedSearcher(idx, n_shards=3, use_actors=False)


def test_standard_node_is_search(single):
    a = rt.execute(single, {"standard": {"query": "def load index"}}, k=7)
    b = single.search("def load index", k=7)
    assert a.to_pydict() == b.to_pydict()


def test_rrf_node_matches_manual_fusion(single):
    from elasticsearch_assets_ray.query.hybrid import rrf_fuse

    spec = {
        "rrf": {
            "retrievers": [
                {"standard": {"query": "def load"}},
                {"standard": {"query": "index value"}},
            ],
            "rank_window_size": 15,
            "rank_constant": 10,
        }
    }
    got = rt.execute(single, spec, k=8)
    kids = [
        rt._ranked(single.search("def load", k=15)),
        rt._ranked(single.search("index value", k=15)),
    ]
    want = rrf_fuse(kids, k=8, rank_constant=10)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(zero_copy_only=False),
        want["rrf"].to_numpy(zero_copy_only=False),
    )


def test_linear_node_weights(single):
    spec = {
        "linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": "def load"}}, "weight": 2.0},
                {"retriever": {"standard": {"query": "index value"}}, "weight": 1.0},
            ],
            "rank_window_size": 12,
        }
    }
    got = rt.execute(single, spec, k=6)
    assert got.num_rows <= 6
    # the top doc of the w=2 list with minmax 1.0 scores >= 2.0 iff it
    # also appears in list B; at minimum its fused score is >= 2.0 * 1.0
    assert got["score"].to_numpy(zero_copy_only=False).max() >= 2.0


def test_rescorer_node_semantics(single, sharded):
    spec = {
        "rescorer": {
            "retriever": {"standard": {"query": "def load index"}},
            "rescore_query": "return value",
            "window_size": 25,
            "query_weight": 1.0,
            "rescore_weight": 2.0,
        }
    }
    a = rt.execute(single, spec, k=8)
    b = rt.execute(sharded, spec, k=8)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(zero_copy_only=False),
        b["score"].to_numpy(zero_copy_only=False),
    )
    # matches the engine's dedicated rescore path on the same window
    c = single.rescore(
        "def load index", "return value", k=8, window_size=25,
        query_weight=1.0, rescore_weight=2.0,
    )
    assert a["doc_id"].to_pylist() == c["doc_id"].to_pylist()


def test_reranker_node_needs_scorer_and_runs_registered(single):
    spec = {
        "text_similarity_reranker": {
            "retriever": {"standard": {"query": "def load"}},
            "rank_window_size": 10,
            "scorer": "missing_model",
        }
    }
    with pytest.raises(NotImplementedError):
        rt.execute(single, spec, k=5)

    @rt.register_reranker("len_scorer")
    def _len_scorer(texts, query):
        return np.array([float(len(t or "")) for t in texts])

    spec["text_similarity_reranker"]["scorer"] = "len_scorer"
    out = rt.execute(single, spec, k=5)
    v = out["score"].to_numpy(zero_copy_only=False)
    assert list(v) == sorted(v, reverse=True) and out.num_rows == 5


def test_bad_nodes(single):
    with pytest.raises(ValueError):
        rt.execute(single, {"nope": {}})
    with pytest.raises(ValueError):
        rt.execute(single, {"standard": {}, "knn": {}})
