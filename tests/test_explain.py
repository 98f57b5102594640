"""ES _explain: the per-term breakdown must SUM (in its listed sorted
order) to the search score bit-exactly — same kernels, same addition
order."""

import numpy as np
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher


@pytest.fixture(scope="module")
def single(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.mark.parametrize("q", ["def load index", "def load index value w3"])
def test_contributions_sum_to_score_bit_exact(single, q):
    top = single.search(q, k=5)
    for d, score in zip(top["doc_id"].to_pylist(), top["score"].to_pylist()):
        e = single.explain(q, int(d))
        total = 0.0
        for c in e["contribution"].to_pylist():
            total += c  # sorted-term order == engine accumulation order
        assert total == score  # bitwise, not approx
        # terms listed sorted, matching clauses only
        terms = e["term"].to_pylist()
        assert terms == sorted(terms)
        assert all(tf > 0 for tf in e["tf"].to_pylist())


def test_explain_idf_tf_norm_factorization(single):
    e = single.explain("def load", int(single.search("def load", k=1)["doc_id"][0].as_py()))
    for w, s, c in zip(
        e["idf"].to_pylist(), e["tf_norm"].to_pylist(), e["contribution"].to_pylist()
    ):
        assert c == w * s


def test_explain_rejects_compound_shapes(single):
    with pytest.raises(ValueError):
        single.explain("def AND (load OR index)", 0)
    with pytest.raises(ValueError):
        single.explain('"def load"', 0)


def test_explain_sharded_delegates(built_index):
    idx, _ = built_index
    sh = ShardedSearcher(idx, n_shards=3, use_actors=False)
    s = Searcher(idx)
    d = int(s.search("def load index", k=1)["doc_id"][0].as_py())
    assert sh.explain("def load index", d).to_pydict() == s.explain(
        "def load index", d
    ).to_pydict()
