"""ES _rank_eval API: pure metric math, the membership rating rule, and
the searcher-facing wrapper (query/rank_eval.py)."""

import math

import pyarrow as pa

from elasticsearch_assets_ray.query import rank_eval as re_mod


def test_term_membership_full_token_only():
    txt = pa.array(["Foo bar99x baz", "plain bar here", "nothing"], pa.string())
    assert list(re_mod.term_membership(txt, "bar99x")) == [True, False, False]
    # substring of a longer token is NOT a match
    assert list(re_mod.term_membership(txt, "bar")) == [False, True, False]
    assert list(re_mod.term_membership(txt, "foo")) == [True, False, False]


def test_metric_values_hand_case():
    vals = re_mod.metric_values([2, 0, 1], {2: 2, 1: 3}, k=3, gmax=2)
    assert vals["precision"] == 2 / 3
    assert vals["recall"] == 2 / 5
    assert vals["mrr"] == 1.0
    dcg = 3.0 / 1.0 + 0.0 + 1.0 / 2.0
    idcg = 3.0 / 1.0 + 3.0 / math.log2(3) + 1.0 / 2.0
    assert abs(vals["ndcg"] - dcg / idcg) < 1e-12
    # ERR: R = (2^g - 1) / 2^2 -> [0.75, 0, 0.25]
    err = 0.75 + 0.0 + (0.25 / 3) * math.exp(math.log(0.25))
    assert abs(vals["err"] - err) < 1e-12


def test_metric_values_degenerate():
    z = re_mod.metric_values([], {}, k=5, gmax=2)
    assert all(z[m] == 0.0 for m in re_mod.METRICS)
    nr = re_mod.metric_values([0, 0], {1: 4}, k=5, gmax=2)
    assert nr["precision"] == 0.0 and nr["mrr"] == 0.0 and nr["err"] == 0.0
    assert nr["recall"] == 0.0 and nr["ndcg"] == 0.0


def test_rank_eval_wrapper_end_to_end(built_index, corpus_dir):
    import ray.data

    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(built_index[0])
    queries = ["def load index", "rank batch"]
    hists = re_mod.rating_histograms(
        ray.data.read_parquet(corpus_dir), queries, text_col="content"
    )
    assert all(sum(h.values()) > 0 for h in hists.values())
    t = re_mod.rank_eval(s, queries, hists, k=5, content_col="content")
    assert t.num_rows == (len(queries) + 1) * len(re_mod.METRICS)
    d = {
        (q, m): v
        for q, m, v in zip(
            t["query_id"].to_pylist(),
            t["metric"].to_pylist(),
            t["value_r"].to_pylist(),
        )
    }
    for v in d.values():
        assert 0.0 <= v <= 1.0
    # every retrieved doc contains all query terms here -> precision 1
    assert d[(0, "precision")] == 1.0
    # the mean row is the mean of the per-query rows
    for m in re_mod.METRICS:
        assert abs(d[(-1, m)] - (d[(0, m)] + d[(1, m)]) / 2) <= 1e-6
