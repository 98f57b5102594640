"""ES phrase suggester: bigram LM build (distributed), candidate
generation contract, and stupid-backoff phrase scoring."""

import math

import pyarrow as pa

from elasticsearch_assets_ray.query import phrase_suggest as ps


def _lm_from_rows(rows):
    import ray.data

    t = pa.table({"text": pa.array(rows, pa.string())})
    return ps.build_phrase_lm(ray.data.from_arrow(t), "text")


def test_bigram_partials_counts():
    b = pa.table({"text": pa.array(["a b a b", "b c", ""], pa.string())})
    t = ps.bigram_partials(b, "text")
    d = {
        (v, w): n
        for v, w, n in zip(t["v"].to_pylist(), t["w"].to_pylist(), t["n"].to_pylist())
    }
    # unigrams (w = '' sentinel)
    assert d[("a", "")] == 2 and d[("b", "")] == 3 and d[("c", "")] == 1
    # bigrams never cross docs
    assert d[("a", "b")] == 2 and d[("b", "a")] == 1 and d[("b", "c")] == 1
    assert ("c", "a") not in d


def test_build_phrase_lm_distributed(ray_session):
    lm = _lm_from_rows(["fast scan", "fast scan", "fist scan", "scan fast"])
    assert lm.uni == {"fast": 3, "scan": 4, "fist": 1}
    assert lm.bi == {("fast", "scan"): 2, ("fist", "scan"): 1, ("scan", "fast"): 1}
    assert lm.total == 8


def test_token_candidates_ranking(ray_session):
    lm = _lm_from_rows(["fast scan", "fast scan", "fist scan", "scan fast"])
    # distance asc first, then count desc, then term asc
    assert ps.token_candidates(lm, "fst", max_edits=1, per_token=5) == [
        "fast",
        "fist",
    ]
    assert ps.token_candidates(lm, "scan", max_edits=1, per_token=5) == ["scan"]


def test_suggest_phrases_backoff_math(ray_session):
    lm = _lm_from_rows(["fast scan", "fast scan", "fist scan", "scan fast"])
    t = ps.suggest_phrases(lm, "fst scan", size=3, max_edits=1, per_token=5)
    sugg = t["suggestion"].to_pylist()
    assert sugg[0] == "fast scan" and "fist scan" in sugg
    n = 8.0
    expect_fast = math.log(3 / n) + math.log(2 / 3)
    expect_fist = math.log(1 / n) + math.log(1 / 1)
    got = dict(zip(sugg, t["score_r"].to_pylist()))
    assert abs(got["fast scan"] - round(expect_fast, 6)) < 1e-9
    assert abs(got["fist scan"] - round(expect_fist, 6)) < 1e-9


def test_suggest_phrases_unseen_bigram_backs_off(ray_session):
    lm = _lm_from_rows(["fast scan", "fast scan", "fist scan", "scan fast"])
    # force the unseen bigram (fist, fast): backoff 0.4 * c(fast) / N
    t = ps.suggest_phrases(lm, "fist fast", size=5, max_edits=0, per_token=1)
    got = dict(zip(t["suggestion"].to_pylist(), t["score_r"].to_pylist()))
    expect = math.log(1 / 8.0) + math.log(0.4 * 3 / 8.0)
    assert abs(got["fist fast"] - round(expect, 6)) < 1e-9


def test_suggest_phrases_empty_input(ray_session):
    lm = _lm_from_rows(["fast scan"])
    assert ps.suggest_phrases(lm, "").num_rows == 0
