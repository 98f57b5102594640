"""Fielded metadata filter clauses (`lang:python`) — ES bool.filter
context over docstore columns: conjunctive, non-scoring, collection
stats untouched."""

import numpy as np
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.parser import parse_query


def test_parser_fielded_clauses():
    q = parse_query('spark lang:en -source:src3 src:"a b"')
    assert q.filters == [("lang", "en"), ("src", "a b")]
    assert q.not_filters == [("source", "src3")]
    assert q.should == ["spark"]
    # round-trip through the printer
    q2 = parse_query(q.to_string())
    assert sorted(q2.filters) == sorted(q.filters)
    assert q2.not_filters == q.not_filters


def test_parser_non_field_colons_stay_terms():
    # digit-led / empty-value clauses are NOT fielded filters
    q = parse_query("12:30 lang: spark")
    assert q.filters == []
    assert "spark" in q.should and "12" in q.should
    # `+field:value` is the same conjunctive filter as the bare form
    q = parse_query("+lang:en spark")
    assert q.filters == [("lang", "en")]
    assert q.must == []


def _score_map(s, q):
    t = s.all_scores(q)
    return dict(
        zip(
            t["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            t["score"].to_pylist(),
        )
    )


def test_filter_matches_brute_force_and_keeps_scores(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    base = _score_map(s, "def load index")
    ids = np.array(sorted(base), dtype=np.int64)
    langs = dict(
        zip(
            s.hydrate(ids, columns=["doc_id", "lang"])["doc_id"].to_pylist(),
            s.hydrate(ids, columns=["doc_id", "lang"])["lang"].to_pylist(),
        )
    )
    got = _score_map(s, "def load index lang:python")
    want = {d: v for d, v in base.items() if langs[d] == "python"}
    assert got == want  # filter context: same scores, subset of docs
    assert 0 < len(got) < len(base)
    # negation is the complement
    got_neg = _score_map(s, "def load index -lang:python")
    assert set(got_neg) == set(base) - set(got)
    # two filters are conjunctive → empty for disjoint values
    both = _score_map(s, "def load index lang:python lang:go")
    assert both == {}


def test_filtered_pruned_topk_matches_exhaustive(built_index):
    idx, _ = built_index
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for q in ["def load index lang:go", "def value return -lang:java"]:
        rp = sp.search(q, 10)
        re_ = se.search(q, 10)
        assert rp["doc_id"].to_pylist() == re_["doc_id"].to_pylist(), q
        assert rp["score"].to_pylist() == re_["score"].to_pylist(), q


def test_filter_with_phrase(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    r = s.all_scores('"def load" lang:python')
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size:
        h = s.hydrate(ids, columns=["doc_id", "lang"])
        assert set(h["lang"].to_pylist()) == {"python"}
    # phrase-filtered result ⊆ unfiltered phrase result
    base = set(s.all_scores('"def load"')["doc_id"].to_pylist())
    assert set(ids.tolist()) <= base


def test_unknown_filter_field_raises(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="unknown filter field"):
        s.all_scores("def nosuchfield:x")


# ---------------------------------------------------------------------------
# `_exists_:field` (ES existence query — non-null metadata value)
# ---------------------------------------------------------------------------


def test_parser_exists_clauses():
    q = parse_query("spark _exists_:lang -_exists_:source")
    assert q.exists_filters == ["lang"]
    assert q.not_exists_filters == ["source"]
    assert q.filters == []
    q2 = parse_query(q.to_string())
    assert q2.exists_filters == q.exists_filters
    assert q2.not_exists_filters == q.not_exists_filters


def test_exists_filters_nulls(null_index):
    s = Searcher(null_index)
    base = _score_map(s, "def load")
    got = _score_map(s, "def load _exists_:lang")
    neg = _score_map(s, "def load -_exists_:lang")
    assert len(base) == 200
    assert len(got) == 100 and len(neg) == 100
    assert set(got) | set(neg) == set(base)
    assert all(base[d] == v for d, v in got.items())  # non-scoring
    # boolean-tree leaf form agrees with the flat form
    tree = _score_map(s, "(def OR load) AND _exists_:lang")
    assert set(tree) == set(got)
    tree_neg = _score_map(s, "(def OR load) AND NOT _exists_:lang")
    assert set(tree_neg) == set(neg)


def test_exists_unknown_field_raises(null_index):
    s = Searcher(null_index)
    with pytest.raises(ValueError, match="unknown filter field"):
        s.all_scores("def _exists_:nosuch")


# ---------------------------------------------------------------------------
# minimum_should_match (ES request parameter)
# ---------------------------------------------------------------------------


def test_msm_matches_brute_force(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    base = _score_map(s, "def load index value")
    ids = np.array(sorted(base), dtype=np.int64)
    h = s.hydrate(ids, columns=["doc_id", "content"])
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    toks = {
        d: set(tokenize_text(c))
        for d, c in zip(h["doc_id"].to_pylist(), h["content"].to_pylist())
    }
    terms = {"def", "load", "index", "value"}
    for n in (1, 2, 3, 4):
        r = s.all_scores("def load index value", minimum_should_match=n)
        got = dict(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))
        want = {d: v for d, v in base.items() if len(toks[d] & terms) >= n}
        assert got == want, n  # filter only — scores unchanged
    # n greater than the clause count matches nothing
    assert s.all_scores("def load", minimum_should_match=3).num_rows == 0


def test_msm_pruned_matches_exhaustive(built_index):
    idx, _ = built_index
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for n in (2, 3):
        a = sp.search("def load index value", 10, minimum_should_match=n)
        b = se.search("def load index value", 10, minimum_should_match=n)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), n
        assert a["score"].to_pylist() == b["score"].to_pylist(), n


def test_msm_rejects_trees_and_multiterm(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="boolean expressions"):
        s.search("def AND load", minimum_should_match=2)
    with pytest.raises(ValueError, match="prefix/wildcard/fuzzy"):
        s.search("de* load", minimum_should_match=2)


def test_analyzed_match_filter_parse_and_print():
    """`field.text:token` — the ES multi-field convention inverted (here
    the raw column is the default and `.text` selects analyzed match)."""
    import pytest

    from elasticsearch_assets_ray.query.parser import parse_query

    q = parse_query("def load path.text:Mod71")
    assert q.match_filters == [("path", "mod71")]  # query side analyzed
    assert q.to_string() == "def load path.text:mod71"
    q = parse_query("def -path.text:utils")
    assert q.not_match_filters == [("path", "utils")]
    # multi-token values are ambiguous (ES match defaults to OR) → error
    with pytest.raises(ValueError, match="exactly one token"):
        parse_query('def path.text:"src utils"')
    # a bare `.text:foo` is not a fielded clause (no base field) — it
    # falls through to plain term analysis, never to the match parser
    q = parse_query("def .text:foo")
    assert q.match_filters == [] and "foo" in q.should


def test_analyzed_match_filter_engine(built_index):
    """Filter context: non-scoring token membership in tokenize(column),
    exact vs a brute force over the hydrated match set; unknown base
    fields still error."""
    import numpy as np
    import pytest

    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    idx, _ = built_index
    s = Searcher(idx)
    allr = s.all_scores("def load")
    ids = allr["doc_id"].to_numpy(zero_copy_only=False)
    h = s.hydrate(np.sort(ids), columns=["doc_id", "path"])
    toks = {d: tokenize_text(p) for d, p in zip(h["doc_id"].to_pylist(), h["path"].to_pylist())}
    some = next(t for t in toks[int(ids[0])] if t not in ("src",))
    want = {d for d, tk in toks.items() if some in tk}
    got = set(s.all_scores(f"def load path.text:{some}")["doc_id"].to_pylist())
    assert got == want and got
    # scores are unchanged by the filter (filter context never scores)
    full = dict(zip(allr["doc_id"].to_pylist(), allr["score"].to_pylist()))
    filt = s.all_scores(f"def load path.text:{some}")
    for d, sc in zip(filt["doc_id"].to_pylist(), filt["score"].to_pylist()):
        assert sc == full[d]
    # negation is the complement within the match set
    neg = set(s.all_scores(f"def load -path.text:{some}")["doc_id"].to_pylist())
    assert neg == set(full) - want
    with pytest.raises(ValueError, match="unknown filter field"):
        s.search("def load nosuch.text:foo", k=3)
