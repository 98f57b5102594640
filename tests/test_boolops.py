"""Lucene boolean expressions (AND / OR / NOT + parentheses) — the
operator surface of the reference's ``query_string`` passthrough
(utils.ts:94-100).  Match = boolean tree evaluation (including DNF
shapes the flat +/- syntax cannot express); score = Lucene's
sum-of-matching-clauses rule (a failed AND contributes nothing even
when some of its terms are present; NOT and filter branches never
score)."""

import numpy as np
import pytest

from elasticsearch_assets_ray.query import bm25
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.parser import (
    QueryParseError,
    parse_query,
    tree_terms,
)
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_precedence_and_shapes():
    q = parse_query("(spark OR merge) AND table")
    assert q.bool_tree == (
        "and",
        [("or", [("term", "spark"), ("term", "merge")]), ("term", "table")],
    )
    # AND binds tighter than OR
    q = parse_query("a AND b OR c AND d")
    assert q.bool_tree == (
        "or",
        [
            ("and", [("term", "a"), ("term", "b")]),
            ("and", [("term", "c"), ("term", "d")]),
        ],
    )
    # juxtaposition ≡ OR (the default-operator reading)
    assert parse_query("(a b) AND c").bool_tree == parse_query(
        "(a OR b) AND c"
    ).bool_tree
    # NOT is prefix, binds tightest
    q = parse_query("a AND NOT b")
    assert q.bool_tree == ("and", [("term", "a"), ("not", ("term", "b"))])
    # filters, ranges and multi-term leaves nest in trees
    q = parse_query("sp* AND (t?ble OR tabel~1) AND lang:en AND n_chars:>=100")
    kinds = [c[0] for c in q.bool_tree[1]]
    assert kinds == ["prefix", "or", "filter", "filter"]


def test_scoring_terms_are_positive_polarity():
    q = parse_query("a AND NOT (b OR c) AND (d OR NOT (e AND NOT f))")
    # b, c are negative; e negative (under one NOT); f back to positive
    assert set(q.scoring_terms) == {"a", "d", "f"}
    assert tree_terms(q.bool_tree, polarity=False) == {"b", "c", "e"}


def test_round_trip():
    for s in [
        "(spark OR merge) AND table",
        "scan AND NOT (window OR agg)",
        "(key AND value) OR (row AND column)",
        "table AND (lang:en OR lang:fr)",
        "merge AND NOT lang:de AND n_chars:[200 TO 500]",
    ]:
        q = parse_query(s)
        assert parse_query(q.to_string()).bool_tree == q.bool_tree


def test_ungrounded_rejected():
    for bad in [
        "NOT a",
        "a OR NOT b",             # matches docs with neither a nor b
        "lang:en OR spark",       # filter-only branch at the top level
        "NOT (a AND NOT b)",      # double negation grounds nothing
        "(n_chars:[1 TO 2])",     # filter-only query
    ]:
        with pytest.raises(QueryParseError, match="not grounded"):
            parse_query(bad)
    # grounded forms with the same pieces parse fine
    parse_query("a AND NOT b")
    parse_query("spark AND (lang:en OR lang:fr)")


def test_syntax_errors():
    with pytest.raises(QueryParseError, match="unbalanced"):
        parse_query("(a OR b")
    with pytest.raises(QueryParseError, match="unbalanced"):
        parse_query("a OR b)")
    with pytest.raises(QueryParseError, match="expected a clause"):
        parse_query("a AND OR b")
    with pytest.raises(QueryParseError, match="phrases are not supported"):
        parse_query('"x y" AND z')
    with pytest.raises(QueryParseError, match="prefixes are not supported"):
        parse_query("+a AND b")


def test_lowercase_and_or_stay_terms():
    q = parse_query("salt and pepper or nothing")
    assert q.bool_tree is None
    assert "and" in q.should and "or" in q.should


# ---------------------------------------------------------------------------
# engine vs brute force
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus_info(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    base = s.all_scores("def load index value return")
    ids = np.array(sorted(base["doc_id"].to_pylist()), dtype=np.int64)
    h = s.hydrate(ids, columns=["doc_id", "content", "lang", "doc_len"])
    info = {
        d: (tokenize_text(c), l, n)
        for d, c, l, n in zip(
            h["doc_id"].to_pylist(),
            h["content"].to_pylist(),
            h["lang"].to_pylist(),
            h["doc_len"].to_pylist(),
        )
    }
    return s, info


def _brute_eval(s, info, d, node):
    """Reference implementation of match + sum-of-matching-clauses."""
    toks, lang, dlen = info[d]
    kind = node[0]
    if kind == "term":
        t = node[1]
        tf = toks.count(t)
        if tf == 0:
            return False, 0.0
        seg = s._segment_rows([t])
        df = sum(seg["df"].to_pylist()) if seg is not None else 0
        sat = bm25.tf_saturation(
            np.array([tf], float), np.array([len(toks)], float), s.avgdl
        )[0]
        return True, bm25.math_idf(df, s.n_docs) * sat
    if kind == "filter":
        pred = node[1]
        val = {"lang": lang, "doc_len": dlen}[pred[1]]
        if pred[0] == "eq":
            return str(val) == pred[2], 0.0
        _, fld, lo, loi, hi, hii = pred
        conv = type(val)
        ok = True
        if lo is not None:
            ok &= val >= conv(lo) if loi else val > conv(lo)
        if hi is not None:
            ok &= val <= conv(hi) if hii else val < conv(hi)
        return ok, 0.0
    if kind == "not":
        m, _ = _brute_eval(s, info, d, node[1])
        return not m, 0.0
    res = [_brute_eval(s, info, d, c) for c in node[1]]
    sc = sum(x[1] for x in res)
    if kind == "and":
        m = all(x[0] for x in res)
        return m, sc if m else 0.0
    return any(x[0] for x in res), sc


BOOL_CASES = [
    "(def OR load) AND index",
    "def AND NOT (load OR index)",
    "(def AND load) OR (index AND value)",     # DNF
    "index AND (lang:python OR lang:go)",
    "(def AND lang:python) OR (index AND value)",
    "def AND doc_len:[100 TO 400} AND NOT lang:java",
    "((def OR load) AND (index OR value)) OR (return AND lang:go)",
]


def test_match_and_clause_scores_vs_brute_force(corpus_info):
    s, info = corpus_info
    for qs in BOOL_CASES:
        p = parse_query(qs)
        r = s.all_scores(p)
        got = dict(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))
        want = {}
        for d in info:
            m, sc = _brute_eval(s, info, d, p.bool_tree)
            if m:
                want[d] = sc
        assert set(got) == set(want), qs
        for d, sc in want.items():
            assert got[d] == pytest.approx(sc, rel=1e-12), (qs, d)


def test_failed_and_branch_does_not_score(corpus_info):
    s, info = corpus_info
    # a doc with def+load but NOT value/index must score ONLY def+load in
    # "(def AND load) OR (index AND value)" even when it contains value
    r = s.all_scores("(def AND load) OR (index AND value)")
    got = dict(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))
    flat = s.all_scores("+def +load")
    flat_m = dict(zip(flat["doc_id"].to_pylist(), flat["score"].to_pylist()))
    checked = 0
    for d, (toks, _l, _n) in info.items():
        st = set(toks)
        if {"def", "load", "value"} <= st and "index" not in st:
            # bag-of-words would add value's contribution; Lucene doesn't
            assert got[d] < flat_m[d] + 1e-12
            full = {"def", "load"}
            checked += 1
    assert checked > 0


def test_pruned_topk_matches_exhaustive(built_index):
    idx, _ = built_index
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for q in BOOL_CASES + ["de* AND (index OR value)"]:
        rp = sp.search(q, 10)
        re_ = se.search(q, 10)
        assert rp["doc_id"].to_pylist() == re_["doc_id"].to_pylist(), q
        assert rp["score"].to_pylist() == re_["score"].to_pylist(), q


def test_expansion_leaves_in_tree(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    # prefix leaf ≡ OR of its expansion terms (match AND score)
    exp = s.expand_prefix("loa")
    assert exp
    a = s.all_scores("loa* AND index")
    b = s.all_scores("(" + " OR ".join(exp) + ") AND index")
    assert a.to_pydict() == b.to_pydict()
    # unmatched expansion is a False leaf
    r = s.all_scores("zzzqqq* AND index")
    assert r.num_rows == 0


def test_unknown_tree_filter_field_raises(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="unknown filter field"):
        s.all_scores("def AND nosuch:x")


# ---------------------------------------------------------------------------
# boosts (`clause^2`, `(group)^1.5`) — Lucene score multipliers
# ---------------------------------------------------------------------------


def test_parser_boosts():
    q = parse_query("(spark OR merge)^2 AND table")
    assert q.bool_tree == (
        "and",
        [
            ("boost", ("or", [("term", "spark"), ("term", "merge")]), 2.0),
            ("term", "table"),
        ],
    )
    q = parse_query("scan^3 OR window OR agg^0.5")
    assert q.bool_tree == (
        "or",
        [
            ("boost", ("term", "scan"), 3.0),
            ("term", "window"),
            ("boost", ("term", "agg"), 0.5),
        ],
    )
    # boosts are transparent to polarity/grounding
    assert parse_query("a^2 AND NOT b^3").scoring_terms == ["a"]
    # round-trip
    for s in ["(spark OR merge)^2 AND table", "scan^3 OR window OR agg^0.5"]:
        q = parse_query(s)
        assert parse_query(q.to_string()).bool_tree == q.bool_tree
    # a range clause is NOT mistaken for a boost (it still parses as a
    # filter leaf → the filter-only query is rejected as ungrounded,
    # not as a malformed boost)
    with pytest.raises(QueryParseError, match="not grounded"):
        parse_query("(n_chars:[1 TO 2])")


def test_boost_scores_match_and_rerank(corpus_info):
    s, info = corpus_info
    plain = s.all_scores("(def OR load) AND index")
    boosted = s.all_scores("(def OR load)^2 AND index")
    pm = dict(zip(plain["doc_id"].to_pylist(), plain["score"].to_pylist()))
    bm_ = dict(zip(boosted["doc_id"].to_pylist(), boosted["score"].to_pylist()))
    assert set(pm) == set(bm_)  # matching unchanged
    # boosted score = plain (def|load part)*2 + index part: verify via
    # components
    idx_only = s.all_scores("index")
    im = dict(zip(idx_only["doc_id"].to_pylist(), idx_only["score"].to_pylist()))
    for d in pm:
        part = pm[d] - im[d]
        assert bm_[d] == pytest.approx(part * 2.0 + im[d], rel=1e-12)


def test_boost_pruned_topk_matches_exhaustive(built_index):
    idx, _ = built_index
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for q in [
        "(def OR load)^2 AND index",
        "def^3 OR load OR index^0.5",
        # duplicate positive occurrences double a term's contribution —
        # the pruning bound must sum path-products, not use idf once
        "(def AND value) OR (def AND index)",
        "(def^2 AND value) OR (def AND index)",
    ]:
        rp, re_ = sp.search(q, 10), se.search(q, 10)
        assert rp["doc_id"].to_pylist() == re_["doc_id"].to_pylist(), q
        assert rp["score"].to_pylist() == re_["score"].to_pylist(), q


# ---------------------------------------------------------------------------
# search_after cursor pagination (ES request parameter)
# ---------------------------------------------------------------------------


def _full_ranking(s, q):
    from elasticsearch_assets_ray.query import bm25 as _bm

    r = s.all_scores(q)
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    sc = r["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -_bm.round_half_up(sc, 9)))
    return ids[order], sc[order]


@pytest.mark.parametrize(
    "q", ["def load index", "(def OR load) AND index", '"def load" index']
)
def test_search_after_walks_full_ranking(built_index, q):
    idx, _ = built_index
    s = Searcher(idx)
    want_ids, _ = _full_ranking(s, q)
    got = []
    cursor = None
    page = 5
    while True:
        r = (
            s.search(q, k=page)
            if cursor is None
            else s.search(q, k=page, search_after=cursor)
        )
        ids = r["doc_id"].to_pylist()
        if not ids:
            break
        got.extend(ids)
        cursor = (r["score"][len(ids) - 1].as_py(), ids[-1])
        if len(ids) < page:
            break
    # pages are disjoint and enumerate the whole ranking at round9
    # granularity (within a tie group the page order is score-exact,
    # so compare as sets per rank-9 group via the full walk)
    assert len(got) == len(set(got)) == want_ids.size
    assert set(got) == set(want_ids.tolist())


def test_search_after_pruned_matches_exhaustive(built_index):
    idx, _ = built_index
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for q in ["def load index", "(def OR load)^2 AND index"]:
        first = se.search(q, 10)
        cur = (first["score"][9].as_py(), first["doc_id"][9].as_py())
        a = sp.search(q, 10, search_after=cur)
        b = se.search(q, 10, search_after=cur)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
        # page 2 has no overlap with page 1 and strictly lower-or-tied scores
        assert not set(a["doc_id"].to_pylist()) & set(first["doc_id"].to_pylist())


# ---------------------------------------------------------------------------
# code-review regression fixes
# ---------------------------------------------------------------------------


def test_binary_not_desugars_to_and_not():
    # Lucene query_string: `foo NOT bar` ≡ foo AND NOT bar
    q = parse_query("foo NOT bar")
    assert q.bool_tree == ("and", [("term", "foo"), ("not", ("term", "bar"))])
    # chains stay one AND group
    q = parse_query("foo NOT bar AND baz")
    assert q.bool_tree == (
        "and",
        [("term", "foo"), ("not", ("term", "bar")), ("term", "baz")],
    )
    # prefix NOT (after an operator / at start) is untouched
    q = parse_query("foo AND NOT bar")
    assert q.bool_tree == ("and", [("term", "foo"), ("not", ("term", "bar"))])
    with pytest.raises(QueryParseError, match="not grounded"):
        parse_query("NOT bar")  # still a pure-negative query


def test_range_boost_parses_as_boost_not_stray_term():
    q = parse_query("merge AND n_chars:[1 TO 2]^2")
    assert q.bool_tree == (
        "and",
        [
            ("term", "merge"),
            ("boost", ("filter", ("range", "n_chars", "1", True, "2", True)), 2.0),
        ],
    )
    # comparator boost too
    q = parse_query("merge AND n_chars:>=5^2")
    assert q.bool_tree[1][1] == (
        "boost",
        ("filter", ("range", "n_chars", "5", True, None, True)),
        2.0,
    )


def test_search_after_survives_multiterm_tree_rewrite(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    q = "(de* OR load) AND index"
    p1 = s.search(q, k=5)
    cur = (p1["score"][4].as_py(), p1["doc_id"][4].as_py())
    p2 = s.search(q, k=5, search_after=cur)
    assert p2.num_rows > 0
    assert not set(p2["doc_id"].to_pylist()) & set(p1["doc_id"].to_pylist())
