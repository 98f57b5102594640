"""ES aggregation analogs on the Searcher: terms facet + numeric
histogram over the exhaustive match set (aggregations see all hits,
never the fetch page)."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query.engine import Searcher


def _match_meta(s, query, cols):
    ids = s.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
    return s.hydrate(np.sort(ids), columns=["doc_id"] + cols)


def test_facet_matches_brute_force(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    got = s.facet("(def OR load) AND index", by="lang")
    h = _match_meta(s, "(def OR load) AND index", ["lang"])
    want = collections.Counter(h["lang"].to_pylist())
    assert dict(zip(got["value"].to_pylist(), got["count"].to_pylist())) == dict(
        want
    )
    # count-desc, value-asc tie-break
    rows = list(zip(got["count"].to_pylist(), got["value"].to_pylist()))
    assert rows == sorted(rows, key=lambda cv: (-cv[0], cv[1]))
    # size truncation keeps the top buckets
    top2 = s.facet("(def OR load) AND index", by="lang", size=2)
    assert top2.num_rows == 2
    assert top2["value"].to_pylist() == got["value"].to_pylist()[:2]


def test_facet_on_numeric_column(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    got = s.facet("def load", by="doc_len", size=5)
    assert got.num_rows == 5
    assert got["value"].type == pa.string()  # ES keyword-izes bucket keys


def test_histogram_matches_brute_force(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    got = s.histogram("def load", "doc_len", 50.0)
    h = _match_meta(s, "def load", ["doc_len"])
    want = collections.Counter(
        float(np.floor(v / 50.0) * 50.0) for v in h["doc_len"].to_pylist()
    )
    assert dict(zip(got["bucket"].to_pylist(), got["count"].to_pylist())) == dict(
        want
    )
    # buckets ascending, counts sum to the match-set size
    b = got["bucket"].to_pylist()
    assert b == sorted(b)
    assert sum(got["count"].to_pylist()) == h.num_rows


def test_histogram_validates_interval(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="interval must be positive"):
        s.histogram("def", "doc_len", 0)


def test_facet_skips_nulls(null_index):
    s = Searcher(null_index)
    got = s.facet("def load", by="lang")
    # half the corpus has null lang — only 'python' buckets remain
    assert got["value"].to_pylist() == ["python"]
    assert got["count"].to_pylist() == [100]


# ---------------------------------------------------------------------------
# field collapsing + more_like_this
# ---------------------------------------------------------------------------


def test_collapse_matches_brute_force(built_index):
    from elasticsearch_assets_ray.query import bm25

    idx, _ = built_index
    s = Searcher(idx)
    q = "def load index"
    r = s.search_collapse(q, k=8, collapse="lang")
    # brute force: best (round9, -id) hit per lang, then top-8
    allr = s.all_scores(q)
    ids = allr["doc_id"].to_numpy(zero_copy_only=False)
    sc = allr["score"].to_numpy(zero_copy_only=False)
    h = s.hydrate(np.sort(ids), columns=["doc_id", "lang"])
    lang = dict(zip(h["doc_id"].to_pylist(), h["lang"].to_pylist()))
    best = {}
    for d, v in sorted(zip(ids.tolist(), sc.tolist())):
        key = lang[d]
        r9 = float(bm25.round_half_up(v, 9))
        if key not in best or (r9, -d) > (best[key][0], -best[key][1]):
            best[key] = (r9, d, v)
    want = sorted(
        ((r9, d, v, k) for k, (r9, d, v) in best.items()),
        key=lambda x: (-x[0], x[1]),
    )[:8]
    assert r["doc_id"].to_pylist() == [w[1] for w in want]
    assert r["lang"].to_pylist() == [w[3] for w in want]
    # one hit per group
    assert len(set(r["lang"].to_pylist())) == r.num_rows
    with pytest.raises(ValueError, match="collapse field"):
        s.search_collapse(q, k=5)


def test_collapse_null_values_are_singletons(null_index):
    s = Searcher(null_index)
    r = s.search_collapse("def load", k=10, collapse="lang")
    vals = r["lang"].to_pylist()
    # python docs collapse to ONE winner; null docs stay individual hits
    assert vals.count("python") == 1
    assert vals.count(None) == 9


def test_more_like_this(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    src = int(s.all_scores("def load index")["doc_id"][0].as_py())
    r = s.more_like_this(src, k=10)
    ids = r["doc_id"].to_pylist()
    assert src not in ids  # the like-doc is excluded
    assert 0 < len(ids) <= 10
    sc = r["score"].to_pylist()
    assert sc == sorted(sc, reverse=True)
    # the neighbors genuinely share vocabulary with the source
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    h = s.hydrate(np.array(sorted([src] + ids[:3])), columns=["doc_id", "content"])
    toks = {
        d: set(tokenize_text(c))
        for d, c in zip(h["doc_id"].to_pylist(), h["content"].to_pylist())
    }
    for d in ids[:3]:
        assert toks[d] & toks[src]
    with pytest.raises(ValueError, match="not found"):
        s.more_like_this(999_999_999)


def test_lookup_docids(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    some = s.hydrate(np.array([5, 6], dtype=np.int64), columns=["doc_id", "path"])
    paths = some["path"].to_pylist()
    m = s.lookup_docids(paths, col="path")
    assert sorted(m.values()) == [5, 6]


# ---------------------------------------------------------------------------
# highlighting (best-window snippet)
# ---------------------------------------------------------------------------


def test_highlight_best_window(built_index):
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    idx, _ = built_index
    s = Searcher(idx)
    hits = s.search("def load index", k=4)
    ids = hits["doc_id"].to_numpy(zero_copy_only=False)
    r = s.highlight("def load index", ids, window=8)
    assert r["doc_id"].to_pylist() == ids.tolist()  # input order kept
    h = s.hydrate(np.sort(ids), columns=["doc_id", "content"])
    texts = dict(zip(h["doc_id"].to_pylist(), h["content"].to_pylist()))
    terms = {"def", "load", "index"}
    for d, st, n, sn in zip(
        r["doc_id"].to_pylist(),
        r["start"].to_pylist(),
        r["n_matched"].to_pylist(),
        r["snippet"].to_pylist(),
    ):
        toks = tokenize_text(texts[d])
        # brute-force best window: max count, earliest
        best = max(
            range(len(toks)),
            key=lambda p: (sum(1 for t in toks[p : p + 8] if t in terms), -p),
        )
        want_n = sum(1 for t in toks[best : best + 8] if t in terms)
        assert n == want_n and st == best + 1, d
        assert sn == " ".join(toks[best : best + 8])
        assert n >= 1  # these docs matched the query
    # multi-term clauses highlight their expansions too
    r2 = s.highlight("lo* index", ids, window=8)
    assert all(n >= 1 for n in r2["n_matched"].to_pylist())
    with pytest.raises(ValueError, match="window must be positive"):
        s.highlight("def", ids, window=0)


# ---------------------------------------------------------------------------
# rescore (secondary-query window reranking)
# ---------------------------------------------------------------------------


def test_rescore_matches_brute_force(built_index):
    from elasticsearch_assets_ray.query import bm25

    idx, _ = built_index
    s = Searcher(idx)
    prim, resc = "def load index", "return value"
    r = s.rescore(prim, resc, k=15, window_size=30, query_weight=1.0, rescore_weight=2.0)
    # brute force: top-30 primary window (round9, id), add secondary
    p = s.all_scores(prim)
    pid_ = p["doc_id"].to_numpy(zero_copy_only=False)
    psc = p["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pid_, -bm25.round_half_up(psc, 9)))[:30]
    w_ids, w_sc = pid_[order], psc[order]
    sec_all = s.all_scores(resc)
    smap = dict(zip(sec_all["doc_id"].to_pylist(), sec_all["score"].to_pylist()))
    total = {
        int(d): float(v) * 1.0 + smap.get(int(d), 0.0) * 2.0
        for d, v in zip(w_ids, w_sc)
    }
    want = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert r["doc_id"].to_pylist() == [d for d, _v in want]
    for got, (_d, v) in zip(r["score"].to_pylist(), want):
        assert got == pytest.approx(v, rel=1e-12)
    # docs outside the window never appear even with huge secondary
    assert set(r["doc_id"].to_pylist()) <= set(w_ids.tolist())
    # the rescore query reorders but never filters
    assert r.num_rows == 15


def test_rescore_rejects_structured_secondary(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="bag-of-SHOULD"):
        s.rescore("def", '"load index"', k=5)
    with pytest.raises(ValueError, match="bag-of-SHOULD"):
        s.rescore("def", "load AND index", k=5)
    # must/not/filter secondaries would be silently mis-scored — reject
    with pytest.raises(ValueError, match="bag-of-SHOULD"):
        s.rescore("def", "+load index", k=5)
    with pytest.raises(ValueError, match="bag-of-SHOULD"):
        s.rescore("def", "load -index", k=5)
    with pytest.raises(ValueError, match="bag-of-SHOULD"):
        s.rescore("def", "load lang:python", k=5)
    with pytest.raises(ValueError, match="must not exceed window_size"):
        s.rescore("def", "load", k=100, window_size=50)
    with pytest.raises(ValueError, match="must be positive"):
        s.rescore("def", "load", k=5, window_size=-1)


def test_function_score_matches_brute_force(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    r = s.function_score("def load index", "doc_len", k=12, factor=0.01, modifier="log1p")
    base = s.all_scores("def load index")
    ids = base["doc_id"].to_numpy(zero_copy_only=False)
    sc = base["score"].to_numpy(zero_copy_only=False)
    h = s.hydrate(np.sort(ids), columns=["doc_id", "doc_len"])
    dl = dict(zip(h["doc_id"].to_pylist(), h["doc_len"].to_pylist()))
    total = {int(d): float(v) * float(np.log1p(0.01 * dl[int(d)])) for d, v in zip(ids, sc)}
    want = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    assert r["doc_id"].to_pylist() == [d for d, _v in want]
    for got, (_d, v) in zip(r["score"].to_pylist(), want):
        assert got == pytest.approx(v, rel=1e-12)
    with pytest.raises(ValueError, match="unknown modifier"):
        s.function_score("def", "doc_len", modifier="exp")


def test_missing_value_count_and_global(null_index):
    """ES missing / value_count / global aggs: exact over the half-null
    corpus, single searcher vs doc-partitioned shards identical."""
    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    s = Searcher(null_index)
    # the null corpus: lang is null for every odd row (100 of 200)
    q = "load index"
    ids = s.match_ids(q)
    h = s.hydrate(np.sort(ids), columns=["lang"])["lang"]
    miss, vc = s.missing_value_counts(q, "lang")
    assert miss == h.null_count and vc == len(h) - h.null_count
    assert miss + vc == ids.size
    assert miss > 0 and vc > 0  # the fixture actually exercises both
    # global bucket ignores the query: counts == whole-corpus counts
    gf = s.global_facet("lang")
    assert gf["value"].to_pylist() == ["python"]
    assert gf["count"].to_pylist() == [100]  # nulls skipped (ES missing)
    # distributed parity
    sh = ShardedSearcher(null_index, n_shards=2, use_actors=False)
    assert sh.missing_value_counts(q, "lang") == (miss, vc)
    assert sh.global_facet("lang").equals(gf)


def test_global_facet_excludes_tombstones(built_index):
    """live_ids honours delete-by-query tombstones — the global bucket
    counts live docs only."""
    import shutil

    idx, _ = built_index
    from elasticsearch_assets_ray.index.deletes import delete_by_query

    tmp = idx + "-globaldel"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(idx, tmp)
    before = Searcher(tmp).global_facet("lang")
    n = delete_by_query(tmp, "def")
    assert n > 0
    after = Searcher(tmp).global_facet("lang")
    assert sum(after["count"].to_pylist()) == sum(before["count"].to_pylist()) - n
    shutil.rmtree(tmp, ignore_errors=True)
