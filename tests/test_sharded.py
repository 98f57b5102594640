"""Doc-partitioned scatter-gather serving: rank identity vs the single
searcher, distributed aggregations, score-free count parity, and the
memory-restriction contract of bucket-range shards.

Reference analog: ElasticsearchReaderClient.ts:53-86 — every search/count
fans out to doc shards; scores must come out identical to the one-index
view (our dfs_query_then_fetch global-df contract)."""

import numpy as np
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher, ShardWorker

QUERIES = [
    "def load index",
    "def load index value",
    "+def load -zset",
    "def AND (load OR index)",
    "def load NOT zset",
    "lang:python def load",
    "de* load",
    "lo?d index",
    "load~1 index",
    '"def load"',
    '"load def"~u1 index',
    'index -"load def"~u0',
    "doc_len:[100 TO 400] def load",
    "(def OR load) AND NOT (index AND value)",
    "def^2 load",
]


@pytest.fixture(scope="module")
def single(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.fixture(scope="module")
def sharded(built_index):
    idx, _ = built_index
    return ShardedSearcher(idx, n_shards=3, use_actors=False)


def _eq_tables(a, b):
    assert a.num_rows == b.num_rows
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    sa = a["score"].to_numpy(zero_copy_only=False)
    sb = b["score"].to_numpy(zero_copy_only=False)
    # bit-identical scores: same floats, same addition order, global df
    np.testing.assert_array_equal(sa, sb)


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identity_sharded_vs_single(single, sharded, q):
    _eq_tables(sharded.search(q, k=12), single.search(q, k=12))


def test_rank_identity_exceeds_local_topk(single, sharded):
    # k larger than any single shard's match share: merge must interleave
    _eq_tables(sharded.search("def load", k=200), single.search("def load", k=200))


def test_msm_and_search_after(single, sharded):
    _eq_tables(
        sharded.search("def load index value", k=10, minimum_should_match=2),
        single.search("def load index value", k=10, minimum_should_match=2),
    )
    p1 = single.search("def load", k=5)
    cur = (p1["score"][-1].as_py(), p1["doc_id"][-1].as_py())
    _eq_tables(
        sharded.search("def load", k=5, search_after=cur),
        single.search("def load", k=5, search_after=cur),
    )


def test_sharded_facet_histogram_collapse(single, sharded):
    q = "def load index"
    f1, f2 = single.facet(q, by="lang"), sharded.facet(q, by="lang")
    assert f1.to_pylist() == f2.to_pylist()
    f1s, f2s = single.facet(q, by="lang", size=2), sharded.facet(q, by="lang", size=2)
    assert f1s.to_pylist() == f2s.to_pylist()
    h1 = single.histogram(q, "doc_len", 50.0)
    h2 = sharded.histogram(q, "doc_len", 50.0)
    assert h1.to_pylist() == h2.to_pylist()
    c1 = single.search_collapse(q, k=8, collapse="lang")
    c2 = sharded.search_collapse(q, k=8, collapse="lang")
    assert c1["doc_id"].to_pylist() == c2["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        c1["score"].to_numpy(zero_copy_only=False),
        c2["score"].to_numpy(zero_copy_only=False),
    )
    assert c1["lang"].to_pylist() == c2["lang"].to_pylist()


def test_sharded_count_matches_all_scores(single, sharded):
    for q in QUERIES:
        assert sharded.count(q) == single.all_scores(q).num_rows, q


def test_match_ids_score_free_parity(single):
    """match_ids == all_scores doc set; flat shapes never hit the scorer."""
    flat = [
        "def load index",
        "+def load -zset",
        "lang:python def load",
        "de* load",
        "doc_len:[100 TO 400] def load",
    ]
    for q in flat:
        base = single.stats["count_fallback_scored"]
        ids = single.match_ids(q)
        want = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
        assert sorted(ids.tolist()) == sorted(want.tolist()), q
        assert single.stats["count_fallback_scored"] == base, q
    assert single.stats["count_score_free"] >= len(flat)
    # tree / phrase shapes fall back but stay correct
    for q in ['"def load"', "def AND (load OR index)"]:
        ids = single.match_ids(q)
        want = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
        assert sorted(ids.tolist()) == sorted(want.tolist()), q


def test_msm_match_ids(single):
    ids = single.match_ids("def load index value", minimum_should_match=3)
    want = single.all_scores(
        "def load index value", minimum_should_match=3
    )["doc_id"].to_numpy(zero_copy_only=False)
    assert sorted(ids.tolist()) == sorted(want.tolist())


def test_bucket_range_restricts_loaded_postings(built_index):
    """A shard loads ONLY its bucket range's segment rows, and shard df
    sums to global df (the partition-independence the df_override relies
    on)."""
    idx, _ = built_index
    full = Searcher(idx)
    seg_full = full._segment_rows(["def"])
    buckets = sorted(set(seg_full["bucket"].to_pylist()))
    assert len(buckets) >= 2, "fixture must span multiple buckets"
    sh = ShardedSearcher(idx, n_shards=3, use_actors=False)
    total_df = 0
    for w, (lo, hi) in zip(sh.shards, sh.ranges):
        seg = w.s._segment_rows(["def"])
        if seg is None:
            continue
        got = seg["bucket"].to_pylist()
        assert all(lo <= b < hi for b in got), (lo, hi, got)
        total_df += sum(seg["df"].to_pylist())
    assert total_df == sum(seg_full["df"].to_pylist())


def test_shard_worker_local_results_disjoint(built_index):
    idx, _ = built_index
    sh = ShardedSearcher(idx, n_shards=3, use_actors=False)
    q, df = sh.prepare("def load index")
    seen: set[int] = set()
    for w in sh.shards:
        ids = w.search(q, 50, df)["doc_id"].to_pylist()
        assert not (seen & set(ids))
        seen |= set(ids)


def test_sharded_actors_smoke(built_index):
    """The actual Ray-actor scatter-gather path (one query is enough —
    the merge logic is shared with the in-process path)."""
    idx, _ = built_index
    single = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=2, use_actors=True)
    _eq_tables(sh.search("def load index", k=10), single.search("def load index", k=10))
    assert sh.count("def load") == single.all_scores("def load").num_rows
    f1 = single.facet("def load", by="lang")
    f2 = sh.facet("def load", by="lang")
    assert f1.to_pylist() == f2.to_pylist()
    # hydrate routes ids to their owning shard
    ids = single.search("def load", k=7)["doc_id"].to_numpy(zero_copy_only=False)
    h1 = single.hydrate(ids, columns=["doc_id", "lang"])
    h2 = sh.hydrate(ids, columns=["doc_id", "lang"])
    assert h1.to_pylist() == h2.to_pylist()


def test_sharded_phrase_prefix_parity(single, sharded):
    """Phrase-prefix stems expand on the COORDINATOR (full term dict) —
    both paths must agree, including the verification chain."""
    for q in ['"def lo*"', '"def lo*" index']:
        _eq_tables(sharded.search(q, k=10), single.search(q, k=10))


def test_match_ids_populates_ids_cache(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    s.match_ids("def load")
    assert len(s._ids_cache) > 0
    n_cached = len(s._ids_cache)
    s.match_ids("def load")  # second probe: pure cache hits
    assert len(s._ids_cache) == n_cached


def test_sharded_hydrate_edge_cases(built_index):
    """Actor-path hydrate: empty input and unknown-id drops must match
    the single searcher's contract (empty table / partial rows)."""
    idx, _ = built_index
    single = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=2, use_actors=True)
    empty = sh.hydrate(np.array([], dtype=np.int64), columns=["doc_id", "lang"])
    assert empty.num_rows == 0 and empty.column_names == ["doc_id", "lang"]
    ids = single.search("def load", k=3)["doc_id"].to_numpy(zero_copy_only=False)
    mixed = np.concatenate([ids, np.array([1 << 60], dtype=np.int64)])
    h1 = single.hydrate(mixed, columns=["doc_id", "lang"])
    h2 = sh.hydrate(mixed, columns=["doc_id", "lang"])
    assert h1.to_pylist() == h2.to_pylist()
    # columns WITHOUT doc_id still align via the internal doc_id fetch
    h3 = sh.hydrate(ids, columns=["lang"])
    assert h3.column_names == ["lang"]
    assert h3.to_pylist() == single.hydrate(ids, columns=["lang"]).to_pylist()


def test_from_offset_pagination(single, sharded):
    """ES `from` offset: page == the same window of the full ranking,
    identical on both serving paths."""
    full = single.search("def load", k=30)
    page = single.search("def load", k=10, from_=10)
    assert page["doc_id"].to_pylist() == full["doc_id"].to_pylist()[10:20]
    sp = sharded.search("def load", k=10, from_=10)
    _eq_tables(sp, page)
    assert single.search("def load", k=10, from_=0).num_rows == 10


def test_sharded_rescore_function_score_parity(single, sharded):
    r1 = single.rescore("def load index", "return value", k=8, window_size=40)
    r2 = sharded.rescore("def load index", "return value", k=8, window_size=40)
    _eq_tables(r2, r1)
    f1 = single.function_score("def load", "doc_len", k=8, factor=0.01)
    f2 = sharded.function_score("def load", "doc_len", k=8, factor=0.01)
    _eq_tables(f2, f1)


def test_sharded_mlt_suggest_highlight_parity(single, sharded):
    src = int(single.search("def load index", k=1)["doc_id"][0].as_py())
    m1 = single.more_like_this(src, k=8)
    m2 = sharded.more_like_this(src, k=8)
    _eq_tables(m2, m1)
    s1 = single.suggest_terms("lod indx", size=5)
    s2 = sharded.suggest_terms("lod indx", size=5)
    assert s1.to_pylist() == s2.to_pylist()
    ids = single.search("def load index", k=5)["doc_id"].to_numpy(zero_copy_only=False)
    h1 = single.highlight("def load index", ids, window=8)
    h2 = sharded.highlight("def load index", ids, window=8)
    # full contract: one row per input docid IN INPUT ORDER on both paths
    assert h1.to_pylist() == h2.to_pylist()


def test_sharded_rescore_actor_path(built_index):
    idx, _ = built_index
    single = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=2, use_actors=True)
    _eq_tables(
        sh.rescore("def load index", "return value", k=5, window_size=30),
        single.rescore("def load index", "return value", k=5, window_size=30),
    )
    _eq_tables(
        sh.function_score("def load", "doc_len", k=5, factor=0.01),
        single.function_score("def load", "doc_len", k=5, factor=0.01),
    )
    ids = single.search("def load", k=4)["doc_id"].to_numpy(zero_copy_only=False)
    # shuffle the request order so the order-restoration logic is actually
    # exercised (shards return rows grouped by owner)
    ids = ids[::-1].copy()
    h1 = single.highlight("def load", ids, window=8)
    h2 = sh.highlight("def load", ids, window=8)
    assert h1.to_pylist() == h2.to_pylist()


def test_reader_api_sharded_backend(built_index, corpus_dir):
    """ReaderAPI(serving_shards=N): the fulltext path (search/count/
    hydrate) served scatter-gather, same results as the single-searcher
    backend."""
    from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice

    idx, _ = built_index
    a1 = ReaderAPI(corpus_dir, key_col="repo", index_dir=idx)
    a2 = ReaderAPI(corpus_dir, key_col="repo", index_dir=idx, serving_shards=2)
    s = ReaderSlice(query="def load index", limit=15)
    assert a2.count(s) == a1.count(s)
    t1, t2 = a1.fetch(s), a2.fetch(s)
    assert t1.num_rows == t2.num_rows
    assert t1.sort_by("doc_id").equals(t2.sort_by("doc_id"))
    sk = ReaderSlice(query="def load", keys=["repo1"])
    assert a2.count(sk) == a1.count(sk)
    m = a2.metrics()
    assert m["engine"]["n_shards"] == 2


def test_property_random_query_parity(single, sharded):
    """Randomized bag-of-words / must / must_not combinations: sharded
    results stay bit-identical to the single searcher."""
    import random

    rng = random.Random(1234)
    vocab = ["def", "load", "index", "value", "return", "parse", "config",
             "table", "cache", "user", "token", "import"]
    for trial in range(25):
        n = rng.randint(1, 4)
        terms = rng.sample(vocab, n)
        parts = []
        for t in terms:
            r = rng.random()
            parts.append(f"+{t}" if r < 0.2 else (f"-{t}" if r < 0.3 else t))
        q = " ".join(parts)
        try:
            expect = single.search(q, k=15)
        except ValueError:
            continue  # e.g. all-negative queries rejected by the parser
        got = sharded.search(q, k=15)
        assert got["doc_id"].to_pylist() == expect["doc_id"].to_pylist(), q
        np.testing.assert_array_equal(
            got["score"].to_numpy(zero_copy_only=False),
            expect["score"].to_numpy(zero_copy_only=False),
        )


def test_track_total_hits_early_exit(built_index):
    """Q7: counting stops at the threshold; remaining buckets undecoded."""
    idx, _ = built_index
    s = Searcher(idx)
    exact = s.all_scores("def load").num_rows
    assert exact > 5
    v, rel = s.match_count("def load")
    assert (v, rel) == (exact, "eq")
    v, rel = s.match_count("def load", track_total_hits=5)
    assert (v, rel) == (5, "gte")
    assert s.stats.get("count_early_exit", 0) >= 1
    v, rel = s.match_count("def load", track_total_hits=exact + 1000)
    assert (v, rel) == (exact, "eq")
    # boundary: a total EXACTLY equal to the threshold is complete → "eq"
    # (ES reports relation gte only for truncated counts)
    v, rel = s.match_count("def load", track_total_hits=exact)
    assert (v, rel) == (exact, "eq")


def test_stats_percentiles_distributed_bit_identity(single, sharded):
    """stats_agg/percentiles: the sharded merge is bit-identical to the
    single searcher (integer count merge + final math runs once), and
    both match a numpy brute force over the hydrated match values."""
    q = "def load"
    st_s = single.stats_agg(q, "doc_len")
    st_d = sharded.stats_agg(q, "doc_len")
    assert st_s == st_d
    p_s = single.percentiles(q, "doc_len")
    p_d = sharded.percentiles(q, "doc_len")
    assert p_s.equals(p_d)

    ids = np.sort(
        single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
    )
    vals = (
        single.hydrate(ids, columns=["doc_len"])["doc_len"]
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    assert st_s["count"] == vals.size
    assert st_s["min"] == vals.min() and st_s["max"] == vals.max()
    assert st_s["sum"] == vals.sum()  # exact: integer-valued field
    assert st_s["avg"] == vals.sum() / vals.size
    np.testing.assert_allclose(
        st_s["variance"], vals.var(), rtol=1e-9, atol=1e-9
    )
    got = p_s["value"].to_numpy(zero_copy_only=False)
    want = np.percentile(vals, [25, 50, 75, 95, 99], method="linear")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_stats_empty_match(single, sharded):
    st = sharded.stats_agg("zzqqzznope", "doc_len")
    assert st["count"] == 0 and st["min"] is None
    assert st == single.stats_agg("zzqqzznope", "doc_len")
    p = sharded.percentiles("zzqqzznope", "doc_len")
    assert p["value"].null_count == p.num_rows


def test_facet_metric_distributed_bit_identity(single, sharded):
    """terms agg + avg sub-agg: integer partials merge exactly; the float
    math runs once → sharded == single bit-for-bit, and both match a
    numpy brute force over the hydrated match set."""
    q = "def load"
    t1 = single.facet_metric(q, "lang", "doc_len")
    t2 = sharded.facet_metric(q, "lang", "doc_len")
    assert t1.to_pylist() == t2.to_pylist()
    # brute force
    ids = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
    h = single.hydrate(np.sort(ids), columns=["lang", "doc_len"])
    import collections

    agg = collections.defaultdict(lambda: [0, 0.0])
    for lang, dl in zip(h["lang"].to_pylist(), h["doc_len"].to_pylist()):
        if lang is None or dl is None:
            continue
        agg[lang][0] += 1
        agg[lang][1] += float(dl)
    for row in t1.to_pylist():
        cnt, sm = agg[row["value"]]
        assert row["count"] == cnt
        assert abs(row["avg"] - sm / cnt) < 1e-9
    # size truncation keeps the count-desc/value-asc bucket order
    assert single.facet_metric(q, "lang", "doc_len", size=2).num_rows <= 2


def test_significant_terms_distributed_and_jlh(single, sharded):
    q = "def load"
    t1 = single.significant_terms(q, size=10, min_doc_count=2)
    t2 = sharded.significant_terms(q, size=10, min_doc_count=2)
    assert t1.to_pylist() == t2.to_pylist()
    assert t1.num_rows > 0
    rows = t1.to_pylist()
    n_docs = int(single.manifest["n_docs"])
    fg_total = int(single.all_scores(q).num_rows)
    for r in rows:
        fg_pct = r["fg"] / fg_total
        bg_pct = r["bg"] / n_docs
        assert fg_pct > bg_pct  # only over-represented terms survive
        assert abs(r["score"] - (fg_pct - bg_pct) * (fg_pct / bg_pct)) < 1e-12
    # scores are rank-sorted (round-9 desc, term asc)
    import elasticsearch_assets_ray.query.bm25 as bm25

    r9 = bm25.round_half_up(
        np.array([r["score"] for r in rows]), 9
    )
    assert all(r9[i] >= r9[i + 1] for i in range(len(rows) - 1))


def test_range_agg_distributed_and_labels(single, sharded):
    from elasticsearch_assets_ray.query.engine import range_label

    # pin the label literals the SQL oracle hardcodes
    assert range_label(None, 200.0) == "*-200.0"
    assert range_label(200.0, 400.0) == "200.0-400.0"
    assert range_label(400.0, None) == "400.0-*"
    q = "def load"
    ranges = [(None, 150.0), (100.0, 300.0), (300.0, None)]
    t1 = single.range_agg(q, "doc_len", ranges)
    t2 = sharded.range_agg(q, "doc_len", ranges)
    assert t1.to_pylist() == t2.to_pylist()
    # overlapping ranges count independently (ES semantics); empty kept
    ids = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
    v = single.hydrate(np.sort(ids), columns=["doc_len"])["doc_len"].to_numpy(
        zero_copy_only=False
    ).astype(float)
    expect = [
        int((v < 150.0).sum()),
        int(((v >= 100.0) & (v < 300.0)).sum()),
        int((v >= 300.0).sum()),
    ]
    assert [r["count"] for r in t1.to_pylist()] == expect


def test_top_hits_distributed_bit_identity(single, sharded):
    q = "def load"
    t1 = single.top_hits(q, "lang", n=3)
    t2 = sharded.top_hits(q, "lang", n=3)
    assert t1.to_pylist() == t2.to_pylist()
    # per-bucket rank is 1..n and scores within a bucket are non-increasing
    # at round-9 granularity with docid tie-break
    import elasticsearch_assets_ray.query.bm25 as bm25

    rows = t1.to_pylist()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["value"], []).append(r)
    for v, rs in by_bucket.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        r9 = bm25.round_half_up(np.array([r["score"] for r in rs]), 9)
        for i in range(len(rs) - 1):
            assert (r9[i], -rs[i]["doc_id"]) >= (r9[i + 1], -rs[i + 1]["doc_id"])
    # every bucket's hits are genuinely the bucket's best: spot-check via
    # a brute force on one bucket
    ids = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
    sc = single.all_scores(q)["score"].to_numpy(zero_copy_only=False)
    h = single.hydrate(np.sort(ids), columns=["doc_id", "lang"])
    lang_of = dict(zip(h["doc_id"].to_pylist(), h["lang"].to_pylist()))
    some = rows[0]["value"]
    cand = [
        (float(bm25.round_half_up(np.array([s]), 9)[0]), -int(d))
        for d, s in zip(ids, sc)
        if lang_of.get(int(d)) == some
    ]
    cand.sort(reverse=True)
    want = [-c[1] for c in cand[:3]]
    got = [r["doc_id"] for r in rows if r["value"] == some]
    assert got == want


def test_shard_actor_crash_recovery(built_index):
    """A killed shard actor restarts and re-serves (max_restarts +
    max_task_retries): the query AFTER the crash is still rank-identical.
    On a multi-node cluster worker loss is routine; serving must not
    need a coordinator rebuild."""
    import ray

    idx, _ = built_index
    single = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=2, use_actors=True)
    before = sh.search("def load index", k=10)
    _eq_tables(before, single.search("def load index", k=10))
    # simulate a node loss for one shard (restart allowed)
    ray.kill(sh.shards[0], no_restart=False)
    after = sh.search("def load index", k=10)
    _eq_tables(after, before)
    assert sh.count("def load") == single.all_scores("def load").num_rows


def test_msearch_identical_to_per_query(single, sharded, built_index):
    """_msearch: one scatter serving the whole batch — per-query results
    bit-identical to search() on both serving paths."""
    batch = ["def load index", "+def load -zset", '"def load"', "de* load"]
    m1 = single.msearch(batch, k=10)
    m2 = sharded.msearch(batch, k=10)
    for q, a, b in zip(batch, m1, m2):
        _eq_tables(b, a)
        _eq_tables(a, single.search(q, k=10))
    # actor path too (the RPC-amortization case msearch exists for)
    idx, _ = built_index
    sh = ShardedSearcher(idx, n_shards=2, use_actors=True)
    for q, t in zip(batch, sh.msearch(batch, k=10)):
        _eq_tables(t, single.search(q, k=10))


def test_significant_terms_lazy_stop_is_exact(single):
    """The fg-desc threshold stop (bg >= fg upper bound) returns exactly
    the unpruned result — tiny chunks force many stop checks."""
    from elasticsearch_assets_ray.query.engine import (
        merge_sig_partials,
        significant_terms_from_partials,
    )

    q = "def load"
    ids = single.all_scores(q)["doc_id"].to_numpy(zero_copy_only=False)
    fg = merge_sig_partials([single.sig_terms_ids(ids)])
    n = int(single.manifest["n_docs"])
    full = significant_terms_from_partials(
        fg, ids.size, single.term_dfs, n, 5, 2, chunk=10**9
    )
    pruned = significant_terms_from_partials(
        fg, ids.size, single.term_dfs, n, 5, 2, chunk=3
    )
    assert full.to_pylist() == pruned.to_pylist()
    assert full.num_rows > 0


def test_top_hits_ids_tolerates_dropped_ids(single):
    """Stale/unknown docids must be dropped with alignment intact (the
    hydrate contract drops them) — not silently shift bucket values."""
    r = single.all_scores("def load")
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    sc = r["score"].to_numpy(zero_copy_only=False)
    want = single.top_hits_ids(ids, sc, "lang", 3)
    # splice in unknown ids (beyond any pid) at the front and back
    bad = np.array([ids.max() + 10_000_000], dtype=np.int64)
    ids2 = np.concatenate([bad, ids, bad + 1])
    sc2 = np.concatenate([[99.0], sc, [98.0]])
    got = single.top_hits_ids(ids2, sc2, "lang", 3)
    assert got.to_pylist() == want.to_pylist()


def test_filters_and_adjacency_matrix(single, sharded):
    """ES filters + adjacency_matrix aggs: distributed == single (the
    doc-partition sum argument), and counts match brute force."""
    qs = {"a": "def", "b": "load", "c": "+index value"}
    f1 = single.filters_agg(qs)
    f2 = sharded.filters_agg(qs)
    assert f1.to_pylist() == f2.to_pylist()
    for row in f1.to_pylist():
        assert row["count"] == single.all_scores(qs[row["value"]]).num_rows
    a1 = single.adjacency_matrix(qs)
    a2 = sharded.adjacency_matrix(qs)
    assert a1.to_pylist() == a2.to_pylist()
    got = dict(zip(a1["value"].to_pylist(), a1["count"].to_pylist()))
    ids = {n: set(single.all_scores(q)["doc_id"].to_pylist()) for n, q in qs.items()}
    for n in qs:
        assert got.get(n, 0) == len(ids[n])
    for x, y in [("a", "b"), ("a", "c"), ("b", "c")]:
        want = len(ids[x] & ids[y])
        assert got.get(f"{x}&{y}", 0) == want


def test_suggest_completion(single, sharded):
    t = single.suggest_completion("lo", size=4)
    assert t.num_rows > 0 and t.num_rows <= 4
    assert all(s.startswith("lo") for s in t["suggestion"].to_pylist())
    dfs = t["df"].to_pylist()
    assert dfs == sorted(dfs, reverse=True)
    assert sharded.suggest_completion("lo", size=4).to_pylist() == t.to_pylist()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one token"):
        single.suggest_completion("two words")


def test_compound_queries_parity_and_semantics(single, sharded):
    """ES boosting / constant_score / dis_max: sharded == single
    bit-for-bit, and the combination math matches brute force."""
    b1 = single.boosting("def load", "zset", negative_boost=0.25, k=10)
    b2 = sharded.boosting("def load", "zset", negative_boost=0.25, k=10)
    _eq_tables(b2, b1)
    # demotion: every demoted doc's score is exactly 0.25x its BM25
    full = dict(
        zip(
            single.all_scores("def load")["doc_id"].to_pylist(),
            single.all_scores("def load")["score"].to_pylist(),
        )
    )
    neg = set(single.match_ids("zset").tolist())
    for d, s in zip(b1["doc_id"].to_pylist(), b1["score"].to_pylist()):
        want = full[d] * 0.25 if d in neg else full[d]
        assert s == want
    c1 = single.constant_score("def load", boost=2.5, k=7)
    c2 = sharded.constant_score("def load", boost=2.5, k=7)
    assert c1.to_pylist() == c2.to_pylist()
    assert set(c1["score"].to_pylist()) == {2.5}
    assert c1["doc_id"].to_pylist() == sorted(single.match_ids("def load"))[:7]
    d1 = single.dis_max(["def load", "index value"], tie_breaker=0.5, k=10)
    d2 = sharded.dis_max(["def load", "index value"], tie_breaker=0.5, k=10)
    _eq_tables(d2, d1)
    sa = dict(zip(single.all_scores("def load")["doc_id"].to_pylist(),
                  single.all_scores("def load")["score"].to_pylist()))
    sb = dict(zip(single.all_scores("index value")["doc_id"].to_pylist(),
                  single.all_scores("index value")["score"].to_pylist()))
    for d, s in zip(d1["doc_id"].to_pylist(), d1["score"].to_pylist()):
        a, b = sa.get(d, 0.0), sb.get(d, 0.0)
        # the engine (and the SQL oracle) compute best + tb*(sum - best);
        # fl(a+b) - max != min in general, so mirror the exact expression
        assert s == max(a, b) + 0.5 * ((a + b) - max(a, b))


def test_match_bool_prefix_parity_and_semantics(single, sharded):
    """ES match_bool_prefix: sharded == single bit-for-bit; score =
    BM25(complete terms) + 1.0 iff the doc contains any dictionary
    expansion of the stem (pinned CONSTANT_SCORE prefix rewrite)."""
    r1 = single.match_bool_prefix("def load in", k=12)
    r2 = sharded.match_bool_prefix("def load in", k=12)
    _eq_tables(r2, r1)
    full = dict(
        zip(
            single.all_scores("def load")["doc_id"].to_pylist(),
            single.all_scores("def load")["score"].to_pylist(),
        )
    )
    pref = set(single.match_ids("in*").tolist())
    assert pref, "fixture corpus must contain in* terms"
    for d, s in zip(r1["doc_id"].to_pylist(), r1["score"].to_pylist()):
        assert s == full.get(d, 0.0) + (1.0 if d in pref else 0.0)
    # at least one hit must be prefix-boosted for the test to bite
    assert any(d in pref for d in r1["doc_id"].to_pylist())
    # pure-stem query: constant 1.0, docID-ascending tie-break
    p1 = single.match_bool_prefix("lo", k=8)
    p2 = sharded.match_bool_prefix("lo", k=8)
    _eq_tables(p2, p1)
    assert set(p1["score"].to_pylist()) == {1.0}
    assert p1["doc_id"].to_pylist() == sorted(single.match_ids("lo*"))[:8]
    # text that analyzes to nothing
    assert single.match_bool_prefix("!!!", k=5).num_rows == 0
    assert sharded.match_bool_prefix("!!!", k=5).num_rows == 0


def test_weighted_tokens_parity_and_pruning(single, sharded):
    """ES weighted_tokens: sparse Σ w·tf over the raw postings surface —
    sharded == single bit-for-bit (quarter-step weights make the sum
    order-free), pruning drops high-df low-weight tokens only."""
    from elasticsearch_assets_ray.query.sparse import weighted_tokens

    dfs0 = single.term_dfs(["def", "load", "index"])
    weak = max(dfs0, key=dfs0.get)  # the most frequent token gets w=0.25
    others = [t for t in ("def", "load", "index") if t != weak]
    toks = {weak: 0.25, others[0]: 2.0, others[1]: 0.75}
    r1 = weighted_tokens(single, toks, k=15)
    r2 = weighted_tokens(sharded, toks, k=15)
    _eq_tables(r2, r1)
    # score semantics: Σ w·tf per doc
    posts = single.term_postings_many(sorted(toks))
    for d, s in zip(r1["doc_id"].to_pylist(), r1["score"].to_pylist()):
        want = 0.0
        for t in sorted(toks):
            ids, tf = posts[t]
            j = np.searchsorted(ids, d)
            if j < ids.size and ids[j] == d:
                want += toks[t] * float(tf[j])
        assert s == want
    # pruning: the max-df token is above the query-average df and weak
    dfs = single.term_dfs(sorted(toks))
    avg = sum(dfs.values()) / 3
    assert dfs[weak] > avg
    p1 = weighted_tokens(
        single, toks, k=15, freq_ratio_threshold=1.0, weight_threshold=1.0
    )
    p2 = weighted_tokens(
        sharded, toks, k=15, freq_ratio_threshold=1.0, weight_threshold=1.0
    )
    _eq_tables(p2, p1)
    kept = {
        t: w
        for t, w in toks.items()
        if not (dfs[t] > avg and w < 1.0)
    }
    assert weak not in kept and kept  # the prune rule must bite
    want = weighted_tokens(single, kept, k=15)
    assert p1.equals(want)
    # a weight above the threshold is never pruned regardless of df
    strong = weighted_tokens(
        single,
        {weak: 1.5, others[0]: 2.0, others[1]: 0.75},
        k=15,
        freq_ratio_threshold=1.0,
        weight_threshold=1.0,
    )
    assert not strong.equals(want)


def test_scan_pages_cover_match_set(single):
    """ES scroll analog: concatenated pages == the full match set in the
    stable (round-9 desc, docID asc) order, page size bounded."""
    import elasticsearch_assets_ray.query.bm25 as bm25

    q = "def load"
    full = single.all_scores(q)
    ids = full["doc_id"].to_numpy(zero_copy_only=False)
    sc = full["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -bm25.round_half_up(sc, 9)))
    want = ids[order].tolist()
    got, n_pages = [], 0
    for page in single.scan(q, page_size=7):
        assert page.num_rows <= 7
        got.extend(page["doc_id"].to_pylist())
        n_pages += 1
    assert got == want
    assert n_pages == (len(want) + 6) // 7
    # no matches → no pages
    assert list(single.scan("qqqqzzzz", page_size=5)) == []


def test_term_vectors(single):
    """_termvectors: (term, tf, positions) straight from re-analysis."""
    import pytest as _pytest

    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    did = int(single.search("def load", k=1)["doc_id"][0].as_py())
    tv = single.term_vectors(did)
    toks = tokenize_text(
        single.hydrate(np.array([did]), columns=["content"])["content"][0].as_py()
    )
    import collections

    want_tf = collections.Counter(toks)
    got = {
        t: (tf, ps)
        for t, tf, ps in zip(
            tv["term"].to_pylist(), tv["tf"].to_pylist(), tv["positions"].to_pylist()
        )
    }
    assert set(got) == set(want_tf)
    for t, (tf, ps) in got.items():
        assert tf == want_tf[t]
        assert ps == [i for i, tok in enumerate(toks) if tok == t]
    assert tv["term"].to_pylist() == sorted(got)
    with _pytest.raises(KeyError):
        single.term_vectors(10**15)


def test_sort_by_field_score_free_and_sharded_parity(single, sharded):
    """ES field-sorted search: single vs scatter-gather identity in both
    directions, score-free match set, value/doc order contract."""
    for desc in (True, False):
        a = single.sort_by_field("def load", "doc_len", k=9, desc=desc)
        b = sharded.sort_by_field("def load", "doc_len", k=9, desc=desc)
        assert a.equals(b)
        v = a["value"].to_numpy(zero_copy_only=False)
        d = a["doc_id"].to_numpy(zero_copy_only=False)
        key = np.lexsort((d, -v if desc else v))
        assert list(key) == list(range(len(key)))  # already in contract order
    # values are the real doc_len of the matches
    ids = np.sort(single.match_ids("def load"))
    t = single.hydrate(ids, columns=["doc_id", "doc_len"])
    m = dict(zip(t["doc_id"].to_pylist(), t["doc_len"].to_pylist()))
    top = single.sort_by_field("def load", "doc_len", k=5, desc=True)
    for did, val in zip(top["doc_id"].to_pylist(), top["value"].to_pylist()):
        assert m[did] == val
    assert top["value"].to_pylist() == sorted(
        (float(x) for x in m.values()), reverse=True
    )[:5]


def test_sort_by_field_empty_match(single, sharded):
    a = single.sort_by_field("qqqqzzzz", "doc_len", k=5)
    b = sharded.sort_by_field("qqqqzzzz", "doc_len", k=5)
    assert a.num_rows == 0 and b.num_rows == 0


def test_cardinality_exact_and_sharded_parity(single, sharded):
    a = single.cardinality("def load", "doc_len")
    b = sharded.cardinality("def load", "doc_len")
    assert a == b
    ids = np.sort(single.match_ids("def load"))
    vals = single.hydrate(ids, columns=["doc_len"])["doc_len"].to_pylist()
    assert a == len(set(vals))
    assert single.cardinality("qqqqzzzz", "doc_len") == 0


def test_synonym_query_semantics_and_parity(single, sharded):
    """Lucene SynonymQuery: tf sums BEFORE saturation (≠ plain OR),
    idf from max member df; sharded bit-identity; validation."""
    syn = {"def": ["load"]}
    a = single.search_synonyms("def index", syn, k=12)
    b = sharded.search_synonyms("def index", syn, k=12)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(zero_copy_only=False),
        b["score"].to_numpy(zero_copy_only=False),
    )
    # manual SynonymQuery score for the top doc
    from elasticsearch_assets_ray.query import bm25

    top = int(a["doc_id"][0].as_py())
    dfs = single.term_dfs(["def", "load", "index"])
    dl = float(single.doclens_for(np.array([top]))[0])
    tv = single.term_vectors(top)
    tf = dict(zip(tv["term"].to_pylist(), tv["tf"].to_pylist()))
    sat = lambda t: bm25.tf_saturation(
        np.array([float(t)]), np.array([dl]), single.avgdl
    )[0]
    want = bm25.math_idf(max(dfs["def"], dfs["load"]), single.n_docs) * sat(
        tf.get("def", 0) + tf.get("load", 0)
    ) + bm25.math_idf(dfs["index"], single.n_docs) * sat(tf.get("index", 0))
    np.testing.assert_allclose(a["score"][0].as_py(), want, rtol=1e-12)
    # differs from plain OR on the same terms (no double idf counting)
    plain = single.search("def load index", k=12)
    assert a["score"].to_pylist() != plain["score"].to_pylist()
    # unknown synonym degrades to the bare term
    c = single.search_synonyms("index", {"index": ["zzzznotaword"]}, k=5)
    d = single.search("index", k=5)
    assert c["doc_id"].to_pylist() == d["doc_id"].to_pylist()
    np.testing.assert_allclose(
        c["score"].to_numpy(zero_copy_only=False),
        d["score"].to_numpy(zero_copy_only=False),
        rtol=1e-12,
    )
    with pytest.raises(ValueError, match="flat should-term"):
        single.search_synonyms('+def "load index"', {}, k=5)
    with pytest.raises(ValueError, match="flat should-term"):
        sharded.search_synonyms("def AND load", {}, k=5)


def test_decay_score_semantics_and_parity(single, sharded):
    """ES decay functions: multiplier formulas (decay value reached at
    distance == scale), sharded parity, unknown kind rejected."""
    from elasticsearch_assets_ray.query.engine import decay_multiplier

    v = np.array([100.0, 200.0, 300.0, 150.0])
    for kind in ("gauss", "exp", "linear"):
        m = decay_multiplier(kind, v, origin=200.0, scale=100.0, offset=0.0, decay=0.5)
        np.testing.assert_allclose(m[1], 1.0)           # at the origin
        np.testing.assert_allclose(m[0], 0.5)           # at distance == scale
        np.testing.assert_allclose(m[2], 0.5)
        assert m[3] > 0.5                               # inside the scale
        a = single.decay_score("def load", "doc_len", kind, 200.0, 100.0, k=8)
        b = sharded.decay_score("def load", "doc_len", kind, 200.0, 100.0, k=8)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        np.testing.assert_array_equal(
            a["score"].to_numpy(zero_copy_only=False),
            b["score"].to_numpy(zero_copy_only=False),
        )
    # linear clamps to zero beyond scale/(1-decay)
    far = decay_multiplier("linear", np.array([10_000.0]), 0.0, 100.0, 0.0, 0.5)
    assert far[0] == 0.0
    with pytest.raises(ValueError, match="unknown decay kind"):
        single.decay_score("def", "doc_len", "cosine", 0.0, 1.0, k=1)


def test_synonym_df_override_covers_shard_absent_members(single, sharded):
    """A synonym member with NO postings in a shard's doc range must
    still contribute its coordinator-injected GLOBAL df to the group's
    max-df idf — regression for the override only rewriting
    locally-present terms."""
    from elasticsearch_assets_ray.query import bm25

    shard = sharded.shards[0].s  # a bucket-range Searcher
    base = "def"
    mem = "zsynonlyelsewhere"  # absent from this shard (and corpus)
    big_df = single.n_docs // 2  # larger than df(def) by construction
    assert single.term_dfs([base])[base] < big_df
    out = shard.synonyms_prepared(
        {base: (base, mem)}, 5, {base: single.term_dfs([base])[base], mem: big_df}
    )
    assert out.num_rows > 0
    top = int(out["doc_id"][0].as_py())
    tv = single.term_vectors(top)
    tf = dict(zip(tv["term"].to_pylist(), tv["tf"].to_pylist()))
    dl = float(single.doclens_for(np.array([top]))[0])
    want = bm25.math_idf(big_df, shard.n_docs) * bm25.tf_saturation(
        np.array([float(tf[base])]), np.array([dl]), shard.avgdl
    )[0]
    np.testing.assert_allclose(out["score"][0].as_py(), want, rtol=1e-12)


def test_decay_rejects_bad_constants(single):
    from elasticsearch_assets_ray.query.engine import decay_sql_expr

    with pytest.raises(ValueError, match="decay must be in"):
        single.decay_score("def", "doc_len", "gauss", 0.0, 100.0, decay=1.0, k=1)
    with pytest.raises(ValueError, match="scale must be"):
        single.decay_score("def", "doc_len", "exp", 0.0, 0.0, k=1)
    with pytest.raises(ValueError, match="decay must be in"):
        decay_sql_expr("linear", "x", 0.0, 10.0, 0.0, 1.5)


def test_sliced_scroll_partitions_the_match_set(single, sharded):
    """Union of per-slice scrolls == the unsliced scroll's match set,
    slices are disjoint, scores carry global df (identical to the
    single searcher's), and pages respect page_size."""
    full = {
        int(d): float(s)
        for page in single.scan("def load", page_size=7)
        for d, s in zip(page["doc_id"].to_pylist(), page["score"].to_pylist())
    }
    seen = {}
    for sl in range(sharded.n_shards):
        for page in sharded.scan("def load", page_size=7, slice_id=sl):
            assert page.num_rows <= 7
            for d, s in zip(page["doc_id"].to_pylist(), page["score"].to_pylist()):
                assert d not in seen  # slices are disjoint
                seen[int(d)] = float(s)
    assert seen == full
    # unsliced distributed scroll matches too
    merged = {
        int(d): float(s)
        for page in sharded.scan("def load", page_size=11)
        for d, s in zip(page["doc_id"].to_pylist(), page["score"].to_pylist())
    }
    assert merged == full
    with pytest.raises(ValueError, match="slice_id"):
        next(sharded.scan("def", slice_id=99))


def test_terms_enum_matches_dictionary(single):
    t = single.terms_enum("de", size=5)
    terms = t["term"].to_pylist()
    assert terms == sorted(terms)
    assert all(x.startswith("de") for x in terms)
    # df agrees with term_dfs
    dfs = single.term_dfs(terms)
    assert t["df"].to_pylist() == [dfs[x] for x in terms]


def test_collapse_inner_hits_composition(single, sharded):
    """Collapse + inner_hits: group winner is inner rank 1, inner hits
    ordered by the shared comparator, sharded identical to single."""
    a = single.collapse_inner_hits("def load index", k=4, collapse="lang", inner_n=3)
    b = sharded.collapse_inner_hits("def load index", k=4, collapse="lang", inner_n=3)
    assert a.equals(b)
    win = single.search_collapse("def load index", k=4, collapse="lang")
    # winner of group g == inner rank 1 of group rank g
    for g, (wd, wv) in enumerate(
        zip(win["doc_id"].to_pylist(), win["lang"].to_pylist()), start=1
    ):
        rows = [
            (ir, d)
            for gr, ir, d, v in zip(
                a["group_rank"].to_pylist(),
                a["inner_rank"].to_pylist(),
                a["doc_id"].to_pylist(),
                a["value"].to_pylist(),
            )
            if gr == g
        ]
        assert rows[0] == (1, wd)
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


def test_profile_breakdown(single):
    p = single.profile("def load index", k=5)
    assert p["hits"] == 5
    assert p["total_ms"] >= p["search_ms"] > 0
    for key in ("parse_ms", "rewrite_ms", "segments_ms"):
        assert p[key] >= 0
    assert "d_buckets_considered" in p and p["d_buckets_considered"] >= 0


def test_random_score_seeded_and_parity(single, sharded):
    """ES random_score: deterministic for a seed, seed-sensitive,
    variates in [0, 1), sharded parity bit-exact."""
    a1 = single.random_score("def load", seed="a", k=8)
    a2 = single.random_score("def load", seed="a", k=8)
    assert a1.equals(a2)  # reproducible
    b = sharded.random_score("def load", seed="a", k=8)
    assert a1["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        a1["score"].to_numpy(zero_copy_only=False),
        b["score"].to_numpy(zero_copy_only=False),
    )
    # a different seed reorders (overwhelmingly likely on 8+ hits)
    c = single.random_score("def load", seed="b", k=8)
    assert c["doc_id"].to_pylist() != a1["doc_id"].to_pylist() or not np.array_equal(
        c["score"].to_numpy(zero_copy_only=False),
        a1["score"].to_numpy(zero_copy_only=False),
    )
    # multiplier stays within [0, 1): random scores never exceed BM25
    plain = dict(
        zip(
            single.search("def load", k=500)["doc_id"].to_pylist(),
            single.search("def load", k=500)["score"].to_pylist(),
        )
    )
    for d, s in zip(a1["doc_id"].to_pylist(), a1["score"].to_pylist()):
        assert 0.0 <= s <= plain[d]


def test_sampler_and_diversified_sampler(built_index):
    """ES sampler / diversified_sampler: global deterministic sample,
    shard-count independence, per-value cap honored."""
    idx, _ = built_index
    sh2 = ShardedSearcher(idx, n_shards=2, use_actors=False)
    sh3 = ShardedSearcher(idx, n_shards=3, use_actors=False)

    a = sh2.sampler_terms("def load index", by="repo", sample_size=40)
    b = sh3.sampler_terms("def load index", by="repo", sample_size=40)
    assert a.sort_by("value").equals(b.sort_by("value"))  # shard-count independent
    assert sum(a["count"].to_pylist()) == 40

    d = sh2.diversified_sampler_terms(
        "def load index", dedup_field="repo", by="lang",
        sample_size=10, max_per_value=3,
    )
    d3 = sh3.diversified_sampler_terms(
        "def load index", dedup_field="repo", by="lang",
        sample_size=10, max_per_value=3,
    )
    assert d.sort_by("value").equals(d3.sort_by("value"))
    assert sum(d["count"].to_pylist()) <= 10
    # cap respected: re-run keyed by the dedup field itself
    caps = sh2.diversified_sampler_terms(
        "def load index", dedup_field="repo", by="repo",
        sample_size=50, max_per_value=3,
    )
    assert max(caps["count"].to_pylist()) <= 3
    with pytest.raises(ValueError):
        sh2.sampler_terms("def", by="repo", sample_size=0)


def test_runtime_field_and_scripted_metric(built_index):
    """ES runtime fields: registered query-time script usable anywhere a
    stored numeric field is (sort, stats, scripted_metric); actor
    processes receive the registry at pool construction."""
    from elasticsearch_assets_ray.query.engine import (
        RUNTIME_FIELDS,
        Searcher,
        register_runtime_field,
    )

    idx, _ = built_index
    register_runtime_field("neg_len", "doc_len", lambda v: -v)
    try:
        single = Searcher(idx)
        a = single.sort_by_field("def load", "neg_len", k=6, desc=True)
        # neg_len desc == doc_len asc
        b = single.sort_by_field("def load", "doc_len", k=6, desc=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        np.testing.assert_array_equal(
            a["value"].to_numpy(zero_copy_only=False),
            -b["value"].to_numpy(zero_copy_only=False),
        )
        # actor path: registry ships at construction
        sh = ShardedSearcher(idx, n_shards=2, use_actors=True)
        c = sh.sort_by_field("def load", "neg_len", k=6, desc=True)
        assert c["doc_id"].to_pylist() == a["doc_id"].to_pylist()

        # scripted_metric over the runtime field: mean == -mean(doc_len)
        mean = sh.scripted_metric(
            "def load",
            "neg_len",
            lambda v, c_: (int(c_.sum()), float((v * c_).sum())),
            lambda st: st[1] / st[0],
        )
        ids = sh.match_ids("def load")
        dl = single.doclens_for(np.sort(ids.astype(np.int64)))
        np.testing.assert_allclose(mean, -dl.mean())
    finally:
        RUNTIME_FIELDS.pop("neg_len", None)


def test_rank_feature_parity_and_monotonicity(single, sharded):
    """rank_feature: sharded == single bit-for-bit for all three ES
    curves, and a huge boost strictly reorders by the feature."""
    for fn, kw in [
        ("saturation", {"pivot": 20.0}),
        ("log", {"scaling": 1.0}),
        ("sigmoid", {"pivot": 20.0, "exponent": 2.0}),
    ]:
        a = single.rank_feature("def load", "doc_len", k=8, boost=1.5, function=fn, **kw)
        b = sharded.rank_feature("def load", "doc_len", k=8, boost=1.5, function=fn, **kw)
        _eq_tables(b, a)
    # additive semantics: boost=0 degenerates to plain BM25
    _eq_tables(
        single.rank_feature("def load", "doc_len", k=8, boost=0.0, pivot=20.0),
        single.search("def load", k=8),
    )
    with pytest.raises(ValueError):
        single.rank_feature("def load", "doc_len", function="nope")


def test_terms_set_requirement_and_parity(single, sharded):
    """terms_set: per-doc requirement from a stored field filters
    exactly; sharded == single."""
    terms = ["def", "load", "index", "value"]
    a = single.terms_set(terms, "doc_len", k=10, min_offset=1, min_mod=3)
    b = sharded.terms_set(terms, "doc_len", k=10, min_offset=1, min_mod=3)
    _eq_tables(b, a)
    # recompute the requirement by hand for the returned docs
    ids = a["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if ids.size:
        import numpy as _np

        cnt = _np.zeros(ids.size)
        for t in terms:
            m = _np.sort(single.match_ids(t))
            if m.size:
                pos = _np.searchsorted(m, ids).clip(0, m.size - 1)
                cnt += (m[pos] == ids).astype(float)
        need = single.field_values_for(ids, "doc_len") % 3 + 1
        assert (cnt >= need).all()
    # a requirement above len(terms) can never match
    empty = single.terms_set(["def"], "doc_len", k=10, min_offset=99)
    assert empty.num_rows == 0
    with pytest.raises(ValueError):
        single.terms_set([], "doc_len")


def test_pinned_order_exclusion_and_parity(single, sharded):
    """pinned: pins come first in the given order with artificial
    descending scores, organic results never repeat a pin, absent ids
    are dropped, and sharded == single."""
    org = single.search("def load", k=6)["doc_id"].to_pylist()
    pins = [org[3], org[1], 2**60]  # one id that does not exist
    a = single.pinned(pins, "def load", k=6)
    b = sharded.pinned(pins, "def load", k=6)
    _eq_tables(b, a)
    got = a["doc_id"].to_pylist()
    assert got[:2] == [org[3], org[1]]
    sc = a["score"].to_numpy(zero_copy_only=False)
    assert sc[0] > sc[1] > sc[2]  # pin scores strictly above organic
    assert len(set(got)) == len(got)  # exclusion: no pin repeats
    assert a.num_rows == 6


def test_distance_feature_parity_and_semantics(single, sharded):
    """distance_feature: sharded == single bit-for-bit; the addend is
    maximal (== boost) at origin and decays with |v − origin|."""
    a = single.distance_feature("def load", "doc_len", origin=30.0, pivot=10.0, k=8, boost=2.0)
    b = sharded.distance_feature("def load", "doc_len", origin=30.0, pivot=10.0, k=8, boost=2.0)
    _eq_tables(b, a)
    # boost=0 degenerates to plain BM25
    _eq_tables(
        single.distance_feature("def load", "doc_len", origin=30.0, pivot=10.0, k=8, boost=0.0),
        single.search("def load", k=8),
    )
    # recompute the addend by hand for the returned docs
    ids = a["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    base = single.all_scores("def load")
    bmap = dict(
        zip(
            base["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            base["score"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    v = single.field_values_for(ids, "doc_len")
    want = np.array([bmap[i] for i in ids.tolist()]) + 2.0 * (10.0 / (10.0 + np.abs(v - 30.0)))
    np.testing.assert_array_equal(a["score"].to_numpy(zero_copy_only=False), want)
    with pytest.raises(ValueError):
        single.distance_feature("def load", "doc_len", origin=0.0, pivot=0.0)


def test_script_score_parity_and_negative_guard(single, sharded):
    """script_score: callable ships to shards by value, sharded ==
    single; negative script outputs raise (ES contract)."""
    from elasticsearch_assets_ray.query.engine import register_score_script

    @register_score_script("t_half_plus_len")
    def _script(sc, v, params):
        return sc * 0.5 + np.log1p(v) * params["w"]

    a = single.script_score("def load", "doc_len", "t_half_plus_len", k=8, params={"w": 0.2})
    b = sharded.script_score("def load", "doc_len", "t_half_plus_len", k=8, params={"w": 0.2})
    _eq_tables(b, a)
    # script REPLACES the score: w=0 halves plain BM25 exactly
    plain = single.search("def load", k=8)
    half = single.script_score("def load", "doc_len", "t_half_plus_len", k=8, params={"w": 0.0})
    np.testing.assert_array_equal(
        half["score"].to_numpy(zero_copy_only=False),
        plain["score"].to_numpy(zero_copy_only=False) * 0.5,
    )
    with pytest.raises(ValueError):
        single.script_score("def load", "doc_len", lambda sc, v, p: sc - 1e9, k=5)
    with pytest.raises(KeyError):
        single.script_score("def load", "doc_len", "no_such_script", k=5)


def test_script_score_rejects_non_finite(single):
    """NaN/inf script outputs must raise, not flow into rankings (a
    min()-only guard lets NaN through: nan < 0 is False)."""
    with pytest.raises(ValueError, match="non-finite"):
        single.script_score(
            "def load", "doc_len", lambda sc, v, p: sc * np.nan, k=5
        )
    with pytest.raises(ValueError, match="non-finite"):
        single.script_score(
            "def load", "doc_len", lambda sc, v, p: sc + np.inf, k=5
        )


def test_prepared_handle_cache_and_shutdown(built_index):
    """Round-5 scatter path: string point queries hit the prepared-
    handle LRU (ObjectRef args in actor mode) with results identical to
    the uncached path; ParsedQuery inputs bypass the cache (unhashable
    lifecycle); shutdown() releases the actors deterministically."""
    idx, _ = built_index
    single = Searcher(idx)
    sh = ShardedSearcher(idx, n_shards=2, use_actors=True, num_cpus=0.25)
    try:
        a = sh.search("def load index", k=10)
        assert len(sh._prep_cache) == 1
        b = sh.search("def load index", k=10)  # cache hit
        assert len(sh._prep_cache) == 1
        _eq_tables(a, b)
        _eq_tables(a, single.search("def load index", k=10))
        # count shares the handle path AND the same (query, msm, cursor)
        # key as search — one prepared handle serves both verbs
        assert sh.count("def load index") == single.all_scores(
            "def load index"
        ).num_rows
        assert len(sh._prep_cache) == 1
        # a pre-parsed query skips the cache but still answers correctly
        q, _ = sh.prepare("def load index")
        _eq_tables(sh.search(q, k=10), a)
        assert len(sh._prep_cache) == 1
        # LRU eviction stays bounded
        sh._prep_cache_max = 3
        sh.count("index")
        sh.count("def")
        assert len(sh._prep_cache) <= 3
    finally:
        sh.shutdown()
    assert sh.shards == [] and len(sh._prep_cache) == 0
    # idempotent on an already-shut-down searcher
    sh.shutdown()


def test_shutdown_noop_in_process(built_index):
    """In-process mode has no actors to kill — shutdown just clears."""
    idx, _ = built_index
    sh = ShardedSearcher(idx, n_shards=2, use_actors=False)
    sh.search("def load", k=5)
    sh.shutdown()
    assert sh.shards == []
