"""Phrase (positional) query semantics: parser, adjacency filter, rank
identity vs the brute-force oracle, and the engine/oracle agreement on
negated phrases."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.oracle import OracleIndex
from elasticsearch_assets_ray.query.parser import parse_query


def test_parser_phrase_clauses():
    q = parse_query('"table scan" merge')
    assert q.phrases == [("table", "scan")]
    assert set(q.must) == {"table", "scan"}
    assert q.should == ["merge"]

    q = parse_query('-"table scan" merge')
    assert q.not_phrases == [("table", "scan")]
    assert q.must == [] and q.must_not == []

    q = parse_query('+"fooBar baz"')  # analyzer runs inside the phrase
    assert q.phrases == [("foo", "bar", "baz")]

    q = parse_query('"single"')  # 1-term quote degrades to a plain term
    assert q.phrases == [] and q.should == ["single"]


def test_contains_phrase():
    cp = Searcher.contains_phrase
    assert cp(["a", "b", "c"], ("a", "b"))
    assert cp(["a", "b", "c"], ("b", "c"))
    assert not cp(["a", "x", "b"], ("a", "b"))
    assert not cp(["a"], ("a", "b"))
    assert cp(["a", "a", "b"], ("a", "b"))


PHRASE_QUERIES = [
    '"def main" return',
    '+"import os"',
    'return -"def main"',
    '"for i in range"',
    '"zz yy xx qq" fallback',  # phrase that matches nothing
]


@pytest.fixture(scope="module")
def oracle(built_index):
    idx_dir, _ = built_index
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    return OracleIndex(doc, content_col="content", id_col="doc_id")


@pytest.mark.parametrize("query", PHRASE_QUERIES)
def test_phrase_rank_identity(query, oracle, built_index):
    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    oi, osc = oracle.topk(query, 10)
    r = s.search(query, 10)
    assert np.array_equal(r["doc_id"].to_numpy(), oi), query
    assert np.array_equal(r["score"].to_numpy(), osc), query


def test_phrase_filters_non_adjacent(built_index):
    """Docs containing both words non-adjacently are excluded by the
    phrase but included by the bag-of-words query."""
    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    bag = s.all_scores("+def +main")
    phr = s.all_scores('"def main"')
    assert phr.num_rows <= bag.num_rows
    # every phrase hit is a bag hit
    assert set(phr["doc_id"].to_pylist()) <= set(bag["doc_id"].to_pylist())


def test_phrase_needs_content(tmp_path, ray_session, corpus_dir):
    from elasticsearch_assets_ray.index.build import build_index

    out = str(tmp_path / "noc")
    build_index(corpus_dir, out, target_partition_rows=512, store_content=False)
    s = Searcher(out)
    with pytest.raises(RuntimeError, match="store_content"):
        s.search('"def main"', 5)


# ---------------------------------------------------------------------------
# positional postings (index-native phrase verification)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def positional_index(ray_session, corpus_dir, tmp_path_factory):
    from elasticsearch_assets_ray.index.build import build_index

    out = str(tmp_path_factory.mktemp("posidx"))
    build_index(
        corpus_dir,
        out,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=4,
        index_positions=True,
        store_content=False,  # positions ALONE must carry phrase queries
    )
    return out


@pytest.mark.parametrize("query", PHRASE_QUERIES)
def test_positional_phrase_rank_identity(query, oracle, positional_index):
    """Phrase results from positional postings (no content in the
    docstore at all) are bit-identical to the content-based oracle."""
    s = Searcher(positional_index)
    assert s.manifest["index_positions"]
    oi, osc = oracle.topk(query, 10)
    r = s.search(query, 10)
    assert np.array_equal(r["doc_id"].to_numpy(), oi), query
    assert np.array_equal(r["score"].to_numpy(), osc), query


def test_positional_vs_content_paths_agree(built_index, positional_index):
    s_content = Searcher(built_index[0])
    s_pos = Searcher(positional_index)
    for q in ['"def main"', 'return -"def main"', '+"import os" load']:
        a = s_content.search(q, 10)
        b = s_pos.search(q, 10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_positions_roundtrip_small(ray_session, tmp_path):
    """Positions stored per (term, doc) are exactly the token indices."""
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.index.build import IndexConfig, build_index
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    texts = ["a b a c b a", "c c b", "x y z x y"]
    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa_table := __import__("pyarrow").table(
            {
                "repo": ["r"] * 3,
                "path": ["p0", "p1", "p2"],
                "commit": ["c"] * 3,
                "lang": ["t"] * 3,
                "content": texts,
            }
        ),
        src,
    )
    out = str(tmp_path / "idx")
    build_index(src, out, index_positions=True, num_shards=2, runs_per_bucket=2)
    s = Searcher(out)
    seg = s._segment_rows(["a", "b", "x"])
    import numpy as np_

    from elasticsearch_assets_ray.index.codec import decode_positions

    assert s.manifest["positions_codec"] == "varint-delta"
    for i in range(seg.num_rows):
        term = seg["term"][i].as_py()
        d, tf = s._decode_postings(seg["blob"][i].as_py(), int(seg["df"][i].as_py()))
        pos = decode_positions(seg["pos"][i].as_py(), tf)
        off = np_.concatenate(([0], np_.cumsum(tf)))
        for j, doc in enumerate(d):
            toks = tokenize_text(texts[int(doc)])
            expect = [k for k, t in enumerate(toks) if t == term]
            assert pos[off[j] : off[j + 1]].tolist() == expect, (term, doc)


# ---------------------------------------------------------------------------
# prefix (trailing-star) queries
# ---------------------------------------------------------------------------


def test_parser_prefix_clauses():
    q = parse_query("fie* -bar* baz")
    assert q.prefixes == ["fie"] and q.not_prefixes == ["bar"]
    assert q.should == ["baz"]
    # lone '*' and multi-token stems degrade gracefully
    assert parse_query("*").prefixes == []
    q2 = parse_query("fooBar*")
    assert q2.prefixes == [] and q2.should == ["foo", "bar"]


PREFIX_TEST_QUERIES = [
    "def* load",
    "ind* -ret*",
    "zzqq* fallback",  # unmatched prefix scores nothing
    'lo* "def main"',  # prefix + phrase combine
]


@pytest.mark.parametrize("query", PREFIX_TEST_QUERIES)
def test_prefix_rank_identity(query, oracle, built_index):
    s = Searcher(built_index[0])
    oi, osc = oracle.topk(query, 10)
    r = s.search(query, 10)
    assert np.array_equal(r["doc_id"].to_numpy(), oi), query
    assert np.array_equal(r["score"].to_numpy(), osc), query


def test_prefix_expansion_cap(built_index):
    s = Searcher(built_index[0])
    terms = s.expand_prefix("de")
    assert "def" in terms
    with pytest.raises(ValueError, match="expands to more"):
        # empty prefix = the whole vocabulary
        from elasticsearch_assets_ray.query.parser import ParsedQuery

        s.expand_prefix("", max_expansions=10)


def test_phrase_freq_scoring_rank_identity(positional_index, corpus_dir):
    """phrase_scoring='phrase_freq' must match a brute-force oracle that
    scores each phrase as (Σ member idf) × tf_saturation(occurrences)
    plus standalone-term BM25."""
    import glob
    import os

    import numpy as np
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from elasticsearch_assets_ray.query import bm25
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.parser import parse_query
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    idx_dir = positional_index
    s = Searcher(idx_dir, phrase_scoring="phrase_freq")
    # the positional fixture stores no content: join docstore doc_ids to
    # corpus rows by unique path
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["doc_id", "path"]
    )
    src = pq.read_table(
        sorted(glob.glob(os.path.join(corpus_dir, "*.parquet"))),
        columns=["path", "content"],
    )
    content_by_path = dict(zip(src["path"].to_pylist(), src["content"].to_pylist()))
    ids_all = doc["doc_id"].to_numpy(zero_copy_only=False)
    texts = [content_by_path[p] for p in doc["path"].to_pylist()]
    toks = [tokenize_text(t) for t in texts]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    n = len(toks)
    avgdl = dls.sum() / n

    def df(t):
        return sum(1 for tk in toks if t in tk)

    def occurrences(tk, phrase):
        m = len(phrase)
        return sum(
            1 for i in range(len(tk) - m + 1) if tuple(tk[i : i + m]) == phrase
        )

    for qtext, k in [
        ('"load index" parse', 5),
        ('+"def load" config', 10),
        ('"load index"', 7),
        ('load "load index"', 6),  # member queried standalone too: both score
    ]:
        q = parse_query(qtext)
        members = {t for p in q.phrases for t in p}
        # should∩members = standalone TermQuery clauses (scored); the
        # parser-added must∩members are clause-members (filter only)
        standalone = sorted(set(q.should) | (set(q.must) - members))
        exp_ids, exp_scores = [], []
        for j in range(n):
            tk = toks[j]
            occ = [occurrences(tk, p) for p in q.phrases]
            if any(o == 0 for o in occ):
                continue
            sc = 0.0
            for t in standalone:  # sorted order = engine accumulation order
                tf = tk.count(t)
                if tf:
                    sc += bm25.math_idf(df(t), n) * float(
                        bm25.tf_saturation(np.array([float(tf)]), np.array([dls[j]]), avgdl)[0]
                    )
            for pi, p in enumerate(q.phrases):
                idf_sum = sum(bm25.math_idf(df(t), n) for t in p)
                sc = sc + idf_sum * float(
                    bm25.tf_saturation(np.array([float(occ[pi])]), np.array([dls[j]]), avgdl)[0]
                )
            exp_ids.append(int(ids_all[j]))
            exp_scores.append(sc)
        e_ids = np.array(exp_ids, dtype=np.int64)
        e_sc = np.array(exp_scores, dtype=np.float64)
        order = np.lexsort((e_ids, -e_sc))
        e_ids, e_sc = e_ids[order][:k], e_sc[order][:k]
        r = s.search(qtext, k=k)
        assert r["doc_id"].to_pylist() == e_ids.tolist(), qtext
        np.testing.assert_allclose(r["score"].to_numpy(), e_sc, rtol=1e-9)


# ---------------------------------------------------------------------------
# sloppy phrases `"a b"~N` (ordered-window contract)
# ---------------------------------------------------------------------------


def test_sloppy_parser_and_semantics(built_index):
    from elasticsearch_assets_ray.query.parser import parse_query
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    q = parse_query('"def main"~2 return -"for i"~1')
    assert q.sloppy_phrases == [(("def", "main"), 2)]
    assert q.not_sloppy_phrases == [(("for", "i"), 1)]
    assert set(q.must) >= {"def", "main"}
    # round-trip
    q2 = parse_query(q.to_string())
    assert q2.sloppy_phrases == q.sloppy_phrases
    assert q2.not_sloppy_phrases == q.not_sloppy_phrases
    # ~0 is exact adjacency
    q0 = parse_query('"def main"~0')
    assert q0.phrases == [("def", "main")] and not q0.sloppy_phrases

    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    got = set(s.all_scores('"def main"~2')["doc_id"].to_pylist())
    base = s.all_scores("+def +main")
    ids = np.array(sorted(base["doc_id"].to_pylist()), dtype=np.int64)
    h = s.hydrate(ids, columns=["doc_id", "content"])
    want = {
        d
        for d, c in zip(h["doc_id"].to_pylist(), h["content"].to_pylist())
        if Searcher.contains_spec(tokenize_text(c), ("def", "main"), 2)
    }
    assert got == want
    # exact ⊆ slop-2 ⊆ conjunction
    exact = set(s.all_scores('"def main"')["doc_id"].to_pylist())
    assert exact <= got <= set(base["doc_id"].to_pylist())


def test_sloppy_positional_equals_content(positional_index, built_index):
    """The greedy positional chain and the content re-tokenize path
    produce identical result sets and scores."""
    idx_dir, _ = built_index
    sc_ = Searcher(idx_dir)        # content path (no positions)
    sp = Searcher(positional_index)  # positional path (no content)
    for q in [
        '"def main"~2 return',
        '"for i range"~3',           # 3-term chain with a gap ("in" skipped)
        'return -"def main"~4',
        '"main def"~4',              # reversed order: ordered-only contract
    ]:
        a = sc_.all_scores(q)
        b = sp.all_scores(q)
        # docids differ across layouts? same corpus_dir, same partition
        # planner → identical assignment; compare directly
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_contains_spec_reference():
    c = lambda toks, p, n: Searcher.contains_spec(toks, p, n)
    toks = "a x b y c".split()
    assert c(toks, ("a", "b"), 1)
    assert not c(toks, ("a", "b"), 0)
    assert c(toks, ("a", "b", "c"), 2)
    assert not c(toks, ("a", "b", "c"), 1)
    assert not c(toks, ("b", "a"), 4)      # order matters
    assert c("a a b".split(), ("a", "b"), 0)   # later start succeeds
    assert not c(toks, ("a", "z"), 9)


# ---------------------------------------------------------------------------
# phrase-prefix `"quick bro*"` (ES match_phrase_prefix)
# ---------------------------------------------------------------------------


def test_phrase_prefix_parser():
    from elasticsearch_assets_ray.query.parser import parse_query

    q = parse_query('"def lo*" index -"for ra*"')
    assert q.phrase_prefixes == [(("def",), "lo")]
    assert q.not_phrase_prefixes == [(("for",), "ra")]
    assert "def" in q.must
    q2 = parse_query(q.to_string())
    assert q2.phrase_prefixes == q.phrase_prefixes
    assert q2.not_phrase_prefixes == q.not_phrase_prefixes
    # single-word quoted prefix degrades to a plain prefix clause
    assert parse_query('"lo*"').prefixes == ["lo"]
    assert parse_query('+"lo*"').must_prefixes == ["lo"]
    # slop wins over a trailing star (star stripped by the analyzer)
    q = parse_query('"def load*"~2')
    assert q.sloppy_phrases and not q.phrase_prefixes


def test_phrase_prefix_matches_brute_force(built_index, positional_index):
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    for idx in [built_index[0], positional_index]:
        s = Searcher(idx)
        got = set(s.all_scores('"def lo*" return')["doc_id"].to_pylist())
        base = s.all_scores("+def return")
        ids = np.array(sorted(base["doc_id"].to_pylist()), dtype=np.int64)
        if s.manifest.get("store_content"):
            h = s.hydrate(ids, columns=["doc_id", "content"])
            texts = dict(zip(h["doc_id"].to_pylist(), h["content"].to_pylist()))
        else:
            # positional fixture stores no content: join the content
            # index's docstore by doc_id (same corpus, same planner)
            sc_ = Searcher(built_index[0])
            h = sc_.hydrate(ids, columns=["doc_id", "content"])
            texts = dict(zip(h["doc_id"].to_pylist(), h["content"].to_pylist()))
        want = set()
        for d, c in texts.items():
            toks = tokenize_text(c)
            if any(
                toks[i] == "def"
                and i + 1 < len(toks)
                and toks[i + 1].startswith("lo")
                for i in range(len(toks))
            ):
                want.add(d)
        assert got == want, idx
        # unmatched stem → clause matches nothing
        assert s.all_scores('"def zzqq*" return').num_rows == 0


def test_phrase_prefix_pruned_matches_exhaustive(positional_index):
    sp = Searcher(positional_index, prune=True)
    se = Searcher(positional_index, prune=False)
    for q in ['"def lo*" return', 'return -"def lo*"']:
        a, b = sp.search(q, 10), se.search(q, 10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


# ---------------------------------------------------------------------------
# unordered proximity `"a b"~uN` (span_near in_order=false extension)
# ---------------------------------------------------------------------------


def test_unordered_parser_and_semantics(built_index):
    from elasticsearch_assets_ray.query.parser import (
        encode_unordered_slop,
        parse_query,
    )
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    q = parse_query('"def main"~u1 return -"i for"~u0')
    assert q.sloppy_phrases == [(("def", "main"), encode_unordered_slop(1))]
    assert q.not_sloppy_phrases == [(("i", "for"), encode_unordered_slop(0))]
    assert set(q.must) >= {"def", "main"}
    q2 = parse_query(q.to_string())
    assert q2.sloppy_phrases == q.sloppy_phrases
    assert q2.not_sloppy_phrases == q.not_sloppy_phrases

    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    spec = (("main", "def"), encode_unordered_slop(1))
    got = set(s.all_scores('"main def"~u1')["doc_id"].to_pylist())
    base = s.all_scores("+def +main")
    ids = np.array(sorted(base["doc_id"].to_pylist()), dtype=np.int64)
    h = s.hydrate(ids, columns=["doc_id", "content"])
    want = {
        d
        for d, c in zip(h["doc_id"].to_pylist(), h["content"].to_pylist())
        if Searcher.contains_spec(tokenize_text(c), *spec)
    }
    assert got == want
    # ordered ~N ⊆ unordered ~uN at the same N (identical span bound,
    # relaxed order), both ⊆ the bag-of-words conjunction
    ordered = set(s.all_scores('"def main"~1')["doc_id"].to_pylist())
    assert ordered <= set(
        s.all_scores('"def main"~u1')["doc_id"].to_pylist()
    ) <= set(base["doc_id"].to_pylist())


def test_unordered_positional_equals_content(positional_index, built_index):
    """The vectorized unordered window kernel over positional postings and
    the content re-tokenize path produce identical results and scores."""
    sc_ = Searcher(built_index[0])   # content path (no positions)
    sp = Searcher(positional_index)  # positional path (no content)
    for q in [
        '"main def"~u2 return',
        '"range i for"~u2',          # 3 terms, any order
        'return -"main def"~u1',
        '"def def"~u3',              # duplicate term: needs 2 distinct positions
        '"import import"~u0',
    ]:
        a = sc_.all_scores(q)
        b = sp.all_scores(q)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


@pytest.mark.parametrize(
    "query",
    ['"main def"~u1', '"os import"~u0 load', 'return -"def main"~u2'],
)
def test_unordered_rank_identity(query, oracle, built_index, positional_index):
    oi, osc = oracle.topk(query, 10)
    for idx in (built_index[0], positional_index):
        r = Searcher(idx).search(query, 10)
        assert np.array_equal(r["doc_id"].to_numpy(), oi), (query, idx)
        assert np.array_equal(r["score"].to_numpy(), osc), (query, idx)


def test_contains_spec_unordered_reference():
    from elasticsearch_assets_ray.query.parser import encode_unordered_slop as u

    c = Searcher.contains_spec
    toks = "the quick brown fox".split()
    assert c(toks, ("brown", "quick"), u(0))       # reversed pair, adjacent
    assert not c(toks, ("fox", "the"), u(0))       # width 4 > 2
    assert c(toks, ("fox", "the"), u(2))
    toks2 = "a the b the c".split()
    assert not c(toks2, ("the", "the"), u(0))      # distinct positions 1,3
    assert c(toks2, ("the", "the"), u(1))
    toks3 = "x c a b y".split()
    assert c(toks3, ("a", "b", "c"), u(0))         # anagram window
    assert c(toks3, ("a", "b", "y"), u(0))         # span 2..4, width 3
    assert not c(toks3, ("a", "b", "x"), u(0))     # width 4 > 3
    assert not c(toks3, ("a", "b", "z"), u(9))     # missing term
