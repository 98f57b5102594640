"""Analysis chain (stages/analysis.py): token filters at build + query
time — the ES analyzer contract (index terms and query terms always
agree)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.oracle import OracleIndex
from elasticsearch_assets_ray.query.parser import parse_query
from elasticsearch_assets_ray.stages.analysis import (
    LUCENE_ENGLISH_STOPWORDS,
    AnalyzerSpec,
    analyze_parsed,
    asciifold,
    s_stem,
)
from elasticsearch_assets_ray.stages.tokenizer import (
    analyze,
    doc_term_freqs,
    tokenize_text,
)

SPEC = AnalyzerSpec(filters=("stop", "s_stem"))


def test_s_stem_rules():
    # rule 1: ies → y (unless eies/aies)
    assert s_stem("queries") == "query"
    assert s_stem("ties") == "ty"  # weak stemmer by design
    assert s_stem("movies") == "movy"
    assert s_stem("ies") == "y"
    # rule 2: -es drops the s (unless aes/ees/oes)
    assert s_stem("batches") == "batche"
    assert s_stem("tables") == "table"  # falls to rule 2 ('les' ends es)
    assert s_stem("trees") == "trees"  # ees guard
    assert s_stem("toes") == "toes"  # oes guard
    # rule 3: -s drops (unless us/ss)
    assert s_stem("columns") == "column"
    assert s_stem("status") == "status"  # us guard
    assert s_stem("class") == "class"  # ss guard
    assert s_stem("s") == ""  # caller drops empties
    assert s_stem("merge") == "merge"  # no suffix → unchanged


def test_asciifold():
    assert asciifold("café") == "cafe"
    assert asciifold("übermaß") == "ubermaß".replace("ß", "")  # ß is not decomposable → dropped
    assert asciifold("naïve") == "naive"
    assert asciifold("Ωmega") == "mega"  # non-decomposable non-ASCII dropped


def test_apply_token_chain_order():
    # stop runs on the PRE-stem surface form when it comes first
    assert SPEC.apply_token("the") is None
    assert SPEC.apply_token("queries") == "query"
    # stem-after-stop: "thes" is not a stopword, stems to "the" and stays
    assert SPEC.apply_token("thes") == "the"
    # stop AFTER stem: "thes" stems to "the" which then drops
    spec2 = AnalyzerSpec(filters=("s_stem", "stop"))
    assert spec2.apply_token("thes") is None
    with pytest.raises(ValueError):
        AnalyzerSpec(filters=("porter",))


def test_tokenize_text_and_vectorized_parity():
    texts = [
        "the fast queries run on tables and batches",
        "getHTTPResponses of the CamelCases",
        "a an and are as at be s ss us",
        "",
        "merge join scan",
    ]
    col = pa.array(texts, pa.string())
    tb = doc_term_freqs(col, with_positions=True, analyzer=SPEC)
    for i, text in enumerate(texts):
        want = tokenize_text(text, SPEC)
        # doc_len = kept tokens
        assert tb.doc_len[i] == len(want)
        got = {}
        for j in np.flatnonzero(tb.doc_idx == i):
            got[str(tb.terms[j])] = int(tb.tfs[j])
        exp = {}
        for t in want:
            exp[t] = exp.get(t, 0) + 1
        assert got == exp
    # positions are dense over kept tokens
    i = 0  # "the fast queries run on tables and batches"
    want = tokenize_text(texts[0], SPEC)
    pair_rows = np.flatnonzero(tb.doc_idx == i)
    pos = sorted(
        int(p)
        for j in pair_rows
        for p in tb.pos_flat[tb.pos_off[j] : tb.pos_off[j + 1]]
    )
    assert pos == list(range(len(want)))


def test_analyze_api_with_filters():
    t = analyze("the Tables of batches", analyzer=SPEC)
    assert t["token"].to_pylist() == ["table", "batche"]
    assert t["position"].to_pylist() == [0, 1]
    # offsets point at the ORIGINAL surface forms
    assert t["start_offset"].to_pylist() == [4, 14]
    assert t["end_offset"].to_pylist() == [10, 21]


def test_analyze_parsed_flat():
    q = analyze_parsed(parse_query("the tables merge"), SPEC)
    assert q.should == ["table", "merge"]
    # phrase: stopwords drop, terms stem, kept-token adjacency
    q = analyze_parsed(parse_query('+"the fast tables"'), SPEC)
    assert q.phrases == [("fast", "table")]
    # phrase shrunk to one term degrades to a plain must term
    q = analyze_parsed(parse_query('+"the tables"'), SPEC)
    assert q.phrases == [] and q.must == ["table"]
    # phrase-prefix: complete terms analyze, the stem stays raw
    q = analyze_parsed(parse_query('"the tables bro*"'), SPEC)
    assert q.phrase_prefixes == [(("table",), "bro")]
    # dictionary clauses untouched
    q = analyze_parsed(parse_query("tabl* merge~1 /quer.*/"), SPEC)
    assert q.prefixes == ["tabl"] and q.fuzzies == [("merge", 1)]
    assert q.regexps == ["quer.*"]


def test_analyze_parsed_tree():
    q = analyze_parsed(parse_query("(tables OR queries) AND merge"), SPEC)
    assert q.bool_tree == (
        "and",
        [("or", [("term", "table"), ("term", "query")]), ("term", "merge")],
    )
    # a stopword leaf vanishes like an analyzed-to-nothing token
    q = analyze_parsed(parse_query("(the OR tables) AND merge"), SPEC)
    assert q.bool_tree == ("and", [("term", "table"), ("term", "merge")])
    # tree analyzed to nothing → loud error
    with pytest.raises(ValueError):
        analyze_parsed(parse_query("the AND a"), SPEC)


@pytest.fixture(scope="module")
def analyzed_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("anacorp")
    n = 240
    rows = []
    for i in range(n):
        words = ["merge", "scan"]
        # half the docs use plural surface forms — an unanalyzed index
        # would split these into distinct terms
        words.append("tables" if i % 2 else "table")
        words.append("queries" if i % 3 == 0 else "query")
        if i % 4 == 0:
            words.append("the")
        words.append(f"w{i % 13}")
        rows.append(" ".join(words))
    t = pa.table(
        {
            "repo": pa.array([f"r{i % 5}" for i in range(n)]),
            "path": pa.array([f"p/{i}.py" for i in range(n)]),
            "commit": pa.array(["c0"] * n),
            "lang": pa.array(["python"] * n),
            "content": pa.array(rows),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"))
    return str(d), t


@pytest.fixture(scope="module")
def analyzed_index(ray_session, analyzed_corpus, tmp_path_factory):
    from elasticsearch_assets_ray.index.build import build_index

    src, _ = analyzed_corpus
    out = str(tmp_path_factory.mktemp("anaidx"))
    build_index(
        src,
        out,
        target_partition_rows=64,
        num_shards=4,
        index_positions=True,
        analyzer=SPEC.to_dict(),
    )
    return out


def test_analyzed_index_conflates_and_stops(analyzed_index, analyzed_corpus):
    s = Searcher(analyzed_index)
    assert s.analyzer == SPEC
    # "tables" and "table" conflate: every doc matches the stemmed term
    r = s.search("tables", k=500)
    assert r.num_rows == 240
    # the index has no stopword terms at all
    assert s.term_dfs(["the"]).get("the", 0) == 0
    # a stopword-only query → no terms → empty result
    assert s.search("the", k=10).num_rows == 0
    # doc_len counts post-filter tokens: doc 0 = table query merge scan w0
    import os

    import pyarrow.dataset as pads

    doc = pads.dataset(os.path.join(analyzed_index, "docstore")).to_table(
        columns=["doc_id", "doc_len"]
    )
    assert doc.sort_by("doc_id")["doc_len"][0].as_py() == 5


def test_analyzed_rank_identity_vs_oracle(analyzed_index, analyzed_corpus):
    """End-to-end: engine on the analyzed index ≡ brute-force oracle
    with the same analyzer, scores bit-identical."""
    _, t = analyzed_corpus
    ot = pa.table(
        {
            "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
            "content": t["content"],
        }
    )
    oracle = OracleIndex(ot, analyzer=SPEC)
    s = Searcher(analyzed_index)
    for q in [
        "the tables merge",
        "queries w3",
        '+"the fast tables" scan',  # no 'fast' adjacency in corpus → filters
        '+"tables queries"',  # kept-token adjacency across surface forms
        "+tables -w5",
        "tabl* scan",
    ]:
        got = s.search(q, k=12)
        ids, scores = oracle.topk(q, k=12)
        assert got["doc_id"].to_pylist() == ids.tolist(), q
        np.testing.assert_allclose(
            got["score"].to_numpy(), scores, rtol=0, atol=1e-9, err_msg=q
        )
    # boolean trees: a query STRING analyzes exactly like handing the
    # engine pre-analyzed terms (the oracle scorer has no tree support)
    got = s.search("(tables OR w5) AND merge", k=12)
    want = s.search("(table OR w5) AND merge", k=12)
    assert got.equals(want)


def test_analyzer_resume_invalidation(analyzed_corpus, tmp_path_factory):
    """Rebuilding into the same dir with a DIFFERENT analyzer must not
    reuse stale partitions (the same rows tokenize differently)."""
    from elasticsearch_assets_ray.index.build import build_index

    src, _ = analyzed_corpus
    out = str(tmp_path_factory.mktemp("anaidx2"))
    build_index(src, out, target_partition_rows=128, num_shards=2)
    s = Searcher(out)
    assert s.term_dfs(["tables"]).get("tables", 0) > 0  # unanalyzed
    build_index(
        src, out, target_partition_rows=128, num_shards=2,
        analyzer=SPEC.to_dict(), resume=True,
    )
    s2 = Searcher(out)
    assert s2.term_dfs(["tables"]).get("tables", 0) == 0
    assert s2.term_dfs(["table"]).get("table", 0) > 0


def test_sql_twin_matches_python():
    """The DuckDB CASE expression is the exact chain (the oracle-gate
    contract)."""
    import duckdb

    words = [
        "queries", "eies", "aies", "ties", "batches", "tables", "trees",
        "toes", "aes", "columns", "status", "class", "s", "merge", "the",
        "a", "thes", "us", "ss", "ies", "es",
    ]
    con = duckdb.connect()
    rel = con.sql(
        "SELECT t AS raw, "
        + SPEC.sql_term_expr("t")
        + " AS stemmed, "
        + SPEC.sql_keep_expr("t")
        + " AS kept FROM (SELECT unnest(?) AS t)",
        params=[words],
    )
    for raw, stemmed, kept in rel.fetchall():
        want = SPEC.apply_token(raw)
        if want is None:
            assert not kept, raw
        else:
            assert kept and stemmed == want, raw
