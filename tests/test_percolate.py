"""Percolator (ES reverse search): brute-force parity over every doc ×
query, semantics edges (must-only match, msm, phrases, filters,
negation), registration validation, and the candidate-pruning contract."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from elasticsearch_assets_ray.stages.percolate import (
    PercolateStage,
    compile_queries,
    percolate,
)
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

DOCS = [
    (0, "spark table scan merge", "en"),
    (1, "table scan only here", "fr"),
    (2, "spark without the other word", "en"),
    (3, "merge join batch vector", "en"),
    (4, "key value row stream", "de"),
    (5, "key value stream", "en"),
    (6, "scan table reversed order", "en"),
    (7, "", "en"),
]

QS = {
    "any_spark_table": "spark table",
    "must_both": "+spark +table",
    "phrase": '"table scan"',
    "neg": "batch -vector",
    "msm2": "key value row",
    "filtered": "stream lang:en",
    "notphrase": 'key -"key value"',
}


def _table():
    return pa.table(
        {
            "doc_id": pa.array([d for d, _t, _l in DOCS], pa.int64()),
            "text": pa.array([t for _d, t, _l in DOCS]),
            "lang": pa.array([l for _d, _t, l in DOCS]),
        }
    )


def _brute(doc_text: str, lang: str, name: str) -> bool:
    ts = tokenize_text(doc_text)
    s = set(ts)
    joined = " " + " ".join(ts) + " "
    if name == "any_spark_table":
        return bool({"spark", "table"} & s)
    if name == "must_both":
        return "spark" in s and "table" in s
    if name == "phrase":
        return " table scan " in joined
    if name == "neg":
        return "batch" in s and "vector" not in s
    if name == "msm2":
        return bool({"key", "value", "row"} & s)
    if name == "filtered":
        return "stream" in s and lang == "en"
    if name == "notphrase":
        return "key" in s and " key value " not in joined
    raise AssertionError(name)


def test_percolate_brute_force_parity(ray_session):
    ds = ray.data.from_arrow(_table()).repartition(3)
    out = percolate(ds, QS)
    got = sorted(
        zip(
            *[
                pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))[c].to_pylist()
                for c in ("doc_id", "query_name")
            ]
        )
    )
    want = sorted(
        (d, nm) for d, t, l in DOCS for nm in QS if _brute(t, l, nm)
    )
    assert got == want
    # sanity on the edges the set was designed for
    assert (6, "phrase") not in got  # "scan table" is not "table scan"
    assert (3, "neg") not in got  # vector present
    assert (4, "filtered") not in got  # lang=de
    assert (5, "notphrase") not in got  # contains the negated phrase
    assert (4, "notphrase") not in got
    assert (2, "must_both") not in got


def test_percolate_msm(ray_session):
    st = PercolateStage(queries={"m": "key value row"})
    # msm applies through parse → spec; emulate via a query with msm by
    # compiling then overriding (the engine's msm is a request param)
    prog = compile_queries({"m": "key value row"})
    prog["specs"][0]["msm"] = 2
    st.prog = prog
    t = st(_table())
    got = set(t["doc_id"].to_pylist())
    assert got == {4, 5}  # need >= 2 of {key, value, row}


def test_percolate_registration_validation():
    with pytest.raises(ValueError, match="no positive term"):
        compile_queries({"bad": "-only -negative"})
    with pytest.raises(ValueError, match="only terms"):
        compile_queries({"bad": "pre* fix"})
    with pytest.raises(ValueError, match="only terms"):
        compile_queries({"bad": "a AND (b OR c)"})


def test_percolate_candidate_pruning():
    """Docs sharing no relevant term produce no candidate work — the
    term->query index is the percolator's scale contract."""
    prog = compile_queries({"q": "+needle haystack"})
    st = PercolateStage(program_ref=None, queries={"q": "+needle haystack"})
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["nothing shared here", "the needle is here"]),
        }
    )
    out = st(t)
    assert out["doc_id"].to_pylist() == [2]
    # trigger terms are the MUST terms only (fewer candidates)
    assert list(prog["term_to_q"]) == ["needle"]


def test_filters_agg_zero_count_bucket_and_sql(ray_session, built_index):
    """ES filters agg emits EVERY named bucket, count 0 included; the
    SQL oracle generator left-joins the name list to match."""
    import duckdb

    from elasticsearch_assets_ray.pipelines.registry import _filters_agg_sql
    from elasticsearch_assets_ray.query.engine import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    t = s.filters_agg({"hit": "def", "miss": "qqqqzzzz"})
    got = dict(zip(t["value"].to_pylist(), t["count"].to_pylist()))
    assert got["miss"] == 0 and got["hit"] > 0
    # oracle shape: zero-count name still yields a row
    sql = _filters_agg_sql({"hit": "spark", "miss": "qqqqzzzz"})
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    rows = dict(con.sql(sql).fetchall())
    assert rows["miss"] == 0 and rows["hit"] > 0


def test_mixture_sql_default_only():
    from elasticsearch_assets_ray.pipelines.oracles_hard import mixture_sample_sql

    sql = mixture_sample_sql({}, key_col="lang", default_epochs=2.0)
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    out = con.sql(sql).df()
    assert len(out) == 2 * n_docs  # every doc exactly 2 epochs


def test_percolate_many_queries_scale(ray_session):
    """The trigger-index contract at a larger registry: 120 queries over
    300 docs, exact vs brute force."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=12)), "en") for i in range(300)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _t, _l in docs], pa.int64()),
            "text": pa.array([x for _d, x, _l in docs]),
        }
    )
    qs = {}
    for i in range(120):
        a, b = rng.choice(vocab, size=2, replace=False)
        kind = i % 3
        if kind == 0:
            qs[f"q{i:03d}"] = f"{a} {b}"
        elif kind == 1:
            qs[f"q{i:03d}"] = f"+{a} {b}"
        else:
            qs[f"q{i:03d}"] = f"{a} -{b}"
    st = PercolateStage(queries=qs)
    out = st(t)
    got = set(zip(out["doc_id"].to_pylist(), out["query_name"].to_pylist()))
    want = set()
    for d, text, _l in docs:
        s = set(tokenize_text(text))
        for name, q in qs.items():
            parts = q.split()
            if q.startswith("+"):
                a, b = parts[0][1:], parts[1]
                ok = a in s
            elif "-" in q:
                a, b = parts[0], parts[1][1:]
                ok = a in s and b not in s
            else:
                a, b = parts
                ok = a in s or b in s
            if ok:
                want.add((d, name))
    assert got == want
