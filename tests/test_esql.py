"""ES|QL pipe language (query/esql.py)."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query.esql import (
    ESQLSyntaxError,
    Evaluator,
    _Parser,
    esql,
)


def _ev(expr: str, batch: pa.Table):
    p = _Parser(f"ROW x = 1 | WHERE {expr}")
    cmds = p.parse()
    node = cmds[1].e
    out = Evaluator().ev(node, batch)
    if isinstance(out, (pa.Array, pa.ChunkedArray)):
        return out.to_pylist()
    if isinstance(out, pa.Scalar):
        return out.as_py()
    return out


_B = pa.table(
    {
        "a": pa.array([1, 2, 3, None], pa.int64()),
        "f": pa.array([1.5, -2.5, 0.25, 4.0], pa.float64()),
        "s": pa.array(["Spark", "ray data", "", None], pa.string()),
        "ts": pa.array(
            np.array(
                ["2024-01-01T10:30:00", "2024-02-15T00:00:00",
                 "2024-02-15T23:59:59", "2024-03-01T00:00:01"],
                dtype="datetime64[us]",
            )
        ),
    }
)


def test_arith_and_comparisons():
    assert _ev("a + 1", _B) == [2, 3, 4, None]
    assert _ev("a * 2 - 1", _B) == [1, 3, 5, None]
    assert _ev("7 / 2", _B) == 3  # integer division truncates (ES|QL)
    assert _ev("7.0 / 2", _B) == 3.5
    assert _ev("a % 2", _B) == [1, 0, 1, None]
    assert _ev("a >= 2", _B) == [False, True, True, None]
    assert _ev("a == 2 OR a == 3", _B) == [False, True, True, None]
    assert _ev("NOT (a == 2)", _B) == [True, False, True, None]
    assert _ev("a IN (1, 3)", _B) == [True, False, True, False]
    assert _ev("a IS NULL", _B) == [False, False, False, True]
    assert _ev("a IS NOT NULL", _B) == [True, True, True, False]


def test_string_functions():
    assert _ev('TO_LOWER(s) LIKE "spa*"', _B) == [True, False, False, None]
    assert _ev('s RLIKE "[a-z]+ [a-z]+"', _B) == [False, True, False, None]
    assert _ev("LENGTH(s)", _B) == [5, 8, 0, None]
    assert _ev('SUBSTRING(s, 2, 3)', _B) == ["par", "ay ", "", None]
    assert _ev('CONCAT(s, "!")', _B) == ["Spark!", "ray data!", "!", None]
    assert _ev('STARTS_WITH(s, "ray")', _B) == [False, True, False, None]
    assert _ev('LOCATE(s, "a")', _B) == [3, 2, 0, None]
    assert _ev('REPLACE(s, "[aeiou]", "_")', _B) == [
        "Sp_rk", "r_y d_t_", "", None,
    ]


def test_round_is_half_away_and_case():
    t = pa.table({"x": pa.array([0.5, 1.5, -0.5, 2.345], pa.float64())})
    assert _ev("ROUND(x)", t) == [1.0, 2.0, -1.0, 2.0]
    assert _ev("ROUND(x, 2)", t) == [0.5, 1.5, -0.5, 2.35]
    assert _ev('CASE(x > 1.0, "big", x > 0.0, "small", "neg")', t) == [
        "small", "big", "neg", "big",
    ]
    assert _ev("TO_LONG(x)", t) == [0, 1, 0, 2]  # truncation toward zero


def test_date_functions():
    assert _ev('DATE_TRUNC("day", ts) == TO_DATETIME("2024-02-15")', _B) == [
        False, True, True, False,
    ]
    assert _ev("DATE_EXTRACT(\"month\", ts)", _B) == [1, 2, 2, 3]
    assert _ev('DATE_FORMAT("%Y-%m-%d", ts)', _B)[0] == "2024-01-01"
    assert _ev('DATE_DIFF("day", TO_DATETIME("2024-01-01"), ts)', _B) == [
        0, 45, 45, 60,
    ]


def test_match_or_and():
    t = pa.table(
        {"text": pa.array(["spark join table", "merge join", "spark scan", ""])}
    )
    assert _ev('MATCH(text, "spark join")', t) == [True, True, True, False]
    assert _ev('MATCH(text, "spark join", "and")', t) == [
        True, False, False, False,
    ]


def test_dissect_grok_mv_expand(ray_session):
    import ray

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "log": pa.array(
                ["a=5 b=xy", "a=12 b=q", "garbage"], pa.string()
            ),
            "tags": pa.array([["r", "s"], [], None], pa.list_(pa.string())),
        }
    )
    ds = ray.data.from_arrow(t)
    out = esql(
        'FROM t | GROK log "a=%{INT:a:int} b=%{WORD:b}" | KEEP id, a, b',
        {"t": ds},
    ).to_pandas()
    assert out["a"].tolist()[:2] == [5, 12] and np.isnan(out["a"][2])
    assert out["b"].tolist()[:2] == ["xy", "q"]
    out2 = esql(
        'FROM t | DISSECT log "a=%{av} b=%{bv}" | KEEP id, av, bv',
        {"t": ds},
    ).to_pandas()
    assert out2["av"].tolist()[:2] == ["5", "12"] and out2["bv"][1] == "q"
    # MV_EXPAND: per-element rows; empty/null lists keep ONE null row
    out3 = esql("FROM t | MV_EXPAND tags | KEEP id, tags", {"t": ds}).to_pandas()
    assert out3["id"].tolist() == [1, 1, 2, 3]
    assert out3["tags"].tolist() == ["r", "s", None, None]


def test_fork_union_and_alignment(ray_session):
    import ray

    t = pa.table(
        {"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array(["x", "y", "z"])}
    )
    ds = ray.data.from_arrow(t)
    out = esql(
        "FROM t | FORK ( WHERE a >= 2 ) ( WHERE b == \"x\" ) | SORT _fork, a",
        {"t": ds},
    ).to_pandas()
    assert out["_fork"].tolist() == ["fork1", "fork1", "fork2"]
    assert out["a"].tolist() == [2, 3, 1]
    # mismatched branch columns are rejected (documented v1 divergence)
    with pytest.raises(ESQLSyntaxError, match="same columns"):
        esql(
            "FROM t | FORK ( KEEP a ) ( KEEP b )",
            {"t": ds},
        )


def test_enrich_sample_change_point(ray_session, sf_dir, tables):
    # ENRICH: policy lookup appends the requested fields (left join)
    got = _run(
        """FROM orders
| ENRICH cust ON o_custkey WITH c_mktsegment
| STATS n = COUNT(*) BY c_mktsegment
| SORT c_mktsegment""",
        tables,
        enrich_policies={
            "cust": {
                "table": f"{sf_dir}/customer.parquet",
                "match_field": "c_custkey",
                "enrich_fields": ["c_mktsegment", "c_name"],
            }
        },
    )
    assert len(got) == 5 and got["n"].sum() > 0
    with pytest.raises(ESQLSyntaxError, match="unknown enrich policy"):
        _run("FROM orders | ENRICH nope ON o_custkey", tables)
    # SAMPLE: deterministic, repeatable, roughly p-sized
    s1 = _run("FROM documents | SAMPLE 0.25 ON doc_id SEED 7 | KEEP doc_id", tables)
    s2 = _run("FROM documents | SAMPLE 0.25 ON doc_id SEED 7 | KEEP doc_id", tables)
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    full = _run("FROM documents | STATS n = COUNT(*)", tables)
    frac = len(s1) / int(full["n"][0])
    assert 0.15 < frac < 0.35
    s3 = _run("FROM documents | SAMPLE 0.25 ON doc_id SEED 8 | KEEP doc_id", tables)
    assert sorted(s1["doc_id"]) != sorted(s3["doc_id"])
    # CHANGE_POINT: a planted step in a ROW-less series via events
    import ray

    t = pa.table(
        {
            "k": pa.array(list(range(12)), pa.int64()),
            "v": pa.array([10] * 6 + [100] * 6, pa.int64()),
        }
    )
    cp = _run("FROM t | CHANGE_POINT v ON k", {"t": ray.data.from_arrow(t)})
    marked = cp[cp["cp_type"].notna()]
    assert len(marked) == 1 and int(marked["k"].iloc[0]) == 6


def test_stddev_wavg_values_top(ray_session, sf_dir, tables):
    import duckdb

    got = _run(
        """FROM events
| WHERE value IS NOT NULL
| STATS sd = STD_DEV(user_id), wa = WEIGHTED_AVG(user_id, event_id), vs = VALUES(event_type), tp = TOP(user_id, 3, "desc") BY event_type
| SORT event_type""",
        tables,
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.sql(
        "SELECT event_type, "
        "sqrt(greatest((CAST(sum(user_id*user_id) AS DOUBLE) - "
        " (CAST(sum(user_id) AS DOUBLE)*CAST(sum(user_id) AS DOUBLE))/"
        " CAST(count(user_id) AS DOUBLE))/CAST(count(user_id) AS DOUBLE), 0)) AS sd, "
        "CAST(sum(user_id*event_id) AS DOUBLE)/CAST(sum(event_id) AS DOUBLE) AS wa, "
        "(list_sort(list(DISTINCT user_id), 'DESC'))[1:3] AS tp "
        "FROM events WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type"
    ).df()
    np.testing.assert_array_equal(got["sd"].to_numpy(), want["sd"].to_numpy())
    np.testing.assert_array_equal(got["wa"].to_numpy(), want["wa"].to_numpy())
    # VALUES = sorted distinct multivalue (here the group key itself)
    assert got["vs"].tolist() == [[t] for t in got["event_type"]]
    # TOP keeps multiplicity: every element ≥ the distinct-top cutoff
    for lst, dt in zip(got["tp"], want["tp"]):
        assert len(lst) == 3 and all(v >= min(dt) for v in lst)


def test_match_pushdown_parity(ray_session, sf_dir, tables):
    from elasticsearch_assets_ray.pipelines.registry import documents_index

    idx = {"documents": {"dir": documents_index(sf_dir), "field": "text", "key": "doc_id"}}
    q = """FROM documents
| WHERE MATCH(text, "spark join", "and") AND lang != "de"
| STATS n = COUNT(*) BY lang, source
| SORT lang, source"""
    scan = _run(q, tables)
    pushed = _run(q, tables, indexes=idx)
    assert scan.equals(pushed)
    # OR-operator MATCH takes the pushdown too
    q2 = 'FROM documents | WHERE MATCH(text, "spark join") | STATS n = COUNT(*)'
    assert int(_run(q2, tables, indexes=idx)["n"][0]) == int(_run(q2, tables)["n"][0])


def test_review_fixes_sort_prune_nullkeys_pushdown(ray_session, sf_dir, tables):
    import ray

    from elasticsearch_assets_ray.pipelines.registry import documents_index

    # (1) mid-pipe SORT must not truncate to the implicit limit
    n = 2500
    t = pa.table(
        {
            "x": pa.array(list(range(n)), pa.int64()),
            "y": pa.array([i % 2 for i in range(n)], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = esql("FROM t | SORT x DESC | WHERE y == 1 | STATS c = COUNT(*)", {"t": ds}).to_pandas()
    assert int(out["c"][0]) == n // 2  # a mid-pipe top-1000 would give 500
    # (2) unbounded output keeps ALL table columns under a parquet FROM
    full = _run("FROM documents | WHERE lang == \"en\" | LIMIT 3", tables)
    import pyarrow.parquet as pq

    assert set(full.columns) == set(pq.read_schema(f"{sf_dir}/documents.parquet").names)
    # (3) STATS BY a null-bearing key: branch aggregates land on the
    # null bucket (a SQL join would never match it)
    t2 = pa.table(
        {
            "k": pa.array(["a", "a", None, None], pa.string()),
            "v": pa.array([1, 3, 10, 30], pa.int64()),
            "u": pa.array([7, 8, 9, 9], pa.int64()),
        }
    )
    st = esql(
        "FROM t | STATS d = COUNT_DISTINCT(u), m = MEDIAN(v) BY k | SORT k",
        {"t": ray.data.from_arrow(t2)},
    ).to_pandas()
    nullrow = st[st["k"].isna()].iloc[0]
    assert int(nullrow["d"]) == 1 and float(nullrow["m"]) == 20.0
    # (4) an EVAL reassigning the indexed field stops MATCH pushdown —
    # both paths agree on the REWRITTEN text
    idx = {"documents": {"dir": documents_index(sf_dir), "field": "text", "key": "doc_id"}}
    q = """FROM documents
| EVAL text = CONCAT(text, " zzyzzx")
| WHERE MATCH(text, "zzyzzx")
| STATS c = COUNT(*)"""
    a = int(_run(q, tables)["c"][0])
    b = int(_run(q, tables, indexes=idx)["c"][0])
    assert a == b > 0  # pushdown would return 0 (index has no zzyzzx)


def test_mv_functions_and_inlinestats(ray_session):
    import ray

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "g": pa.array(["a", "a", "b", "b"], pa.string()),
            "v": pa.array([10, 30, 5, None], pa.int64()),
            "lst": pa.array(
                [[3, 1, 2], [], None, [7]], pa.list_(pa.int64())
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    out = esql(
        "FROM t | EVAL c = MV_COUNT(lst), s = MV_SUM(lst), mn = MV_MIN(lst), "
        'mx = MV_MAX(lst), av = MV_AVG(lst), f = MV_FIRST(lst), l = MV_LAST(lst), '
        'j = MV_JOIN(lst, "-") | KEEP id, c, s, mn, mx, av, f, l, j | SORT id',
        {"t": ds},
    ).to_pandas()
    assert out["c"].tolist()[0] == 3 and all(np.isnan(x) for x in out["c"][1:3])
    assert out["s"].tolist()[0] == 6 and out["s"].tolist()[3] == 7
    assert out["mn"][0] == 1 and out["mx"][0] == 3 and out["av"][0] == 2.0
    assert out["f"][0] == 3 and out["l"][0] == 2
    assert out["j"][0] == "3-1-2" and out["j"][3] == "7"
    # INLINESTATS: per-group aggregates joined back without collapsing
    st = esql(
        "FROM t | INLINESTATS gs = SUM(v), gn = COUNT(v) BY g | SORT id "
        "| KEEP id, g, v, gs, gn",
        {"t": ds},
    ).to_pandas()
    assert len(st) == 4
    assert st["gs"].tolist() == [40, 40, 5, 5]
    assert st["gn"].tolist() == [2, 2, 1, 1]
    # global INLINESTATS appends constants
    g = esql(
        "FROM t | INLINESTATS tot = SUM(v) | KEEP id, tot | SORT id",
        {"t": ds},
    ).to_pandas()
    assert g["tot"].tolist() == [45, 45, 45, 45]


def test_keep_drop_wildcards(ray_session, tables):
    got = _run("FROM lineitem | KEEP l_orderkey, l_l* | LIMIT 3", tables)
    assert got.columns.tolist() == [
        "l_orderkey", "l_linenumber", "l_linestatus",
    ]
    d = _run("FROM lineitem | DROP l_s*, l_p*, l_c* | LIMIT 3", tables)
    assert "l_suppkey" not in d.columns and "l_shipdate" not in d.columns
    assert "l_orderkey" in d.columns
    star = _run("FROM region | KEEP * | LIMIT 2", tables)
    assert star.columns.tolist() == ["r_regionkey", "r_name"]
    # `a * 2` is still multiplication (adjacency rule)
    m = _run("FROM region | EVAL x = r_regionkey * 2 | KEEP r_regionkey, x | SORT r_regionkey", tables)
    assert m["x"].tolist() == [2 * v for v in m["r_regionkey"]]
    with pytest.raises(KeyError):
        _run("FROM region | KEEP nope | LIMIT 1", tables)


def test_parser_errors():
    with pytest.raises(ESQLSyntaxError):
        _Parser("WHERE x == 1").parse()  # must start with FROM/ROW
    with pytest.raises(ESQLSyntaxError):
        _Parser("FROM t | FOO 1").parse()
    with pytest.raises(ESQLSyntaxError):
        _Parser("FROM t | WHERE a ==").parse()
    with pytest.raises(ESQLSyntaxError):
        _Parser("FROM t | STATS x = BOGUS(a)").parse()


@pytest.fixture()
def tables(sf_dir):
    names = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    return {t: f"{sf_dir}/{t}.parquet" for t in names}


def _run(q, tables, **kw):
    return (
        pa.concat_tables(list(esql(q, tables, **kw).iter_batches(batch_format="pyarrow")))
        .to_pandas()
    )


def test_esql_stats_vs_duckdb(ray_session, sf_dir, tables):
    import duckdb

    got = _run(
        """FROM events
| WHERE event_type != "view"
| EVAL day = DATE_TRUNC("day", ts)
| STATS n = COUNT(*), u = COUNT_DISTINCT(user_id), vmin = MIN(value), av = AVG(value) BY day
| SORT day
| LIMIT 100000""",
        tables,
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.sql(
        "SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n, "
        "count(DISTINCT user_id)::BIGINT AS u, min(value) AS vmin, "
        "avg(value) AS av FROM events WHERE event_type != 'view' "
        "GROUP BY day ORDER BY day"
    ).df()
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["n"].to_numpy(), want["n"].to_numpy())
    np.testing.assert_array_equal(got["u"].to_numpy(), want["u"].to_numpy())
    np.testing.assert_array_equal(got["vmin"].to_numpy(), want["vmin"].to_numpy())
    np.testing.assert_allclose(got["av"].to_numpy(), want["av"].to_numpy(), rtol=1e-12)


def test_esql_sort_limit_topk_and_implicit_cap(ray_session, tables):
    got = _run(
        "FROM orders | SORT o_totalprice DESC, o_orderkey ASC | LIMIT 10 "
        "| KEEP o_orderkey, o_totalprice",
        tables,
    )
    assert len(got) == 10
    assert (got["o_totalprice"].to_numpy()[:-1] >= got["o_totalprice"].to_numpy()[1:]).all()
    capped = _run("FROM lineitem | KEEP l_orderkey", tables)
    assert len(capped) == 1000  # ES|QL implicit LIMIT


def test_esql_lookup_join_left(ray_session, tables):
    got = _run(
        """FROM orders
| RENAME o_custkey AS c_custkey
| LOOKUP JOIN customer ON c_custkey
| STATS n = COUNT(*), segs = COUNT_DISTINCT(c_mktsegment)
| LIMIT 10""",
        tables,
    )
    assert int(got["n"][0]) > 0 and int(got["segs"][0]) == 5


def test_esql_percentile_exact(ray_session, sf_dir, tables):
    import duckdb

    got = _run(
        """FROM events
| WHERE value IS NOT NULL
| STATS med = MEDIAN(value), p90 = PERCENTILE(value, 90) BY event_type
| SORT event_type""",
        tables,
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.sql(
        "SELECT event_type, quantile_cont(value, 0.5) AS med, "
        "quantile_cont(value, 0.9) AS p90 FROM events "
        "WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type"
    ).df()
    # DuckDB's quantile_cont interpolation differs at the last ulp
    # (~1e-14 relative); the gate layer rounds to 6 decimals (repo-wide
    # percentile convention) which absorbs it
    np.testing.assert_allclose(got["med"].to_numpy(), want["med"].to_numpy(), atol=1e-9)
    np.testing.assert_allclose(got["p90"].to_numpy(), want["p90"].to_numpy(), atol=1e-9)
