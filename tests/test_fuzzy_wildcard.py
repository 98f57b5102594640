"""Fuzzy (`term~N`) and general wildcard (`t?ble`, `*ark`) query
clauses: parser, term-dictionary expansion, and rank identity vs the
brute-force oracle (the Lucene ``query_string`` multi-term surface the
reference delegates — reference utils.ts:94-100)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from elasticsearch_assets_ray.query import expand as exp
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.oracle import OracleIndex
from elasticsearch_assets_ray.query.parser import parse_query


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parser_fuzzy_clauses():
    q = parse_query("retrun~2 error")
    assert q.fuzzies == [("retrun", 2)]
    assert q.should == ["error"]

    q = parse_query("impart~1 +erro~ -quer~0")
    assert q.fuzzies == [("impart", 1)]
    assert q.must_fuzzies == [("erro", 2)]  # bare ~ defaults to 2
    assert q.not_fuzzies == [("quer", 0)]

    # multi-token stem degrades to plain terms (analyzer splits fooBar)
    q = parse_query("fooBar~1")
    assert q.fuzzies == [] and set(q.should) == {"foo", "bar"}


def test_parser_wildcard_clauses():
    q = parse_query("r?nk er*r -s*t +cl*s")
    assert q.wildcards == ["r?nk", "er*r"]
    assert q.not_wildcards == ["s*t"]
    assert q.must_wildcards == ["cl*s"]

    # trailing-star-only stays on the prefix fast path
    q = parse_query("ret*")
    assert q.prefixes == ["ret"] and q.wildcards == []

    # bare match-all and non-alphabet patterns degrade
    q = parse_query("*? f,o?x")
    assert q.wildcards == []
    assert "f" not in q.wildcards

    q = parse_query("Imp?rt")  # lowercased like the analyzer
    assert q.wildcards == ["imp?rt"]


def test_to_string_roundtrip():
    q = parse_query("r?nk retrun~2 -er*r +impart~1")
    s = q.to_string()
    assert "r?nk" in s and "retrun~2" in s and "-er*r" in s and "+impart~1" in s
    # printable form reparses to the same clause sets
    q2 = parse_query(s)
    assert sorted(q2.wildcards) == sorted(q.wildcards)
    assert sorted(q2.fuzzies) == sorted(q.fuzzies)
    assert sorted(q2.not_wildcards) == sorted(q.not_wildcards)
    assert sorted(q2.must_fuzzies) == sorted(q.must_fuzzies)


# ---------------------------------------------------------------------------
# expansion kernels
# ---------------------------------------------------------------------------


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_scalar_reference():
    import random

    rng = random.Random(11)
    al = "ab1"
    for _ in range(50):
        q = "".join(rng.choice(al) for _ in range(rng.randint(0, 6)))
        cands = [
            "".join(rng.choice(al) for _ in range(rng.randint(1, 8)))
            for _ in range(25)
        ]
        got = exp.levenshtein_batch(q, pa.array(cands)).tolist()
        assert got == [_lev_ref(q, c) for c in cands], (q, cands)


def test_wildcard_regex_translation():
    assert exp.wildcard_regex("t?ble") == "^t[a-z0-9]ble$"
    assert exp.wildcard_regex("er*r") == "^er[a-z0-9]*r$"
    assert exp.wildcard_literal_prefix("er*r") == "er"
    assert exp.wildcard_literal_prefix("*ueue") == ""
    assert exp.is_wildcard_pattern("t?ble")
    assert not exp.is_wildcard_pattern("*")  # match-all rejected
    assert not exp.is_wildcard_pattern("f,o?x")


def test_expand_wildcard_and_fuzzy_against_index(built_index):
    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    got = set(s.expand_wildcard("er*r"))
    assert "error" in got
    assert all(t.startswith("er") and t.endswith("r") for t in got)
    # leading wildcard scans the whole dictionary
    assert "queue" in s.expand_wildcard("*ueue")

    fz = set(s.expand_fuzzy("retrun", 2))
    assert "return" in fz
    assert all(_lev_ref("retrun", t) <= 2 for t in fz)
    assert s.expand_fuzzy("return", 0) == ["return"]

    with pytest.raises(ValueError, match="expands to more than"):
        s.expand_wildcard("*", max_expansions=3) if exp.is_wildcard_pattern(
            "*"
        ) else s.expand_wildcard("e*", max_expansions=1)


def test_cold_warm_expansion_agree(built_index):
    idx_dir, _ = built_index
    warm = Searcher(idx_dir)
    cold = Searcher(idx_dir, shard_resident=False)
    for pat in ["er*r", "*ueue", "r?nk", "s*t"]:
        assert warm.expand_wildcard(pat) == cold.expand_wildcard(pat), pat
    for t, n in [("retrun", 2), ("impart", 1), ("erro", 2)]:
        assert warm.expand_fuzzy(t, n) == cold.expand_fuzzy(t, n), (t, n)


# ---------------------------------------------------------------------------
# rank identity vs the brute-force oracle
# ---------------------------------------------------------------------------

FW_QUERIES = [
    "retrun~2 error",
    "impart~1 batch",
    "+erro~1 batch",          # conjunctive fuzzy group {err, error}
    "-quer~2 merge",          # excludes query/queue within 2 edits
    "r?nk score",
    "er*r send",
    "*ueue item",             # leading wildcard
    "+cl*s batch",            # conjunctive wildcard group
    "-s*t merge row",         # negative wildcard
    "imp?rt retrun~1",        # mixed wildcard + fuzzy
    "zz?qq merge",            # wildcard matching nothing contributes nothing
    "zzz~1 merge",            # fuzzy matching nothing contributes nothing
]


@pytest.fixture(scope="module")
def fw_oracle(built_index):
    idx_dir, _ = built_index
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["doc_id", "content"]
    )
    return OracleIndex(doc, content_col="content", id_col="doc_id")


@pytest.mark.parametrize("query", FW_QUERIES)
def test_fuzzy_wildcard_rank_identity(query, fw_oracle, built_index):
    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    oi, osc = fw_oracle.topk(query, 10)
    r = s.search(query, 10)
    assert np.array_equal(r["doc_id"].to_numpy(), oi), query
    assert np.array_equal(r["score"].to_numpy(), osc), query


def test_conjunctive_fuzzy_filters(built_index):
    """`+erro~1` requires ≥1 term within 1 edit of 'erro' per doc; the
    bare disjunction is a superset."""
    idx_dir, _ = built_index
    s = Searcher(idx_dir)
    bag = s.all_scores("erro~1 batch")
    conj = s.all_scores("+erro~1 batch")
    assert set(conj["doc_id"].to_pylist()) <= set(bag["doc_id"].to_pylist())
    # conjunctive docs all contain err or error
    terms = set(s.expand_fuzzy("erro", 1))
    hyd = s.hydrate(
        conj["doc_id"].to_numpy(zero_copy_only=False), columns=["doc_id", "content"]
    )
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    for c in hyd["content"].to_pylist():
        assert terms & set(tokenize_text(c))


def test_multisearcher_expansion(built_index, tmp_path):
    """Wildcard/fuzzy expansion unions base + delta term dictionaries."""
    from elasticsearch_assets_ray.index.incremental import MultiSearcher

    idx_dir, _ = built_index
    ms = MultiSearcher([idx_dir])
    s = Searcher(idx_dir)
    assert ms.expand_wildcard("er*r") == s.expand_wildcard("er*r")
    assert ms.expand_fuzzy("retrun", 2) == s.expand_fuzzy("retrun", 2)


# ---------------------------------------------------------------------------
# term suggester ("did you mean")
# ---------------------------------------------------------------------------


def test_suggest_terms_ranking(built_index):
    import numpy as np

    from elasticsearch_assets_ray.query.engine import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    r = s.suggest_terms("lod indx", size=5, max_edits=2)
    by_tok = {}
    for t, sug, d, df in zip(
        r["token"].to_pylist(),
        r["suggestion"].to_pylist(),
        r["distance"].to_pylist(),
        r["df"].to_pylist(),
    ):
        by_tok.setdefault(t, []).append((d, -df, sug))
    assert set(by_tok) <= {"lod", "indx"}
    for t, rows in by_tok.items():
        assert rows == sorted(rows), t          # (distance, df desc, term)
        assert len(rows) <= 5
        def _lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        for d, _negdf, sug in rows:
            assert d == _lev(t, sug)  # distances honest vs a reference
            assert d <= 2
    # an exact vocabulary word suggests itself at distance 0 first
    r0 = s.suggest_terms("load", size=3)
    assert r0["suggestion"][0].as_py() == "load"
    assert r0["distance"][0].as_py() == 0
    # garbage with no near terms → no rows for that token
    rg = s.suggest_terms("zzzzqqqq", size=3)
    assert rg.num_rows == 0


# ---------------------------------------------------------------------------
# regexp term queries (/pat/)
# ---------------------------------------------------------------------------


def test_regexp_parse_and_expand(built_index):
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.parser import parse_query

    q = parse_query("/lo[a-d]d/ index -/re?turns?/ +/v.lue/")
    assert q.regexps == ["lo[a-d]d"]
    assert q.not_regexps == ["re?turns?"]
    assert q.must_regexps == ["v.lue"]
    q2 = parse_query(q.to_string())
    assert q2.regexps == q.regexps and q2.must_regexps == q.must_regexps

    idx, _ = built_index
    s = Searcher(idx)
    exp = s.expand_regexp("loa?d")
    assert "load" in exp
    assert all(__import__("re").fullmatch("loa?d", t) for t in exp)
    # regexp expansion ≡ the explicit OR of its terms
    a = s.all_scores("/loa?d/ index")
    b = s.all_scores(" ".join(exp) + " index")
    assert a.to_pydict() == b.to_pydict()
    import pytest

    with pytest.raises(ValueError, match="invalid regexp"):
        s.all_scores("/lo[ad/ index")


def test_regexp_in_boolean_tree(built_index):
    from elasticsearch_assets_ray.query.engine import Searcher

    idx, _ = built_index
    s = Searcher(idx)
    exp = s.expand_regexp("lo.d")
    a = s.all_scores("index AND (/lo.d/ OR value)")
    b = s.all_scores("index AND ((" + " OR ".join(exp) + ") OR value)")
    assert a.to_pydict() == b.to_pydict()


def test_regex_literal_prefix():
    from elasticsearch_assets_ray.query.expand import regex_literal_prefix

    assert regex_literal_prefix("load") == "load"
    assert regex_literal_prefix("lo[ad]d") == "lo"
    assert regex_literal_prefix("loa?d") == "lo"   # optional char dropped
    assert regex_literal_prefix("loa*") == "lo"
    assert regex_literal_prefix(".*x") == ""
    assert regex_literal_prefix("ab{2}") == "a"


def test_regexp_parens_and_alternation(built_index):
    """Review regressions: parens inside /pat/ are pattern syntax (not
    boolean grouping); top-level alternation voids the literal-prefix
    pruning; escapes survive lowercasing; RE2-invalid patterns raise."""
    import re

    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.parser import parse_query

    q = parse_query("/colum(n|ns)/ filter")
    assert q.bool_tree is None  # regexp parens do NOT trigger boolean mode
    assert q.regexps == ["colum(n|ns)"]

    idx, _ = built_index
    s = Searcher(idx)
    # top-level alternation must find BOTH alternatives (prefix pruning
    # previously scanned only the 'load' range)
    exp = s.expand_regexp("load|index")
    assert set(exp) == {"load", "index"}
    a = s.all_scores("/load|index/ value")
    b = s.all_scores("load index value")
    assert a.to_pydict() == b.to_pydict()
    # escape classes survive the literal lowercasing
    q = parse_query(r"/x\D+/ y")
    assert q.regexps == ["x\\D+"]
    # RE2-invalid (Python-valid) pattern raises cleanly
    import pytest

    with pytest.raises(ValueError, match="invalid regexp"):
        s.expand_regexp("(?=a)b")
    # regexp leaf with parens inside a boolean tree
    q = parse_query("value AND /colum(n|ns)/")
    assert q.bool_tree == (
        "and", [("term", "value"), ("regexp", "colum(n|ns)")]
    )


def test_damerau_levenshtein_matches_duckdb():
    """The exact-DL refiner is pinned to DuckDB's damerau_levenshtein
    (equality-by-construction for the fuzzy_osa oracle)."""
    import random

    import duckdb

    from elasticsearch_assets_ray.query.expand import damerau_levenshtein

    con = duckdb.connect()
    random.seed(13)
    cases = [("ca", "abc"), ("abcd", "acbd"), ("tabel", "table"), ("", "x")]
    cases += [
        (
            "".join(random.choices("abcd", k=random.randint(0, 6))),
            "".join(random.choices("abcd", k=random.randint(0, 6))),
        )
        for _ in range(400)
    ]
    for a, b in cases:
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)


def test_fuzzy_transpositions_mask():
    import pyarrow as pa

    from elasticsearch_assets_ray.query.expand import fuzzy_mask

    terms = pa.array(["table", "tablet", "cable", "tale", "stable"])
    # 'tabel' → 'table' is ONE transposition: invisible to plain ~1,
    # found by the transposition-aware metric
    assert list(fuzzy_mask("tabel", terms, 1)) == [False] * 5
    assert list(fuzzy_mask("tabel", terms, 1, transpositions=True)) == [
        True, False, False, False, False,
    ]
    # plain hits stay hits (DL <= plain): every term here is one
    # insert/delete/substitution away from 'table'
    assert list(fuzzy_mask("table", terms, 1, transpositions=True)) == [
        True, True, True, True, True,
    ]
    assert list(fuzzy_mask("table", terms, 1)) == [True] * 5


def test_searcher_fuzzy_transpositions_flag(built_index):
    from elasticsearch_assets_ray.query.engine import Searcher

    idx, _ = built_index
    plain = Searcher(idx)
    osa = Searcher(idx, fuzzy_transpositions=True)
    # 'laod' → 'load' is a transposition (plain distance 2)
    assert plain.expand_fuzzy("laod", 1) == []
    assert "load" in osa.expand_fuzzy("laod", 1)
    r = osa.search("laod~1 index", k=5)
    assert r.num_rows > 0
