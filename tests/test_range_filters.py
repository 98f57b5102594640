"""Fielded RANGE filter clauses (`n:[10 TO 20}`, `n:>=5`) — the xLucene
range syntax the reference emits for its date windows
(SpacesReaderClient.ts:250: `${field}:[${start} TO ${end}}`), evaluated
as ES bool.filter context over docstore metadata columns: conjunctive,
non-scoring, collection stats untouched; bounds compare in the COLUMN's
Arrow type."""

import numpy as np
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.parser import parse_query


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parser_range_forms():
    q = parse_query("spark n:[10 TO 20] m:{3 TO 7}")
    assert q.range_filters == [
        ("n", "10", True, "20", True),
        ("m", "3", False, "7", False),
    ]
    assert q.should == ["spark"]
    # the reference's mixed form: inclusive lo, exclusive hi
    q = parse_query("ts:[2024-01-01 TO 2024-02-01}")
    assert q.range_filters == [("ts", "2024-01-01", True, "2024-02-01", False)]
    # open endpoints
    q = parse_query("n:[5 TO *] m:[* TO 9}")
    assert q.range_filters == [
        ("n", "5", True, None, True),
        ("m", None, True, "9", False),
    ]
    # comparator sugar desugars to half-open ranges
    q = parse_query("a:>=5 b:>5 c:<=5 d:<5")
    assert q.range_filters == [
        ("a", "5", True, None, True),
        ("b", "5", False, None, True),
        ("c", None, True, "5", True),
        ("d", None, True, "5", False),
    ]
    # negation
    q = parse_query("-n:[10 TO 20] x")
    assert q.not_range_filters == [("n", "10", True, "20", True)]
    assert q.range_filters == []


def test_parser_range_round_trip():
    for s in [
        "spark n:[10 TO 20}",
        "-n:{3 TO *] merge",
        "a:>=5 b:<7 key",
        'x:[aa TO bb] "table scan"',
    ]:
        q = parse_query(s)
        q2 = parse_query(q.to_string())
        assert q2.range_filters == sorted(
            set(q.range_filters),
            key=lambda r: (r[0], r[1] is not None, r[1] or "", r[2]),
        ) or q2.range_filters == q.range_filters
        assert sorted(q2.not_range_filters) == sorted(set(q.not_range_filters))
        assert q2.should == q.should


def test_parser_malformed_ranges_stay_terms():
    # no TO → not a range clause; brackets are stripped by tokenization
    q = parse_query("n:[10 20] spark")
    assert q.range_filters == []
    assert "spark" in q.should


# ---------------------------------------------------------------------------
# engine semantics vs brute force
# ---------------------------------------------------------------------------


def _score_map(s, q):
    t = s.all_scores(q)
    return dict(
        zip(
            t["doc_id"].to_numpy(zero_copy_only=False).tolist(),
            t["score"].to_pylist(),
        )
    )


def test_numeric_range_matches_brute_force(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    base = _score_map(s, "def load index")
    ids = np.array(sorted(base), dtype=np.int64)
    h = s.hydrate(ids, columns=["doc_id", "doc_len"])
    dlen = dict(zip(h["doc_id"].to_pylist(), h["doc_len"].to_pylist()))
    lo, hi = int(np.percentile(list(dlen.values()), 25)), int(
        np.percentile(list(dlen.values()), 75)
    )

    got = _score_map(s, f"def load index doc_len:[{lo} TO {hi}]")
    want = {d: v for d, v in base.items() if lo <= dlen[d] <= hi}
    assert got == want  # filter context: same scores, subset of docs
    assert 0 < len(got) < len(base)

    # exclusive endpoints
    got_ex = _score_map(s, f"def load index doc_len:{{{lo} TO {hi}}}")
    assert got_ex == {d: v for d, v in base.items() if lo < dlen[d] < hi}

    # comparator sugar ≡ bracket half-open range
    assert _score_map(s, f"def load index doc_len:>={lo}") == _score_map(
        s, f"def load index doc_len:[{lo} TO *]"
    )

    # negation is the exact complement within the candidate set
    got_neg = _score_map(s, f"def load index -doc_len:[{lo} TO {hi}]")
    assert set(got_neg) == set(base) - set(got)

    # numeric comparison, not lexicographic: a 2-digit bound must not
    # exclude 3-digit doc_lens the way a string compare would
    got9 = _score_map(s, "def load index doc_len:>99")
    assert got9 == {d: v for d, v in base.items() if dlen[d] > 99}


def test_string_range_lexicographic(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    base = _score_map(s, "def load index")
    ids = np.array(sorted(base), dtype=np.int64)
    h = s.hydrate(ids, columns=["doc_id", "lang"])
    langs = dict(zip(h["doc_id"].to_pylist(), h["lang"].to_pylist()))
    got = _score_map(s, "def load index lang:{go TO python}")
    assert got == {d: v for d, v in base.items() if "go" < langs[d] < "python"}
    assert 0 < len(got) < len(base)


def test_fully_open_range_is_existence(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    base = _score_map(s, "def load index")
    # doc_len is never null → [* TO *] is a no-op filter
    assert _score_map(s, "def load index doc_len:[* TO *]") == base


def test_range_pruned_topk_matches_exhaustive(built_index):
    idx, _ = built_index
    sp = Searcher(idx, prune=True)
    se = Searcher(idx, prune=False)
    for q in [
        "def load index doc_len:[150 TO 600]",
        "def value return -doc_len:{100 TO 400]",
        "def load lang:[java TO python] doc_len:>=120",
    ]:
        rp = sp.search(q, 10)
        re_ = se.search(q, 10)
        assert rp["doc_id"].to_pylist() == re_["doc_id"].to_pylist(), q
        assert rp["score"].to_pylist() == re_["score"].to_pylist(), q


def test_unknown_range_field_raises(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="unknown filter field"):
        s.all_scores("def nosuch:[1 TO 2]")


def test_bad_bound_type_raises(built_index):
    idx, _ = built_index
    s = Searcher(idx)
    with pytest.raises(ValueError, match="does not cast"):
        s.all_scores("def doc_len:[abc TO xyz]")
