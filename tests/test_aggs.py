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
