"""Thin ES API surface: search templates, filtered aliases, _mget,
_field_caps, _analyze."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.sharded import ShardedSearcher
from elasticsearch_assets_ray.query.templates import (
    AliasStore,
    TemplateStore,
    render_template,
)


@pytest.fixture(scope="module")
def single(built_index):
    idx, _ = built_index
    return Searcher(idx)


@pytest.fixture(scope="module")
def sharded(built_index):
    idx, _ = built_index
    return ShardedSearcher(idx, n_shards=3, use_actors=False)


def test_render_template():
    assert render_template("{{a}} AND {{ b }}", {"a": "def", "b": "load"}) == (
        "def AND load"
    )
    assert render_template("n:[{{lo}} TO {{hi}}]", {"lo": 1, "hi": 2}) == "n:[1 TO 2]"
    with pytest.raises(KeyError):
        render_template("{{missing}}", {})


def test_template_store_search(single):
    ts = TemplateStore()
    ts.put("by_terms", "{{t1}} {{t2}}")
    got = ts.search(single, "by_terms", {"t1": "def", "t2": "load"}, k=5)
    want = single.search("def load", k=5)
    assert got.to_pydict() == want.to_pydict()


def test_alias_filter_context_scores_unchanged(single):
    """Filtered-alias hits keep the RAW query's scores (filter context
    never contributes to BM25)."""
    al = AliasStore()
    al.put("v", single, filter="value w3")
    got = al.search("v", "def load", k=10)
    raw = single.search("def load", k=10_000)
    raw_scores = dict(
        zip(raw["doc_id"].to_pylist(), raw["score"].to_pylist())
    )
    fids = set(np.sort(single.match_ids("value w3")).tolist())
    for d, s in zip(got["doc_id"].to_pylist(), got["score"].to_pylist()):
        assert d in fids
        assert s == raw_scores[d]  # bitwise
    # count through the alias = |query ∩ filter|
    qids = set(single.match_ids("def load").tolist())
    assert al.count("v", "def load") == len(qids & fids)
    # unfiltered alias passes straight through
    al.put("all", single)
    assert al.search("all", "def load", k=5).to_pydict() == single.search(
        "def load", k=5
    ).to_pydict()


def test_alias_sharded_parity(single, sharded):
    a = single.search_filtered_by("def load", "value w3", k=10)
    b = sharded.search_filtered_by("def load", "value w3", k=10)
    assert a.to_pydict() == b.to_pydict()
    assert single.count_filtered_by("def load", "value w3") == (
        sharded.count_filtered_by("def load", "value w3")
    )


def test_mget_order_duplicates_missing(single):
    top = single.search("def load", k=3)["doc_id"].to_pylist()
    req = [top[1], 10**15, top[0], top[1]]  # out of order, missing, dup
    t = single.mget(req, columns=["lang"])
    assert t["doc_id"].to_pylist() == req
    assert t["found"].to_pylist() == [True, False, True, True]
    langs = t["lang"].to_pylist()
    assert langs[1] is None
    assert langs[0] == langs[3]
    # empty request
    e = single.mget([])
    assert e.num_rows == 0


def test_field_caps(single, sharded):
    t = single.field_caps()
    caps = {f: ty for f, ty in zip(t["field"].to_pylist(), t["type"].to_pylist())}
    assert caps["content"] == "text"
    assert caps["doc_id"] == "long"
    assert caps["lang"] == "keyword"
    agg = dict(zip(t["field"].to_pylist(), t["aggregatable"].to_pylist()))
    assert not agg["content"] and agg["lang"]
    assert sharded.field_caps().to_pydict() == t.to_pydict()


def test_analyze_through_engine(single):
    t = single.analyze("getHTTPResponse loads_data.v2")
    assert t["token"].to_pylist() == ["get", "httpresponse", "loads", "data", "v2"]
    assert t["position"].to_pylist() == [0, 1, 2, 3, 4]
    s = "getHTTPResponse loads_data.v2"
    for tok, a, b in zip(
        t["token"].to_pylist(), t["start_offset"].to_pylist(), t["end_offset"].to_pylist()
    ):
        assert s[a:b].lower() == tok
