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
