"""Index re-sharding (index/reshard.py — the ES _split/_shrink analog):
layout changes only, every search bit-identical, docIDs stable."""

import os

import numpy as np
import pytest

from elasticsearch_assets_ray.index.reshard import reshard_index
from elasticsearch_assets_ray.query.engine import Searcher

QUERIES = [
    "def load index",
    "+def -yield",
    '+"def load"',
    "(def OR yield) AND index",
    "lo*d index",
    "n_chars:>=0 def",  # falls back if column absent; see below
]


@pytest.fixture(scope="module")
def resharded(ray_session, corpus_dir, tmp_path_factory):
    """source: 4 hash shards × rpb 2; split to rpb 1 and shrink to rpb 8."""
    from elasticsearch_assets_ray.index.build import build_index

    src = str(tmp_path_factory.mktemp("rs_src"))
    build_index(
        corpus_dir,
        src,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=4,
        index_positions=True,
    )
    split = str(tmp_path_factory.mktemp("rs_split"))
    reshard_index(src, split, num_shards=2, runs_per_bucket=1)
    shrink = str(tmp_path_factory.mktemp("rs_shrink"))
    reshard_index(src, shrink, num_shards=8, runs_per_bucket=8)
    return src, split, shrink


def _queries():
    return [
        "def load index",
        "+def -yield",
        '+"def load"',
        "(def OR yield) AND index",
        "lo*d index",
    ]


def test_reshard_bit_identical_search(resharded):
    src, split, shrink = resharded
    s0 = Searcher(src)
    for other in (split, shrink):
        s1 = Searcher(other)
        assert s1.n_docs == s0.n_docs and s1.avgdl == s0.avgdl
        for q in _queries():
            a = s0.search(q, k=25)
            b = s1.search(q, k=25)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_reshard_serving_shards(resharded):
    """The split layout serves through MORE doc-partitioned shards —
    the whole point of _split — still bit-identical."""
    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    src, split, _ = resharded
    s0 = Searcher(src)
    sh = ShardedSearcher(split, n_shards=5, use_actors=False)
    assert len(sh.shards) == 5  # rpb=1 gives enough buckets to fan out
    for q in _queries():
        a = s0.search(q, k=25)
        b = sh.search(q, k=25)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_reshard_rejects_noop_and_keeps_tombstones(resharded, tmp_path_factory):
    import shutil

    from elasticsearch_assets_ray.index.deletes import delete_by_query

    src, _, _ = resharded
    with pytest.raises(ValueError, match="equals the source layout"):
        reshard_index(src, str(tmp_path_factory.mktemp("rs_noop")))
    # tombstones survive a reshard (docIDs unchanged)
    tomb_src = str(tmp_path_factory.mktemp("rs_tomb_src"))
    shutil.copytree(src, tomb_src, dirs_exist_ok=True)
    n = delete_by_query(tomb_src, "yield")
    assert n > 0
    out = str(tmp_path_factory.mktemp("rs_tomb_out"))
    reshard_index(tomb_src, out, runs_per_bucket=1)
    assert Searcher(out).search("yield", k=10).num_rows == 0
    assert (
        Searcher(out).search("def load", k=50)["doc_id"].to_pylist()
        == Searcher(tomb_src).search("def load", k=50)["doc_id"].to_pylist()
    )


def test_reshard_analyzed_index(ray_session, corpus_dir, tmp_path_factory):
    """The analyzer travels with the manifest — queries through the
    resharded index still analyze."""
    from elasticsearch_assets_ray.index.build import build_index

    src = str(tmp_path_factory.mktemp("rs_ana"))
    build_index(
        corpus_dir,
        src,
        target_partition_rows=256,
        num_shards=4,
        analyzer={"filters": ["stop", "s_stem"]},
    )
    out = str(tmp_path_factory.mktemp("rs_ana_out"))
    reshard_index(src, out, num_shards=2)
    s0, s1 = Searcher(src), Searcher(out)
    assert s1.analyzer == s0.analyzer
    a = s0.search("the indexes loads", k=20)
    b = s1.search("the indexes loads", k=20)
    assert a.equals(b)
