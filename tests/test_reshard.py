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


def test_rewrite_runs_take_zero_shuffle_path(resharded, tmp_path, monkeypatch):
    """Reshard writes bucket-affine v3 runs (``part-b<bucket>-x*.parquet``,
    rows shard-sorted, one row group per shard) and run_phase2 merges them
    WITHOUT the groupby sort-shuffle — segments byte-identical to the
    legacy path over the same decoded runs."""
    import glob
    import json

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    import elasticsearch_assets_ray.index.build as B
    from elasticsearch_assets_ray.index.build import IndexConfig, run_phase2

    src, _, _ = resharded

    # capture the run files reshard produces (they're deleted after phase 2)
    captured = str(tmp_path / "runs_copy")
    os.makedirs(captured)
    real_phase2 = B.run_phase2

    def spy_phase2(out_dir, cfg):
        import shutil

        for f in glob.glob(os.path.join(out_dir, "runs", "*.parquet")):
            shutil.copy2(f, os.path.join(captured, os.path.basename(f)))
        return real_phase2(out_dir, cfg)

    import elasticsearch_assets_ray.index.reshard as R

    monkeypatch.setattr(R, "run_phase2", spy_phase2)
    out = str(tmp_path / "rs_v3")
    reshard_index(src, out, num_shards=3, runs_per_bucket=4)

    run_files = sorted(glob.glob(os.path.join(captured, "*.parquet")))
    assert run_files
    for f in run_files:
        # bucket-affine naming + shard-sorted row groups
        assert os.path.basename(f).startswith("part-b")
        pf = pq.ParquetFile(f)
        assert "shard" in pf.schema_arrow.names
        ci = pf.schema_arrow.names.index("shard")
        mins = [
            pf.metadata.row_group(rg).column(ci).statistics.min
            for rg in range(pf.metadata.num_row_groups)
        ]
        maxs = [
            pf.metadata.row_group(rg).column(ci).statistics.max
            for rg in range(pf.metadata.num_row_groups)
        ]
        assert mins == maxs and mins == sorted(set(mins))

    # legacy parity: strip shard column + rename to uuid-style, re-merge
    legacy = str(tmp_path / "rs_legacy")
    os.makedirs(os.path.join(legacy, "runs"))
    os.makedirs(os.path.join(legacy, "docstore"))
    for f in glob.glob(os.path.join(out, "docstore", "part-*.parquet")):
        os.link(f, os.path.join(legacy, "docstore", os.path.basename(f)))
    for i, f in enumerate(run_files):
        t = pq.read_table(f).drop_columns(["shard"])
        pq.write_table(
            t,
            os.path.join(legacy, "runs", f"part-xlegacy{i:04d}.parquet"),
            compression="zstd",
        )
    with open(os.path.join(src, "manifest.json")) as fh:
        man = json.load(fh)
    cfg = IndexConfig(
        num_shards=3,
        runs_per_bucket=4,
        index_positions=bool(man.get("index_positions")),
        codec=man.get("codec", "varint"),
    )
    run_phase2(legacy, cfg)

    def seg(d):
        t = pads.dataset(os.path.join(d, "segments"), partitioning="hive").to_table()
        return t.take(
            pc.sort_indices(
                t, sort_keys=[("term", "ascending"), ("bucket", "ascending")]
            )
        )

    a, b = seg(out), seg(legacy)
    assert a.num_rows == b.num_rows
    for c in ("term", "bucket", "df", "cf", "min_docid", "max_docid", "blob", "pos"):
        assert a[c].to_pylist() == b[c].to_pylist(), c

    # and the resharded index still answers bit-identically
    s0, s1 = Searcher(src), Searcher(out)
    for q in _queries():
        x, y = s0.search(q, k=25), s1.search(q, k=25)
        assert x["doc_id"].to_pylist() == y["doc_id"].to_pylist()
        assert x["score"].to_pylist() == y["score"].to_pylist()
