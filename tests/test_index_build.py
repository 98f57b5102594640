import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from elasticsearch_assets_ray.index.build import build_index
from elasticsearch_assets_ray.sources.partition import plan_partitions


def test_plan_partitions_counts(corpus_dir):
    specs = plan_partitions(corpus_dir, target_rows=128)
    assert sum(s.n_rows for s in specs) == 600
    assert all(s.n_rows <= 128 for s in specs)
    # stable pids and disjoint doc bases
    bases = [s.doc_base for s in specs]
    assert bases == sorted(set(bases))
    assert specs == plan_partitions(corpus_dir, target_rows=128)


def test_manifest_counts(built_index):
    idx_dir, manifest = built_index
    assert manifest["complete"]
    assert manifest["n_docs"] == 600  # corpus has no dup (repo,path,commit)
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table()
    assert doc.num_rows == 600
    assert manifest["total_tokens"] == int(
        pa.compute.sum(doc["doc_len"]).as_py()
    )
    assert abs(manifest["avgdl"] - manifest["total_tokens"] / 600) < 1e-12


def test_sha256_invariant(built_index, corpus_dir):
    """input_hint: per-row content sha256 equality through the docstore."""
    idx_dir, _ = built_index
    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(
        columns=["repo", "path", "commit", "sha256", "content"]
    )
    src = pads.dataset(corpus_dir).to_table()
    src_map = {
        (r, p, c): hashlib.sha256(txt.encode()).hexdigest()
        for r, p, c, txt in zip(
            src["repo"].to_pylist(),
            src["path"].to_pylist(),
            src["commit"].to_pylist(),
            src["content"].to_pylist(),
        )
    }
    for r, p, c, h, txt in zip(
        doc["repo"].to_pylist(),
        doc["path"].to_pylist(),
        doc["commit"].to_pylist(),
        doc["sha256"].to_pylist(),
        doc["content"].to_pylist(),
    ):
        assert src_map[(r, p, c)] == h
        assert hashlib.sha256(txt.encode()).hexdigest() == h


def test_postings_consistent_with_docstore(built_index):
    """Σ df over segment rows per term == brute-force df from content."""
    idx_dir, manifest = built_index
    seg = pads.dataset(os.path.join(idx_dir, "segments"), partitioning="hive").to_table(
        columns=["term", "df", "min_docid", "max_docid"]
    )
    # docID ranges of a term's bucket rows never overlap
    import collections

    by_term = collections.defaultdict(list)
    for t, lo, hi in zip(
        seg["term"].to_pylist(), seg["min_docid"].to_pylist(), seg["max_docid"].to_pylist()
    ):
        by_term[t].append((lo, hi))
    for t, ranges in by_term.items():
        ranges.sort()
        for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
            assert h1 < l2, f"overlapping bucket ranges for {t}"

    from elasticsearch_assets_ray.stages.tokenizer import doc_term_freqs

    doc = pads.dataset(os.path.join(idx_dir, "docstore")).to_table(columns=["content"])
    tb = doc_term_freqs(doc["content"])
    ref_df = collections.Counter(tb.terms.tolist())
    got_df = collections.Counter()
    for t, d in zip(seg["term"].to_pylist(), seg["df"].to_pylist()):
        got_df[t] += d
    assert got_df == ref_df


def test_dedup_exact(tmp_path, ray_session):
    t = pa.table(
        {
            "repo": ["r", "r", "r", "s"],
            "path": ["a", "a", "b", "a"],
            "commit": ["1", "1", "1", "1"],
            "lang": ["python"] * 4,
            "content": ["def first(): pass", "def second(): pass", "x", "y"],
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "f.parquet"))
    m = build_index(str(src), str(tmp_path / "idx"), target_partition_rows=1024)
    assert m["n_raw_rows"] == 4
    assert m["n_docs"] == 3  # (r,a,1) duplicated — first occurrence kept
    doc = pads.dataset(str(tmp_path / "idx/docstore")).to_table()
    kept = dict(zip(zip(doc["repo"].to_pylist(), doc["path"].to_pylist()), doc["content"].to_pylist()))
    assert kept[("r", "a")] == "def first(): pass"


def test_resume_skips_completed_partitions(tmp_path, corpus_dir, ray_session):
    out = str(tmp_path / "idx")
    m1 = build_index(corpus_dir, out, target_partition_rows=256, runs_per_bucket=2)
    # simulate a crash after some partitions: drop one partition's artifacts
    # and the global manifest, keep the rest
    os.unlink(os.path.join(out, "manifest.json"))
    victim = sorted(os.listdir(os.path.join(out, "manifests")))[1]
    pid = victim.split("-")[1].split(".")[0]
    os.unlink(os.path.join(out, "manifests", victim))
    os.unlink(os.path.join(out, "runs", f"part-{pid}.parquet"))
    os.unlink(os.path.join(out, "docstore", f"part-{pid}.parquet"))
    # record mtimes of surviving partition artifacts
    survivor = os.path.join(out, "runs", "part-00000.parquet")
    mtime_before = os.path.getmtime(survivor)

    m2 = build_index(corpus_dir, out, target_partition_rows=256, runs_per_bucket=2)
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["total_tokens"] == m1["total_tokens"]
    # surviving partitions were NOT re-tokenized (artifact untouched)
    assert os.path.getmtime(survivor) == mtime_before

    # the rebuilt index answers identically
    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(out)
    r = s.search("import parse config", 5)
    assert r.num_rows == 5


def test_noop_rebuild_fast(built_index, corpus_dir):
    idx_dir, m1 = built_index
    m2 = build_index(
        corpus_dir,
        idx_dir,
        target_partition_rows=128,
        runs_per_bucket=2,
        num_shards=4,
    )
    assert m2["n_docs"] == m1["n_docs"]


def test_index_config_validation():
    import pytest

    from elasticsearch_assets_ray.index.build import IndexConfig

    with pytest.raises(ValueError, match="codec"):
        IndexConfig(codec="zstd")
    with pytest.raises(ValueError, match="num_shards"):
        IndexConfig(num_shards=0)
    with pytest.raises(ValueError, match="runs_per_bucket"):
        IndexConfig(runs_per_bucket=-1)
    with pytest.raises(ValueError, match="content_col"):
        IndexConfig(content_col="")
    with pytest.raises(ValueError, match="id column"):
        IndexConfig(content_col="repo")


def test_v3_runs_sharded_rowgroups(built_index):
    """v3 layout contract: runs carry the shard column, rows sorted by
    shard, ONE row group per shard present — so phase 2's ``shard ==``
    filter prunes to exactly that shard's bytes (the zero-shuffle
    property)."""
    idx_dir, _ = built_index
    runs = sorted(
        f
        for f in os.listdir(os.path.join(idx_dir, "runs"))
        if f.endswith(".parquet")
    )
    assert runs
    for name in runs:
        pf = pq.ParquetFile(os.path.join(idx_dir, "runs", name))
        assert "shard" in pf.schema_arrow.names
        col = pf.schema_arrow.names.index("shard")
        seen = []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(col).statistics
            # one row group per shard: min == max within, strictly
            # increasing across
            assert st.min == st.max
            seen.append(st.min)
        assert seen == sorted(set(seen))
        shard_col = pf.read(columns=["shard"])["shard"].to_numpy(
            zero_copy_only=False
        )
        assert (np.diff(shard_col) >= 0).all()


def test_phase2_fast_path_matches_legacy(built_index, tmp_path):
    """The zero-shuffle phase 2 must produce byte-identical segments to
    the legacy groupby sort-shuffle over the SAME runs."""
    import glob

    from elasticsearch_assets_ray.index.build import (
        IndexConfig,
        _empty_segment_table,
        run_phase2,
    )

    idx_dir, _ = built_index
    cfg = IndexConfig(
        target_partition_rows=128, runs_per_bucket=2, num_shards=4
    )
    alt = str(tmp_path / "legacy")
    os.makedirs(os.path.join(alt, "runs"))
    os.makedirs(os.path.join(alt, "docstore"))
    for sub in ("runs", "docstore"):
        for f in glob.glob(os.path.join(idx_dir, sub, "part-*.parquet")):
            os.link(f, os.path.join(alt, sub, os.path.basename(f)))
    # strip the shard column from the linked runs to force the legacy path
    for f in glob.glob(os.path.join(alt, "runs", "part-*.parquet")):
        t = pq.read_table(f)
        os.unlink(f)
        pq.write_table(t.drop_columns(["shard"]), f, compression="zstd")
    run_phase2(alt, cfg)

    def seg_table(d):
        t = pads.dataset(
            os.path.join(d, "segments"), partitioning="hive"
        ).to_table()
        return t.take(
            pa.compute.sort_indices(
                t, sort_keys=[("term", "ascending"), ("bucket", "ascending")]
            )
        )

    a = seg_table(idx_dir)
    b = seg_table(alt)
    assert a.num_rows == b.num_rows
    for c in ("term", "bucket", "df", "cf", "min_docid", "max_docid", "blob"):
        assert a[c].to_pylist() == b[c].to_pylist(), c
    # empty-group emission: schema must match the real merge output
    # exactly (schema unions across blocks break the searcher otherwise)
    real = pads.dataset(
        os.path.join(idx_dir, "segments"), partitioning="hive"
    ).to_table()
    # ``shard`` is a hive partition column (path-encoded, read back as
    # int32) — compare the DATA columns, which must match exactly
    empty = _empty_segment_table(with_pos=False).drop_columns(["shard"])
    real_no_part = real.select(empty.column_names)
    assert [f.name for f in real_no_part.schema] == [
        f.name for f in empty.schema
    ]
    for f_real, f_empty in zip(real_no_part.schema, empty.schema):
        assert f_real.type == f_empty.type, f_real.name
