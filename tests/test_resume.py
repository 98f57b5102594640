"""Checkpoint/resume: an interrupted build never re-tokenizes finished
partitions (the holes/recoveryData analog, SURVEY.md P5/P10)."""

import json
import os

from elasticsearch_assets_ray.index.build import IndexConfig, build_index, build_partition
from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.sources.partition import plan_partitions


def test_resume_skips_completed_partitions(corpus_dir, tmp_path, ray_session):
    out = str(tmp_path / "idx")
    cfg = IndexConfig(target_partition_rows=128, runs_per_bucket=2, num_shards=4)
    specs = plan_partitions(corpus_dir, 128)
    assert len(specs) >= 4

    # simulate a run that died after finishing the first two partitions
    for s in specs[:2]:
        build_partition(s, cfg, out)
    done_manifest = os.path.join(out, "manifests", f"part-{specs[0].pid:05d}.json")
    mtime_before = os.path.getmtime(done_manifest)
    run_before = os.path.getmtime(os.path.join(out, "runs", f"part-{specs[0].pid:05d}.parquet"))

    manifest = build_index(corpus_dir, out, config=cfg, resume=True)
    assert manifest["complete"] and manifest["n_partitions"] == len(specs)
    # finished partitions were NOT rebuilt
    assert os.path.getmtime(done_manifest) == mtime_before
    assert os.path.getmtime(os.path.join(out, "runs", f"part-{specs[0].pid:05d}.parquet")) == run_before

    # resumed index is fully queryable
    s = Searcher(out)
    res = s.search("def load index", k=5)
    assert res.num_rows == 5

    # a second resume call with a complete manifest is a fast no-op
    m2 = build_index(corpus_dir, out, config=cfg, resume=True)
    assert m2["n_docs"] == manifest["n_docs"]


def test_partition_manifest_carries_lineage_and_metrics(corpus_dir, tmp_path):
    out = str(tmp_path / "idx2")
    cfg = IndexConfig(target_partition_rows=128)
    spec = plan_partitions(corpus_dir, 128)[0]
    m = build_partition(spec, cfg, out)
    with open(os.path.join(out, "manifests", f"part-{spec.pid:05d}.json")) as f:
        saved = json.load(f)
    assert saved["path"] == spec.path and saved["row_groups"] == spec.row_groups
    for metric in ("n_docs", "total_tokens", "n_terms_local", "n_raw_rows"):
        assert saved[metric] == m[metric] and saved[metric] >= 0


def test_resume_across_plan_change(tmp_path, ray_session):
    """P11: changing the partition plan (new input file / different
    target_partition_rows) reuses finished partitions whose grouping is
    unchanged and rebuilds only the delta (reference
    compactDivisions/expandDivisions recovery semantics)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(11)
    vocab = "def main load index save read write scan merge".split()

    def mk(path, n, seed):
        r = np.random.default_rng(seed)
        texts = [" ".join(r.choice(vocab, 12)) for _ in range(n)]
        pq.write_table(
            pa.table(
                {
                    "repo": pa.array(["r"] * n),
                    "path": pa.array([f"{path}-{i}" for i in range(n)]),
                    "commit": pa.array(["c"] * n),
                    "lang": pa.array(["py"] * n),
                    "content": pa.array(texts),
                }
            ),
            str(src / path),
            row_group_size=64,
        )

    mk("a.parquet", 128, 1)
    out = str(tmp_path / "idx")
    cfg = IndexConfig(target_partition_rows=128, runs_per_bucket=2, num_shards=4)
    m1 = build_index(str(src), out, config=cfg, resume=True)
    man_a = os.path.join(out, "manifests", "part-00000.json")
    mtime_a = os.path.getmtime(man_a)

    # plan change: a NEW input file appears; a.parquet's grouping is
    # unchanged -> its partition must be reused, not rebuilt
    mk("b.parquet", 128, 2)
    m2 = build_index(str(src), out, config=cfg, resume=True)
    assert m2["n_partitions"] == m1["n_partitions"] + 1
    assert os.path.getmtime(man_a) == mtime_a  # untouched
    s = Searcher(out)
    assert s.n_docs == 256
    assert s.search("def load", k=3).num_rows == 3

    # plan change 2: target size halves -> a/b re-pack into 64-row
    # groupings; stale artifacts removed, index stays consistent
    cfg2 = IndexConfig(target_partition_rows=64, runs_per_bucket=2, num_shards=4)
    m3 = build_index(str(src), out, config=cfg2, resume=True)
    assert m3["n_docs"] == 256
    assert m3["n_partitions"] == 4
    # no stale runs remain beyond the current plan
    runs = sorted(os.listdir(os.path.join(out, "runs")))
    assert len(runs) == 4
    s2 = Searcher(out)
    res = s2.search("def load", k=5)
    assert res.num_rows == 5

    # results equal a from-scratch build at the same plan
    out_fresh = str(tmp_path / "fresh")
    build_index(str(src), out_fresh, config=cfg2, resume=False)
    sf = Searcher(out_fresh)
    rf = sf.search("def load", k=5)
    assert res["score"].to_pylist() == rf["score"].to_pylist()
