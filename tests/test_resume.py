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
