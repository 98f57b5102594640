"""Source-format ingestion (JSONL/CSV → Parquet → index) and
crash-mid-build fault injection."""

import json
import os

import numpy as np
import pytest


def test_jsonl_ingest_to_index(ray_session, tmp_path):
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.sources.ingest import ingest

    src = tmp_path / "docs.jsonl"
    with open(src, "w") as f:
        for i in range(200):
            f.write(
                json.dumps(
                    {
                        "repo": "r",
                        "path": f"f{i}.py",
                        "commit": "c",
                        "lang": "py",
                        "content": f"def handler_{i}(): return load_index({i})",
                        "extra": i,  # pruned below
                    }
                )
                + "\n"
            )
    pq_dir = str(tmp_path / "pq")
    out = ingest(
        str(src), pq_dir, columns=["repo", "path", "commit", "lang", "content"]
    )
    idx = str(tmp_path / "idx")
    m = build_index(out, idx, target_partition_rows=64, num_shards=4, runs_per_bucket=2)
    assert m["n_docs"] == 200
    s = Searcher(idx)
    r = s.search("load index handler", k=5)
    assert r.num_rows == 5


def test_csv_ingest(ray_session, tmp_path):
    from elasticsearch_assets_ray.sources.ingest import ingest

    src = tmp_path / "t.csv"
    src.write_text("k,v\n" + "".join(f"k{i},{i}\n" for i in range(50)))
    out = ingest(str(src), str(tmp_path / "pq"))
    import pyarrow.dataset as pads

    t = pads.dataset(out).to_table()
    assert t.num_rows == 50 and set(t.column_names) == {"k", "v"}

    with pytest.raises(ValueError, match="unsupported"):
        ingest("x.avro", str(tmp_path / "nope"))


def test_crash_mid_partition_resumes_clean(corpus_dir, tmp_path, ray_session):
    """A build that died mid-partition (stray .tmp files, artifacts
    written but no manifest) resumes without corruption: unfinished
    partitions rebuild, finished ones are reused, the index queries
    identically to an uninterrupted build."""
    from elasticsearch_assets_ray.index.build import (
        IndexConfig,
        build_index,
        build_partition,
    )
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.sources.partition import plan_partitions

    out = str(tmp_path / "idx")
    cfg = IndexConfig(target_partition_rows=128, runs_per_bucket=2, num_shards=4)
    specs = plan_partitions(corpus_dir, 128)
    assert len(specs) >= 3

    # partition 0 finished cleanly
    build_partition(specs[0], cfg, out)
    # partition 1 "crashed": docstore + run written, MANIFEST missing
    build_partition(specs[1], cfg, out)
    os.unlink(os.path.join(out, "manifests", f"part-{specs[1].pid:05d}.json"))
    # stray tmp from an interrupted atomic write
    open(os.path.join(out, "runs", "zzz.tmp"), "w").write("junk")

    m = build_index(corpus_dir, out, config=cfg, resume=True)
    assert m["complete"]
    s = Searcher(out)
    got = s.search("def load index", k=5)

    fresh = str(tmp_path / "fresh")
    build_index(corpus_dir, fresh, config=cfg, resume=False)
    exp = Searcher(fresh).search("def load index", k=5)
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["score"].to_pylist() == exp["score"].to_pylist()


def test_es_hit_envelope_unwrap(ray_session, tmp_path):
    """A scroll dump of ES hit envelopes flattens to _source fields +
    _id and feeds the index build directly."""
    from elasticsearch_assets_ray.sources.ingest import jsonl_to_parquet

    src = tmp_path / "hits.jsonl"
    with open(src, "w") as f:
        for i in range(30):
            f.write(
                json.dumps(
                    {
                        "_id": f"doc-{i}",
                        "_index": "idx",
                        "_source": {"uuid": f"u{i}", "bytes": i * 10, "created": "2024-01-01"},
                    }
                )
                + "\n"
            )
    out = jsonl_to_parquet(str(src), str(tmp_path / "pq"), unwrap_source=True)
    import pyarrow.dataset as pads

    t = pads.dataset(out).to_table()
    assert t.num_rows == 30
    assert set(t.column_names) == {"_id", "uuid", "bytes", "created"}
    assert t.sort_by("bytes")["_id"][0].as_py() == "doc-0"
