"""Index re-sharding — the ES ``_split`` / ``_shrink`` analog.

ES changes an index's primary shard count by re-routing every doc into
a new shard layout WITHOUT re-analyzing (split: each shard divides;
shrink: shards merge).  This engine's analog of the primary-shard knob
is the segment layout pair:

- ``runs_per_bucket`` — the docID-range bucket granularity.  Buckets
  are the unit of serving-shard assignment (query/sharded.py splits the
  bucket space into K contiguous serving shards) and of block-max
  pruning, so SPLITTING buckets (smaller rpb) raises the maximum
  serving fan-out and sharpens pruning bounds; SHRINKING (larger rpb)
  cuts per-term segment-row overhead on small corpora.
- ``num_shards`` — the term-hash segment directories (phase-2
  parallelism + dictionary-lookup fan-out).

:func:`reshard_index` rewrites ONLY the postings layout: segments
decode to phase-1-format runs (the expunge machinery's decode path with
an empty tombstone set — no re-tokenization, docIDs unchanged) and the
standard phase-2 merge rebuilds segments, block metadata and
positions under the new layout.  The docstore is copied verbatim (same
pids, same row offsets), tombstones and PIT snapshots stay valid, and
every search result is bit-identical by construction (pinned by
tests/test_reshard.py across query shapes and both serving paths).

Scale shape: one streaming pass over the segment files (decode →
re-key) writing bucket-affine v3 runs
(:func:`..index.build.write_rewrite_runs_batch`), so phase 2 takes the
same ZERO-SHUFFLE path as a fresh build — one independent merge task
per (shard, bucket), no all-to-all.  The whole operation moves index
bytes, never corpus bytes, which at 100 TB is the difference between
hours and days.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

from elasticsearch_assets_ray.index.build import IndexConfig, run_phase2
from elasticsearch_assets_ray.index.deletes import _segment_to_runs


def reshard_index(
    index_dir: str,
    out_dir: str,
    num_shards: int | None = None,
    runs_per_bucket: int | None = None,
) -> dict:
    """Write a NEW index at ``out_dir`` with the same documents and
    statistics but a different segment layout.  The source index is
    untouched.  Returns the new global manifest."""
    import functools

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    new_ns = int(num_shards if num_shards is not None else man["num_shards"])
    new_rpb = int(
        runs_per_bucket
        if runs_per_bucket is not None
        else man.get("runs_per_bucket", 32)
    )
    if new_ns == int(man["num_shards"]) and new_rpb == int(
        man.get("runs_per_bucket", 32)
    ):
        raise ValueError(
            "reshard target equals the source layout "
            f"(num_shards={new_ns}, runs_per_bucket={new_rpb})"
        )
    os.makedirs(out_dir, exist_ok=True)

    # ---- docstore: verbatim copy (docIDs and row offsets unchanged) ----
    dst_doc = os.path.join(out_dir, "docstore")
    os.makedirs(dst_doc, exist_ok=True)
    for p in _glob.glob(os.path.join(index_dir, "docstore", "part-*.parquet")):
        shutil.copy2(p, os.path.join(dst_doc, os.path.basename(p)))
    # sidecars keyed by docID stay valid: tombstones + PITs ("deleted/"),
    # dense-vector parts ("vectors/")
    for extra in ("deleted", "vectors"):
        src = os.path.join(index_dir, extra)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(out_dir, extra), dirs_exist_ok=True)

    # ---- postings: segments → runs (no tombstones) → phase-2 shuffle ----
    from elasticsearch_assets_ray.index.codec import (
        decode_postings,
        decode_postings_pfor,
    )

    decode_fn = (
        decode_postings_pfor if man.get("codec") == "pfor" else decode_postings
    )
    has_positions = bool(man.get("index_positions"))
    doc_shift = int(man["doc_shift"])
    seg_files = sorted(
        _glob.glob(
            os.path.join(index_dir, "segments", "**", "*.parquet"),
            recursive=True,
        )
    )
    runs_dir = os.path.join(out_dir, "runs")
    os.makedirs(runs_dir, exist_ok=True)
    if seg_files:
        empty_tomb = ray.put(np.empty(0, dtype=np.int64))
        cols = ["term", "df", "blob"] + (["pos"] if has_positions else [])
        runs_ds = ray.data.read_parquet(seg_files, columns=cols).map_batches(
            functools.partial(
                _segment_to_runs,
                tomb_ref=empty_tomb,
                doc_shift=doc_shift,
                decode_fn=decode_fn,
                has_positions=has_positions,
                pos_codec=man.get("positions_codec"),
            ),
            batch_format="pyarrow",
        )

        # bucket-affine v3 run files keyed to the NEW layout (new_rpb /
        # new_ns) → run_phase2's zero-shuffle path rebuilds the segments
        # with no all-to-all
        from elasticsearch_assets_ray.index.build import (
            write_rewrite_runs_batch,
        )

        runs_ds.map_batches(
            functools.partial(
                write_rewrite_runs_batch,
                runs_dir=runs_dir,
                rpb=new_rpb,
                num_shards=new_ns,
            ),
            batch_format="pyarrow",
        ).to_pandas()

    cfg = IndexConfig(
        content_col=man.get("content_col", "content"),
        codec=man.get("codec", "varint"),
        store_content=man.get("store_content", True),
        index_positions=has_positions,
        num_shards=new_ns,
        runs_per_bucket=new_rpb,
        analyzer=man.get("analyzer"),
    )
    run_phase2(out_dir, cfg)
    shutil.rmtree(runs_dir, ignore_errors=True)

    from elasticsearch_assets_ray.index.build import _atomic_write_json

    new_man = dict(man)
    new_man.update(
        {
            "num_shards": new_ns,
            "runs_per_bucket": new_rpb,
            "resharded_from": index_dir,
            "complete": True,
        }
    )
    _atomic_write_json(new_man, os.path.join(out_dir, "manifest.json"))
    return new_man
