"""Reindex — the reference's FLAGSHIP composition as one resumable
distributed pipeline: slicer-planned reads → per-batch transform →
partitioned, checkpointed output.

The reference's whole purpose is this pipeline (asset/src/
elasticsearch_reader → teraslice processors → asset/src/
elasticsearch_bulk: date/id slicers plan slices, fetchers execute them,
the sender bulk-writes, and Teraslice recovers by replaying unfinished
slices).  Here:

- Slices are planned DRIVER-side by the same ReaderAPI planners the
  reference models (even date division, fixed intervals, count-guided
  adaptive, keyspace prefixes) — cheap footer/count probes only.
- Each slice executes as ONE Ray task: column-pruned predicate read →
  optional transform → atomic ``part-<slice>.parquet`` write plus a
  sidecar ``.done.json`` carrying the slice spec, row counts and the
  output fingerprint.  Tasks are independent → linear scale-out, and a
  lost worker only re-runs its slice (Ray retries the task).
- ``resume=True`` skips every slice whose ``.done.json`` matches the
  CURRENT slice spec (the reference's recovery-fast-forward, P10, at
  pipeline level): re-planning with different parameters invalidates
  only the slices whose spec changed.

Raw ``ray.remote`` tasks (not Dataset.map_batches) are the right tool
HERE because the unit of checkpointing is the slice: per-slice atomic
output + sidecar is exactly what Dataset's block-oriented write cannot
express (a Dataset write commits all-or-nothing per run, not per
slice).  Everything inside a slice stays Arrow-vectorized.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice


def _slice_key(s: ReaderSlice) -> str:
    """Stable content key of a slice spec (the resume fingerprint)."""
    return json.dumps(
        {
            "start": str(s.start) if s.start is not None else None,
            "end": str(s.end) if s.end is not None else None,
            "keys": list(s.keys),
            "keys_exact": bool(s.keys_exact),
            "query": s.query,
            "limit": s.limit,
        },
        sort_keys=True,
    )


@ray.remote
def _run_slice(
    table_path: str,
    date_col: str | None,
    key_col: str | None,
    s: ReaderSlice,
    out_file: str,
    done_file: str,
    columns: list[str] | None,
    transform: Callable[[pa.Table], pa.Table] | None,
) -> dict:
    api = ReaderAPI(table_path, date_col=date_col, key_col=key_col)
    t = api.fetch(s, columns=columns)
    rows_in = t.num_rows
    if transform is not None:
        t = transform(t)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(out_file), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(t, tmp)
        os.replace(tmp, out_file)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    entry = {
        "slice": _slice_key(s),
        "rows_in": rows_in,
        "rows_out": t.num_rows,
        "file": os.path.basename(out_file),
    }
    with open(done_file, "w") as f:
        json.dump(entry, f)
    return entry


def reindex(
    src_table: str,
    out_dir: str,
    *,
    date_col: str | None = None,
    key_col: str | None = None,
    slices: list[ReaderSlice] | None = None,
    n_slices: int = 8,
    columns: list[str] | None = None,
    transform: Callable[[pa.Table], pa.Table] | None = None,
    resume: bool = True,
) -> dict:
    """Run the reader→transform→writer pipeline; returns the manifest
    (per-slice lineage + totals).  Slices default to the even date
    division when ``date_col`` is set, else the keyspace plan — or pass
    your own (e.g. ``make_adaptive_date_ranges`` output)."""
    api = ReaderAPI(src_table, date_col=date_col, key_col=key_col)
    if slices is None:
        if date_col is not None:
            slices = api.make_date_slicer_ranges(n_slices)
        elif key_col is not None:
            slices = api.make_id_slicer_ranges(
                "abcdefghijklmnopqrstuvwxyz0123456789", max_count=10**9
            )[:n_slices] or []
        else:
            raise ValueError("need date_col, key_col or explicit slices")
    os.makedirs(out_dir, exist_ok=True)
    # a RE-plan with FEWER slices must remove the previous run's tail
    # parts — glob consumers would otherwise silently read stale rows
    # alongside the new output
    import glob as _glob

    for f in _glob.glob(os.path.join(out_dir, "part-*")):
        stem = os.path.basename(f).split(".")[0]
        if int(stem.split("-")[1]) >= len(slices):
            os.unlink(f)
    futures, done, entries = [], 0, []
    for i, s in enumerate(slices):
        out_file = os.path.join(out_dir, f"part-{i:05d}.parquet")
        done_file = os.path.join(out_dir, f"part-{i:05d}.done.json")
        if resume and os.path.exists(done_file) and os.path.exists(out_file):
            with open(done_file) as f:
                prev = json.load(f)
            if prev.get("slice") == _slice_key(s):
                entries.append(prev)
                done += 1
                continue
        futures.append(
            _run_slice.remote(
                src_table, date_col, key_col, s, out_file, done_file,
                columns, transform,
            )
        )
    entries.extend(ray.get(futures))
    manifest = {
        "n_slices": len(slices),
        "slices_skipped_resume": done,
        "rows_in": int(sum(e["rows_in"] for e in entries)),
        "rows_out": int(sum(e["rows_out"] for e in entries)),
        "entries": sorted(entries, key=lambda e: e["file"]),
        "complete": True,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
