"""Partition planning — the Ray-native analog of the reference's slicers.

The reference's slicer emits ``ReaderSlice`` partition descriptors sized by
count probes (reference: packages/elasticsearch-asset-apis/src/
elasticsearch-reader-api/ElasticsearchReaderAPI.ts:225-285 auto-interval;
dateSlicer.ts:86-201 adaptive recursion).  Here the document space is a set
of Parquet files, so the count probe is free: Parquet footer metadata gives
exact per-row-group row counts without scanning data (the F3 analog).  The
planner packs row groups into partitions of ~``target_rows`` rows — the
``size``-bounded slice of the reference (schema.ts:27-33, default 5000 docs
per slice; ours defaults much larger because a partition is a Ray task, not
an HTTP fetch).

Every partition gets a stable ``pid`` and a docID base ``pid << DOC_SHIFT``
so docIDs are (a) deterministic given the sorted input file list, (b)
disjoint and ordered across partitions — which makes the posting merge a
concatenation of docID-sorted runs, never a k-way interleave.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

DOC_SHIFT = 22  # ≤ 4M docs per partition; pid << 22 = docID base
MAX_PARTITION_ROWS = 1 << DOC_SHIFT


@dataclass
class PartitionSpec:
    """One unit of index-build work (the ReaderSlice analog,
    reference interfaces.ts:138-168)."""

    pid: int
    path: str
    row_groups: list[int] = field(default_factory=list)
    n_rows: int = 0

    @property
    def doc_base(self) -> int:
        return self.pid << DOC_SHIFT

    def to_row(self) -> dict:
        return {
            "pid": self.pid,
            "path": self.path,
            "row_groups": list(self.row_groups),
            "n_rows": self.n_rows,
        }

    @staticmethod
    def from_row(row: dict) -> "PartitionSpec":
        return PartitionSpec(
            pid=int(row["pid"]),
            path=str(row["path"]),
            row_groups=[int(g) for g in row["row_groups"]],
            n_rows=int(row["n_rows"]),
        )


def expand_paths(paths: str | list[str]) -> list[str]:
    """Deterministic sorted file list (docID stability depends on it)."""
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
        elif any(ch in p for ch in "*?["):
            out.extend(glob.glob(p))
        else:
            out.append(p)
    return sorted(set(out))


def plan_partitions(
    paths: str | list[str],
    target_rows: int = 256 * 1024,
    pid_base: int = 0,
    hook=None,
) -> list[PartitionSpec]:
    """Pack Parquet row groups into ~target_rows partitions.

    Footer-metadata only — no data is read (scales to millions of files;
    at very large file counts this planning step itself can be distributed
    with ``map_batches`` over the file list, same logic per file).
    ``pid_base`` offsets pids (and therefore docID bases) so multiple
    builds (e.g. incremental deltas) share one disjoint docID space.
    """
    target_rows = min(target_rows, MAX_PARTITION_ROWS)
    specs: list[PartitionSpec] = []
    pid = pid_base
    for path in expand_paths(paths):
        meta = pq.ParquetFile(path).metadata
        cur_groups: list[int] = []
        cur_rows = 0
        for rg in range(meta.num_row_groups):
            rg_rows = meta.row_group(rg).num_rows
            if cur_rows > 0 and cur_rows + rg_rows > target_rows:
                specs.append(PartitionSpec(pid, path, cur_groups, cur_rows))
                pid += 1
                cur_groups, cur_rows = [], 0
            if rg_rows > MAX_PARTITION_ROWS:
                raise ValueError(
                    f"row group of {rg_rows} rows exceeds MAX_PARTITION_ROWS; "
                    f"rewrite {path} with smaller row groups"
                )
            cur_groups.append(rg)
            cur_rows += rg_rows
        if cur_groups:
            specs.append(PartitionSpec(pid, path, cur_groups, cur_rows))
            pid += 1
    if hook is not None:
        # observer of the discovered plan (the DateSlicerMetadataHook
        # analog, reference interfaces.ts:259-275 — callers use it to
        # surface interval/range metadata into job state)
        hook(specs)
    return specs
