"""ES ``_transform`` API (pivot), batch + CONTINUOUS mode.

An ES pivot transform materializes ``group_by → aggregations`` into a
destination index; in continuous mode it checkpoints on a sync time
field and folds only documents newer than the checkpoint into the
destination on every tick.

Ray-Data-first analog (exactness-preserving):

- The destination parquet stores the PARTIAL (``p_``-prefixed) column
  layout of :mod:`relational`'s combiner — sums stay sums, means stay
  (sum, n) pairs — which is ASSOCIATIVE, so a continuous tick only
  aggregates the NEW rows (``sync_field`` > checkpoint) into partials
  and re-combines them with the stored partials
  (:func:`_recombine_partials`).  Finalization (mean division, cents →
  currency) happens at READ time, so any number of ticks produces
  bit-identical results to one batch run.
- A tick is atomic + idempotent: the new dest parquet carries the
  checkpoint (max sync value folded, plus the spec fingerprint) in its
  SCHEMA METADATA, so data and checkpoint commit in one ``os.replace``;
  a crashed tick leaves the old (data, checkpoint) pair intact and
  re-running folds the same rows again to the same result.
- Group cardinality: ES pivots produce dashboard-sized tables, so the
  tick combine is driver-side (bounded by ``distinct_hint``, enforced
  like partial_agg's small path).  The unbounded-cardinality variant is
  the shuffle combine of :func:`relational.partial_agg` writing
  partitioned dest parquet — same partial layout, same merge.
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from elasticsearch_assets_ray.stages.relational import (
    AggSpec,
    _combine_group_vec,
    _partial_batch,
    _recombine_partials,
)


class PivotTransform:
    def __init__(
        self,
        dest: str,
        group_by: list[str],
        aggs: list[AggSpec],
        sync_field: str,
        distinct_hint: int = 100_000,
    ):
        self.dest = dest
        self.group_by = list(group_by)
        self.aggs = list(aggs)
        self.sync_field = sync_field
        self.distinct_hint = distinct_hint
        os.makedirs(dest, exist_ok=True)

    # ---------- state ----------
    def _spec(self) -> str:
        return json.dumps(
            {
                "group_by": self.group_by,
                "aggs": [[a.out, a.col, a.kind] for a in self.aggs],
                "sync_field": self.sync_field,
            },
            sort_keys=True,
        )

    def _read_meta(self) -> dict | None:
        """State rides the partials parquet's SCHEMA METADATA, so the
        (partials, checkpoint) pair commits in ONE os.replace — a crash
        can never leave new partials under an old checkpoint (which
        would re-fold rows and double-count)."""
        if not os.path.exists(self._partials_path()):
            return None
        md = pq.read_schema(self._partials_path()).metadata or {}
        raw = md.get(b"pivot_meta")
        return json.loads(raw) if raw else None

    def checkpoint(self):
        """Last folded sync value (None before the first tick); a spec
        change invalidates the destination (ES requires a transform
        reset on config change)."""
        meta = self._read_meta()
        if meta is None or meta.get("spec") != self._spec():
            return None
        v = meta["checkpoint"]
        if isinstance(v, str):
            from datetime import datetime

            return datetime.fromisoformat(v)
        return v

    def _partials_path(self) -> str:
        return os.path.join(self.dest, "partials.parquet")

    # ---------- ticks ----------
    def tick(self, ds: ray.data.Dataset) -> int:
        """Fold rows with ``sync_field`` strictly newer than the
        checkpoint into the destination; returns the number of partial
        rows folded.  The per-batch combiner runs distributed; only
        ≤ |batches| × |keys-in-batch| partial rows reach the driver."""
        ckpt = self.checkpoint()
        if ckpt is None and os.path.exists(self._partials_path()):
            # no valid checkpoint but partials on disk = a spec change —
            # stale partials must not survive into the new transform
            # (re-folding everything over them would double-count)
            os.remove(self._partials_path())
        sync = self.sync_field

        def part(b: pa.Table) -> pa.Table:
            if ckpt is not None:
                b = b.filter(pc.greater(b[sync], pa.scalar(ckpt, b[sync].type)))
            p = _partial_batch(b, self.group_by, self.aggs)
            mx = pc.max(b[sync]).as_py() if b.num_rows else None
            return p.append_column(
                "__sync_max",
                pa.array([mx] * p.num_rows, b[sync].type)
                if p.num_rows
                else pa.array([], b[sync].type),
            )

        acc: pa.Table | None = None
        new_ckpt = ckpt
        folded = 0
        for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows == 0:
                continue
            folded += b.num_rows
            bmax = pc.max(b["__sync_max"]).as_py()
            if bmax is not None and (new_ckpt is None or bmax > new_ckpt):
                new_ckpt = bmax
            b = b.drop_columns(["__sync_max"])
            acc = b if acc is None else pa.concat_tables([acc, b])
            if acc.num_rows >= max(65536, 2 * self.distinct_hint):
                acc = _recombine_partials(acc, self.group_by, self.aggs)
                if acc.num_rows > 5 * self.distinct_hint:
                    raise ValueError(
                        "pivot cardinality exceeds distinct_hint — use the "
                        "partial_agg shuffle variant for unbounded pivots"
                    )
        if acc is None:
            return 0  # nothing newer than the checkpoint — dest untouched
        # final combine + the cardinality contract check (the in-loop
        # check only fires past the fold threshold)
        acc = _recombine_partials(acc, self.group_by, self.aggs)
        if acc.num_rows > 5 * self.distinct_hint:
            raise ValueError(
                "pivot cardinality exceeds distinct_hint — use the "
                "partial_agg shuffle variant for unbounded pivots"
            )
        parts = [acc]
        if os.path.exists(self._partials_path()):
            prev = pq.read_table(self._partials_path())
            parts = [prev, acc.select(prev.column_names)]
        merged = _recombine_partials(
            pa.concat_tables(parts), self.group_by, self.aggs
        )
        # ONE atomic commit: partials + checkpoint travel together in the
        # parquet schema metadata
        meta = json.dumps(
            {
                "spec": self._spec(),
                "checkpoint": new_ckpt.isoformat()
                if hasattr(new_ckpt, "isoformat")
                else new_ckpt,
            }
        )
        merged = merged.replace_schema_metadata({b"pivot_meta": meta.encode()})
        fd, tmp = tempfile.mkstemp(dir=self.dest, suffix=".parquet")
        os.close(fd)
        pq.write_table(merged, tmp)
        os.replace(tmp, self._partials_path())
        return folded

    # ---------- reads ----------
    def result(self) -> pa.Table:
        """Finalized destination table (the ES dest index view): partials
        combined + finalized exactly like a one-shot partial_agg."""
        t = pq.read_table(self._partials_path())
        return _combine_group_vec(t, self.group_by, self.aggs)
