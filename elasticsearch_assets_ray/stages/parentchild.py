"""ES ``join`` field semantics (parent/child) on Ray Data.

Elasticsearch models intra-index parent/child relations with the ``join``
field: children are routed to the parent's shard, ``has_child`` returns
parents whose children match a query (relevance folded in via
``score_mode`` = none/sum/max/min/avg plus ``min_children``/
``max_children``), ``has_parent`` returns children of matching parents,
and the ``children`` aggregation nests child metrics under parent-side
buckets.  The reference repo delegates these to Elasticsearch itself
(its readers only page matching hits out — see
ElasticsearchReaderAPI.ts); here the semantics are re-expressed
Ray-Data-first:

- ES's routing co-location (parent and children share a shard) maps to
  ONE hash-partitioned ``Dataset.join`` on the parent key.
- The child-side ``score_mode`` reduction runs as :func:`partial_agg`
  (per-batch Arrow combiner → bounded shuffle) BEFORE the join, so the
  exchange moves one partial row per (batch, parent), never raw
  children — at 100 TB the join's child side is already parent-sized.
- Scores are carried as integer cents (``score_cents``) through the
  sum/avg reductions so results are bit-deterministic regardless of
  block combine order (float sums are not associative).

Matching + scoring is ONE vectorized callable per side
(``pa.Table -> pa.Table``): the caller filters and scores a batch with
pyarrow.compute kernels and returns only the matching rows — no
per-row Python anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from elasticsearch_assets_ray.stages.relational import (
    AggSpec,
    _partial_batch,
    partial_agg,
)

#: ES has_child score_mode values (ES docs: "none" scores parents 0.0)
SCORE_MODES = ("none", "sum", "max", "min", "avg")

# NOTE on operator ordering: ``groupby().map_groups`` emits ZERO-COLUMN
# blocks for sort partitions that received no rows, map_batches never
# visits empty blocks (they bypass the operator unchanged), and
# ``Dataset.join`` fails on a column-less input block ("No match for
# FieldRef.Name(<key>)").  So a full groupby combine must never feed a
# join: has_child joins per-BATCH partials (associative) to the parents
# and re-combines AFTER the join, keeping the combine terminal.


def _finalize_score(t: pa.Table, score_mode: str) -> pa.Table:
    """Per-parent (sum_c, max_c, min_c, n_children) partials -> ES score."""
    n = t["n_children"]
    if score_mode == "none":
        score = pa.nulls(t.num_rows, pa.float64()).fill_null(0.0)
    elif score_mode == "sum":
        score = pc.divide(pc.cast(t["__sum_c"], pa.float64()), pa.scalar(100.0))
    elif score_mode == "avg":
        score = pc.divide(
            pc.divide(pc.cast(t["__sum_c"], pa.float64()), pa.scalar(100.0)),
            pc.cast(n, pa.float64()),
        )
    else:  # max / min
        score = pc.divide(pc.cast(t[f"__{score_mode}_c"], pa.float64()), pa.scalar(100.0))
    return t.drop_columns(["__sum_c", "__max_c", "__min_c"]).append_column(
        "score", score
    )


def has_child(
    parents: ray.data.Dataset,
    children: ray.data.Dataset,
    *,
    parent_key: str,
    child_key: str,
    child_fn: Callable[[pa.Table], pa.Table],
    score_mode: str = "none",
    min_children: int = 1,
    max_children: int | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """ES ``has_child`` query: parents with ≥min_children (≤max_children)
    matching children, scored per ``score_mode``.

    ``child_fn`` receives a child batch and returns the MATCHING rows as
    ``(child_key, score_cents:int64)`` — the child query's filter and
    relevance function fused into one vectorized Arrow callable (pass
    zeros for filter-context semantics).

    Output: every parent column + ``n_children`` + ``score`` (float64;
    0.0 when score_mode="none", matching ES).
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    batch_aggs = [
        AggSpec("sc", "score_cents", "sum"),
        AggSpec("mx", "score_cents", "max"),
        AggSpec("mn", "score_cents", "min"),
        AggSpec("nc", "score_cents", "count"),
    ]

    def partial(b: pa.Table) -> pa.Table:
        m = child_fn(b).select([child_key, "score_cents"])
        p = _partial_batch(m, [child_key], batch_aggs)
        if child_key != parent_key:
            p = p.rename_columns(
                [parent_key if c == child_key else c for c in p.column_names]
            )
        if p.num_rows == 0:
            # a batch with no matching children must still emit a row: the
            # hash-shuffle join broadcasts schemas off its FIRST submitted
            # block and an empty first block silently consumes that
            # broadcast (zero-column partitions → ArrowInvalid).  A
            # NULL-keyed sentinel never inner-joins (SQL null semantics).
            return pa.table(
                {
                    parent_key: pa.array([None], p.schema.field(parent_key).type),
                    "p_sc": pa.array([0], pa.int64()),
                    "p_mx": pa.array([0], pa.int64()),
                    "p_mn": pa.array([0], pa.int64()),
                    "p_nc": pa.array([0], pa.int64()),
                }
            )
        return p

    # one partial row per (child batch, parent) — the join's child side is
    # already parent-sized; the per-parent combine runs AFTER the join
    # (partials are associative) so no groupby output ever feeds the join
    per_batch = children.map_batches(partial, batch_format="pyarrow")
    joined = parents.join(
        per_batch, join_type="inner", on=(parent_key,), num_partitions=num_partitions
    )
    payload = [c for c in parents.schema().names if c != parent_key]
    combined = partial_agg(
        joined,
        [parent_key, *payload],
        [
            AggSpec("__sum_c", "p_sc", "sum"),
            AggSpec("__max_c", "p_mx", "max"),
            AggSpec("__min_c", "p_mn", "min"),
            AggSpec("n_children", "p_nc", "sum"),
        ],
    )

    def fin(b: pa.Table) -> pa.Table:
        mask = pc.greater_equal(b["n_children"], pa.scalar(min_children))
        if max_children is not None:
            mask = pc.and_(
                mask, pc.less_equal(b["n_children"], pa.scalar(max_children))
            )
        return _finalize_score(b.filter(mask), score_mode)

    return combined.map_batches(fin, batch_format="pyarrow")


def has_parent(
    parents: ray.data.Dataset,
    children: ray.data.Dataset,
    *,
    parent_key: str,
    child_key: str,
    parent_fn: Callable[[pa.Table], pa.Table],
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """ES ``has_parent`` query: children whose parent matches, each child
    carrying the parent's relevance (``score=true``; pass zero cents for
    ES's score=false → 0.0).

    ``parent_fn`` returns the MATCHING parent rows as ``(parent_key,
    score_cents:int64)``.  Both sides stay distributed — the matched
    parent set can be a large fraction of a 100 TB index, so this is a
    hash-partitioned join, not a broadcast.

    Output: every child column + ``score`` (float64).
    """
    def match(b: pa.Table) -> pa.Table:
        m = parent_fn(b).select([parent_key, "score_cents"])
        if parent_key != child_key:
            m = m.rename_columns(
                [child_key if c == parent_key else c for c in m.column_names]
            )
        if m.num_rows == 0:
            # same empty-first-block schema-broadcast hazard as has_child:
            # emit a NULL-keyed sentinel instead of an empty block
            return pa.table(
                {
                    child_key: pa.array([None], m.schema.field(child_key).type),
                    "score_cents": pa.array([0], pa.int64()),
                }
            )
        return m

    matched = parents.map_batches(match, batch_format="pyarrow")
    joined = children.join(
        matched, join_type="inner", on=(child_key,), num_partitions=num_partitions
    )
    return joined.map_batches(
        lambda b: b.drop_columns(["score_cents"]).append_column(
            "score",
            pc.divide(pc.cast(b["score_cents"], pa.float64()), pa.scalar(100.0)),
        ),
        batch_format="pyarrow",
    )


def children_terms_agg(
    parents: ray.data.Dataset,
    children: ray.data.Dataset,
    *,
    parent_key: str,
    child_key: str,
    bucket_col: str,
    child_aggs: list[AggSpec],
    bucket_hint: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """ES ``terms`` aggregation on a PARENT field with a nested
    ``children`` aggregation: child metrics grouped by the parent-side
    bucket.

    The parent side is projected to (key, bucket) before the join — the
    only parent bytes that move are the bucket labels — and the child
    metrics are pre-reduced per batch by :func:`partial_agg` after the
    join, so the second (bucket) exchange is bounded by ``bucket_hint``.
    """
    slim = parents.map_batches(
        lambda b: b.select([parent_key, bucket_col]), batch_format="pyarrow"
    )
    if parent_key != child_key:
        slim = slim.map_batches(
            lambda b: b.rename_columns(
                [child_key if c == parent_key else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
    need = {child_key, *[a.col for a in child_aggs]}
    kids = children.map_batches(
        lambda b: b.select([c for c in b.column_names if c in need]),
        batch_format="pyarrow",
    )
    joined = kids.join(
        slim, join_type="inner", on=(child_key,), num_partitions=num_partitions
    )
    return partial_agg(joined, [bucket_col], child_aggs, distinct_hint=bucket_hint)
