"""Scalable relational building blocks on Ray Data.

These are the wide operators the reference *lacks* (SURVEY.md §2.6 — it
delegates everything beyond `count` to Elasticsearch) re-expressed
Ray-Data-first with the 100-TB patterns baked in:

- :func:`partial_agg` — pre-aggregate inside ``map_batches`` (Arrow
  ``Table.group_by`` per batch) so the ``groupby`` shuffle moves only
  per-batch partials, never raw rows.  Sums over money-like doubles are
  done in integer cents (``sum_cents``) so results are bit-deterministic
  regardless of combine order.
- :func:`broadcast_join` — small-side hash join: the small table is
  ``ray.put`` ONCE and every ``map_batches`` task joins its Arrow batch
  against it (inner/left/semi/anti).  No all-to-all shuffle.
- :func:`topk` — per-batch local top-k prune, then a tiny global sort —
  the ``sort().limit(k)`` semantics without sorting the full dataset.

The reference's only aggregate is a predicate count
(ElasticsearchReaderAPI.ts:84-87); everything here is new surface.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# ---------------------------------------------------------------------------
# partial aggregation
# ---------------------------------------------------------------------------

#: kind -> (arrow partial agg fn, final combine)
_KINDS = {"sum", "sum_cents", "count", "min", "max", "mean", "mean_cents"}


@dataclass(frozen=True)
class AggSpec:
    """out_name = kind(col).  ``sum_cents``/``mean_cents`` round col*100 to
    int64 first (exact money arithmetic, combine-order independent)."""

    out: str
    col: str
    kind: str

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown agg kind {self.kind!r}")


def _partial_batch(batch: pa.Table, keys: list[str], aggs: list[AggSpec]) -> pa.Table:
    cols: dict[str, pa.Array] = {k: batch[k] for k in keys}
    plan: list[tuple[str, str]] = []  # (tmp col name, arrow agg)
    names: list[str] = []
    tmp = dict(cols)
    for i, a in enumerate(aggs):
        cname = f"__a{i}"
        if a.kind in ("sum_cents", "mean_cents"):
            # half away from zero = DuckDB/SQL round(); Arrow's default
            # half-to-even diverges on exact .5 doubles (possible when the
            # scaled value is dyadic, e.g. x.75 × 0.94 × 100)
            v = pc.cast(
                pc.round(
                    pc.multiply(batch[a.col], pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        elif a.kind == "count":
            v = pa.nulls(batch.num_rows, pa.int64()).fill_null(1)
        else:
            v = batch[a.col]
        tmp[cname] = v
        if a.kind in ("sum", "sum_cents"):
            plan.append((cname, "sum"))
        elif a.kind == "count":
            plan.append((cname, "sum"))
        elif a.kind in ("mean", "mean_cents"):
            plan.append((cname, "sum"))
            tmp[cname + "_n"] = pa.nulls(batch.num_rows, pa.int64()).fill_null(1)
            plan.append((cname + "_n", "sum"))
        else:  # min / max
            plan.append((cname, a.kind))
        names.append(cname)
    t = pa.table(tmp)
    g = t.group_by(keys, use_threads=False).aggregate(plan)
    # arrow names results "<col>_<agg>"
    out_cols: dict[str, pa.Array] = {k: g[k] for k in keys}
    for (cname, agg), a in zip(
        [p for p in plan if not p[0].endswith("_n")], aggs
    ):
        out_cols[f"p_{a.out}"] = g[f"{cname}_{agg}"]
        if a.kind in ("mean", "mean_cents"):
            out_cols[f"p_{a.out}__n"] = g[f"{cname}_n_sum"]
    return pa.table(out_cols)


def key_group_column(batch: pa.Table, keys: list[str], n_groups: int) -> pa.Array:
    """Deterministic coarse shuffle key: hash(keys) % n_groups.  Groups by
    THIS instead of the raw keys so the downstream ``map_groups`` runs one
    vectorized Python call per coarse group (≤ n_groups total), never one
    per distinct key — the per-distinct-key ``map_groups`` trap."""
    from elasticsearch_assets_ray.stages.textstats import polynomial_hash

    key = pc.cast(batch[keys[0]], pa.string()).fill_null("\x00null")
    for k in keys[1:]:
        key = pc.binary_join_element_wise(
            key, pc.cast(batch[k], pa.string()).fill_null("\x00null"), "\x1f"
        )
    h = polynomial_hash(key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key)
    return pa.array((h % np.uint64(n_groups)).astype(np.int64))


def _combine_group_vec(group: pa.Table, keys: list[str], aggs: list[AggSpec]) -> pa.Table:
    """Final combine for ONE coarse group: a single vectorized Arrow
    group_by over every distinct key hashed into this group (no per-key
    Python)."""
    plan: list[tuple[str, str]] = []
    for a in aggs:
        if a.kind in ("sum", "sum_cents", "count"):
            plan.append((f"p_{a.out}", "sum"))
        elif a.kind in ("min", "max"):
            plan.append((f"p_{a.out}", a.kind))
        else:  # mean / mean_cents
            plan.append((f"p_{a.out}", "sum"))
            plan.append((f"p_{a.out}__n", "sum"))
    g = group.group_by(keys, use_threads=False).aggregate(plan)
    out: dict[str, pa.Array] = {k: g[k] for k in keys}
    for a in aggs:
        if a.kind in ("sum", "sum_cents", "count"):
            out[a.out] = g[f"p_{a.out}_sum"]
        elif a.kind in ("min", "max"):
            out[a.out] = g[f"p_{a.out}_{a.kind}"]
        else:
            s = pc.cast(g[f"p_{a.out}_sum"], pa.float64())
            n = pc.cast(g[f"p_{a.out}__n_sum"], pa.float64())
            if a.kind == "mean_cents":
                s = pc.divide(s, pa.scalar(100.0))
            out[a.out] = pc.divide(s, n)
    return pa.table(out)


def _recombine_partials(t: pa.Table, keys: list[str], aggs: list[AggSpec]) -> pa.Table:
    """Combine partial rows into FEWER partial rows (same ``p_`` column
    layout) — sums stay sums, means stay (sum, n) pairs, so recombining
    is associative and can run incrementally."""
    plan: list[tuple[str, str]] = []
    for a in aggs:
        if a.kind in ("min", "max"):
            plan.append((f"p_{a.out}", a.kind))
        else:
            plan.append((f"p_{a.out}", "sum"))
        if a.kind in ("mean", "mean_cents"):
            plan.append((f"p_{a.out}__n", "sum"))
    g = t.group_by(keys, use_threads=False).aggregate(plan)
    out: dict[str, pa.Array] = {k: g[k] for k in keys}
    for a in aggs:
        suffix = a.kind if a.kind in ("min", "max") else "sum"
        out[f"p_{a.out}"] = g[f"p_{a.out}_{suffix}"]
        if a.kind in ("mean", "mean_cents"):
            out[f"p_{a.out}__n"] = g[f"p_{a.out}__n_sum"]
    return pa.table(out)


#: driver-combine allowed when the caller declares ≤ this many distinct keys
SMALL_COMBINE_MAX_HINT = 200_000


def partial_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[AggSpec],
    *,
    n_groups: int = 64,
    distinct_hint: int | None = None,
) -> ray.data.Dataset:
    """groupby(keys) with per-batch pre-aggregation (combiner) before the
    shuffle.  The shuffled relation has ≤ |batches| × |distinct keys in
    batch| rows — at 100 TB the exchange moves partials, never data.

    Two final-combine strategies:

    - ``distinct_hint`` set and ≤ :data:`SMALL_COMBINE_MAX_HINT` (the
      caller KNOWS key cardinality is bounded — e.g. 6 returnflag×status
      pairs, 5 market segments): stream the partial batches to the driver
      and fold them with an incremental Arrow group_by.  No second Ray
      stage at all — the ``groupby().map_groups`` shuffle costs a fixed
      ~0.5 s of orchestration per query regardless of data size, which
      dominates low-cardinality aggregates (round-2 tpch_q1 regression).
      Driver memory is bounded: partials are re-combined every
      ``2^16`` rows, and a hint that lies (true cardinality > 5× the
      bound) raises instead of silently accumulating.
    - otherwise (unbounded cardinality): shuffle by ``hash(keys) %
      n_groups`` (bounded group count), each group combined by ONE
      vectorized Arrow group_by — constant Python-call count regardless
      of cardinality (grouping by the raw keys would invoke Python once
      per distinct key, e.g. once per customer)."""
    partial = ds.map_batches(
        lambda b: _partial_batch(b, keys, aggs), batch_format="pyarrow"
    )
    if distinct_hint is not None and distinct_hint <= SMALL_COMBINE_MAX_HINT:
        fold_every = max(65536, 2 * distinct_hint)
        acc: pa.Table | None = None
        for b in partial.iter_batches(batch_format="pyarrow"):
            acc = b if acc is None else pa.concat_tables([acc, b])
            if acc.num_rows >= fold_every:
                acc = _recombine_partials(acc, keys, aggs)
                if acc.num_rows > 5 * max(distinct_hint, 1):
                    raise ValueError(
                        f"partial_agg distinct_hint={distinct_hint} but "
                        f"≥{acc.num_rows} distinct keys observed — drop the "
                        "hint to use the shuffle combine"
                    )
        if acc is None:
            sch = ds.schema()
            empty = pa.table({n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)})
            acc = _partial_batch(empty, keys, aggs)
        return ray.data.from_arrow(_combine_group_vec(acc, keys, aggs))
    with_grp = partial.map_batches(
        lambda p: p.append_column("__grp", key_group_column(p, keys, n_groups)),
        batch_format="pyarrow",
    )
    return with_grp.groupby("__grp").map_groups(
        lambda g: _combine_group_vec(g.drop_columns(["__grp"]), keys, aggs),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# broadcast join
# ---------------------------------------------------------------------------


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    keys: str | list[str],
    *,
    join_type: str = "inner",
    right_keys: str | list[str] | None = None,
) -> ray.data.Dataset:
    """Join ``big`` (streamed) against ``small`` (broadcast ONCE via
    ``ray.put``; every task's ``ray.get`` is a zero-copy plasma read on
    the node that already holds the object).  join_type ∈ {inner, left,
    semi, anti}.  Stateless tasks, not an actor pool: Ray reuses warm
    worker processes, so there is no per-query pool spin-up and the
    object fetch amortizes across a worker's tasks."""
    if isinstance(keys, str):
        keys = [keys]
    if isinstance(right_keys, str):
        right_keys = [right_keys]
    rk = right_keys or keys
    jt = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
    }[join_type]
    ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        return batch.join(
            ray.get(ref), keys=keys, right_keys=rk, join_type=jt, use_threads=False
        )

    return big.map_batches(join_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top-k
# ---------------------------------------------------------------------------


def _local_topk(batch: pa.Table, sort_keys: list[tuple[str, str]], k: int) -> pa.Table:
    idx = pc.sort_indices(batch, sort_keys=sort_keys)[:k]
    return batch.take(idx)


def topk(
    ds: ray.data.Dataset, sort_keys: list[tuple[str, str]], k: int
) -> pa.Table:
    """Global top-k: per-batch prune to k rows, then one tiny driver-side
    sort over ≤ k × n_blocks pruned rows.  Never sorts the full dataset —
    at 100 TB the full ``ds.sort`` would be an all-to-all shuffle for k
    rows of output."""
    pruned = ds.map_batches(
        lambda b: _local_topk(b, sort_keys, k), batch_format="pyarrow"
    )
    batches = list(pruned.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(batches)
    idx = pc.sort_indices(t, sort_keys=sort_keys)[:k]
    return t.take(idx)


# ---------------------------------------------------------------------------
# matrix_stats (ES): exact multi-field moment/covariance/correlation
# ---------------------------------------------------------------------------


def matrix_stats_partials(ds: ray.data.Dataset, fields: list[str]) -> dict[str, int]:
    """Integer co-moment partials over INTEGER-valued fields: n, Σxᵢ and
    Σxᵢxⱼ (i ≤ j), combined per batch inside ``map_batches`` and summed
    as Python ints on the driver (one tiny row per batch crosses the
    wire).  Rows with ANY null field are skipped (ES matrix_stats
    semantics).  Integer sums make the distributed result independent of
    batch/shard order and bit-replicable in SQL; fields whose Σx² would
    overflow int64 need the t-digest/float swap (documented, not
    needed for the bounded metadata fields this serves)."""

    def part(b: pa.Table) -> pa.Table:
        valid = None
        for f in fields:
            m = pc.is_valid(b[f])
            valid = m if valid is None else pc.and_(valid, m)
        if valid is not None:
            b = b.filter(valid)
        cols = [
            b[f].to_numpy(zero_copy_only=False).astype(np.int64) for f in fields
        ]
        out: dict[str, list[int]] = {"n": [b.num_rows]}
        for i, f in enumerate(fields):
            out[f"s_{i}"] = [int(cols[i].sum())]
            for j in range(i, len(fields)):
                out[f"p_{i}_{j}"] = [int(np.dot(cols[i], cols[j]))]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    sums: dict[str, int] = {}
    for batch in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # iter_batches may coalesce several per-block partial rows into
        # one batch — fold EVERY row
        for name in batch.column_names:
            sums[name] = sums.get(name, 0) + int(pc.sum(batch[name]).as_py())
    return sums


def matrix_stats(ds: ray.data.Dataset, fields: list[str]) -> pa.Table:
    """ES ``matrix_stats`` aggregation: count, per-field mean and sample
    variance, pairwise sample covariance and Pearson correlation — all
    finalized ONCE from the exact integer partials (the float expressions
    are written in the textbook E-form so a SQL twin evaluates the
    identical doubles).  Output: (stat, fx, fy, value_r) rows."""
    s = matrix_stats_partials(ds, fields)
    n = s["n"]
    if n < 2:
        raise ValueError("matrix_stats needs >= 2 complete rows")
    rows: list[tuple[str, str, str, float]] = []
    means: list[float] = []
    var: list[float] = []
    for i, f in enumerate(fields):
        rows.append(("count", f, f, float(n)))
        m = float(s[f"s_{i}"]) / n
        means.append(m)
        v = (float(s[f"p_{i}_{i}"]) - float(s[f"s_{i}"]) * float(s[f"s_{i}"]) / n) / (
            n - 1
        )
        var.append(v)
        rows.append(("mean", f, f, round(m, 6)))
        rows.append(("variance", f, f, round(v, 6)))
    for i, fx in enumerate(fields):
        for j in range(i + 1, len(fields)):
            fy = fields[j]
            cov = (
                float(s[f"p_{i}_{j}"]) - float(s[f"s_{i}"]) * float(s[f"s_{j}"]) / n
            ) / (n - 1)
            rows.append(("covariance", fx, fy, round(cov, 6)))
            rows.append(
                ("correlation", fx, fy, round(cov / np.sqrt(var[i] * var[j]), 6))
            )
    return pa.table(
        {
            "stat": pa.array([r[0] for r in rows], pa.string()),
            "fx": pa.array([r[1] for r in rows], pa.string()),
            "fy": pa.array([r[2] for r in rows], pa.string()),
            "value_r": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def approx_terms_agg(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    *,
    size: int = 10,
    shard_size: int = 3,
    n_shards: int = 4,
    distinct_hint: int | None = None,
) -> pa.Table:
    """The ES ``terms`` aggregation ACCURACY contract under
    doc-partitioned sharding — the approximate mode every multi-shard ES
    cluster actually serves (terms-aggregation docs,
    ``doc_count_error_upper_bound`` / ``sum_other_doc_count``):

    - shard = ``id % n_shards`` (a deterministic hash partition — the
      stand-in for the index's doc ranges, SQL-replicable);
    - each shard contributes only its local top ``shard_size`` buckets
      (count desc, key asc — the ES shard response order);
    - merged count per candidate key sums over the shards that returned
      it; a shard that omitted the key may hide at most its SMALLEST
      returned count — and exactly 0 if it returned fewer than
      ``shard_size`` buckets (its list was complete);
    - the final page is the top ``size`` by (merged count desc, key asc),
      each with its per-bucket ``doc_count_error_upper_bound``; an extra
      ``__other__`` row carries ``sum_other_doc_count`` (docs in
      non-returned buckets) and the global upper bound (the worst case
      for a key no shard returned).

    Shape: ONE combiner-first ``(shard, key)`` count shuffle
    (``partial_agg``), a per-shard ``map_groups`` truncation (the wire
    carries ≤ n_shards × shard_size candidate rows + one total), driver
    merge over that bounded table.  Null keys are skipped (ES
    ``missing`` semantics)."""

    def add_shard(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key_col]))
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("__shard", pa.array(ids % n_shards))

    counts = partial_agg(
        ds.map_batches(add_shard, batch_format="pyarrow"),
        ["__shard", key_col],
        [AggSpec("n", id_col, "count")],
        distinct_hint=distinct_hint,
    )
    if isinstance(counts, pa.Table):
        counts_ds = ray.data.from_arrow(counts)
    else:
        counts_ds = counts.materialize()
    total = int(counts_ds.sum("n") or 0)

    def truncate(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            # groupby().map_groups emits zero-column blocks for empty
            # sort partitions — drop them (schema restored at concat)
            return pa.table(
                {
                    "__shard": pa.array([], pa.int64()),
                    key_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "__last": pa.array([], pa.int64()),
                }
            )
        kept = g.sort_by(
            [("n", "descending"), (key_col, "ascending")]
        ).slice(0, shard_size)
        last = (
            int(kept["n"][-1].as_py()) if g.num_rows > shard_size else 0
        )
        return kept.select(["__shard", key_col, "n"]).append_column(
            "__last", pa.array([last] * kept.num_rows, pa.int64())
        )

    trunc = pa.concat_tables(
        [
            t
            for t in counts_ds.groupby("__shard")
            .map_groups(truncate, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            if t.num_columns
        ]
    ) if total else pa.table(
        {
            "__shard": pa.array([], pa.int64()),
            key_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "__last": pa.array([], pa.int64()),
        }
    )
    shards = trunc["__shard"].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = trunc[key_col].to_pylist()
    ns = trunc["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    last_by_shard: dict[int, int] = {}
    for s, l in zip(
        shards, trunc["__last"].to_numpy(zero_copy_only=False).astype(np.int64)
    ):
        last_by_shard[int(s)] = int(l)
    global_bound = sum(last_by_shard.values())
    merged: dict[object, int] = {}
    returned_by: dict[object, set] = {}
    for s, v, c in zip(shards, vals, ns):
        merged[v] = merged.get(v, 0) + int(c)
        returned_by.setdefault(v, set()).add(int(s))
    cand = sorted(merged, key=lambda v: (-merged[v], str(v)))[:size]
    err = {
        v: sum(
            l for s, l in last_by_shard.items() if s not in returned_by[v]
        )
        for v in cand
    }
    other = total - sum(merged[v] for v in cand)
    return pa.table(
        {
            "value": pa.array([str(v) for v in cand] + ["__other__"], pa.string()),
            "count": pa.array([merged[v] for v in cand] + [other], pa.int64()),
            "error_bound": pa.array(
                [err[v] for v in cand] + [global_bound], pa.int64()
            ),
        }
    )
