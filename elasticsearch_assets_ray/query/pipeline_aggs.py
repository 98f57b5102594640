"""ES pipeline aggregations — reduce-phase transforms over a merged
bucket table.

In Elasticsearch, pipeline aggregations (``derivative``,
``cumulative_sum``, ``moving_fn``, ``serial_diff``, ``bucket_selector``,
``bucket_sort`` and the sibling ``*_bucket`` family) do NOT run on the
data nodes: they execute on the coordinating node during the reduce
phase, over the already-merged bucket list of their parent aggregation
(the reference delegates the whole aggregation tree to ES at
packages/elasticsearch-asset-apis/src/elasticsearch-reader-api/
ElasticsearchReaderClient.ts:53-86).  That is exactly the architecture
here: the parent buckets are produced distributed (shard-side partials,
integer-exact merge — see ``ShardedSearcher.histogram`` /
``partial_agg`` date histograms), and these functions run ONCE on the
small merged table.  Their cost is O(buckets), never O(docs), so they
are scale-free by construction.

Inputs must be bucket-ascending (the parent agg's natural order); every
function is a pure table → table transform so they compose like ES's
pipeline chains.

Float determinism: bucket counts are integers, and integer sums below
2^53 are exact in float64 regardless of association order, so
``moving_fn('avg')`` and ``avg_bucket`` produce bit-identical doubles to
a SQL window/aggregate over the same buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OPS = {
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "eq": lambda a, b: a == b,
}


def _vals(t: pa.Table, col: str) -> np.ndarray:
    return t[col].to_numpy(zero_copy_only=False)


def _metric_dtype(t: pa.Table, col: str):
    return np.float64 if pa.types.is_floating(t.schema.field(col).type) else np.int64


def derivative(t: pa.Table, col: str, out: str | None = None) -> pa.Table:
    """ES ``derivative``: bucket[i] − bucket[i−1]; the first bucket has
    no derivative (ES omits the field — here: null)."""
    v = _vals(t, col).astype(_metric_dtype(t, col))
    d = np.zeros(v.size, dtype=v.dtype)
    if v.size:
        d[1:] = v[1:] - v[:-1]
    mask = np.zeros(v.size, dtype=bool)
    if v.size:
        mask[0] = True
    return t.append_column(out or f"{col}_deriv", pa.array(d, mask=mask))


def serial_diff(t: pa.Table, col: str, lag: int = 1, out: str | None = None) -> pa.Table:
    """ES ``serial_diff``: bucket[i] − bucket[i−lag] (null for the first
    ``lag`` buckets)."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    v = _vals(t, col).astype(_metric_dtype(t, col))
    d = np.zeros(v.size, dtype=v.dtype)
    mask = np.ones(v.size, dtype=bool)
    if v.size > lag:
        d[lag:] = v[lag:] - v[:-lag]
        mask[lag:] = False
    return t.append_column(out or f"{col}_diff{lag}", pa.array(d, mask=mask))


def cumulative_sum(t: pa.Table, col: str, out: str | None = None) -> pa.Table:
    """ES ``cumulative_sum`` over the bucket order (integer-exact)."""
    v = _vals(t, col).astype(np.int64)
    return t.append_column(out or f"{col}_cumsum", pa.array(np.cumsum(v)))


def moving_fn(
    t: pa.Table,
    col: str,
    window: int,
    fn: str = "avg",
    shift: int = 0,
    out: str | None = None,
) -> pa.Table:
    """ES ``moving_fn``: a sliding window over the bucket order.  With
    ES's default ``shift=0`` the window for bucket i is the *previous*
    ``window`` buckets ``[i−window, i)`` — the current bucket excluded;
    ``shift=1`` slides it to include the current bucket.  Partial
    windows (near the start) use whatever buckets exist, and an empty
    window yields null — both exactly the SQL
    ``OVER (ROWS BETWEEN window PRECEDING AND 1 PRECEDING)`` semantics,
    which is how the oracle states it."""
    if window < 1:
        raise ValueError("window must be >= 1")
    v = _vals(t, col).astype(np.float64)
    n = v.size
    outv = np.zeros(n, dtype=np.float64)
    mask = np.zeros(n, dtype=bool)
    # integer-count windows sum exactly in float64, so a per-window
    # O(buckets·window) loop over the SMALL merged table is both simple
    # and bit-stable (no running-sum cancellation)
    for i in range(n):
        lo = max(0, i - window + shift)
        hi = min(n, i + shift)
        if hi <= lo:
            mask[i] = True
            continue
        w = v[lo:hi]
        if fn == "avg":
            outv[i] = float(np.sum(w)) / (hi - lo)
        elif fn == "sum":
            outv[i] = float(np.sum(w))
        elif fn == "min":
            outv[i] = float(np.min(w))
        elif fn == "max":
            outv[i] = float(np.max(w))
        else:
            raise ValueError(f"unknown moving_fn {fn!r}")
    return t.append_column(out or f"{col}_m{fn}", pa.array(outv, mask=mask))


_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def rate(
    t: pa.Table,
    col: str,
    bucket: str = "day",
    unit: str = "hour",
    out: str | None = None,
) -> pa.Table:
    """ES ``rate`` aggregation under a FIXED-interval date_histogram
    parent: each bucket's metric rescaled to a per-``unit`` rate —
    value · (unit_seconds / bucket_seconds).  Calendar-variable units
    (month / quarter / year) are rejected, mirroring ES's rule that a
    rate unit must be compatible with a fixed bucket interval.  The
    scale factor is computed ONCE as a double and multiplied (not
    re-divided per row), so the oracle can state the identical float
    expression."""
    for name in (bucket, unit):
        if name not in _UNIT_SECONDS:
            raise ValueError(
                f"rate unit {name!r} must be fixed-length "
                f"({sorted(_UNIT_SECONDS)})"
            )
    factor = _UNIT_SECONDS[unit] / _UNIT_SECONDS[bucket]
    v = _vals(t, col).astype(np.float64) * factor
    return t.append_column(
        out or f"{col}_rate_{unit}", pa.array(v, pa.float64())
    )


def bucket_selector(t: pa.Table, col: str, op: str, value: float) -> pa.Table:
    """ES ``bucket_selector``: keep only buckets whose metric satisfies
    the predicate (the HAVING of the aggregation tree)."""
    v = _vals(t, col)
    return t.filter(pa.array(_OPS[op](v, value)))


def bucket_sort(
    t: pa.Table,
    sort: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
) -> pa.Table:
    """ES ``bucket_sort``: re-order / truncate / page the parent's
    buckets.  ``sort`` entries are (column, 'ascending'|'descending');
    ties broken by the pre-sort bucket order (stable sort), which is the
    deterministic analog of ES's insertion-order tie behavior."""
    out = t.sort_by(sort) if sort else t
    out = out.slice(from_)
    return out.slice(0, size) if size is not None else out


def sibling_stats(t: pa.Table, col: str) -> dict:
    """The sibling ``*_bucket`` family in one pass: ``min_bucket`` /
    ``max_bucket`` (with ES's bucket-key lists for ties), ``sum_bucket``,
    ``avg_bucket`` and ``stats_bucket`` share these numbers."""
    v = _vals(t, col).astype(np.int64)
    if v.size == 0:
        return {"count": 0, "min": None, "max": None, "sum": 0, "avg": None}
    s = int(v.sum())
    return {
        "count": int(v.size),
        "min": int(v.min()),
        "max": int(v.max()),
        "sum": s,
        "avg": float(s) / v.size,
    }


def change_point(t: pa.Table, col: str) -> dict:
    """ES ``change_point`` aggregation, step-change detector: over an
    ordered bucket series the split minimizing total within-segment SSE
    (binary segmentation, the classic CUSUM-equivalent formulation; ES
    runs several detectors — this is the deterministic ``step_change``
    subset, documented as such).

    Exactness contract: the series values are integers, prefix sums are
    exact Python ints, and the per-split SSE uses ONE pinned DOUBLE
    expression ``(ql - (sl·sl)/nl) + (qr - (sr·sr)/nr)`` — every operand
    converted to float64 FIRST (``float(sl) * float(sl)``), matching the
    SQL twin's CAST(… AS DOUBLE) arithmetic at every magnitude.  (A
    Python int·int/int would stay exact past 2^53 where the double twin
    rounds, silently flipping near-tie argmins at large daily counts.)
    Ties → smallest split index.  Needs ≥ 4 buckets (ES requires 22 for
    its p-value machinery; the detector itself needs only a 2-bucket
    segment on each side).

    Returns {index (1-based, first bucket of the NEW regime),
    score (SSE reduction vs no split)}.
    """
    y = [int(v) for v in t[col].to_pylist()]
    n = len(y)
    if n < 4:
        raise ValueError("change_point needs at least 4 buckets")
    cum = [0]
    cumsq = [0]
    for v in y:
        cum.append(cum[-1] + v)
        cumsq.append(cumsq[-1] + v * v)
    s_tot, q_tot = cum[-1], cumsq[-1]
    best_t, best_sse = None, None
    for split in range(1, n):
        sl, ql, nl = float(cum[split]), float(cumsq[split]), float(split)
        sr = float(s_tot) - sl
        qr = float(q_tot) - ql
        nr = float(n - split)
        sse = (ql - (sl * sl) / nl) + (qr - (sr * sr) / nr)
        if best_sse is None or sse < best_sse:
            best_t, best_sse = split, sse
    sse0 = float(q_tot) - (float(s_tot) * float(s_tot)) / float(n)
    return {"index": best_t + 1, "score": sse0 - best_sse}


def bucket_script(
    t: pa.Table, cols: list[str], fn, out: str
) -> pa.Table:
    """ES ``bucket_script``: a new per-bucket metric computed from the
    parent's existing metrics (the reduce-phase calculator — never
    touches data nodes).  ``fn`` receives one float64 numpy array per
    column, in ``cols`` order, and must return an array; buckets where
    any input is null come back null (ES ``skip`` gap policy)."""
    vs = [_vals(t, c).astype(np.float64) for c in cols]
    nulls = np.zeros(t.num_rows, dtype=bool)
    for c in cols:
        col = t[c]
        if col.null_count:
            nulls |= ~np.asarray(
                pc.is_valid(col.combine_chunks()), dtype=bool
            )
    outv = np.asarray(fn(*vs), dtype=np.float64)
    return t.append_column(out, pa.array(outv, mask=nulls))


def normalize(
    t: pa.Table, col: str, method: str, out: str | None = None
) -> pa.Table:
    """ES ``normalize`` pipeline aggregation — every method of the
    spec (normalize-aggregation docs): ``rescale_0_1``,
    ``rescale_0_100``, ``percent_of_sum``, ``mean`` (value − mean,
    rescaled by the range), ``z-score``, ``softmax``.  Runs on the
    merged bucket table (reduce phase), float64 throughout."""
    v = _vals(t, col).astype(np.float64)
    n = v.size
    if n == 0:
        return t.append_column(out or f"{col}_norm", pa.array([], pa.float64()))
    rng = v.max() - v.min()
    if method == "rescale_0_1":
        o = (v - v.min()) / rng if rng else np.zeros(n)
    elif method == "rescale_0_100":
        o = (v - v.min()) / rng * 100.0 if rng else np.zeros(n)
    elif method == "percent_of_sum":
        o = v / v.sum()
    elif method == "mean":
        o = (v - v.sum() / n) / rng if rng else np.zeros(n)
    elif method == "z-score":
        mean = v.sum() / n
        std = np.sqrt(np.sum((v - mean) ** 2) / n)
        o = (v - mean) / std if std else np.zeros(n)
    elif method == "softmax":
        e = np.exp(v)
        o = e / e.sum()
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    return t.append_column(out or f"{col}_norm", pa.array(o, pa.float64()))


def cumulative_cardinality(
    first_seen_counts: pa.Table, day_col: str, count_col: str
) -> pa.Table:
    """ES ``cumulative_cardinality`` finalizer: given per-bucket counts
    of keys whose FIRST occurrence falls in that bucket (the mergeable
    unit — a key contributes exactly once, at its min bucket), the
    running distinct count is their cumulative sum.  The first-seen
    table comes from a bounded (bucket, key) dedup shuffle upstream
    (the events_daily shape; an HLL sketch swaps in at extreme
    cardinality, losing exactness like ES itself does)."""
    s = first_seen_counts.sort_by([(day_col, "ascending")])
    v = s[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            day_col: s[day_col],
            "cumulative_cardinality": pa.array(np.cumsum(v), pa.int64()),
        }
    )


def moving_percentiles(
    day_value_counts: pa.Table,
    bucket_col: str,
    *,
    window: int = 3,
    percent: float = 50.0,
) -> pa.Table:
    """ES ``moving_percentiles`` with EXACT backing: the upstream
    shuffle produces per-bucket ``(value, count)`` partials (the same
    mergeable unit as the exact percentiles agg — ES slides t-digests
    instead, trading exactness; stages/tdigest.py is the documented
    swap), and each bucket's percentile is computed over the trailing
    ``window`` buckets INCLUDING the current one (bucket-position
    window over the buckets present — the pinned contract).  Returns
    (bucket, value) with the interpolated quantile_cont convention."""
    t = day_value_counts.sort_by(
        [(bucket_col, "ascending"), ("value", "ascending")]
    )
    days = t[bucket_col].to_numpy(zero_copy_only=False)
    uniq = np.unique(days)
    vals = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    cnts = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    from elasticsearch_assets_ray.query.engine import (
        percentiles_from_value_counts,
    )

    out_days, out_vals = [], []
    for i, d in enumerate(uniq):
        lo = uniq[max(0, i - window + 1)]
        m = (days >= lo) & (days <= d)
        wv, wc = vals[m], cnts[m]
        o = np.argsort(wv, kind="stable")
        wv, wc = wv[o], wc[o]
        # merge duplicate values across the window's buckets
        if wv.size:
            first = np.concatenate(([True], wv[1:] != wv[:-1]))
            idx = np.cumsum(first) - 1
            mv = wv[first]
            mc = np.zeros(mv.size, dtype=np.int64)
            np.add.at(mc, idx, wc)
        else:
            mv, mc = wv, wc
        p = percentiles_from_value_counts(
            pa.table({"value": pa.array(mv), "count": pa.array(mc)}),
            (percent,),
        )
        out_days.append(d)
        out_vals.append(p["value"][0].as_py())
    return pa.table(
        {
            bucket_col: pa.array(out_days),
            "value": pa.array(out_vals, pa.float64()),
        }
    )
