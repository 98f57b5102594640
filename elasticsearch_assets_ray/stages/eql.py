"""ES EQL ``sequence`` queries (funnel matching) on Ray Data.

EQL's core construct is the ordered sequence over a join key::

    sequence by user_id with maxspan=7d
      [ event_type == "view" ] [ event_type == "click" ] [ event_type == "purchase" ]

This module implements the deterministic earliest-completion form: for
every join key, the EARLIEST chain e1 < e2 < ... < en (strictly
increasing timestamps, one event per step, same key) whose total span
``t_n − t_1`` is ≤ maxspan.  The chain is built greedily — each step
takes the earliest qualifying event after the previous step — which is
OPTIMAL for minimizing the completion time of a chain started at a
given first event (exchange argument: taking a later event can never
enable an earlier later-step event).  One row per (key, first-event)
candidate chain survives the span filter; per-key earliest = the row
with minimal t_start.

Scale shape: ONE pass, no shuffle at all — each step's events are
filtered per batch (vectorized predicate), encoded as (key << TS_BITS |
ts-offset) sortable int64 keys, and the chain building is a searchsorted
cascade over the per-step sorted arrays.  The per-step relations move to
the driver; they are predicate-filtered event subsets (funnel steps are
selective by design) — the coarse-group cogroup variant drops in when a
step matches a large fraction of a 100-TB table.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data


def _collect_step(
    ds: ray.data.Dataset, pred: Callable[[pa.Table], "pa.BooleanArray"],
    key_col: str, ts_col: str,
) -> tuple[np.ndarray, np.ndarray]:
    """(key, ts int64 us) arrays of the step's matching events."""

    def take(b: pa.Table) -> pa.Table:
        t = b.filter(pred(b))
        return pa.table(
            {
                "k": t[key_col].cast(pa.int64()),
                "ts": t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    out = pa.concat_tables(
        list(ds.map_batches(take, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    return (
        out["k"].to_numpy(zero_copy_only=False).astype(np.int64),
        out["ts"].to_numpy(zero_copy_only=False).astype(np.int64),
    )


def eql_sequence(
    ds: ray.data.Dataset,
    steps: list[Callable[[pa.Table], "pa.BooleanArray"]],
    *,
    key_col: str,
    ts_col: str,
    maxspan_us: int,
) -> pa.Table:
    """Earliest maxspan-bounded sequence per key → (key, t_start, t_end)
    sorted by key.  ``steps`` are vectorized batch predicates."""
    if len(steps) < 2:
        raise ValueError("an EQL sequence needs at least 2 steps")
    per_step = [_collect_step(ds, p, key_col, ts_col) for p in steps]
    # sortable composite key: key << TS_BITS | (ts - ts_min).  The offset
    # keeps the timestamp field small; bits are validated, not assumed.
    all_ts = np.concatenate([t for _k, t in per_step] or [np.empty(0, np.int64)])
    if all_ts.size == 0:
        return pa.table(
            {"k": pa.array([], pa.int64()),
             "t_start": pa.array([], pa.int64()),
             "t_end": pa.array([], pa.int64())}
        )
    ts0 = int(all_ts.min())
    span_bits = max(int(all_ts.max()) - ts0, 1).bit_length() + 1
    keys_max = max(int(k.max()) if k.size else 0 for k, _t in per_step)
    if keys_max.bit_length() + span_bits > 62:
        raise ValueError("key/timestamp range too wide for the packed encoding")

    def enc(k: np.ndarray, t: np.ndarray) -> np.ndarray:
        return (k << np.int64(span_bits)) | (t - ts0)

    sorted_steps = []
    for k, t in per_step:
        e = enc(k, t)
        o = np.argsort(e, kind="stable")
        sorted_steps.append((k[o], t[o], e[o]))
    k1, t1, _e1 = sorted_steps[0]
    cur_k, cur_t = k1, t1
    alive = np.ones(cur_k.size, dtype=bool)
    for kk, tt, ee in sorted_steps[1:]:
        # earliest event of this step with the SAME key and ts strictly
        # greater: side='right' on the packed key
        pos = np.searchsorted(ee, enc(cur_k, cur_t), side="right")
        ok = pos < ee.size
        pos_c = np.minimum(pos, max(ee.size - 1, 0))
        ok &= kk[pos_c] == cur_k
        alive &= ok
        cur_t = np.where(ok, tt[pos_c], cur_t)
    alive &= (cur_t - t1) <= maxspan_us
    k, ts_start, ts_end = k1[alive], t1[alive], cur_t[alive]
    if k.size == 0:
        return pa.table(
            {"k": pa.array([], pa.int64()),
             "t_start": pa.array([], pa.int64()),
             "t_end": pa.array([], pa.int64())}
        )
    # per-key earliest start (ties impossible: (key, ts) pairs of step-1
    # events are unique per event; equal-ts duplicates pick the same chain)
    order = np.lexsort((ts_start, k))
    k, ts_start, ts_end = k[order], ts_start[order], ts_end[order]
    first = np.concatenate(([True], k[1:] != k[:-1]))
    return pa.table(
        {
            "k": pa.array(k[first]),
            "t_start": pa.array(ts_start[first]),
            "t_end": pa.array(ts_end[first]),
        }
    )
