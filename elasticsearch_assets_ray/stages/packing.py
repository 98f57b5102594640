"""Token-budgeted sequence packing for LLM training pipelines.

Greedy sequential packing: documents in id order are appended to the
current pack until adding the next one would exceed ``budget`` tokens;
a document larger than the whole budget forms its own (oversize) pack
— documents are never split.  The assignment is a pure function of the
ordered (id, token_count) sequence, so it is deterministic and
restartable.

Scale contract: packing is SEQUENTIAL BY CONSTRUCTION, so the
distributed form packs each partition independently (pack ids are
partition-prefixed, exactly like docID assignment `pid << shift + row`)
— no cross-partition coordination, no shuffle; a pack never spans
partitions, costing at most one under-filled pack per partition
(negligible at 100s of MB per partition).  Beyond-the-reference
training-data operator (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PACK_SHIFT = 32  # pack_id = (partition << PACK_SHIFT) | local pack


def pack_bounds(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Pack START indices (first index of each pack, ascending) for a
    token-count sequence — one ``searchsorted`` per PACK, not per row."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    n = tokens.size
    cum = np.cumsum(tokens.astype(np.int64))
    starts = [0]
    s = 0
    while True:
        base = int(cum[s - 1]) if s else 0
        e = int(np.searchsorted(cum, base + budget, side="right"))
        if e <= s:
            e = s + 1  # oversize document: its own pack, never split
        if e >= n:
            break
        starts.append(e)
        s = e
    return np.array(starts, dtype=np.int64)


def pack_batch(
    batch: pa.Table,
    budget: int,
    count_col: str,
    partition: int = 0,
    id_col: str = "doc_id",
) -> pa.Table:
    """Append ``pack_id`` (partition-prefixed) and ``pack_pos`` columns.
    Rows are packed in ``id_col`` order; the output keeps that order."""
    if not 0 <= partition < (1 << (63 - PACK_SHIFT)):
        # the prefix must fit above the 32-bit local pack number; ids
        # that are themselves composite (e.g. this engine's internal
        # pid<<shift docIDs) would silently wrap — refuse instead
        raise ValueError(
            f"partition prefix {partition} outside [0, 2^{63 - PACK_SHIFT}) "
            "— pack over the source table's plain ids, not composite ones"
        )
    order = np.argsort(
        batch[id_col].to_numpy(zero_copy_only=False), kind="stable"
    )
    t = batch.take(pa.array(order, type=pa.int64()))
    tokens = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if (tokens < 0).any():
        raise ValueError(f"negative token counts in {count_col!r}")
    starts = pack_bounds(tokens, budget)
    n = tokens.size
    sizes = np.diff(np.concatenate([starts, [n]]))
    local = np.repeat(np.arange(starts.size, dtype=np.int64), sizes)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    cols = {name: t[name] for name in t.column_names}
    cols["pack_id"] = pa.array((np.int64(partition) << PACK_SHIFT) | local)
    cols["pack_pos"] = pa.array(pos)
    return pa.table(cols)


def pack_documents(
    ds,
    budget: int,
    count_col: str,
    id_col: str = "doc_id",
):
    """Dataset → Dataset with pack assignment, one independent packing
    per input block (the distributed contract above).  Blocks are
    processed as whole batches; the partition prefix comes from a
    per-block task index via ``map_batches`` over grouped blocks."""
    import ray.data

    # one batch per block: batch_size=None keeps block boundaries
    def _f(batch: pa.Table) -> pa.Table:
        # partition prefix: the block's MINIMUM id — deterministic
        # regardless of task scheduling order (validated to fit above
        # the 32-bit local pack number by pack_batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        part = int(ids.min()) if ids.size else 0
        return pack_batch(batch, budget, count_col, partition=part, id_col=id_col)

    return ds.map_batches(_f, batch_size=None, batch_format="pyarrow")
