"""ES ``frequent_item_sets`` aggregation (exact, small alphabets).

ES mines frequent item sets with Eclat over transactions built from one
or more fields.  Here the transaction is "the set of distinct values of
``item_col`` seen for one ``txn_col`` key" (e.g. the event types a user
has triggered), and the alphabet is a caller-declared list of ≤ 16
items, so a transaction is one BITMASK and support counting is exact
integer arithmetic:

- phase 1 (map_batches + partial_agg by txn key): per-key max of the
  per-item indicator columns — the shuffle moves ≤ |batches| × |keys in
  batch| partial rows, never raw events;
- phase 2: per-key flags fold to a mask, ONE bounded groupby (≤ 2^|items|
  distinct masks, ``distinct_hint``-combined on the driver);
- phase 3 (driver, O(2^n · 2^n) over the tiny mask table): support of
  itemset S = Σ count(mask) over masks ⊇ S.

Alphabets larger than 16 want the classic two-round Apriori over the
same partial_agg machinery; the mask closure here is the exact
small-alphabet fast path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg


def frequent_item_sets(
    ds: ray.data.Dataset,
    txn_col: str,
    item_col: str,
    items: list[str],
    min_support: int = 1,
    min_size: int = 2,
) -> pa.Table:
    """(itemset, size, support) for every itemset of ≥ ``min_size``
    declared items with support ≥ ``min_support`` transactions; itemset
    labels join the member items with '+' in sorted-item order."""
    if not 0 < len(items) <= 16:
        raise ValueError("frequent_item_sets needs 1..16 declared items")
    items = sorted(items)

    def flags(b: pa.Table) -> pa.Table:
        cols = {txn_col: b[txn_col]}
        for i, it in enumerate(items):
            cols[f"__it{i}"] = pc.cast(
                pc.equal(b[item_col], pa.scalar(it)), pa.int64()
            ).fill_null(0)
        return pa.table(cols)

    per_key = partial_agg(
        ds.map_batches(flags, batch_format="pyarrow"),
        [txn_col],
        [AggSpec(f"__it{i}", f"__it{i}", "max") for i in range(len(items))],
    )

    def to_mask(b: pa.Table) -> pa.Table:
        m = np.zeros(b.num_rows, dtype=np.int64)
        for i in range(len(items)):
            m |= b[f"__it{i}"].to_numpy(zero_copy_only=False).astype(np.int64) << i
        return pa.table({"mask": pa.array(m)})

    counts = partial_agg(
        per_key.map_batches(to_mask, batch_format="pyarrow"),
        ["mask"],
        [AggSpec("cnt", "mask", "count")],
        distinct_hint=1 << len(items),
    )
    t = pa.concat_tables(list(counts.iter_batches(batch_format="pyarrow")))
    masks = t["mask"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    labels, sizes, sups = [], [], []
    for s in range(1, 1 << len(items)):
        size = bin(s).count("1")
        if size < min_size:
            continue
        sup = int(cnts[(masks & s) == s].sum())
        if sup >= min_support:
            labels.append(
                "+".join(it for i, it in enumerate(items) if s >> i & 1)
            )
            sizes.append(size)
            sups.append(sup)
    return pa.table(
        {
            "itemset": pa.array(labels, pa.string()),
            "size": pa.array(sizes, pa.int64()),
            "support": pa.array(sups, pa.int64()),
        }
    )
