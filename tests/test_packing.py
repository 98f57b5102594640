"""Token-budgeted greedy sequence packing (stages/packing.py)."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.stages.packing import (
    PACK_SHIFT,
    pack_batch,
    pack_bounds,
    pack_documents,
)


def _greedy_ref(tokens, budget):
    k = pos = cum = 0
    out = []
    for t in tokens:
        if pos > 0 and cum + t > budget:
            k += 1
            cum = pos = 0
        cum += t
        out.append((k, pos))
        pos += 1
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pack_bounds_matches_greedy(seed):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(1, 900, 500).astype(np.int64)
    budget = 2048
    starts = pack_bounds(tokens, budget)
    ref = _greedy_ref(tokens, budget)
    ref_starts = [i for i, (_k, p) in enumerate(ref) if p == 0]
    assert starts.tolist() == ref_starts
    # invariants: every non-oversize pack fits the budget; docs unsplit
    ends = np.concatenate([starts[1:], [tokens.size]])
    for s, e in zip(starts, ends):
        total = tokens[s:e].sum()
        assert total <= budget or e - s == 1  # oversize doc alone


def test_pack_batch_columns_and_order():
    t = pa.table(
        {
            "doc_id": pa.array([5, 3, 4, 1, 2], pa.int64()),
            "token_count": pa.array([600, 600, 600, 600, 2500], pa.int64()),
        }
    )
    out = pack_batch(t, budget=1000, count_col="token_count", partition=7)
    assert out["doc_id"].to_pylist() == [1, 2, 3, 4, 5]  # packed in id order
    ref = _greedy_ref([600, 2500, 600, 600, 600], 1000)
    assert out["pack_id"].to_pylist() == [
        (7 << PACK_SHIFT) | k for k, _p in ref
    ]
    assert out["pack_pos"].to_pylist() == [p for _k, p in ref]
    with pytest.raises(ValueError, match="budget must be positive"):
        pack_batch(t, budget=0, count_col="token_count")


def test_pack_documents_dataset(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
            "token_count": pa.array(rng.integers(1, 500, 1000).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(1)
    out = pa.concat_tables(
        list(
            pack_documents(ds, budget=1500, count_col="token_count").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    assert out.num_rows == 1000
    ref = _greedy_ref(t["token_count"].to_pylist(), 1500)
    local = [pid & ((1 << PACK_SHIFT) - 1) for pid in out["pack_id"].to_pylist()]
    assert local == [k for k, _p in ref]
    # multi-partition: packs never span partitions, prefixes disjoint
    ds4 = ray.data.from_arrow(t).repartition(4)
    out4 = pa.concat_tables(
        list(
            pack_documents(ds4, budget=1500, count_col="token_count").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    assert out4.num_rows == 1000
    ids = np.array(out4["doc_id"].to_pylist())
    pids = np.array(out4["pack_id"].to_pylist())
    tok = dict(zip(t["doc_id"].to_pylist(), t["token_count"].to_pylist()))
    import collections

    per_pack = collections.defaultdict(list)
    for d, p in zip(ids, pids):
        per_pack[p].append(d)
    for p, members in per_pack.items():
        total = sum(tok[d] for d in members)
        assert total <= 1500 or len(members) == 1
