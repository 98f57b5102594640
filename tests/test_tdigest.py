"""t-digest quantile sketch: accuracy bands vs exact quantiles, merge
semantics (order independence, distributed = single-stream), wire format,
and the sharded percentiles_approx serving path."""

import numpy as np
import pyarrow as pa
import pytest

from elasticsearch_assets_ray.stages.tdigest import TDigest, percentiles_tdigest

QS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99]


def _accuracy(d: TDigest, v: np.ndarray, tol_mid: float, tol_tail: float):
    v = np.sort(v)
    for q in QS:
        got = d.quantile(q)
        # tolerance in RANK space (the t-digest guarantee is on q error);
        # duplicate plateaus make a single rank ambiguous — the estimate
        # is good if q lies within [left_rank - tol, right_rank + tol]
        left = np.searchsorted(v, got, side="left") / v.size
        right = np.searchsorted(v, got, side="right") / v.size
        tol = tol_tail if (q <= 0.05 or q >= 0.95) else tol_mid
        assert left - tol <= q <= right + tol, (q, got, left, right)


def test_uniform_and_skewed_accuracy():
    rng = np.random.default_rng(7)
    for v in [
        rng.uniform(0, 1, 200_000),
        rng.lognormal(0, 2, 200_000),  # heavy right tail
        np.repeat(rng.uniform(0, 1, 50), 4000),  # massive duplication
    ]:
        d = TDigest(200.0)
        for chunk in np.array_split(v, 37):
            d.add(chunk)
        _accuracy(d, v, tol_mid=0.01, tol_tail=0.002)


def test_merge_order_independence():
    rng = np.random.default_rng(11)
    parts = [rng.normal(i, 1 + i, 10_000) for i in range(8)]
    blobs = []
    for p in parts:
        d = TDigest(100.0)
        d.add(p)
        blobs.append(d.to_bytes())
    a = TDigest(100.0)
    for b in blobs:
        a.merge(TDigest.from_bytes(b))
    b_ = TDigest(100.0)
    for bb in reversed(blobs):
        b_.merge(TDigest.from_bytes(bb))
    # deferred one-shot compression → arrival order cannot matter
    assert a.quantiles(QS) == b_.quantiles(QS)
    assert a.count() == pytest.approx(80_000)


def test_merged_matches_single_stream_accuracy():
    rng = np.random.default_rng(3)
    v = rng.exponential(5.0, 120_000)
    merged = TDigest(200.0)
    for chunk in np.array_split(v, 16):
        d = TDigest(200.0)
        d.add(chunk)
        merged.merge(TDigest.from_bytes(d.to_bytes()))
    _accuracy(merged, v, tol_mid=0.012, tol_tail=0.003)


def test_wire_format_roundtrip_and_validation():
    d = TDigest(50.0)
    d.add(np.arange(1000, dtype=float))
    r = TDigest.from_bytes(d.to_bytes())
    assert r.quantiles(QS) == d.quantiles(QS)
    with pytest.raises(ValueError):
        TDigest(50.0).merge(TDigest(100.0))
    with pytest.raises(ValueError):
        TDigest(5.0)
    with pytest.raises(ValueError):
        d.quantile(1.5)
    assert np.isnan(TDigest(50.0).quantile(0.5))


def test_distributed_percentiles_tdigest(ray_session):
    import ray.data

    rng = np.random.default_rng(19)
    v = rng.lognormal(1.0, 1.5, 60_000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(12)
    t = percentiles_tdigest(ds, "x", percents=(25.0, 50.0, 75.0, 95.0, 99.0))
    sv = np.sort(v)
    for p, got in zip(t["percent"].to_pylist(), t["value"].to_pylist()):
        rank = np.searchsorted(sv, got) / sv.size
        assert abs(rank - p / 100.0) <= 0.015, (p, got, rank)


def test_percentiles_approx_sharded_vs_exact(built_index):
    """Serving path: the sketch percentiles track the exact distributed
    percentiles on a real index (integer doc_len field, rank tolerance)."""
    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    idx, _ = built_index
    sh = ShardedSearcher(idx, n_shards=3, use_actors=False)
    q = "def load"
    exact = sh.percentiles(q, "doc_len")
    approx = sh.percentiles_approx(q, "doc_len")
    ex = dict(zip(exact["percent"].to_pylist(), exact["value"].to_pylist()))
    ap = dict(zip(approx["percent"].to_pylist(), approx["value"].to_pylist()))
    vals = sh.value_counts(q, "doc_len")
    v = np.repeat(
        vals["value"].to_numpy(zero_copy_only=False),
        vals["count"].to_numpy(zero_copy_only=False),
    )
    sv = np.sort(v)
    for p in ex:
        rank = np.searchsorted(sv, ap[p]) / sv.size
        assert abs(rank - p / 100.0) <= 0.05, (p, ap[p], ex[p])


def test_add_weights_nan_alignment():
    """NaN values drop WITH their weights; mismatched shapes rejected."""
    d = TDigest(50.0)
    d.add(np.array([1.0, np.nan, 3.0]), weights=np.array([10.0, 20.0, 30.0]))
    assert d.count() == 40.0  # 10 + 30, never the NaN's 20
    # weighted median of {1.0 x10, 3.0 x30} is 3.0
    assert d.quantile(0.9) == 3.0
    with pytest.raises(ValueError, match="shape"):
        TDigest(50.0).add(np.array([1.0, 2.0]), weights=np.array([1.0]))
