"""Bloom-filter blocklist stage: construction invariants (no false
negatives, bounded false positives) and the exact end-to-end flag over
a Ray dataset."""

import numpy as np
import pyarrow as pa
import ray.data

from elasticsearch_assets_ray.stages.bloom import BloomFilter, blocklist_flag


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, size=5000, dtype=np.int64).astype(np.uint64)
    bloom = BloomFilter.build(members, fp_rate=0.01)
    assert bloom.maybe_contains(members).all()  # Bloom invariant
    probe = rng.integers(0, 2**62, size=50_000, dtype=np.int64).astype(np.uint64)
    probe = probe[~np.isin(probe, members)]
    fp = bloom.maybe_contains(probe).mean()
    # 1% target; allow generous slack for the finite-m rounding
    assert fp < 0.03, fp


def test_bloom_empty_probe_and_bad_fp_rate():
    bloom = BloomFilter.build(np.array([1, 2, 3], dtype=np.uint64))
    assert bloom.maybe_contains(np.array([], dtype=np.uint64)).shape == (0,)
    import pytest

    with pytest.raises(ValueError):
        BloomFilter.build(np.array([1], dtype=np.uint64), fp_rate=1.5)


def test_blocklist_flag_exact(ray_session):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 10_000, size=4000, dtype=np.int64)
    block = np.unique(rng.choice(keys, size=300, replace=False))
    ds = ray.data.from_arrow(pa.table({"fp": pa.array(keys)})).repartition(8)
    out = blocklist_flag(ds, "fp", block).to_pandas()
    want = np.isin(out["fp"].to_numpy(), block).astype(np.int64)
    # exactness: the verified flag has NO false positives or negatives
    assert (out["blocked"].to_numpy() == want).all()
    # the prefilter is a superset of the true members
    assert (out["bloom_candidate"].to_numpy() >= out["blocked"].to_numpy()).all()
    # and not a trivial all-pass: candidates stay close to true members
    assert out["bloom_candidate"].sum() <= out["blocked"].sum() + 0.05 * len(out)
