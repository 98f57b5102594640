"""Bloom-filter blocklist membership for training-data pipelines.

The 100-TB shape of "drop every document on a blocklist" (benchmark
contamination sets, DMCA/opt-out lists, known-spam fingerprints): the
blocklist is small (10^5..10^8 keys) but the corpus is not, so the
membership test must be a broadcast-side structure probed inside
``map_batches`` — never a shuffle join.  A Bloom filter is the compact
broadcast (~1.2 MB per million keys at 1% fp): batches probe it
vectorized, and only the tiny candidate set pays the EXACT check, so
the output has no false positives and, by Bloom construction, no false
negatives.  The per-row ``bloom_candidate`` column makes the prefilter
measurable (candidates ≈ blocked + fp_rate · rows).

Beyond-the-reference operator (the reference delegates filtering to
Elasticsearch queries; SURVEY.md §2 training-data additions).  Hashing
reuses the repo's splitmix64 finalizer (public domain, Steele et al. /
Vigna) with Kirsch–Mitzenmacher double hashing (two hashes simulate k,
public literature).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.stages.sampling import splitmix64

_GOLD = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    """Fixed-size blocked bitset with k double-hashed probes, built once
    (driver or any single process) and broadcast read-only."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray):
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.bits = bits  # uint8, bit-packed, ceil(m/8) bytes

    @classmethod
    def build(cls, values: np.ndarray, fp_rate: float = 0.01) -> "BloomFilter":
        if not 0.0 < fp_rate < 1.0:
            raise ValueError(f"fp_rate {fp_rate!r} outside (0, 1)")
        n = max(1, int(np.asarray(values).size))
        m = max(64, int(math.ceil(-n * math.log(fp_rate) / (math.log(2.0) ** 2))))
        k = max(1, int(round(m / n * math.log(2.0))))
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        bloom = cls(m, k, bits)
        pos = bloom._positions(values)  # (n, k)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return bloom

    def _positions(self, values: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via Kirsch–Mitzenmacher: h1 + i·h2 mod m
        (h2 forced odd so the probe sequence never degenerates)."""
        v = np.asarray(values).astype(np.uint64, copy=False)
        h1 = splitmix64(v)
        h2 = splitmix64(v ^ _GOLD) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m_bits)).astype(
                np.int64
            )

    def maybe_contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized probe: True where ALL k bits are set (definite
        non-members are always False — no false negatives)."""
        v = np.asarray(values)
        if v.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(v)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1)


def blocklist_flag(
    ds,
    key_col: str,
    block_values: np.ndarray,
    out_col: str = "blocked",
    candidate_col: str = "bloom_candidate",
    fp_rate: float = 0.01,
):
    """Flag rows whose ``key_col`` (int64 fingerprint/hash) is on the
    blocklist: one stateless ``map_batches`` pass probing the broadcast
    Bloom filter, with the EXACT check (sorted-array membership) paid
    only by Bloom candidates.  Adds ``out_col`` (0/1, exact) and
    ``candidate_col`` (0/1, the prefilter's answer) — their Dataset sums
    give the measured false-positive rate with no side channel."""
    import ray

    exact = np.unique(np.asarray(block_values).astype(np.int64))
    bloom = BloomFilter.build(exact, fp_rate=fp_rate)
    ref = ray.put((bloom, exact))

    def flag(batch: pa.Table) -> pa.Table:
        bl, ex = ray.get(ref)
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cand = bl.maybe_contains(keys)
        blocked = np.zeros(keys.size, dtype=np.int64)
        idx = np.flatnonzero(cand)
        if idx.size:
            # exact verify ONLY for candidates — the work the Bloom
            # filter exists to bound
            hit = ex[np.searchsorted(ex, keys[idx]).clip(0, ex.size - 1)] == keys[idx]
            blocked[idx[hit]] = 1
        out = {name: batch[name] for name in batch.column_names}
        out[out_col] = pa.array(blocked)
        out[candidate_col] = pa.array(cand.astype(np.int64))
        return pa.table(out)

    return ds.map_batches(flag, batch_format="pyarrow")
