"""t-digest quantile sketch — the documented swap for the exact
(value, count) percentile partials when a field's distinct cardinality is
unbounded (floats, high-resolution timestamps): a shard's partial becomes
a fixed-size centroid set instead of a distinct-value table.

This is the MERGING t-digest of Dunning & Ertl ("Computing Extremely
Accurate Quantiles Using t-Digests", arXiv:1902.04023) with the k1 scale
function: centroids are merged greedily in mean order while the potential
k(q) = (δ/2π)·asin(2q−1) advances by ≤ 1, which bounds centroid weight by
~4·n·q(1−q)/δ — tight at the tails, coarse in the middle, giving relative
tail accuracy ~1/δ.  ES's own ``percentiles`` agg is t-digest backed, so
this matches the reference semantics class; the repo's DEFAULT percentiles
stay exact (SURVEY §2.7) and gate-checked.

Determinism: compression sorts by (mean, weight) first, so a digest's
state is a pure function of the multiset of (mean, weight) pairs fed in —
merge order across shards cannot change the result.  (Different shard
COUNTS still produce different — equally valid — sketches; only the exact
path is bit-identical across topologies, which is why it stays the gate.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TDigest:
    """Merging t-digest with the k1 scale function."""

    def __init__(self, delta: float = 200.0):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_n = 0

    # ---------- ingest ----------

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        if weights is None:
            v = v[~np.isnan(v)]
            if v.size == 0:
                return self
            w = np.ones(v.size, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)
            if w.shape != v.shape:
                raise ValueError(
                    f"weights shape {w.shape} != values shape {v.shape}"
                )
            # the NaN mask must drop the VALUE AND ITS WEIGHT together —
            # masking values alone shifts every later weight one slot
            keep = ~np.isnan(v)
            v, w = v[keep], w[keep]
            if v.size == 0:
                return self
        self._buf_m.append(v)
        self._buf_w.append(w)
        self._buf_n += v.size
        # amortized compaction: buffer up to ~10x the centroid budget
        if self._buf_n > 10 * self.delta:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        """Accumulate another digest's centroids WITHOUT compressing:
        compression happens once, lazily, at the first query — so a
        digest merged from K shard partials is a pure function of the
        partials' centroid multiset, independent of arrival order.
        (Partials are ~δ centroids each; the deferred buffer stays
        small even for thousands of shards.)"""
        if other.delta != self.delta:
            raise ValueError("cannot merge digests of different delta")
        other._compress()
        if other.means.size:
            self._buf_m.append(other.means.copy())
            self._buf_w.append(other.weights.copy())
            self._buf_n += other.means.size
        return self

    # ---------- compression ----------

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)

    def _compress(self) -> None:
        if self._buf_n == 0:
            # nothing buffered: recompression is idempotent (verified by
            # test), so re-merging the existing centroids is pure waste —
            # repeated quantile() calls must not pay O(centroids) each
            return
        m = np.concatenate([self.means] + self._buf_m) if self._buf_m else self.means
        w = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_m, self._buf_w, self._buf_n = [], [], 0
        if m.size == 0:
            return
        # determinism: state depends only on the (mean, weight) multiset
        order = np.lexsort((w, m))
        m, w = m[order], w[order]
        total = w.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(m[0]), float(w[0])
        w_before = 0.0  # total weight strictly before the current centroid
        k_lo = self._k(np.array([0.0]))[0]
        for i in range(1, m.size):
            q_right = (w_before + cur_w + w[i]) / total
            if self._k(np.array([min(q_right, 1.0)]))[0] - k_lo <= 1.0:
                # weighted mean update (left-to-right, deterministic)
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_before += cur_w
                k_lo = self._k(np.array([w_before / total]))[0]
                cur_m, cur_w = float(m[i]), float(w[i])
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m, dtype=np.float64)
        self.weights = np.array(out_w, dtype=np.float64)

    # ---------- query ----------

    def count(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Interpolated quantile: centroid i covers the cumulative-weight
        midpoint convention (Dunning's reference interpolation)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(w) - w / 2.0
        target = q * total
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    # ---------- serialization (the shard-partial wire format) ----------

    def to_bytes(self) -> bytes:
        self._compress()
        return (
            np.array([self.delta, float(self.means.size)], dtype=np.float64).tobytes()
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        head = np.frombuffer(data[:16], dtype=np.float64)
        delta, n = float(head[0]), int(head[1])
        d = cls(delta)
        d.means = np.frombuffer(data[16 : 16 + 8 * n], dtype=np.float64).copy()
        d.weights = np.frombuffer(data[16 + 8 * n : 16 + 16 * n], dtype=np.float64).copy()
        return d


def percentiles_tdigest(
    ds,
    col: str,
    percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
    delta: float = 200.0,
) -> pa.Table:
    """Distributed approximate percentiles of a numeric column: per-batch
    digests inside ``map_batches`` (each batch emits ONE fixed-size
    centroid blob), digest merge at the driver — bytes moved are
    O(#batches × δ), independent of row count AND of the column's
    distinct cardinality (the case the exact (value, count) partial
    can't bound)."""

    def partial(t: pa.Table) -> pa.Table:
        d = TDigest(delta)
        v = t[col].combine_chunks().drop_null().to_numpy(zero_copy_only=False)
        d.add(v.astype(np.float64))
        return pa.table({"tdigest": pa.array([d.to_bytes()], pa.large_binary())})

    out = TDigest(delta)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["tdigest"]:
            out.merge(TDigest.from_bytes(blob.as_py()))
    vals = out.quantiles([p / 100.0 for p in percents])
    return pa.table(
        {
            "percent": pa.array([float(p) for p in percents], pa.float64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
