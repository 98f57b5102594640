"""HyperLogLog distinct-count sketch (Flajolet et al., public algorithm).

The exact-cardinality shape used by ``events_daily`` (dedup the (day,
user) pairs, then count) is the right default, but at EXTREME cardinality
(billions of distinct users per bucket at 100 TB) the pair shuffle itself
is the bottleneck.  This sketch is the documented swap: per-batch partial
registers inside ``map_batches`` (vectorized ``np.maximum.at``), merged by
elementwise max — a 2^p-byte register array per group instead of one
shuffled row per distinct pair.  Standard error ≈ 1.04/√(2^p) (~0.8 % at
the default p=14, 16 KB per sketch).

Beyond the reference's surface (the reference delegates ES ``cardinality``
aggregation, which is HLL++ internally) — listed in SURVEY.md §2.7.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.stages.sampling import splitmix64


def hash_registers(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """THE hash → (register index, rank) derivation, shared by
    :meth:`HLL.add_hashes` and :func:`grouped_distinct_hll` so the
    float53-exactness subtlety lives in one place: index = top p bits;
    rank = leading zeros of the low (64−p) bits + 1, where for low>0
    floor(log2(low)) via frexp is EXACT (values < 2^53 fit float64)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h & np.uint64((1 << (64 - p)) - 1)
    rank = np.full(h.size, 64 - p + 1, dtype=np.uint8)
    nz = low > 0
    if nz.any():
        _, ex = np.frexp(low[nz].astype(np.float64))
        rank[nz] = (64 - p - (ex - 1)).astype(np.uint8)
    return idx, rank


class HLL:
    """Dense HyperLogLog with p index bits (m = 2^p registers)."""

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        """Fold a batch of uint64 hashes into the registers (vectorized)."""
        h = np.ascontiguousarray(h, dtype=np.uint64)
        if h.size == 0:
            return
        idx, rank = hash_registers(h, self.p)
        np.maximum.at(self.regs, idx, rank)

    def add(self, values: np.ndarray) -> None:
        """Hash int64/uint64 values through splitmix64 and fold them in."""
        v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
        self.add_hashes(splitmix64(v))

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError("cannot merge sketches of different p")
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def to_bytes(self) -> bytes:
        return self.regs.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 14) -> "HLL":
        h = cls(p)
        regs = np.frombuffer(data, dtype=np.uint8)
        if regs.size != h.m:
            raise ValueError(f"register blob has {regs.size} bytes, want {h.m}")
        h.regs = regs.copy()
        return h

    def count(self) -> int:
        """Cardinality estimate with the standard small-range (linear
        counting) correction; 64-bit hashes never need the large-range
        correction."""
        m = float(self.m)
        # Flajolet et al. 2007 bias-correction constants: the closed form
        # 0.7213/(1+1.079/m) is only valid for m >= 128; p in [4,6] uses
        # the paper's tabulated alpha_16/alpha_32/alpha_64
        if self.p == 4:
            alpha = 0.673
        elif self.p == 5:
            alpha = 0.697
        elif self.p == 6:
            alpha = 0.709
        else:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.ldexp(1.0, -self.regs.astype(np.int64))))
        zeros = int(np.count_nonzero(self.regs == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)  # linear counting regime
        # floor(x + 0.5), not round(): Python round() is banker's at .5
        # while SQL round() is half-away — the SQL register replica
        # (events_daily_hll oracle) must land on the same integer
        return int(np.floor(est + 0.5))


def grouped_distinct_hll(
    ds, key_col: str, col: str, p: int = 12
) -> pa.Table:
    """Per-key approximate distinct counts (the ES ``date_histogram`` +
    ``cardinality`` shape, and the extreme-cardinality swap for
    ``events_daily``'s exact (day, user) pair dedup): inside each
    ``map_batches`` call, ONE vectorized register fold per (key, register)
    via a composite index — each batch emits one 2^p-byte blob per
    distinct key it saw; the driver merges register-max per key.  Bytes
    moved are O(#batches × keys-per-batch × 2^p), independent of the
    value cardinality that breaks the exact pair shuffle.  Returns
    (key, distinct) key-ascending."""

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks()
        vals = t[col].combine_chunks()
        valid = pa.compute.and_(
            pa.compute.is_valid(keys), pa.compute.is_valid(vals)
        )
        keys, vals = keys.filter(valid), vals.filter(valid)
        if len(keys) == 0:
            return pa.table(
                {
                    "key": pa.array([], keys.type),
                    "regs": pa.array([], pa.large_binary()),
                }
            )
        enc = pa.compute.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uk = enc.dictionary
        n_keys = len(uk)
        h = splitmix64(
            np.ascontiguousarray(
                vals.to_numpy(zero_copy_only=False)
            ).astype(np.uint64, copy=False)
        )
        m = 1 << p
        idx, rank = hash_registers(h, p)
        # one scatter-max over ALL keys at once: flat (key, register) grid
        grid = np.zeros(n_keys * m, dtype=np.uint8)
        np.maximum.at(grid, codes * m + idx, rank)
        blobs = [grid[i * m : (i + 1) * m].tobytes() for i in range(n_keys)]
        return pa.table(
            {"key": uk, "regs": pa.array(blobs, pa.large_binary())}
        )

    merged: dict = {}
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for k, blob in zip(b["key"].to_pylist(), b["regs"]):
            h = HLL.from_bytes(blob.as_py(), p)
            if k in merged:
                merged[k].merge(h)
            else:
                merged[k] = h
    keys = sorted(merged)
    return pa.table(
        {
            "key": pa.array(keys),
            "distinct": pa.array(
                [merged[k].count() for k in keys], pa.int64()
            ),
        }
    )


def distinct_count_hll(ds, col: str, p: int = 14) -> int:
    """Distributed approximate distinct count of an integer column:
    per-batch partial registers inside ``map_batches`` (each batch emits
    ONE 2^p-byte row), register-max merge at the driver — bytes moved are
    O(#batches × 2^p), independent of cardinality."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        col_arr = t[col].combine_chunks()
        v = col_arr.drop_null().to_numpy(zero_copy_only=False)
        h.add(v.astype(np.int64))
        return pa.table({"regs": pa.array([h.to_bytes()], pa.large_binary())})

    out = HLL(p)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["regs"]:
            out.merge(HLL.from_bytes(blob.as_py(), p))
    return out.count()
