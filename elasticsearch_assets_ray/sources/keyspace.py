"""Keyspace partitioning — native analogs of the reference's id_reader
slicer algorithms:

- :data:`ALPHABETS` — the four key alphabets
  (reference id-utils/keys.ts:96-128);
- :func:`round_robin_assignment` — deal the alphabet across N slicers
  (P9, reference id-utils/utils.ts:25-52: slicer i gets chars i, i+N, …);
- :func:`prefix_dfs_partitions` — the idSlicer DFS keyspace walk (P7,
  reference algorithms/idSlicer.ts:7-175): descend one char deeper while
  a prefix's count exceeds ``max_count``, prune empty subtrees,
  ``starting_depth`` starts the walk deeper (the reference's
  ``starting_key_depth``);
- :func:`quantile_key_ranges` — the idSlicerOptimized char-class sizing
  (P8, reference algorithms/idSlicer-refactor.ts:9-286) taken to its
  logical end: variable-width key ranges with equal row counts, i.e.
  exact rank-based range partitioning.

The count probe the reference issues per prefix (an ES ``count`` call)
becomes a binary search over the sorted key column
(:class:`KeyspaceIndex`) — free after one sorted scan.  At cluster scale
the sorted key column is produced by ``ds.sort(key)`` (or kept sorted in
the docstore layout) and the same searchsorted logic runs on boundary
metadata; here it is a driver-side numpy array.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ALPHABETS: dict[str, str] = {
    # reference id-utils/keys.ts:96-128
    "base64url": "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_",
    "base64": "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_+/",
    "hexadecimal": "0123456789abcdef",
    "HEXADECIMAL": "0123456789ABCDEF",
}


def round_robin_assignment(alphabet: str, n_slicers: int) -> list[list[str]]:
    """Slicer i gets alphabet chars i, i+N, i+2N, … (P9).  n_slicers must
    not exceed the alphabet size (reference schema.ts:288-301)."""
    chars = list(alphabet)
    if n_slicers > len(chars):
        raise ValueError(
            f"slicers ({n_slicers}) cannot exceed alphabet size ({len(chars)})"
        )
    return [chars[i::n_slicers] for i in range(n_slicers)]


class KeyspaceIndex:
    """Sorted key column with O(log n) prefix/range count probes — the
    free replacement for the reference's per-prefix ES count call.

    The column stays an ARROW array end-to-end (sorted with
    ``pc.sort_indices``); probes are a driver-side binary search touching
    O(log n) scalars — the whole key column is never converted to Python
    strings (the ``to_pylist`` + object-dtype numpy sort variant
    materialized every key as a PyObject on the driver)."""

    def __init__(self, keys):
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
            arr = arr.drop_null()
            self.keys = arr.take(pc.sort_indices(arr))
            self._arrow = True
        else:
            self.keys = np.sort(np.asarray(keys, dtype=object), kind="stable")
            self._arrow = False
        self.n = len(self.keys)

    @classmethod
    def from_parquet(cls, path: str, key_col: str) -> "KeyspaceIndex":
        return cls(pq.read_table(path, columns=[key_col])[key_col])

    def key_at(self, i: int) -> str:
        return self.keys[i].as_py() if self._arrow else str(self.keys[i])

    def _lower_bound(self, x: str) -> int:
        """First index with keys[i] >= x (binary search; O(log n) scalar
        reads on the Arrow path)."""
        if not self._arrow:
            return int(np.searchsorted(self.keys, x, side="left"))
        lo, hi = 0, self.n
        while lo < hi:
            mid = (lo + hi) // 2
            if self.keys[mid].as_py() < x:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def count_range(self, lo: str | None, hi: str | None) -> int:
        """Rows with lo <= key < hi (None = unbounded)."""
        a = 0 if lo is None else self._lower_bound(lo)
        b = self.n if hi is None else self._lower_bound(hi)
        return max(0, b - a)

    def count_prefix(self, prefix: str) -> int:
        return self.count_range(prefix, prefix + "\U0010ffff")


class SortedKeyspace:
    """Distributed keyspace planning state (the scale path KeyspaceIndex's
    docstring promises): ONE ``ds.sort(key)`` over the pruned key column
    writes a sorted parquet layout; per-file exact boundary keys (first +
    last value, read once) form a tiny driver-side boundary table; every
    count/rank probe bisects the boundaries and reads AT MOST one file's
    key column through an LRU.  Driver memory ∝ number of files + LRU
    budget — never the key column (the round-2 shape materialized every
    key on the driver; at 1B keys that is GBs).

    Same probe protocol as :class:`KeyspaceIndex` (``n``, ``key_at``,
    ``count_range``, ``count_prefix``), so :func:`prefix_dfs_partitions`
    and :func:`quantile_key_ranges` run unchanged on either.
    Reference analog: the slicers' per-prefix remote count probes
    (algorithms/idSlicer.ts:7-175) — here the "remote index" is the
    sorted layout and a probe is an O(log files) bisect + one file read.
    """

    KEY = "key"

    def __init__(self, layout_dir: str, cache_budget_bytes: int = 1 << 28):
        import glob
        import os
        from collections import OrderedDict

        files = sorted(glob.glob(os.path.join(layout_dir, "*.parquet")))
        firsts: list[str] = []
        lasts: list[str] = []
        counts: list[int] = []
        metas = []
        for f in files:
            pf = pq.ParquetFile(f)
            nrows = pf.metadata.num_rows
            if nrows == 0:
                continue
            # exact boundary keys: parquet string statistics may be
            # truncated, which breaks exact rank arithmetic — read the
            # first and last row-group's key column once instead
            first = pf.read_row_group(0, columns=[self.KEY])[self.KEY][0].as_py()
            last_rg = pf.num_row_groups - 1
            lcol = pf.read_row_group(last_rg, columns=[self.KEY])[self.KEY]
            last = lcol[len(lcol) - 1].as_py()
            metas.append((first, last, f, nrows))
        metas.sort()  # global order: by (first, last) — ranges are disjoint
        for first, last, f, nrows in metas:
            firsts.append(first)
            lasts.append(last)
            counts.append(nrows)
        self.files = [m[2] for m in metas]
        self.firsts = firsts
        self.lasts = lasts
        self.cum = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        self.n = int(self.cum[-1])
        self._lru: "OrderedDict[int, pa.Array]" = OrderedDict()
        # BYTE-budgeted: a sort block can hold millions of keys — a
        # count-bounded LRU would pin GBs on the planner
        self._lru_bytes = 0
        self.cache_budget_bytes = cache_budget_bytes

    @staticmethod
    def default_layout_dir(parquet_path: str, key_col: str) -> str:
        """Canonical cache location for a (table, key column) sorted
        layout: ``$ESR_KEYSPACE_CACHE`` (default /tmp/esr_keyspace_cache)
        / sha of the absolute path + column.  Shared by every caller so
        one layout serves them all."""
        import hashlib
        import os

        tag = hashlib.sha256(
            f"{os.path.abspath(parquet_path)}|{key_col}".encode()
        ).hexdigest()[:16]
        return os.path.join(
            os.environ.get("ESR_KEYSPACE_CACHE", "/tmp/esr_keyspace_cache"), tag
        )

    @classmethod
    def build(
        cls, parquet_path: str, key_col: str, layout_dir: str, *, overwrite: bool = False
    ) -> "SortedKeyspace":
        """Sort the key column (pruned read — only ``key_col`` leaves
        storage) into ``layout_dir``.  Idempotent per (input files,
        sizes, key_col) fingerprint unless ``overwrite``.  The layout is
        built in a scratch dir and PUBLISHED with one atomic rename, so
        concurrent builders can never interleave files in the shared
        cache path — whoever renames first wins, the loser discards its
        scratch and reuses the winner's layout."""
        import hashlib
        import os
        import shutil

        import ray.data

        paths = [parquet_path]
        if os.path.isdir(parquet_path):
            paths = sorted(
                os.path.join(parquet_path, f)
                for f in os.listdir(parquet_path)
                if f.endswith(".parquet")
            )
        fp = hashlib.sha256()
        for p in paths:
            st = os.stat(p)
            fp.update(f"{p}|{st.st_size}|{st.st_mtime_ns}|{key_col}\n".encode())
        marker = os.path.join(layout_dir, ".fingerprint")
        want = fp.hexdigest()

        def current() -> bool:
            try:
                return open(marker).read() == want
            except OSError:
                return False

        if not overwrite and current():
            return cls(layout_dir)
        tmp = f"{layout_dir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds = ray.data.read_parquet(paths, columns=[key_col])
        ds = ds.map_batches(
            lambda b: pa.table({cls.KEY: b[key_col].drop_null()}),
            batch_format="pyarrow",
        )
        ds.sort(cls.KEY).write_parquet(tmp)
        with open(os.path.join(tmp, ".fingerprint"), "w") as f:
            f.write(want)
        if current() and not overwrite:
            shutil.rmtree(tmp, ignore_errors=True)  # a concurrent builder won
            return cls(layout_dir)
        stale = f"{layout_dir}.stale-{os.getpid()}"
        try:
            if os.path.exists(layout_dir):
                os.rename(layout_dir, stale)  # move stale layout aside atomically
            os.rename(tmp, layout_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not current():
                raise
        shutil.rmtree(stale, ignore_errors=True)
        return cls(layout_dir)

    def _keys_of(self, fi: int) -> pa.Array:
        hit = self._lru.get(fi)
        if hit is not None:
            self._lru.move_to_end(fi)
            return hit
        arr = pq.read_table(self.files[fi], columns=[self.KEY])[self.KEY].combine_chunks()
        self._lru[fi] = arr
        self._lru_bytes += arr.nbytes
        while self._lru_bytes > self.cache_budget_bytes and len(self._lru) > 1:
            _, old = self._lru.popitem(last=False)
            self._lru_bytes -= old.nbytes
        return arr

    def _rank(self, x: str) -> int:
        """Global count of keys < x.  File = FIRST whose last key >= x
        (earlier files hold only keys < x; later files only keys >= x),
        then one in-file binary search."""
        import bisect

        if self.n == 0:
            return 0
        fi = bisect.bisect_left(self.lasts, x)
        if fi == len(self.files):
            return self.n
        keys = self._keys_of(fi)
        lo, hi = 0, len(keys)
        while lo < hi:
            mid = (lo + hi) // 2
            if keys[mid].as_py() < x:
                lo = mid + 1
            else:
                hi = mid
        return int(self.cum[fi]) + lo

    def key_at(self, i: int) -> str:
        import bisect

        fi = bisect.bisect_right(self.cum, i) - 1
        return self._keys_of(fi)[i - int(self.cum[fi])].as_py()

    def count_range(self, lo: str | None, hi: str | None) -> int:
        a = 0 if lo is None else self._rank(lo)
        b = self.n if hi is None else self._rank(hi)
        return max(0, b - a)

    def count_prefix(self, prefix: str) -> int:
        return self.count_range(prefix, prefix + "\U0010ffff")


@dataclass(frozen=True)
class KeySlice:
    """The ReaderSlice{keys:[prefix]} analog (reference
    interfaces.ts:138-168).  ``exact`` slices match keys EQUAL to the
    prefix (emitted when a hot prefix is itself a key and must descend —
    the variable-length-key case the reference's fixed-length hash keys
    never hit)."""

    prefix: str
    count: int
    exact: bool = False


def prefix_dfs_partitions(
    ks: KeyspaceIndex,
    alphabet: str,
    max_count: int,
    *,
    starting_depth: int = 1,
    max_depth: int = 12,
) -> list[KeySlice]:
    """DFS over key prefixes: emit a prefix when its count ≤ max_count
    (or depth = max_depth — the can't-split-further case the reference
    hits on condensed keys), descend one char otherwise (emitting an
    ``exact`` slice for keys that END at the hot prefix), prune empty
    subtrees.  Emitted slices are disjoint and cover every key whose
    characters are all in ``alphabet``."""
    out: list[KeySlice] = []

    def walk(prefix: str, depth: int) -> None:
        for ch in alphabet:
            p = prefix + ch
            c = ks.count_prefix(p)
            if c == 0:
                continue  # prune subtree (reference idSlicer.ts:117-129)
            if c <= max_count or depth >= max_depth:
                out.append(KeySlice(p, c))
            else:
                exact = ks.count_range(p, p + "\x00")  # keys == p
                if exact:
                    out.append(KeySlice(p, exact, exact=True))
                walk(p, depth + 1)

    # starting_key_depth: enumerate all prefixes of the starting depth.
    # Keys that END above the starting depth (variable-length keys shorter
    # than starting_depth) are emitted as exact slices on the way down —
    # descending without them would silently drop those keys from the
    # slice plan's coverage.
    def seed(prefix: str, depth: int) -> None:
        if depth == starting_depth:
            walk(prefix, depth)
            return
        for ch in alphabet:
            p = prefix + ch
            if ks.count_prefix(p) > 0:
                exact = ks.count_range(p, p + "\x00")  # keys == p
                if exact:
                    out.append(KeySlice(p, exact, exact=True))
                seed(p, depth + 1)

    seed("", 1)
    return out


def quantile_key_ranges(ks: KeyspaceIndex, n_parts: int) -> list[str]:
    """Boundary keys at exact ranks i·n//n_parts (i = 1..n_parts−1) over
    the sorted key column: range i = [boundary[i−1], boundary[i]) with
    open extremes.  The key at a rank is well-defined under duplicate
    keys regardless of tie order — the property the SQL oracle relies
    on."""
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    ranks = [(i * ks.n) // n_parts for i in range(1, n_parts)]
    return [ks.key_at(r) for r in ranks]
