"""Keyed state storage — native analog of the reference's
`elasticsearch_state_storage` (reference asset/src/elasticsearch_state_storage/
api.ts:1-31, schema.ts: LRU cache over ``_key → DataEntity`` with batched
mget chunk_size=2500 concurrency=10, optional persist/mset write-back).

Here the backing store is a keyed Parquet docstore (one directory,
hash-partitioned by key); the cache is an actor-pool ``map_batches``
stage: each actor holds an LRU dict and lazily loads only the docstore
partitions its batches touch.  mget = the enrich join it was used for.
"""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data


class DocstoreCache:
    """LRU key→row cache over a keyed Parquet store.

    ``ds.map_batches(DocstoreCache, fn_constructor_kwargs=dict(
    store_path=..., key_col=...), concurrency=N)`` enriches each batch
    with the stored row for its key column (mget analog).  State loads
    in ``__init__``/lazily — once per actor, never per batch."""

    def __init__(
        self,
        store_path: str,
        key_col: str,
        value_cols: list[str],
        cache_size: int = 1 << 20,
        batch_key_col: str | None = None,
    ):
        self.store = pads.dataset(store_path)
        self.key_col = key_col
        self.value_cols = value_cols
        self.batch_key_col = batch_key_col or key_col
        self.cache: OrderedDict[object, tuple] = OrderedDict()
        self.cache_size = cache_size
        self.hits = 0
        self.misses = 0

    def mget(self, keys: list[object]) -> dict[object, tuple]:
        """Batched get: serve from LRU, fetch misses with ONE filtered
        store read (the chunked-mget analog)."""
        out: dict[object, tuple] = {}
        missing = []
        for k in keys:
            if k in self.cache:
                self.cache.move_to_end(k)
                out[k] = self.cache[k]
                self.hits += 1
            else:
                missing.append(k)
        if missing:
            self.misses += len(missing)
            t = self.store.to_table(
                columns=[self.key_col, *self.value_cols],
                filter=pc.field(self.key_col).isin(missing),
            )
            kv = t[self.key_col].to_pylist()
            vals = [t[c].to_pylist() for c in self.value_cols]
            for i, k in enumerate(kv):
                row = tuple(v[i] for v in vals)
                out[k] = row
                self.cache[k] = row
            while len(self.cache) > self.cache_size:
                self.cache.popitem(last=False)
        return out

    def mset(self, rows: dict[object, tuple]) -> None:
        """Write-through cache update (persist analog — the store write
        itself goes through the bulk/routed writers, not here)."""
        for k, v in rows.items():
            self.cache[k] = v
            self.cache.move_to_end(k)
        while len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized enrich: miss keys are fetched with ONE filtered
        store read per batch; the loaded rows stay resident as an Arrow
        table and each batch hash-joins against it (no per-row Python).
        The resident table is bounded by ``cache_size`` rows: on overflow
        the OLDEST rows are evicted (rows are appended in fetch order, so
        keeping the tail is the segmented-LRU approximation — same policy
        the dict-based mget path enforces exactly)."""
        if getattr(self, "_tbl", None) is None:
            self._tbl = self.store.to_table(
                columns=[self.key_col, *self.value_cols],
                filter=pc.field(self.key_col).isin([]),
            )
        uniq = pc.unique(batch[self.batch_key_col].combine_chunks()
                         if isinstance(batch[self.batch_key_col], pa.ChunkedArray)
                         else batch[self.batch_key_col])
        missing = uniq.filter(
            pc.invert(pc.is_in(uniq, value_set=self._tbl[self.key_col].combine_chunks()))
        )
        if len(missing):
            self.misses += len(missing)
            fetched = self.store.to_table(
                columns=[self.key_col, *self.value_cols],
                filter=pc.field(self.key_col).isin(missing),
            )
            self._tbl = pa.concat_tables([self._tbl, fetched])
        self.hits += len(uniq) - len(missing)
        right = self._tbl.rename_columns([self.batch_key_col, *self.value_cols])
        out = batch.join(
            right, keys=[self.batch_key_col], join_type="left outer", use_threads=False
        )
        # evict AFTER the join so rows the current batch references (hits
        # at the head included) are never dropped before they are used;
        # the bound holds between calls
        if self._tbl.num_rows > self.cache_size:
            self._tbl = self._tbl.slice(
                self._tbl.num_rows - self.cache_size
            ).combine_chunks()
        return out
