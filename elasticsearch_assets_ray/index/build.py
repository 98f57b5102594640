"""Index build — SPIMI on Ray Data.

Two phases (SURVEY.md §7.1):

**Phase 1 (per-partition, embarrassingly parallel, checkpointed).**  One
Ray task per :class:`PartitionSpec`: read the partition's row groups
(columns pruned to what the index needs), exact-dedup on the id columns,
assign docIDs ``doc_base + row``, sha256 the content (the per-row
invariant from BASELINE.json ``input_hint``), tokenize (vectorized Arrow),
and write three artifacts atomically (write-then-rename):

- ``docstore/part-NNNNN.parquet`` — docID-ordered doc metadata + sha256 +
  doc_len (+ content unless disabled),
- ``runs/part-NNNNN.parquet``     — the partition's posting run: one row
  per term with docID-sorted (docids, tfs, doclens) packed as binary,
- ``manifests/part-NNNNN.json``   — lineage (path, row groups, fingerprint)
  + metrics (doc/token/term counts).  A partition whose manifest exists is
  SKIPPED on resume — an interrupted build never re-tokenizes (the holes /
  recoveryData analog, reference dateSlicer.ts:308-335,
  interfaces.ts:192-206).

**Phase 2 (zero-shuffle merge, v3).**  The merge key is
``(shard = hash(term) % num_shards, bucket = pid // runs_per_bucket)``
— and BOTH halves are already file-affine: a run file holds exactly one
pid (one bucket), and since v3 phase 1 sorts each run by shard and
writes ONE PARQUET ROW GROUP PER SHARD.  So the "shuffle" needs no
all-to-all at all: one merge task per (shard, bucket) reads only its
bucket's ≤ runs_per_bucket run files with a ``shard ==`` filter that
row-group statistics prune to exactly its bytes.  Every posting byte is
read once, by the one task that needs it — the exchange rides the
shared filesystem/object store the way a sort-merge shuffle spills
anyway, minus the sort, the sampling pass, and the driver barrier.  On
a multi-node cluster each merge task is independent and placement-free.
(The pre-v3 ``groupby(shard, bucket).map_groups`` path is kept as a
fallback for runs written without the shard column.)

``bucket = pid // runs_per_bucket`` bounds every group to
≤ runs_per_bucket runs regardless of term frequency —
'import'/'return'/'def' merge in many disjoint docID-range groups
instead of one giant one (the salted-repartition / subslice_by_key
analog, reference dateSlicer.ts:381-394).  Because partition docID
ranges are disjoint and ordered, merging a group is *concatenation* of
sorted runs, never a k-way interleave; a term's full posting list is
the bucket-ordered sequence of its segment rows.

The merged group is encoded (delta + varint 128-doc blocks with per-block
(last_docid, max_tf, min_dl) metadata) and written as segment rows
partitioned by ``shard = hash(term) % num_shards`` so a query term touches
one shard directory.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from elasticsearch_assets_ray.index.codec import (
    encode_postings_many,
    encode_postings_pfor,
)
from elasticsearch_assets_ray.sources.partition import (
    DOC_SHIFT,
    PartitionSpec,
    plan_partitions,
)
from elasticsearch_assets_ray.stages.tokenizer import doc_term_freqs

# v2: slim posting runs (int32 row offsets, no dls)
# v3: runs carry a shard column, sorted by (shard, term) with one parquet
#     row group per shard — phase 2 merges with NO all-to-all (each
#     (shard, bucket) task filter-reads exactly its row groups)
MANIFEST_VERSION = 3

#: identifier of the term→shard routing hash recorded in every index
#: manifest; a searcher must recompute shard routing with the SAME hash
#: the index was built with or query terms silently miss their shard.
TERM_HASH_ID = "poly64-1000003"


@dataclass
class IndexConfig:
    content_col: str = "content"
    codec: str = "varint"  # "varint" (vectorized encode) | "pfor" (bit-packed)
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    keep_cols: tuple[str, ...] = ("lang",)  # extra docstore columns
    store_content: bool = True
    # store per-posting token positions (int32) — enables index-native
    # phrase verification without reading document content, at the cost
    # of ~4 bytes per TOKEN of index size.  Off by default.
    index_positions: bool = False
    target_partition_rows: int = 256 * 1024
    runs_per_bucket: int = 32  # bounds merge-group size (skew cap)
    num_shards: int = 32  # segment hash shards (also phase-2 parallelism)
    # cpus RESERVED per phase-1 task.  Tokenization is memory-bandwidth
    # bound: past ~half the cores, concurrent tokenize tasks on one node
    # slow each other down (measured: 32 concurrent slower than 16 on a
    # 32-core box).  Set 2.0 on bandwidth-saturated nodes to halve
    # per-node concurrency while still scaling with cluster size; the
    # default 1.0 uses every core (right when below the knee).
    phase1_num_cpus: float = 1.0
    # optional analysis chain (stages/analysis.AnalyzerSpec.to_dict()
    # form, e.g. {"filters": ["stop", "s_stem"]}) — token filters run
    # after the canonical tokenization at build time, and Searcher
    # re-applies the same chain to every query (the ES analyzer
    # contract).  None = the canonical chain alone.
    analyzer: dict | None = None
    extra: dict = field(default_factory=dict)

    def analyzer_spec(self):
        if self.analyzer is None:
            return None
        from elasticsearch_assets_ray.stages.analysis import AnalyzerSpec

        return AnalyzerSpec.from_dict(self.analyzer)

    def __post_init__(self):
        # validated config surface (the reference schema-validates every
        # op config, e.g. elasticsearch_reader_api/schema.ts:16-247)
        if self.codec not in ("varint", "pfor"):
            raise ValueError(f"unknown codec {self.codec!r} (varint | pfor)")
        if not self.content_col:
            raise ValueError("content_col is required")
        if self.target_partition_rows <= 0:
            raise ValueError("target_partition_rows must be positive")
        if self.runs_per_bucket <= 0:
            raise ValueError("runs_per_bucket must be positive")
        if self.num_shards <= 0:
            raise ValueError("num_shards must be positive")
        if self.phase1_num_cpus <= 0:
            raise ValueError("phase1_num_cpus must be positive")
        self.analyzer_spec()  # validates filter names eagerly
        if self.content_col in self.id_cols:
            raise ValueError("content_col cannot also be an id column")


def term_shard(terms, num_shards: int) -> np.ndarray:
    """Stable term→shard hash, vectorized (polynomial hash over utf-8
    bytes mod 2^64 — deterministic across processes, unlike Python
    ``hash()``)."""
    from elasticsearch_assets_ray.stages.textstats import polynomial_hash

    arr = terms if isinstance(terms, (pa.Array, pa.ChunkedArray)) else pa.array(
        [str(t) for t in terms], type=pa.string()
    )
    return (polynomial_hash(arr) % np.uint64(num_shards)).astype(np.int64)


def _atomic_write_table(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _atomic_write_json(obj: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _atomic_write_run_sharded(run: pa.Table, path: str) -> None:
    """Write a posting run with ONE ROW GROUP PER SHARD (rows must arrive
    sorted by the ``shard`` column).  Row-group statistics then let the
    phase-2 merge task's ``shard ==`` filter read exactly its bytes —
    the property the zero-shuffle phase 2 relies on."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shard = run["shard"].to_numpy(zero_copy_only=False)
    if len(shard):
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(shard)) + 1, [len(shard)])
        )
    else:
        bounds = np.zeros(1, dtype=np.int64)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        with pq.ParquetWriter(tmp, run.schema, compression="zstd") as w:
            if len(bounds) > 1:
                for a, b in zip(bounds[:-1], bounds[1:]):
                    w.write_table(run.slice(a, b - a))
            else:
                w.write_table(run)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_rewrite_runs_batch(
    batch: pa.Table, runs_dir: str, rpb: int, num_shards: int
) -> pa.Table:
    """map_batches body for REWRITE pipelines (expunge / reshard /
    any segments→runs decode): write the batch's rows as bucket-affine,
    shard-sorted v3 run files so :func:`run_phase2` takes the
    zero-shuffle path for rewrites too.

    Layout contract (mirrors fresh v3 runs): each output file holds
    exactly ONE bucket (named ``part-b<bucket>-x<uuid>.parquet`` — the
    filename IS the bucket, baked with THIS rpb), rows sorted by
    ``shard = term_shard(term, num_shards)`` with one parquet row group
    per shard.  A bucket may span several files (one per input batch
    that touched it); the merge concatenates them exactly like a fresh
    build's ≤ rpb pid files.  Returns a 1-row ``{"rows": n}`` table."""
    import uuid as _uuid

    n = batch.num_rows
    if n:
        pid = batch["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = pid // rpb
        shard = term_shard(batch["term"], num_shards)
        t = batch.append_column("shard", pa.array(shard))
        order = np.lexsort((shard, bucket))
        if not np.array_equal(order, np.arange(n)):
            t = t.take(pa.array(order, type=pa.int64()))
        bsorted = bucket[order]
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(bsorted)) + 1, [n])
        )
        for a, b in zip(bounds[:-1], bounds[1:]):
            name = (
                f"part-b{int(bsorted[a]):06d}-x{_uuid.uuid4().hex[:12]}.parquet"
            )
            _atomic_write_run_sharded(
                t.slice(a, b - a), os.path.join(runs_dir, name)
            )
    return pa.table({"rows": pa.array([n], pa.int64())})


def _binary_from_offsets(values: np.ndarray, boundaries: np.ndarray) -> pa.Array:
    """Zero-copy large_binary array: cell i = values[boundaries[i]:boundaries[i+1]]
    as raw little-endian bytes.  No per-term Python loop."""
    item = values.dtype.itemsize
    offs = (boundaries * item).astype(np.int64)
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(boundaries) - 1,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(np.ascontiguousarray(values).tobytes())],
    )


def sha256_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 hex of a string column (the input_hint invariant).

    The per-row digest call is unavoidable in pure Python (Arrow has no
    sha256 kernel), but the bytes are fed as zero-copy memoryview slices
    of the Arrow data buffer — no to_pylist, no per-row str→bytes copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    import numpy as _np

    offs = _np.frombuffer(arr.buffers()[1], dtype=_np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = arr.buffers()[2]
    mv = memoryview(buf) if buf is not None else memoryview(b"")
    nulls = arr.is_null().to_numpy(zero_copy_only=False) if arr.null_count else None
    out = [
        None
        if (nulls is not None and nulls[i])
        else hashlib.sha256(mv[offs[i] : offs[i + 1]]).hexdigest()
        for i in range(len(arr))
    ]
    return pa.array(out, type=pa.string())


def build_partition(
    spec: PartitionSpec,
    cfg: IndexConfig,
    out_dir: str,
    row_filter=None,
    filter_cols: tuple[str, ...] = (),
) -> dict:
    """Phase-1 task body: one partition → docstore shard + posting run +
    manifest.  Pure function of (spec, cfg, input bytes) — safe to retry;
    all writes are write-then-rename.  ``row_filter`` (a pyarrow compute
    expression over ``filter_cols``) restricts the partition's rows —
    the incremental-build window predicate."""
    name = f"part-{spec.pid:05d}"
    man_path = os.path.join(out_dir, "manifests", name + ".json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            saved = json.load(f)
        # lineage guard: a manifest from a DIFFERENT partition plan (other
        # input file / row groups — e.g. resume after target_partition_rows
        # changed) must not be silently reused; docIDs would shift.  A
        # manifest from an older artifact-format version is rebuilt.
        if (
            saved.get("version") == MANIFEST_VERSION
            and saved.get("path") == spec.path
            and saved.get("row_groups") == list(spec.row_groups)
            and saved.get("analyzer") == cfg.analyzer
        ):
            return saved
        if (
            saved.get("version") != MANIFEST_VERSION
            or saved.get("analyzer") != cfg.analyzer
        ):
            # older artifact format, or the analysis chain changed (the
            # same rows tokenize differently) — rebuild this partition
            for sub, ext in (
                ("manifests", ".json"),
                ("runs", ".parquet"),
                ("docstore", ".parquet"),
            ):
                p = os.path.join(out_dir, sub, name + ext)
                if os.path.exists(p):
                    os.unlink(p)
        else:
            raise RuntimeError(
                f"partition {spec.pid} manifest lineage mismatch: built from "
                f"{saved.get('path')}#{saved.get('row_groups')}, plan wants "
                f"{spec.path}#{list(spec.row_groups)} — the partition plan "
                "changed; rebuild with resume=False"
            )

    needed = list(
        dict.fromkeys([*cfg.id_cols, *cfg.keep_cols, cfg.content_col, *filter_cols])
    )
    pf = pq.ParquetFile(spec.path)
    table = pf.read_row_groups(spec.row_groups, columns=needed)
    if row_filter is not None:
        table = table.filter(row_filter)
        drop = [c for c in filter_cols if c not in (*cfg.id_cols, *cfg.keep_cols, cfg.content_col)]
        if drop:
            table = table.drop_columns(drop)
    n_raw = table.num_rows

    # exact dedup on id columns, keep first occurrence (ES 'create' analog
    # within a partition; reference ElasticsearchBulkSender.ts create action)
    if len(cfg.id_cols) and n_raw:
        key_parts = [pc.cast(table[c], pa.string()) for c in cfg.id_cols]
        key = key_parts[0]
        for p in key_parts[1:]:
            key = pc.binary_join_element_wise(key, p, "\x1f")
        # first-occurrence mask via dictionary codes
        codes = pc.dictionary_encode(key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key).indices.to_numpy(zero_copy_only=False)
        first = np.zeros(len(codes), dtype=bool)
        seen = np.full(codes.max() + 1 if len(codes) else 0, -1, dtype=np.int64)
        idx = np.arange(len(codes))
        # reverse-scan trick: last write wins → write reversed indices so the
        # stored index is the FIRST occurrence
        seen[codes[::-1]] = idx[::-1]
        first[seen[seen >= 0]] = True
        if not first.all():
            table = table.filter(pa.array(first))

    n_docs = table.num_rows
    doc_ids = spec.doc_base + np.arange(n_docs, dtype=np.int64)

    content = table[cfg.content_col]
    tb = doc_term_freqs(
        content, with_positions=cfg.index_positions, analyzer=cfg.analyzer_spec()
    )
    total_tokens = int(tb.doc_len.sum())

    # --- docstore shard ---
    doc_cols: dict[str, pa.Array] = {"doc_id": pa.array(doc_ids)}
    for c in cfg.id_cols + tuple(k for k in cfg.keep_cols if k in table.column_names):
        # "doc_id" is reserved for the internal id; an input column of the
        # same name is preserved as "orig_doc_id"
        out_name = c if c != "doc_id" else "orig_doc_id"
        doc_cols[out_name] = table[c].combine_chunks() if isinstance(table[c], pa.ChunkedArray) else table[c]
    doc_cols["sha256"] = sha256_column(content)
    doc_cols["doc_len"] = pa.array(tb.doc_len)
    if cfg.store_content:
        doc_cols[cfg.content_col] = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
    _atomic_write_table(pa.table(doc_cols), os.path.join(out_dir, "docstore", name + ".parquet"))

    # --- posting run: per-term docID-sorted arrays ---
    # tb pairs are sorted by (doc, term-code); resort by (term, doc).
    # np.unique on terms gives sorted term ids.
    #
    # SHUFFLE-SLIM layout (v2): postings ship as int32 ROW OFFSETS
    # (docid − doc_base < 2^22) instead of absolute int64 docids, and
    # doc lengths don't ship at all — the merge task reconstructs them
    # from the docstore's doc_len column (≤ runs_per_bucket tiny column
    # reads per group).  8 bytes/posting through the one all-to-all
    # instead of 16 — the phase-2 exchange is plasma/network-bandwidth
    # bound, so bytes are wall-clock.
    uterms, term_ids = np.unique(tb.terms, return_inverse=True)
    order = np.lexsort((tb.doc_idx, term_ids))
    s_tid = term_ids[order]
    s_off = tb.doc_idx[order].astype(np.uint32)  # row offset within pid
    s_tf = tb.tfs[order].astype(np.int32)
    if len(s_tid):
        boundaries = np.concatenate(
            ([0], np.flatnonzero(np.diff(s_tid)) + 1, [len(s_tid)])
        )
    else:
        boundaries = np.zeros(1, dtype=np.int64)
    df_local = np.diff(boundaries)
    cf_local = np.add.reduceat(s_tf.astype(np.int64), boundaries[:-1]) if len(s_tid) else np.empty(0, dtype=np.int64)
    min_docid = (
        spec.doc_base + s_off[boundaries[:-1]].astype(np.int64)
        if len(s_tid)
        else np.empty(0, dtype=np.int64)
    )
    run_cols = {
        "term": pa.array(uterms, type=pa.string()),
        "pid": pa.array(np.full(len(uterms), spec.pid, dtype=np.int64)),
        "min_docid": pa.array(min_docid),
        "df_local": pa.array(df_local.astype(np.int64)),
        "cf_local": pa.array(cf_local),
        "offs_le": _binary_from_offsets(s_off, boundaries),
        "tfs_le": _binary_from_offsets(s_tf, boundaries),
    }
    if cfg.index_positions:
        # reorder each pair's position slice from (doc, term) to
        # (term, doc) pair order: variable-length gather built from the
        # pair permutation — no Python loop
        if len(order):
            src_start = tb.pos_off[:-1][order]
            lens64 = tb.tfs[order]
            total = int(lens64.sum())
            dst_start = np.concatenate(([0], np.cumsum(lens64[:-1]))).astype(np.int64)
            take = (
                np.repeat(src_start, lens64)
                + np.arange(total, dtype=np.int64)
                - np.repeat(dst_start, lens64)
            )
            pos_sorted = tb.pos_flat[take]
        else:
            pos_sorted = np.empty(0, dtype=np.int32)
        # per-term position counts = Σ tf over the term's pairs = cf
        pos_bounds = np.concatenate(([0], np.cumsum(cf_local))).astype(np.int64)
        run_cols["pos_le"] = _binary_from_offsets(pos_sorted, pos_bounds)
    run = pa.table(run_cols)
    # v3 layout: bake the term's shard, sort by it (stable — uterms are
    # already term-sorted, so rows stay (shard, term)-ordered), and write
    # one row group per shard.  Phase 2 then reads each shard's postings
    # with a statistics-pruned filter instead of an all-to-all shuffle.
    shard_np = term_shard(run["term"], cfg.num_shards)
    run = run.append_column("shard", pa.array(shard_np))
    s_order = np.argsort(shard_np, kind="stable")
    if not np.array_equal(s_order, np.arange(len(s_order))):
        run = run.take(pa.array(s_order, type=pa.int64()))
    _atomic_write_run_sharded(run, os.path.join(out_dir, "runs", name + ".parquet"))

    manifest = {
        "version": MANIFEST_VERSION,
        "pid": spec.pid,
        "path": spec.path,
        "row_groups": spec.row_groups,
        "n_raw_rows": n_raw,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "n_terms_local": len(uterms),
        "analyzer": cfg.analyzer,
    }
    _atomic_write_json(manifest, man_path)  # LAST: presence == partition done
    return manifest


def _build_partition_batch(
    batch: pa.Table,
    cfg: IndexConfig,
    out_dir: str,
    row_filter=None,
    filter_cols: tuple[str, ...] = (),
) -> pa.Table:
    """map_batches fn over spec rows (stateless tasks; one block per spec)."""
    manifests = []
    for row in batch.to_pylist():
        m = build_partition(
            PartitionSpec.from_row(row), cfg, out_dir,
            row_filter=row_filter, filter_cols=filter_cols,
        )
        manifests.append(
            {k: m[k] for k in ("pid", "n_raw_rows", "n_docs", "total_tokens", "n_terms_local")}
        )
    return pa.Table.from_pylist(manifests)


def _flat_binary(col: pa.Array | pa.ChunkedArray, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a large_binary column (rows are packed little-endian arrays)
    into one numpy array + per-row element counts.  One copy for
    alignment; no per-row Python loop."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    raw = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)[offs[0] : offs[-1]]
    flat = np.frombuffer(raw.tobytes(), dtype=dtype)
    item = np.dtype(dtype).itemsize
    counts = np.diff(offs) // item
    return flat, counts.astype(np.int64)


def _encode_many_pfor(docids, tfs, dls, term_offsets) -> dict:
    """PFor path of the group merge: per-term bit-packed encode assembled
    into the same output shape as :func:`encode_postings_many` (the PFor
    bit layout is block-local, so the vectorized cross-term pass doesn't
    apply; this codec trades build CPU for smaller blocks)."""
    n_terms = len(term_offsets) - 1
    blobs, blob_off = [], np.zeros(n_terms + 1, dtype=np.int64)
    bl_parts, bo_parts, mt_parts, md_parts = [], [], [], []
    nb = np.zeros(n_terms, dtype=np.int32)
    cf = np.add.reduceat(tfs, term_offsets[:-1]) if len(docids) else np.empty(0, np.int64)
    for i in range(n_terms):
        lo, hi = term_offsets[i], term_offsets[i + 1]
        ep = encode_postings_pfor(docids[lo:hi], tfs[lo:hi], dls[lo:hi])
        blobs.append(np.frombuffer(ep.blob, dtype=np.uint8))
        blob_off[i + 1] = blob_off[i] + len(ep.blob)
        bl_parts.append(ep.block_last_docid)
        bo_parts.append(ep.block_offsets)
        mt_parts.append(ep.block_max_tf)
        md_parts.append(ep.block_min_dl)
        nb[i] = len(ep.block_offsets)
    return {
        "blob_buf": np.concatenate(blobs) if blobs else np.empty(0, np.uint8),
        "blob_offsets": blob_off,
        "df": np.diff(term_offsets),
        "cf": cf,
        "min_docid": docids[term_offsets[:-1]],
        "max_docid": docids[term_offsets[1:] - 1],
        "n_blocks": nb,
        "block_last": np.concatenate(bl_parts) if bl_parts else np.empty(0, np.int64),
        "block_off": np.concatenate(bo_parts) if bo_parts else np.empty(0, np.int64),
        "block_maxtf": np.concatenate(mt_parts) if mt_parts else np.empty(0, np.int32),
        "block_mindl": np.concatenate(md_parts) if md_parts else np.empty(0, np.int32),
        "block_offsets": np.concatenate(([0], np.cumsum(nb))).astype(np.int64),
    }


#: per-process doc_len cache for merge tasks (keyed on file mtime so a
#: rebuild into the same out_dir can never serve stale lengths)
_DOCLEN_CACHE: dict = {}


def _doclen_for_pid(out_dir: str, pid: int) -> np.ndarray:
    path = os.path.join(out_dir, "docstore", f"part-{pid:05d}.parquet")
    key = (path, os.path.getmtime(path))
    arr = _DOCLEN_CACHE.get(key)
    if arr is None:
        if len(_DOCLEN_CACHE) > 512:
            _DOCLEN_CACHE.clear()
        arr = (
            pq.read_table(path, columns=["doc_len"])["doc_len"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int32)
        )
        _DOCLEN_CACHE[key] = arr
    return arr


def _merge_shard_bucket(
    group: pa.Table, codec: str = "varint", out_dir: str | None = None
) -> pa.Table:
    """Phase-2 map_groups body: merge ONE (shard, bucket) group — i.e.
    every term's runs within that shard/bucket — fully vectorized.

    Runs have disjoint ordered docID ranges, so per term the merged
    posting list is its runs concatenated in min_docid order (never a
    k-way interleave).  Sorting rows by (term, min_docid) makes every
    term's postings a contiguous docID-sorted segment of the flat arrays,
    which :func:`encode_postings_many` encodes in one pass — one Python
    call per (shard, bucket), NOT per term (the per-term map_groups
    variant spent the whole phase in per-group overhead).

    Postings arrive as int32 row offsets; absolute docids are
    reconstructed from each row's pid, and doc lengths are gathered from
    the docstore's doc_len columns (≤ runs_per_bucket small column reads
    per group — the bucket's pids only)."""
    order = pc.sort_indices(
        group, sort_keys=[("term", "ascending"), ("min_docid", "ascending")]
    )
    g = group.take(order)
    terms = g["term"].combine_chunks() if isinstance(g["term"], pa.ChunkedArray) else g["term"]
    n_rows = g.num_rows
    neq = pc.not_equal(terms.slice(1), terms.slice(0, n_rows - 1)).fill_null(True)
    first = np.ones(n_rows, dtype=bool)
    if n_rows > 1:
        first[1:] = neq.to_numpy(zero_copy_only=False)
    row_start = np.flatnonzero(first)

    offs32, counts = _flat_binary(g["offs_le"], np.uint32)
    tfs32, _ = _flat_binary(g["tfs_le"], np.int32)
    row_pids = g["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
    post_pid = np.repeat(row_pids, counts)
    docids = (post_pid << DOC_SHIFT) + offs32.astype(np.int64)

    # doc lengths for this bucket's pids, gathered from the docstore
    # (via a per-worker-process cache: map_groups tasks reuse warm
    # workers, and several groups of one bucket share the same pids)
    dls32 = np.empty(len(docids), dtype=np.int32)
    for p in np.unique(row_pids):
        dl_arr = _doclen_for_pid(out_dir, int(p))
        mask = post_pid == p
        dls32[mask] = dl_arr[offs32[mask]]

    post_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    term_offsets = np.concatenate((post_off[row_start], [post_off[-1]]))

    if codec == "pfor":
        enc = _encode_many_pfor(docids, tfs32.astype(np.int64), dls32.astype(np.int64), term_offsets)
    else:
        enc = encode_postings_many(docids, tfs32.astype(np.int64), dls32.astype(np.int64), term_offsets)

    uterms = terms.take(pa.array(row_start, type=pa.int64()))
    n_terms = len(row_start)
    shard = g["shard"][0].as_py()
    bucket = g["bucket"][0].as_py()
    out = {
        "term": uterms,
        "bucket": pa.array(np.full(n_terms, bucket, dtype=np.int64)),
        "shard": pa.array(np.full(n_terms, shard, dtype=np.int64)),
        "df": pa.array(enc["df"]),
        "cf": pa.array(enc["cf"]),
        "min_docid": pa.array(enc["min_docid"]),
        "max_docid": pa.array(enc["max_docid"]),
        "n_blocks": pa.array(enc["n_blocks"], type=pa.int32()),
        "blob": _binary_from_offsets(enc["blob_buf"], enc["blob_offsets"]),
        "block_last": _binary_from_offsets(enc["block_last"], enc["block_offsets"]),
        "block_off": _binary_from_offsets(enc["block_off"], enc["block_offsets"]),
        "block_maxtf": _binary_from_offsets(enc["block_maxtf"], enc["block_offsets"]),
        "block_mindl": _binary_from_offsets(enc["block_mindl"], enc["block_offsets"]),
    }
    if "pos_le" in g.column_names:
        # flat positions follow the same (term, min_docid) row concat
        # order as the postings; delta+varint encode the WHOLE group once
        # (first position of each posting absolute, rest deltas) and
        # slice per-term byte ranges from the per-value byte counts
        from elasticsearch_assets_ray.index.codec import encode_positions

        pos_flat, _pc = _flat_binary(g["pos_le"], np.int32)
        enc_bytes, nb = encode_positions(pos_flat, tfs32.astype(np.int64))
        elem_bounds = np.concatenate(([0], np.cumsum(enc["cf"]))).astype(np.int64)
        byte_ends = np.concatenate(([0], np.cumsum(nb))).astype(np.int64)
        out["pos"] = _binary_from_offsets(enc_bytes, byte_ends[elem_bounds])
    return pa.table(out)


def _empty_segment_table(with_pos: bool) -> pa.Table:
    """Zero-row table with the exact _merge_shard_bucket output schema —
    what a (shard, bucket) merge task emits when its filter matches
    nothing (schema unions across blocks must stay exact or the searcher's
    segment concat breaks)."""
    cols: dict = {
        "term": pa.array([], pa.string()),
        "bucket": pa.array([], pa.int64()),
        "shard": pa.array([], pa.int64()),
        "df": pa.array([], pa.int64()),
        "cf": pa.array([], pa.int64()),
        "min_docid": pa.array([], pa.int64()),
        "max_docid": pa.array([], pa.int64()),
        "n_blocks": pa.array([], pa.int32()),
    }
    for c in ("blob", "block_last", "block_off", "block_maxtf", "block_mindl"):
        cols[c] = pa.array([], pa.large_binary())
    if with_pos:
        cols["pos"] = pa.array([], pa.large_binary())
    return pa.table(cols)


def run_phase2(out_dir: str, cfg: IndexConfig) -> None:
    """Phase-2 merge: runs → per-(shard, bucket) merged, encoded segment
    rows partitioned by shard.  Reusable over any runs/docstore directory
    pair with disjoint pid ranges (full builds AND delta compaction).

    v3 runs (shard column, one row group per shard) take the ZERO-SHUFFLE
    path: one merge task per (shard, bucket) filter-reads exactly its row
    groups from its bucket's ≤ runs_per_bucket files — no all-to-all, no
    sort, no sampling barrier; every posting byte is read once by the one
    task that needs it.  Legacy runs without the shard column fall back to
    the groupby(shard, bucket) sort-shuffle."""
    import functools
    import re as _re

    import glob as _glob

    seg_dir = os.path.join(out_dir, "segments")
    if os.path.exists(seg_dir):
        import shutil

        shutil.rmtree(seg_dir)  # phase 2 is cheap relative to phase 1; redo whole
    # explicit part-file glob: an interrupted atomic write can leave a
    # stray *.tmp in the directory, which must never reach the reader
    run_files = sorted(_glob.glob(os.path.join(out_dir, "runs", "part-*.parquet")))
    if not run_files:
        os.makedirs(seg_dir, exist_ok=True)  # empty but valid index
        return
    rpb = cfg.runs_per_bucket
    num_shards = cfg.num_shards
    first_names = pq.read_schema(run_files[0]).names
    # the zero-shuffle path needs BOTH v3 properties: the shard column
    # (per-shard row groups) and file↔bucket affinity from the filename —
    # either ``part-<pid>.parquet`` (fresh build: bucket = pid // rpb) or
    # ``part-b<bucket>-x<uuid>.parquet`` (rewrite runs from
    # :func:`write_rewrite_runs_batch`: the bucket is baked in, computed
    # with the writer's rpb == this cfg's rpb by contract).  Any other
    # name (pre-v3 uuid runs) takes the sort-shuffle below.
    def _file_bucket(f: str) -> int | None:
        m = _re.search(r"part-(\d+)\.parquet$", f)
        if m:
            return int(m.group(1)) // rpb
        m = _re.search(r"part-b(\d+)-x[0-9a-f]+\.parquet$", f)
        return int(m.group(1)) if m else None

    file_buckets = [_file_bucket(f) for f in run_files]

    if "shard" in first_names and all(b is not None for b in file_buckets):
        # ---- zero-shuffle path (v3 runs) ----
        with_pos = "pos_le" in first_names
        by_bucket: dict[int, list[str]] = {}
        for f, b in zip(run_files, file_buckets):
            by_bucket.setdefault(b, []).append(f)
        descriptors = [
            {"shard": s, "bucket": b, "files": fs}
            for b, fs in sorted(by_bucket.items())
            for s in range(num_shards)
        ]
        codec = cfg.codec

        def merge_groups(batch: pa.Table) -> pa.Table:
            import pyarrow.dataset as pads

            outs = []
            for row in batch.to_pylist():
                g = pads.dataset(row["files"]).to_table(
                    filter=pc.field("shard") == row["shard"]
                )
                if not g.num_rows:
                    continue
                g = g.append_column(
                    "bucket",
                    pa.array(np.full(g.num_rows, row["bucket"], dtype=np.int64)),
                )
                outs.append(_merge_shard_bucket(g, codec=codec, out_dir=out_dir))
            if not outs:
                return _empty_segment_table(with_pos)
            return pa.concat_tables(outs)

        # one descriptor per block up to a cap: at very large bucket
        # counts, coalescing a few (same-bucket, adjacent-shard) groups
        # per task keeps driver scheduling overhead bounded without
        # hurting skew (groups stay ≤ runs_per_bucket runs each)
        segments = ray.data.from_items(
            descriptors, override_num_blocks=min(len(descriptors), 2048)
        ).map_batches(merge_groups, batch_format="pyarrow")
    else:
        # ---- legacy sort-shuffle path (pre-v3 runs) ----
        runs = ray.data.read_parquet(run_files)

        def add_keys(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "bucket", pc.divide(t["pid"], pa.scalar(rpb, pa.int64()))
            )
            return t.append_column(
                "shard", pa.array(term_shard(t["term"], num_shards))
            )

        runs = runs.map_batches(add_keys, batch_format="pyarrow")
        segments = runs.groupby(["shard", "bucket"]).map_groups(
            functools.partial(_merge_shard_bucket, codec=cfg.codec, out_dir=out_dir),
            batch_format="pyarrow",
        )
    segments.write_parquet(seg_dir, partition_cols=["shard"])
    # a zero-posting input writes no files at all — the directory must
    # still exist for the searcher
    os.makedirs(seg_dir, exist_ok=True)


def build_index(
    paths: str | list[str],
    out_dir: str,
    *,
    config: IndexConfig | None = None,
    resume: bool = True,
    pid_base: int = 0,
    row_filter=None,
    filter_cols: tuple[str, ...] = (),
    **cfg_kwargs,
) -> dict:
    """Build (or resume) the full index at ``out_dir``.  Returns the global
    manifest.  Ray must already be initialised by the caller.

    ``pid_base`` offsets the docID space (incremental deltas);
    ``row_filter``/``filter_cols`` restrict input rows (window builds)."""
    cfg = config or IndexConfig(**cfg_kwargs)
    specs = plan_partitions(paths, cfg.target_partition_rows, pid_base=pid_base)
    if not specs:
        raise ValueError(f"no parquet input found at {paths!r}")
    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        for sub in ("manifests", "runs", "docstore", "segments"):
            p = os.path.join(out_dir, sub)
            if os.path.exists(p):
                import shutil

                shutil.rmtree(p)
        for f in ("manifest.json", "plan.json"):
            p = os.path.join(out_dir, f)
            if os.path.exists(p):
                os.unlink(p)

    # ---- stable pid registry (P11: slicer-count/plan redistribution) ----
    # A completed partition is reusable across plan changes iff its
    # (path, row_groups) grouping — and therefore its docID range — is
    # unchanged.  plan.json pins pid per grouping key, so adding an input
    # file or changing target_partition_rows re-buckets only the work that
    # actually changed, instead of forcing a full rebuild (the reference's
    # compactDivisions/expandDivisions recovery semantics,
    # date-helpers.ts:148-240).  Groupings that left the plan have their
    # artifacts deleted so phase 2 never merges stale runs.
    reg_path = os.path.join(out_dir, "plan.json")
    registry: dict[str, int] = {}
    if resume and os.path.exists(reg_path):
        with open(reg_path) as f:
            registry = json.load(f)

    def _key_of(s: PartitionSpec) -> str:
        return f"{s.path}|{','.join(map(str, s.row_groups))}"

    used = set(registry.values())
    next_pid = max([pid_base - 1, *used]) + 1
    remapped: list[PartitionSpec] = []
    for s in specs:
        k = _key_of(s)
        pid = registry.get(k)
        if pid is None:
            pid = next_pid
            next_pid += 1
            registry[k] = pid
        remapped.append(PartitionSpec(pid, s.path, list(s.row_groups), s.n_rows))
    current_keys = {_key_of(s) for s in specs}
    for k in [k for k in registry if k not in current_keys]:
        stale_pid = registry.pop(k)
        for sub, ext in (
            ("manifests", ".json"),
            ("runs", ".parquet"),
            ("docstore", ".parquet"),
        ):
            p = os.path.join(out_dir, sub, f"part-{stale_pid:05d}{ext}")
            if os.path.exists(p):
                os.unlink(p)
    _atomic_write_json(registry, reg_path)
    specs = remapped
    plan_fp = hashlib.sha256(
        json.dumps([sorted(registry.items()), cfg.analyzer]).encode()
    ).hexdigest()[:16]

    # sweep stray .tmp files a crashed atomic write may have left
    import glob as _glob

    for sub in ("manifests", "runs", "docstore", "segments"):
        for tmp in _glob.glob(os.path.join(out_dir, sub, "*.tmp")):
            os.unlink(tmp)

    gm_path = os.path.join(out_dir, "manifest.json")
    if resume and os.path.exists(gm_path):
        with open(gm_path) as f:
            gm = json.load(f)
        if gm.get("complete") and gm.get("plan_fingerprint") == plan_fp:
            return gm

    # ---- phase 1: per-partition build (skips completed partitions) ----
    import time as _time

    _t0 = _time.perf_counter()
    spec_ds = ray.data.from_items(
        [s.to_row() for s in specs], override_num_blocks=len(specs)
    )
    import functools

    man_ds = spec_ds.map_batches(
        functools.partial(
            _build_partition_batch, cfg=cfg, out_dir=out_dir,
            row_filter=row_filter, filter_cols=filter_cols,
        ),
        batch_format="pyarrow",
        num_cpus=cfg.phase1_num_cpus,
    )
    manifests = man_ds.to_pandas()
    if os.environ.get("ESR_PRINT_STATS"):
        # the measure-don't-guess hook: per-stage wall/cpu/object-store
        # numbers from Ray Data's own accounting
        import sys as _sys

        print("==== phase 1 Dataset stats ====", file=_sys.stderr)
        print(man_ds.stats(), file=_sys.stderr)

    n_docs = int(manifests["n_docs"].sum())
    total_tokens = int(manifests["total_tokens"].sum())
    _t1 = _time.perf_counter()

    # ---- phase 2: the term shuffle ----
    run_phase2(out_dir, cfg)
    _t2 = _time.perf_counter()

    global_manifest = {
        "phase1_sec": round(_t1 - _t0, 3),
        "phase2_sec": round(_t2 - _t1, 3),
        "version": MANIFEST_VERSION,
        "complete": True,
        "plan_fingerprint": plan_fp,
        "n_partitions": len(specs),
        "max_pid": max(s.pid for s in specs),
        "n_docs": n_docs,
        "n_raw_rows": int(manifests["n_raw_rows"].sum()),
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "n_term_partitions": int(manifests["n_terms_local"].sum()),
        "doc_shift": DOC_SHIFT,
        "term_hash": TERM_HASH_ID,
        "codec": cfg.codec,
        "num_shards": cfg.num_shards,
        "runs_per_bucket": cfg.runs_per_bucket,
        "content_col": cfg.content_col,
        "id_cols": list(cfg.id_cols),
        "store_content": cfg.store_content,
        "index_positions": cfg.index_positions,
        "positions_codec": "varint-delta" if cfg.index_positions else None,
        "analyzer": cfg.analyzer,
    }
    _atomic_write_json(global_manifest, gm_path)
    return global_manifest
