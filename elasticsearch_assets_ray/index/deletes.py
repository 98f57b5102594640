"""Delete-by-query tombstones + expunge merge.

The reference's bulk sender deletes individual records
(ElasticsearchBulkSender.ts:49-63, stages/bulk.py K3); index-WIDE
deletion in its deployments goes through Elasticsearch's
``_delete_by_query`` + ``_forcemerge?only_expunge_deletes`` APIs.  These
are the native analogs over our own index:

- :func:`delete_by_query` resolves a lucene query to matching docids and
  records them as TOMBSTONES (``deleted/tombstones.parquet``, atomic
  replace).  Search / count exclude tombstoned docs immediately.
- **BM25 stats (N, df, avgdl) intentionally DO NOT change until
  expunge** — identical to Lucene's deleted-doc semantics, where deleted
  docs still count toward collection statistics until segments merge.
- :func:`expunge_deletes` rewrites the index WITHOUT re-tokenizing:
  docstore parts are filtered (per-part Ray tasks), postings are
  decoded, tombstone-filtered, remapped to the compacted row offsets and
  re-emitted as bucket-affine v3 runs
  (:func:`..index.build.write_rewrite_runs_batch`), then the standard
  phase-2 merge (:func:`..index.build.run_phase2`) takes its
  zero-shuffle path over them — positions included, no all-to-all.

Scale notes: tombstones are one sorted int64 docid list (8 B/doc —
shard it per pid range beyond ~1e9 deletes); the expunge docstore pass
is one task per part file and the postings pass streams segment rows
through ``map_batches``, so both scale with partition count, not corpus
size on any single node.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from elasticsearch_assets_ray.index.build import (
    IndexConfig,
    _atomic_write_json,
    _atomic_write_table,
    _binary_from_offsets,
    _flat_binary,
    run_phase2,
)
from elasticsearch_assets_ray.sources.partition import DOC_SHIFT


def tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deleted", "tombstones.parquet")


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted int64 docids marked deleted (empty when none)."""
    p = tombstone_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy(
        zero_copy_only=False
    ).astype(np.int64)


def write_tombstones(index_dir: str, docids: np.ndarray) -> None:
    """Atomic replace (tmp + rename) of the tombstone list — a crashed
    writer never leaves a torn file for readers."""
    p = tombstone_path(index_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    docids = np.unique(np.asarray(docids, dtype=np.int64))
    _atomic_write_table(pa.table({"doc_id": pa.array(docids)}), p)


def open_pit(index_dir: str) -> str:
    """ES ``point in time`` analog (the ``_pit`` API): snapshot the
    index's mutable state — the tombstone list; segments are immutable —
    under a content-addressed id, so searches carrying the PIT keep
    seeing this exact view while deletes continue.  Returns the pit id;
    reopening an identical state returns the same id (idempotent)."""
    import hashlib

    ts = load_tombstones(index_dir)
    pit_id = hashlib.sha256(ts.tobytes()).hexdigest()[:16]
    p = os.path.join(index_dir, "deleted", "pits", f"{pit_id}.parquet")
    if not os.path.exists(p):
        os.makedirs(os.path.dirname(p), exist_ok=True)
        _atomic_write_table(pa.table({"doc_id": pa.array(ts)}), p)
    return pit_id


def pit_tombstones(index_dir: str, pit_id: str) -> np.ndarray:
    """The tombstone snapshot a PIT search serves from (raises on an
    unknown/expired pit id, mirroring ES's search_context_missing)."""
    p = os.path.join(index_dir, "deleted", "pits", f"{pit_id}.parquet")
    if not os.path.exists(p):
        raise KeyError(f"unknown or closed pit {pit_id!r}")
    return pq.read_table(p, columns=["doc_id"])["doc_id"].to_numpy(
        zero_copy_only=False
    ).astype(np.int64)


def close_pit(index_dir: str, pit_id: str) -> bool:
    """Release a PIT snapshot; returns False if it was already gone."""
    p = os.path.join(index_dir, "deleted", "pits", f"{pit_id}.parquet")
    try:
        os.remove(p)
        return True
    except FileNotFoundError:
        return False


def delete_by_query(index_dir: str, query: str) -> int:
    """Tombstone every doc matching ``query`` (full lucene clause surface
    — boolean, phrases, prefix/wildcard/fuzzy).  Returns the number of
    NEWLY deleted docs.  Already-tombstoned docs are excluded from the
    match (the searcher applies tombstones), so repeat calls are
    idempotent."""
    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(index_dir)
    ids = s.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
    existing = load_tombstones(index_dir)
    merged = np.union1d(existing, ids)
    n_new = int(merged.size - existing.size)
    if n_new:
        write_tombstones(index_dir, merged)
    return n_new


def _expunge_docstore(
    index_dir: str, out_dir: str, tomb_ref, doc_shift: int
) -> tuple[int, int]:
    """Rewrite docstore parts dropping tombstoned rows (one Ray task per
    part file; row offsets compact, pids keep their filenames).  Returns
    (n_docs, total_tokens) of the surviving corpus."""
    import ray
    import ray.data

    parts = sorted(
        _glob.glob(os.path.join(index_dir, "docstore", "part-*.parquet"))
    )
    items = [
        {"path": p, "pid": int(os.path.basename(p)[5:-8])} for p in parts
    ]
    os.makedirs(os.path.join(out_dir, "docstore"), exist_ok=True)

    def rewrite(batch: pa.Table) -> pa.Table:
        import ray as _ray

        tomb = _ray.get(tomb_ref)
        out_n, out_tok, out_pid = [], [], []
        for path, pid in zip(
            batch["path"].to_pylist(), batch["pid"].to_pylist()
        ):
            t = pq.read_table(path)
            base = pid << doc_shift
            # this pid's deleted row offsets (tombstones are sorted)
            lo = np.searchsorted(tomb, base)
            hi = np.searchsorted(tomb, base + t.num_rows)
            dels = tomb[lo:hi] - base
            if dels.size:
                keep = np.ones(t.num_rows, dtype=bool)
                keep[dels] = False
                t = t.filter(pa.array(keep))
                # re-key to the COMPACTED offsets (postings are remapped
                # the same way in _segment_to_runs)
                t = t.set_column(
                    t.schema.get_field_index("doc_id"),
                    "doc_id",
                    pa.array(base + np.arange(t.num_rows, dtype=np.int64)),
                )
            _atomic_write_table(
                t, os.path.join(out_dir, "docstore", os.path.basename(path))
            )
            out_pid.append(pid)
            out_n.append(t.num_rows)
            out_tok.append(
                int(
                    np.sum(
                        t["doc_len"].to_numpy(zero_copy_only=False),
                        dtype=np.int64,
                    )
                )
                if t.num_rows
                else 0
            )
        return pa.table(
            {
                "pid": pa.array(out_pid, pa.int64()),
                "n_docs": pa.array(out_n, pa.int64()),
                "total_tokens": pa.array(out_tok, pa.int64()),
            }
        )

    stats = (
        ray.data.from_items(items)
        .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    return int(stats["n_docs"].sum()), int(stats["total_tokens"].sum())


def _segment_to_runs(
    batch: pa.Table,
    tomb_ref,
    doc_shift: int,
    decode_fn,
    has_positions: bool,
    pos_codec: str | None = "varint-delta",
) -> pa.Table:
    """Decode a batch of merged segment rows, drop tombstoned postings,
    remap surviving docids to the COMPACTED row offsets and re-emit
    phase-1-format run rows (one per surviving (term, pid)) — the
    standard phase-2 shuffle then rebuilds segments, block metadata and
    positions without any re-tokenization."""
    import ray as _ray

    from elasticsearch_assets_ray.index.codec import decode_positions

    tomb = _ray.get(tomb_ref)
    terms_out: list[str] = []
    pids_out: list[int] = []
    min_docid_out: list[int] = []
    df_out: list[int] = []
    cf_out: list[int] = []
    offs_chunks: list[np.ndarray] = []
    offs_bounds = [0]
    tfs_chunks: list[np.ndarray] = []
    pos_chunks: list[np.ndarray] = []
    pos_bounds = [0]

    terms = batch["term"].to_pylist()
    dfs = batch["df"].to_numpy(zero_copy_only=False)
    blobs = batch["blob"].to_pylist()
    pos_col = batch["pos"].to_pylist() if has_positions else None
    for i, term in enumerate(terms):
        docids, tfs = decode_fn(blobs[i], int(dfs[i]))
        keep = ~np.isin(docids, tomb)
        pos_flat = None
        if pos_col is not None:
            if pos_codec == "varint-delta":
                pos_flat = decode_positions(pos_col[i], tfs)
            else:  # raw little-endian int32 (pre-compression layout)
                pos_flat = np.frombuffer(pos_col[i], dtype=np.int32)
            pos_flat = pos_flat[np.repeat(keep, tfs)]
        docids, tfs = docids[keep], tfs[keep]
        if docids.size == 0:
            continue
        pid = docids >> doc_shift
        old_off = docids - (pid << doc_shift)
        # compacted row offsets: subtract the count of deleted rows of
        # the SAME pid below each surviving offset (tomb is sorted)
        abs_del_before = np.searchsorted(tomb, docids)
        pid_base_del = np.searchsorted(tomb, pid << doc_shift)
        new_off = (old_off - (abs_del_before - pid_base_del)).astype(np.uint32)
        # split the term's postings by pid (docids ascending ⇒ pid runs
        # are contiguous)
        run_bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(pid)) + 1, [pid.size])
        )
        tf_cum = np.concatenate(([0], np.cumsum(tfs))).astype(np.int64)
        for a, b in zip(run_bounds[:-1], run_bounds[1:]):
            terms_out.append(term)
            pids_out.append(int(pid[a]))
            min_docid_out.append(int((pid[a] << doc_shift) + new_off[a]))
            df_out.append(int(b - a))
            cf_out.append(int(tf_cum[b] - tf_cum[a]))
            offs_chunks.append(new_off[a:b])
            offs_bounds.append(offs_bounds[-1] + (b - a))
            tfs_chunks.append(tfs[a:b].astype(np.int32))
            if pos_flat is not None:
                pos_chunks.append(pos_flat[tf_cum[a] : tf_cum[b]])
                pos_bounds.append(pos_bounds[-1] + int(tf_cum[b] - tf_cum[a]))

    if not terms_out:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "pid": pa.array([], pa.int64()),
                "min_docid": pa.array([], pa.int64()),
                "df_local": pa.array([], pa.int64()),
                "cf_local": pa.array([], pa.int64()),
                "offs_le": pa.array([], pa.large_binary()),
                "tfs_le": pa.array([], pa.large_binary()),
                **(
                    {"pos_le": pa.array([], pa.large_binary())}
                    if has_positions
                    else {}
                ),
            }
        )
    offs_flat = np.concatenate(offs_chunks).astype(np.uint32)
    tfs_flat = np.concatenate(tfs_chunks).astype(np.int32)
    cols = {
        "term": pa.array(terms_out, pa.string()),
        "pid": pa.array(pids_out, pa.int64()),
        "min_docid": pa.array(min_docid_out, pa.int64()),
        "df_local": pa.array(df_out, pa.int64()),
        "cf_local": pa.array(cf_out, pa.int64()),
        "offs_le": _binary_from_offsets(offs_flat, np.asarray(offs_bounds)),
        "tfs_le": _binary_from_offsets(tfs_flat, np.asarray(offs_bounds)),
    }
    if has_positions:
        pos_all = (
            np.concatenate(pos_chunks).astype(np.int32)
            if pos_chunks
            else np.empty(0, dtype=np.int32)
        )
        cols["pos_le"] = _binary_from_offsets(pos_all, np.asarray(pos_bounds))
    return pa.table(cols)


def expunge_deletes(index_dir: str, out_dir: str) -> dict:
    """Materialize tombstones: write a NEW index at ``out_dir`` with
    deleted docs physically removed and collection statistics (N, df,
    avgdl, block metadata) recomputed — the ``_forcemerge
    ?only_expunge_deletes`` analog.  The source index is untouched."""
    import functools

    import ray
    import ray.data

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    tomb = load_tombstones(index_dir)
    doc_shift = int(man.get("doc_shift", DOC_SHIFT))
    os.makedirs(out_dir, exist_ok=True)
    tomb_ref = ray.put(tomb)

    n_docs, total_tokens = _expunge_docstore(
        index_dir, out_dir, tomb_ref, doc_shift
    )

    # postings: segment rows → filtered runs → the standard phase-2 merge
    from elasticsearch_assets_ray.index.codec import (
        decode_postings,
        decode_postings_pfor,
    )

    decode_fn = (
        decode_postings_pfor if man.get("codec") == "pfor" else decode_postings
    )
    has_positions = bool(man.get("index_positions"))
    seg_files = sorted(
        _glob.glob(
            os.path.join(index_dir, "segments", "**", "*.parquet"),
            recursive=True,
        )
    )
    runs_dir = os.path.join(out_dir, "runs")
    os.makedirs(runs_dir, exist_ok=True)
    if seg_files:
        cols = ["term", "df", "blob"] + (["pos"] if has_positions else [])
        runs_ds = ray.data.read_parquet(seg_files, columns=cols).map_batches(
            functools.partial(
                _segment_to_runs,
                tomb_ref=tomb_ref,
                doc_shift=doc_shift,
                decode_fn=decode_fn,
                has_positions=has_positions,
                pos_codec=man.get("positions_codec"),
            ),
            batch_format="pyarrow",
        )

        # bucket-affine v3 run files → run_phase2 takes the zero-shuffle
        # path for the compaction too (no all-to-all over index bytes)
        from elasticsearch_assets_ray.index.build import (
            write_rewrite_runs_batch,
        )

        runs_ds.map_batches(
            functools.partial(
                write_rewrite_runs_batch,
                runs_dir=runs_dir,
                rpb=int(man.get("runs_per_bucket", 32)),
                num_shards=int(man["num_shards"]),
            ),
            batch_format="pyarrow",
        ).to_pandas()

    cfg = IndexConfig(
        content_col=man.get("content_col", "content"),
        codec=man.get("codec", "varint"),
        store_content=man.get("store_content", True),
        index_positions=has_positions,
        num_shards=int(man["num_shards"]),
        runs_per_bucket=int(man.get("runs_per_bucket", 32)),
    )
    run_phase2(out_dir, cfg)
    import shutil

    shutil.rmtree(runs_dir, ignore_errors=True)

    new_man = dict(man)
    new_man.update(
        {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "expunged_from": index_dir,
            "expunged_docs": int(tomb.size),
            "complete": True,
        }
    )
    _atomic_write_json(new_man, os.path.join(out_dir, "manifest.json"))
    return new_man
