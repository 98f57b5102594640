"""Index-resident dense vectors — the ES ``dense_vector`` field.

ES 8.x serves ``knn`` search from vectors stored IN the index, doc-
partitioned across shards, each shard returning a local top-k that the
coordinator merges (exact for brute-force/`exact: true` mode).  This
module attaches a vector sidecar to a built fulltext index with exactly
that layout: one float32 matrix per docstore part (pid), row-aligned to
the part's docIDs (``doc_base + row``), plus a presence mask for docs
without a vector.  ``Searcher.knn`` (query/engine.py) scores a shard's
resident vectors; ``ShardedSearcher.knn`` (query/sharded.py) scatter-
gathers — memory per serving shard is ∝ its own docID range, the same
contract as the postings.

Reference parity: the reference delegates every vector operation to ES
(dense_vector mappings are written through its bulk sender but never
computed on); this is the native analog of the ES-side capability.

Scale shape of :func:`attach_vectors`: the vectors arrive as a Dataset
keyed by the corpus id; ONE hash join against the docstore's (doc_id,
key) columns assigns internal docIDs, then ONE ``groupby(pid)`` writes
each part's matrix — both exchanges are bounded (ids + vectors move
once; no driver materialization).  Like the index build itself, workers
write to ``index_dir`` directly, so a multi-node cluster needs
``index_dir`` on shared storage.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import ray.data

from elasticsearch_assets_ray.sources.partition import DOC_SHIFT

VEC_META = "meta.json"


def _vec_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "vectors")


def _part_paths(index_dir: str, pid: int) -> tuple[str, str]:
    d = _vec_dir(index_dir)
    return (
        os.path.join(d, f"part-{pid:05d}.npy"),
        os.path.join(d, f"mask-{pid:05d}.npy"),
    )


def _atomic_save(path: str, arr: np.ndarray) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def attach_vectors(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    doc_key: str = "orig_doc_id",
    num_partitions: int = 16,
) -> dict:
    """Attach ``ds``'s vectors (keyed by ``key_col`` matching the
    docstore's ``doc_key`` column) to the index at ``index_dir``.
    Idempotent per index: if ``vectors/meta.json`` exists it is returned
    unchanged (delete the directory to re-attach)."""
    vdir = _vec_dir(index_dir)
    meta_path = os.path.join(vdir, VEC_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    shift = int(man.get("doc_shift", DOC_SHIFT))
    os.makedirs(vdir, exist_ok=True)

    id_cols = ["doc_id"] if doc_key == "doc_id" else ["doc_id", doc_key]
    ids_ds = ray.data.read_parquet(
        os.path.join(index_dir, "docstore"), columns=id_cols
    )

    def to_binary(batch: pa.Table) -> pa.Table:
        # Arrow's hash join can't carry list payload columns — pack each
        # vector into one binary cell (float32 LE), zero-copy from the
        # list's flat values buffer
        col = batch[vec_col].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        n = len(col)
        dim = flat.size // n if n else 0
        offs = (np.arange(n + 1, dtype=np.int32) * (dim * 4)).tobytes()
        emb = pa.Array.from_buffers(
            pa.binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(flat.tobytes())]
        )
        return pa.table({key_col: batch[key_col], "emb_bin": emb})

    joined = ds.map_batches(to_binary, batch_format="pyarrow").join(
        ids_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(doc_key,),
    )

    def add_pid(batch: pa.Table) -> pa.Table:
        # when doc_key IS doc_id the join collapses the key into key_col
        src = "doc_id" if "doc_id" in batch.column_names else key_col
        did = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        if "doc_id" not in batch.column_names:
            batch = batch.append_column("doc_id", pa.array(did))
        return batch.append_column("pid", pa.array(did >> shift))

    def write_part(group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = group["emb_bin"].combine_chunks()
        n_rows = len(col)
        buf = col.buffers()
        off_all = np.frombuffer(buf[1], dtype=np.int32)
        off = off_all[col.offset : col.offset + n_rows + 1].astype(np.int64)
        lens = np.diff(off)
        nb = int(lens[0]) if n_rows else 0
        if n_rows and not np.all(lens == nb):
            raise ValueError(
                f"pid {pid}: inconsistent vector byte lengths "
                f"{sorted(set(lens.tolist()))} — all embeddings must share one dim"
            )
        if np.unique(did).size != did.size:
            raise ValueError(
                f"pid {pid}: duplicate vector keys — one vector per doc required"
            )
        dim = nb // 4
        data = np.frombuffer(buf[2], dtype=np.uint8)
        # rows may be non-contiguous after the shuffle: one uint8 gather
        take = (off[:-1, None] + np.arange(nb, dtype=np.int64)[None, :]).reshape(-1)
        mat = np.ascontiguousarray(data[take]).view(np.float32).reshape(n_rows, dim)
        base = pid << shift
        import pyarrow.parquet as pq

        n = pq.ParquetFile(
            os.path.join(index_dir, "docstore", f"part-{pid:05d}.parquet")
        ).metadata.num_rows
        vecs = np.zeros((n, dim), dtype=np.float32)
        mask = np.zeros(n, dtype=np.uint8)
        rows = did - base
        vecs[rows] = mat
        mask[rows] = 1
        vpath, mpath = _part_paths(index_dir, pid)
        _atomic_save(vpath, vecs)
        _atomic_save(mpath, mask)
        return pa.table(
            {"pid": pa.array([pid], pa.int64()), "n_vectors": pa.array([len(col)], pa.int64()),
             "dim": pa.array([dim], pa.int64())}
        )

    stats = pa.concat_tables(
        list(
            joined.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(write_part, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    dims = set(stats["dim"].to_pylist())
    if len(dims) > 1:
        raise ValueError(f"inconsistent vector dims across parts: {sorted(dims)}")
    meta = {
        "dim": (dims.pop() if dims else 0),
        "key_col": key_col,
        "doc_key": doc_key,
        "dtype": "float32",
        "n_vectors": int(sum(stats["n_vectors"].to_pylist())),
        "n_parts": stats.num_rows,
    }
    fd, tmp = tempfile.mkstemp(dir=vdir, suffix=".tmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def load_meta(index_dir: str) -> dict | None:
    p = os.path.join(_vec_dir(index_dir), VEC_META)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_part(
    index_dir: str, pid: int, dim: int, n_docs: int
) -> tuple[np.ndarray, np.ndarray]:
    """(vectors float32 (n_docs, dim) mmap, mask bool (n_docs,)) for one
    pid; a pid with no attached vectors yields an all-missing part."""
    vpath, mpath = _part_paths(index_dir, pid)
    if not os.path.exists(vpath):
        return (
            np.zeros((n_docs, dim), dtype=np.float32),
            np.zeros(n_docs, dtype=bool),
        )
    vecs = np.load(vpath, mmap_mode="r")
    mask = np.load(mpath).astype(bool)
    return vecs, mask


def attached_pids(index_dir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[5:-4])
        for p in glob.glob(os.path.join(_vec_dir(index_dir), "part-*.npy"))
    )
