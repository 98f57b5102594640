"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  ``ray.put`` once and broadcast; every ``map_batches`` task does one
  float64 matmul per batch and keeps a local (query, k) heap; the driver
  merges ≤ k × n_blocks candidate rows.  This is the baseline/oracle.
- :class:`LSHIndexer` / :func:`lsh_topk` — random-hyperplane LSH variant
  (the scale path): each vector is bucketed by sign-pattern; a query only
  scores vectors whose bucket matches in ≥1 of the hash tables.  Recall <
  1 by construction; used when the corpus no longer fits a per-batch
  matmul budget.

No analog exists in the reference (similarity is ES-delegated, and the
reference never uses it); first-class training-data operator.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _matrix(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 from a list<float> column (zero-copy flat view)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _brute_force_batch(batch: pa.Table, queries_ref, id_col: str, vec_col: str, k: int) -> pa.Table:
    """Stateless per-batch scorer: the query matrix is ray.put once and
    fetched zero-copy from plasma per task (workers stay warm — no actor
    pool spin-up for small jobs; switch to an actor class only when the
    query matrix is large enough that per-task normalization matters)."""
    q = ray.get(queries_ref)
    qids = q["qids"]
    qmat = _normalize(q["qmat"])
    vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _normalize(_matrix(batch[vec_col]))
    sims = qmat @ m.T  # (Q, n)
    k = min(k, sims.shape[1])
    # local top-k per query: argpartition then exact sort
    part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
    rows = np.repeat(np.arange(sims.shape[0]), k)
    cols = part.reshape(-1)
    return pa.table(
        {
            "query_id": pa.array(qids[rows].astype(np.int64)),
            "vec_id": pa.array(vids[cols]),
            "sim": pa.array(sims[rows, cols].astype(np.float64)),
        }
    )


def _merge_topk(cands: pa.Table, k: int) -> pa.Table:
    """Global (query_id, vec_id, sim, rank) top-k from per-block
    candidates; ties broken by vec_id asc."""
    qid = cands["query_id"].to_numpy(zero_copy_only=False)
    vid = cands["vec_id"].to_numpy(zero_copy_only=False)
    sim = cands["sim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sim, qid))
    qid, vid, sim = qid[order], vid[order], sim[order]
    # rank within query
    starts = np.concatenate(([True], qid[1:] != qid[:-1]))
    grp = np.cumsum(starts) - 1
    first_idx = np.flatnonzero(starts)
    rank = np.arange(len(qid)) - first_idx[grp] + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(qid[keep].astype(np.int64)),
            "vec_id": pa.array(vid[keep].astype(np.int64)),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "sim": pa.array(sim[keep].astype(np.float64)),
        }
    )


def _match_pairs(
    keys_flat: np.ndarray,
    row_of: np.ndarray,
    qk_sorted: np.ndarray,
    qk_qi: np.ndarray,
    n_q: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch candidate generation shared by the ANN scorers: match every
    (row, key) entry against the SORTED query-side key postings
    (qk_sorted with parallel query ids qk_qi) in two searchsorted passes,
    expand the hit ranges to (row, query) pairs, and dedupe — replacing
    the per-query ``np.isin`` loop (fine at 3 gate queries, |Q|× the
    batch work when serving thousands)."""
    lo = np.searchsorted(qk_sorted, keys_flat, side="left")
    hi = np.searchsorted(qk_sorted, keys_flat, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    starts = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    offs = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
    pair_qi = qk_qi[np.repeat(lo, cnt) + offs]
    pair_row = np.repeat(row_of, cnt)
    combo = np.unique(pair_row * np.int64(n_q) + pair_qi)
    return combo // np.int64(n_q), combo % np.int64(n_q)


def _pairs_local_topk(
    m: np.ndarray,
    vids: np.ndarray,
    qmat: np.ndarray,
    qids: np.ndarray,
    pair_row: np.ndarray,
    pair_qi: np.ndarray,
    k: int,
) -> pa.Table:
    """Per-query local top-k over candidate (row, query) pairs: ONE fused
    gather-dot (einsum) over every pair, then a lexsort + segment head-k
    — no per-query matmul loop.  Deterministic (-sim, vec_id) order."""
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )
    if pair_row.size == 0:
        return empty
    sims = np.einsum("ij,ij->i", m[pair_row], qmat[pair_qi])
    srt = np.lexsort((vids[pair_row], -sims, pair_qi))
    sq, srow, ssim = pair_qi[srt], pair_row[srt], sims[srt]
    seg_start = np.concatenate(([True], sq[1:] != sq[:-1]))
    seg_idx = np.cumsum(seg_start) - 1
    first_of_seg = np.flatnonzero(seg_start)
    pos = np.arange(sq.size) - first_of_seg[seg_idx]
    keep = pos < k
    return pa.table(
        {
            "query_id": pa.array(np.asarray(qids)[sq[keep]].astype(np.int64)),
            "vec_id": pa.array(vids[srow[keep]].astype(np.int64)),
            "sim": pa.array(ssim[keep].astype(np.float64)),
        }
    )


def _sorted_query_postings(qkeys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a (Q, T) query key matrix into sorted (key, query-id)
    postings arrays for :func:`_match_pairs`."""
    qi_flat = np.repeat(np.arange(qkeys.shape[0], dtype=np.int64), qkeys.shape[1])
    order = np.argsort(qkeys.reshape(-1), kind="stable")
    return qkeys.reshape(-1)[order], qi_flat[order]


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
    """Exact cosine top-k for each query vector.  Returns
    (query_id, vec_id, rank, sim) with rank 1..k per query."""
    import functools

    ref = ray.put({"qids": np.asarray(query_ids), "qmat": np.asarray(query_vecs, dtype=np.float64)})
    cands_ds = ds.map_batches(
        functools.partial(
            _brute_force_batch, queries_ref=ref, id_col=id_col, vec_col=vec_col, k=k
        ),
        batch_format="pyarrow",
    )
    cands = pa.concat_tables(list(cands_ds.iter_batches(batch_format="pyarrow")))
    return _merge_topk(cands, k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane) — the scale path
# ---------------------------------------------------------------------------


class LSHIndexer:
    """Adds ``lsh_key`` per (row, table): sign pattern of ``n_planes``
    random hyperplanes, seeded → identical across actors.  Use as an
    actor-pool stage; downstream ``groupby('lsh_key')`` co-locates
    candidates."""

    def __init__(self, dim: int, n_tables: int = 8, n_planes: int = 12, seed: int = 13,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_planes, dim))
        self.n_tables = n_tables
        self.vec_col = vec_col

    def key(self, m: np.ndarray) -> np.ndarray:
        """(n, n_tables) int64 bucket keys."""
        n = m.shape[0]
        out = np.empty((n, self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            signs = (m @ self.planes[t].T) > 0  # (n, planes)
            key = np.zeros(n, dtype=np.int64)
            for j in range(signs.shape[1]):
                key = (key << 1) | signs[:, j]
            out[:, t] = key | (t << 48)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch[self.vec_col]))
        keys = self.key(m)  # (n, T)
        n = batch.num_rows
        idx = np.repeat(np.arange(n), self.n_tables)
        exploded = batch.take(pa.array(idx))
        out = {name: exploded[name] for name in exploded.column_names}
        out["lsh_key"] = pa.array(keys.reshape(-1))
        return pa.table(out)


def lsh_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 8,
    n_planes: int = 12,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
    """Approximate cosine top-k: only vectors sharing ≥1 LSH bucket with
    the query are scored.  Same output schema as brute_force_topk."""
    indexer = LSHIndexer(dim=dim, n_tables=n_tables, n_planes=n_planes, vec_col=vec_col)
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qkeys = indexer.key(qmat)  # (Q, T)
    wanted = np.unique(qkeys.reshape(-1))
    ref = ray.put(
        {"qids": np.asarray(query_ids), "qmat": qmat, "wanted": wanted, "qkeys": qkeys}
    )

    class Scorer:
        def __init__(self):
            self.state = ray.get(ref)
            self.indexer = LSHIndexer(dim=dim, n_tables=n_tables, n_planes=n_planes, vec_col=vec_col)
            # query-side key postings, sorted once per actor — batch
            # candidate generation is two searchsorted calls, with NO
            # per-query Python loop (the round-2 shape looped |Q| times
            # per batch: fine at 3 gate queries, not at thousands)
            self.qk_sorted, self.qk_qi = _sorted_query_postings(self.state["qkeys"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_matrix(batch[vec_col]))
            n = len(vids)
            keys = self.indexer.key(m).reshape(-1)  # (n*T,)
            row_of = np.repeat(np.arange(n, dtype=np.int64), n_tables)
            n_q = self.state["qmat"].shape[0]
            pair_row, pair_qi = _match_pairs(
                keys, row_of, self.qk_sorted, self.qk_qi, n_q
            )
            return _pairs_local_topk(
                m, vids, self.state["qmat"], self.state["qids"], pair_row, pair_qi, k
            )

    cands_ds = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=concurrency)
    cands = pa.concat_tables(list(cands_ds.iter_batches(batch_format="pyarrow")))
    if cands.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    return _merge_topk(cands, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) — coarse k-means quantizer, the other scale path
# ---------------------------------------------------------------------------


def train_centroids(
    sample: np.ndarray, n_centroids: int, n_iters: int = 10, seed: int = 17
) -> np.ndarray:
    """Seeded Lloyd k-means on a (normalized) sample — the coarse
    quantizer.  Deterministic: same sample/seed → same centroids.  At
    cluster scale the sample comes from ``ds.random_sample`` with a fixed
    seed; training is driver-side (centroid count ≪ corpus)."""
    rng = np.random.default_rng(seed)
    m = _normalize(np.asarray(sample, dtype=np.float64))
    n = m.shape[0]
    n_centroids = min(n_centroids, n)
    cent = m[rng.choice(n, size=n_centroids, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(m @ cent.T, axis=1)  # cosine on normalized = dot
        for c in range(n_centroids):
            mask = assign == c
            if mask.any():
                v = m[mask].sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


def kmeans_distributed(
    ds: "ray.data.Dataset",
    vec_col: str,
    n_centroids: int,
    n_iters: int = 10,
    seed: int = 17,
    init_sample: int = 4096,
) -> tuple[np.ndarray, dict]:
    """FULL-corpus spherical k-means (cosine), the scale path when a
    driver-side sample (:func:`train_centroids`) is not representative:
    per iteration the centers broadcast ONCE via ``ray.put`` and every
    batch emits per-cluster (vector-sum, count) partials — one small row
    per cluster per batch, merged on the driver.  The corpus streams; no
    shuffle, no materialization, bytes to the driver are
    O(batches × k × dim) per iteration.

    Deterministic given a fixed input partitioning: partials merge in a
    sorted order (cluster id, then serialized sum bytes) so driver float
    addition has one fixed order regardless of batch completion order.

    Returns (centroids row-normalized (k, dim) float64, stats with
    per-iteration inertia proxy and cluster sizes)."""
    import ray as _ray

    # deterministic seeding: first init_sample rows (corpus order), the
    # same convention the IVF build uses for its quantizer sample
    head = pa.concat_tables(
        list(ds.limit(init_sample).iter_batches(batch_format="pyarrow"))
    )
    sample = _matrix(head[vec_col])
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    k = min(n_centroids, sample.shape[0])
    cent = sample[rng.choice(sample.shape[0], size=k, replace=False)].copy()
    dim = cent.shape[1]
    stats: dict = {"iters": [], "n_centroids": k}
    sizes = np.zeros(k, dtype=np.int64)  # bound even when n_iters == 0

    for it in range(n_iters):
        cent_ref = _ray.put(cent)

        def partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            c = _ray.get(_ref)
            m = _normalize(_matrix(t[vec_col]))
            assign = np.argmax(m @ c.T, axis=1)
            sim = (m * c[assign]).sum(axis=1)
            order = np.argsort(assign, kind="stable")
            a_sorted = assign[order]
            first = np.ones(a_sorted.size, dtype=bool)
            first[1:] = a_sorted[1:] != a_sorted[:-1]
            starts = np.flatnonzero(first)
            sums = np.add.reduceat(m[order], starts, axis=0)
            cnts = np.add.reduceat(np.ones(a_sorted.size), starts)
            return pa.table(
                {
                    "cluster": pa.array(a_sorted[starts].astype(np.int64)),
                    "vecsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "count": pa.array(cnts.astype(np.int64)),
                    "simsum": pa.array(
                        np.add.reduceat(sim[order], starts), pa.float64()
                    ),
                }
            )

        rows = pa.concat_tables(
            list(
                ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        cl = rows["cluster"].to_numpy(zero_copy_only=False)
        vs = _matrix(rows["vecsum"])
        cn = rows["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        ss = rows["simsum"].to_numpy(zero_copy_only=False)
        # fixed merge order: (cluster, partial bytes) — batch completion
        # order cannot change the float summation order
        keys = [(int(c), vs[i].tobytes()) for i, c in enumerate(cl)]
        order = sorted(range(len(keys)), key=lambda i: keys[i])
        new = cent.copy()
        sizes = np.zeros(k, dtype=np.int64)
        acc = np.zeros((k, dim), dtype=np.float64)
        total_sim = 0.0
        for i in order:
            acc[cl[i]] += vs[i]
            sizes[cl[i]] += cn[i]
            total_sim += ss[i]
        for c in range(k):
            if sizes[c]:
                norm = np.linalg.norm(acc[c])
                if norm > 0:
                    new[c] = acc[c] / norm
        stats["iters"].append(
            {
                "mean_cosine": round(float(total_sim / max(sizes.sum(), 1)), 6),
                "nonempty": int((sizes > 0).sum()),
            }
        )
        cent = new
    stats["sizes"] = sizes.tolist()
    return cent, stats


class IVFAssigner:
    """Actor-pool stage: adds ``ivf_cluster`` = nearest centroid id per
    row.  Centroids are broadcast once via ray.put and loaded per actor."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        self.cent = ray.get(centroids_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch[self.vec_col]))
        assign = np.argmax(m @ self.cent.T, axis=1).astype(np.int64)
        out = {n: batch[n] for n in batch.column_names}
        out["ivf_cluster"] = pa.array(assign)
        return pa.table(out)


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: np.ndarray | None = None,
    concurrency: int | tuple[int, int] = (1, 4),
) -> pa.Table:
    """IVF approximate top-k: vectors are bucketed by nearest centroid;
    a query scores only the ``nprobe`` closest clusters' vectors.  Same
    output schema as brute_force_topk; recall < 1 by construction.

    The scan prunes at the source: batches are filtered to probed
    clusters BEFORE any matmul, so at scale (cluster-partitioned layout,
    ``write_parquet(partition_cols=['ivf_cluster'])``) unprobed
    partitions never leave storage."""
    if train_sample is None:
        head = ds.limit(4096)
        train_sample = _matrix(
            pa.concat_tables(list(head.iter_batches(batch_format="pyarrow")))[vec_col]
        )
    cent = train_centroids(train_sample, n_centroids)
    cent_ref = ray.put(cent)
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qassign = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probed = np.unique(qassign.reshape(-1))
    qk_sorted, qk_qi = _sorted_query_postings(qassign)  # once, not per batch
    state_ref = ray.put(
        {
            "qids": np.asarray(query_ids), "qmat": qmat, "qassign": qassign,
            "probed": probed, "qk_sorted": qk_sorted, "qk_qi": qk_qi,
        }
    )

    import functools

    def score(batch: pa.Table, cent_ref=cent_ref, state_ref=state_ref) -> pa.Table:
        cent_ = ray.get(cent_ref)
        st = ray.get(state_ref)
        vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch[vec_col]))
        assign = np.argmax(m @ cent_.T, axis=1)
        keep = np.isin(assign, st["probed"])
        if not keep.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        mk, vk, ak = m[keep], vids[keep], assign[keep]
        pair_row, pair_qi = _match_pairs(
            ak, np.arange(len(vk), dtype=np.int64), st["qk_sorted"], st["qk_qi"],
            st["qmat"].shape[0],
        )
        return _pairs_local_topk(
            mk, vk, st["qmat"], st["qids"], pair_row, pair_qi, k
        )

    cands_ds = ds.map_batches(score, batch_format="pyarrow")
    cands = pa.concat_tables(list(cands_ds.iter_batches(batch_format="pyarrow")))
    if cands.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    return _merge_topk(cands, k)


def ivf_build(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    train_sample: np.ndarray | None = None,
    seed: int = 17,
) -> dict:
    """Build the cluster-PARTITIONED IVF layout: vectors are written as
    ``out_dir/vectors/ivf_cluster=<c>/...`` Parquet (one directory per
    coarse cell) plus the centroid matrix.  Query-time ``nprobe`` pruning
    then happens AT THE SOURCE — ``read_parquet`` with an ``ivf_cluster``
    filter only opens the probed partitions' files; unprobed cells never
    leave storage (this is the layout the docstring of :func:`ivf_topk`
    promises; that function remains the layout-free variant for ad-hoc
    datasets)."""
    import json

    if train_sample is None:
        head = ds.limit(4096)
        train_sample = _matrix(
            pa.concat_tables(list(head.iter_batches(batch_format="pyarrow")))[vec_col]
        )
    cent = train_centroids(train_sample, n_centroids, seed=seed)
    cent_ref = ray.put(cent)
    assigned = ds.map_batches(
        IVFAssigner,
        fn_constructor_kwargs=dict(centroids_ref=cent_ref, vec_col=vec_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    # partition on a COPY of the cluster id: partition_cols strips the
    # column from the data files, and we want it both as directory layout
    # (source pruning) and as a per-row column (in-batch probe masks)
    assigned = assigned.map_batches(
        lambda b: b.append_column("ivf_part", b["ivf_cluster"]),
        batch_format="pyarrow",
    )
    vec_dir = os.path.join(out_dir, "vectors")
    assigned.write_parquet(vec_dir, partition_cols=["ivf_part"])
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    man = {"n_centroids": int(cent.shape[0]), "dim": int(cent.shape[1]), "vec_col": vec_col}
    with open(os.path.join(out_dir, "ivf.json"), "w") as f:
        json.dump(man, f)
    return man


def ivf_search(
    index_dir: str,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 4,
) -> pa.Table:
    """Search an :func:`ivf_build` layout: only the ``nprobe`` closest
    clusters per query are READ (partition-pruned scan), then scored
    exactly.  Same output schema as brute_force_topk."""
    import json

    with open(os.path.join(index_dir, "ivf.json")) as f:
        man = json.load(f)
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    vec_col = man["vec_col"]
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qassign = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probed = np.unique(qassign.reshape(-1))
    import pyarrow.compute as pc

    # source pruning: ONLY the probed clusters' partition directories are
    # handed to the read — unprobed cells never leave storage
    import glob as _glob

    vec_dir = os.path.join(index_dir, "vectors")
    paths = [
        f
        for c in probed
        for f in sorted(
            _glob.glob(os.path.join(vec_dir, f"ivf_part={int(c)}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    ds = ray.data.read_parquet(paths)
    qk_sorted, qk_qi = _sorted_query_postings(qassign)  # once, not per batch
    ref = ray.put(
        {
            "qids": np.asarray(query_ids), "qmat": qmat, "qassign": qassign,
            "qk_sorted": qk_sorted, "qk_qi": qk_qi,
        }
    )

    def score(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch[vec_col]))
        clus = (
            pc.cast(batch["ivf_cluster"], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pair_row, pair_qi = _match_pairs(
            clus, np.arange(len(vids), dtype=np.int64), st["qk_sorted"], st["qk_qi"],
            st["qmat"].shape[0],
        )
        return _pairs_local_topk(
            m, vids, st["qmat"], st["qids"], pair_row, pair_qi, k
        )

    cands_ds = ds.map_batches(score, batch_format="pyarrow")
    cands = pa.concat_tables(list(cands_ds.iter_batches(batch_format="pyarrow")))
    if cands.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    return _merge_topk(cands, k)


def ivf_probed_files(index_dir: str, query_vecs: np.ndarray, nprobe: int) -> tuple[int, int]:
    """(files the probe plan touches, total files) — the pruning
    observability hook used by tests/benchmarks to prove unprobed
    partitions are never opened."""
    import glob as _glob

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qassign = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probed = {int(c) for c in np.unique(qassign.reshape(-1))}
    vec_dir = os.path.join(index_dir, "vectors")
    total = touched = 0
    for p in _glob.glob(os.path.join(vec_dir, "ivf_part=*", "*.parquet")):
        total += 1
        if int(os.path.basename(os.path.dirname(p)).split("=")[1]) in probed:
            touched += 1
    return touched, total


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_tables: int = 6,
    n_planes: int = 10,
    concurrency: int | tuple[int, int] = (1, 8),
    n_rows_hint: int | None = None,
    materialize: bool = True,
) -> pa.Table | ray.data.Dataset:
    """Embedding-cosine near-dup pairs via LSH bucketing + in-bucket exact
    cosine.  Returns (id_a, id_b, sim) with id_a < id_b, sims ≥ threshold
    (``materialize=False`` → distributed-distinct Dataset, the scale path)."""
    from elasticsearch_assets_ray.stages.dedup import (
        blocked_triangle_pairs,
        dynamic_n_groups,
    )

    indexer_kwargs = dict(dim=dim, n_tables=n_tables, n_planes=n_planes, vec_col=vec_col)
    exploded = ds.map_batches(
        LSHIndexer,
        fn_constructor_kwargs=indexer_kwargs,
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    n_groups = dynamic_n_groups(
        (n_rows_hint or 0) * n_tables, target_rows_per_group=20_000
    )
    import pyarrow.compute as pc

    exploded = exploded.map_batches(
        lambda t: t.append_column(
            "grp", pc.bit_wise_and(t["lsh_key"], pa.scalar(n_groups - 1, pa.int64()))
        ),
        batch_format="pyarrow",
    )

    def verify(group: pa.Table) -> pa.Table:
        # one vectorized pass over ALL lsh buckets hashed into this group
        order = pc.sort_indices(
            group, sort_keys=[("lsh_key", "ascending"), (id_col, "ascending")]
        )
        g = group.take(order)
        keys = g["lsh_key"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        a_parts, b_parts, s_parts = [], [], []
        if n:
            mat = _normalize(_matrix(g[vec_col]))
            starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
            ends = np.append(starts[1:], n)
            for r in np.flatnonzero(ends - starts >= 2):
                lo, hi = int(starts[r]), int(ends[r])
                bi = ids[lo:hi]
                um = np.concatenate(([True], bi[1:] != bi[:-1]))
                sel = np.arange(lo, hi)[um]
                bi = bi[um]
                if len(bi) < 2:
                    continue
                m = mat[sel]
                # blocked upper-triangle sweep, scratch bounded by
                # blocked_triangle_pairs regardless of bucket size
                for ia, ja, sv in blocked_triangle_pairs(
                    len(bi),
                    lambda s0, e0, c0: m[s0:e0] @ m[c0:].T,
                    lambda S: S >= threshold,
                ):
                    a_parts.append(bi[ia])
                    b_parts.append(bi[ja])
                    s_parts.append(sv)
        if a_parts:
            a_all = np.concatenate(a_parts)
            b_all = np.concatenate(b_parts)
            s_all = np.concatenate(s_parts)
        else:
            a_all = b_all = np.empty(0, dtype=np.int64)
            s_all = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                "id_a": pa.array(a_all.astype(np.int64)),
                "id_b": pa.array(b_all.astype(np.int64)),
                "sim": pa.array(s_all.astype(np.float64)),
            }
        )

    pairs_ds = exploded.groupby("grp").map_groups(verify, batch_format="pyarrow")
    if not materialize:
        from elasticsearch_assets_ray.stages.dedup import distinct_pairs_ds

        return distinct_pairs_ds(pairs_ds, "sim", "max")
    pairs = pa.concat_tables(list(pairs_ds.iter_batches(batch_format="pyarrow")))
    if pairs.num_rows == 0:
        return pairs
    g = pairs.group_by(["id_a", "id_b"], use_threads=False).aggregate([("sim", "max")])
    return g.rename_columns(["id_a", "id_b", "sim"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bounded ANN path: m bytes per
# vector instead of 4·dim, with asymmetric-distance (ADC) search
# ---------------------------------------------------------------------------


def pq_train(
    sample: np.ndarray, m: int = 8, ksub: int = 16, n_iters: int = 15, seed: int = 23
) -> np.ndarray:
    """Train PQ codebooks: split the (normalized) vectors into ``m``
    contiguous subspaces and run seeded Lloyd k-means (plain L2 — the
    subvectors are not unit) with ``ksub`` centroids in each.  Returns
    (m, ksub, dsub) float64.  Deterministic: same sample/seed → same
    codebooks (the distributed encoder and the tests rely on it)."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n, dim = x.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if ksub > 256:
        raise ValueError("ksub > 256 does not fit uint8 codes")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        kj = min(ksub, n)
        cent = sub[rng.choice(n, size=kj, replace=False)].copy()
        for _ in range(n_iters):
            # assign by squared L2 (‖x‖² constant per row → argmin over
            # ‖c‖² − 2x·c), update = cluster mean
            d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = np.argmin(d, axis=1)
            for c in range(kj):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        if kj < ksub:  # degenerate tiny sample: pad by repeating
            cent = np.vstack([cent, np.repeat(cent[:1], ksub - kj, axis=0)])
        books[j] = cent
    return books


def pq_encode(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Encode (normalized) vectors → (n, m) uint8 nearest-centroid codes
    per subspace.  Vectorized per subspace: one (n, ksub) distance
    matrix, argmin."""
    x = _normalize(np.asarray(mat, dtype=np.float64))
    m, ksub, dsub = codebooks.shape
    codes = np.empty((x.shape[0], m), dtype=np.uint8)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = codebooks[j]
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def pq_adc_scores(codes: np.ndarray, codebooks: np.ndarray, qvec: np.ndarray) -> np.ndarray:
    """Asymmetric-distance cosine estimate for ONE query against (n, m)
    codes: sim ≈ Σⱼ q_subⱼ · centroidⱼ[codeⱼ] — an (m, ksub) lookup
    table per query, then one fancy-index + row sum.  O(n·m) per query
    with NO decode of the original vectors."""
    m, ksub, dsub = codebooks.shape
    lut = np.einsum("jkd,jd->jk", codebooks, qvec.reshape(m, dsub))
    return lut[np.arange(m)[None, :], codes].sum(axis=1)


def pq_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    train_sample: int = 2048,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
    """PQ-compressed approximate cosine top-k over the full corpus.

    Scale shape: codebooks train once on a deterministic head sample
    (driver-side — m·ksub·dsub floats), broadcast via ``ray.put``; each
    batch encodes to uint8 codes and scores every query against the
    CODES ONLY (per-query LUT + gather-sum), keeping a local top-k.  The
    wire carries k rows per (query, block).  At 100 TB the codes are
    4·dim/m× smaller than the vectors — the corpus-resident footprint
    that makes exhaustive ANN affordable where floats don't fit;
    persisting the codes table + codebooks (pq_encode over a written
    layout, IVF-style) is the documented productionization.

    Output schema matches brute_force_topk (query_id, vec_id, rank, sim)
    with sim the ADC estimate."""
    head = pa.concat_tables(
        list(ds.limit(train_sample).iter_batches(batch_format="pyarrow"))
    )
    books = pq_train(_matrix(head[vec_col]), m=m, ksub=ksub)
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ref = ray.put({"books": books, "qids": np.asarray(query_ids), "qmat": qmat})

    class Scorer:
        def __init__(self):
            self.state = ray.get(ref)
            b = self.state["books"]
            qm = self.state["qmat"]
            mm, kk, dd = b.shape
            # per-actor: all query LUTs at once, flattened to (Q, m*ksub)
            # so each batch scores with ONE fancy-index gather + row sum
            self.luts = np.einsum(
                "jkd,qjd->qjk", b, qm.reshape(qm.shape[0], mm, dd)
            ).reshape(qm.shape[0], mm * kk)
            self.m, self.ksub = mm, kk

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
            vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if vids.size == 0:
                return empty
            codes = pq_encode(_matrix(batch[vec_col]), self.state["books"])
            # flat LUT index per (row, subspace); gather gives (Q, n, m)
            flat = np.arange(self.m, dtype=np.int64) * self.ksub + codes
            sims = self.luts[:, flat].sum(axis=2)  # (Q, n)
            kk = min(k, vids.size)
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (Q, kk)
            qids = self.state["qids"]
            return pa.table(
                {
                    "query_id": pa.array(np.repeat(qids, kk).astype(np.int64)),
                    "vec_id": pa.array(vids[part].ravel()),
                    "sim": pa.array(
                        np.take_along_axis(sims, part, axis=1).ravel().astype(np.float64)
                    ),
                }
            )

    cands_ds = ds.map_batches(Scorer, batch_format="pyarrow", concurrency=concurrency)
    cands = pa.concat_tables(list(cands_ds.iter_batches(batch_format="pyarrow")))
    if cands.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
    return _merge_topk(cands, k)


def exact_rerank(
    ds: "ray.data.Dataset",
    cands: pa.Table,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> pa.Table:
    """Exact-cosine rerank of an ANN candidate table (query_id, vec_id, …):
    the standard PQ production pattern — ADC generates a small candidate
    set, then ONLY those vectors are re-fetched (a semi-join pushed into
    ``map_batches``; at 100 TB this reads Q*k rows, not the corpus) and
    scored with true cosine.  Returns (query_id, vec_id, rank, sim)."""
    need = np.unique(cands["vec_id"].to_numpy(zero_copy_only=False)).astype(np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, need)))

    got = pa.concat_tables(
        list(ds.map_batches(pick, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    vids = got[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_matrix(got[vec_col]))
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids_arr = np.asarray(query_ids, dtype=np.int64)

    cq = cands["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = cands["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # align candidate rows to fetched vectors / query matrix via searchsorted
    vorder = np.argsort(vids, kind="stable")
    row = vorder[np.searchsorted(vids[vorder], cv)]
    qorder = np.argsort(qids_arr, kind="stable")
    qrow = qorder[np.searchsorted(qids_arr[qorder], cq)]
    sims = np.einsum("ij,ij->i", qmat[qrow], mat[row])
    return _merge_topk(
        pa.table(
            {
                "query_id": pa.array(cq),
                "vec_id": pa.array(cv),
                "sim": pa.array(sims.astype(np.float64)),
            }
        ),
        k,
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
# k-means partitioning + within-cluster cosine
# ---------------------------------------------------------------------------


def semdedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_iters: int = 6,
    block_rows: int = 4096,
) -> pa.Table:
    """Semantic near-dup PAIRS: spherical k-means partitions the
    embedding space (all-dataset, deterministic — kmeans_distributed),
    then each cluster runs an exact blocked-triangle cosine sweep.

    Scale shape: assignment is one broadcast-centers map_batches; the
    only shuffle is ONE groupby(cluster); within a cluster the pairwise
    sweep is blocked (``block_rows``² scratch, never |cluster|²).
    Pairs found = pairs whose BOTH ends share a cluster — the SemDeDup
    trade (recall loss only for near-dups straddling a k-means boundary;
    EXACT duplicates always co-locate, identical vectors get identical
    assignments).  Returns (id_a, id_b, sim), id_a < id_b, distinct."""
    centers, _stats = kmeans_distributed(ds, vec_col, n_centroids, n_iters=n_iters)
    ref = ray.put(centers)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _normalize(_matrix(batch[vec_col]))
        cl = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(cl),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    def sweep(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(group[vec_col]))
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        out_a, out_b, out_s = [], [], []
        n = ids.size
        for i0 in range(0, n, block_rows):
            a = m[i0 : i0 + block_rows]
            for j0 in range(i0, n, block_rows):
                b = m[j0 : j0 + block_rows]
                sims = a @ b.T
                if i0 == j0:
                    iu = np.triu_indices(a.shape[0], k=1, m=b.shape[0])
                    mask = sims[iu] >= threshold
                    ra, rb = iu[0][mask] + i0, iu[1][mask] + j0
                    ss = sims[iu][mask]
                else:
                    ra, rb = np.nonzero(sims >= threshold)
                    ss = sims[ra, rb]
                    ra, rb = ra + i0, rb + j0
                if ra.size:
                    out_a.append(ids[ra])
                    out_b.append(ids[rb])
                    out_s.append(ss)
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "sim": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )

    pairs = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(sweep, batch_format="pyarrow")
    )
    t = pa.concat_tables(list(pairs.iter_batches(batch_format="pyarrow")))
    if t.num_rows == 0:
        return t
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
