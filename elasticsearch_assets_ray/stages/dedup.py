"""Deduplication operators for training-data pipelines.

- :func:`exact_dedup` — hash-keyed exact dedup (keep lowest-id row per
  identical content): per-batch combiner then one groupby shuffle on the
  64-bit content hash, never on the content itself (the shuffled relation
  carries hash+id only → tiny exchange at 100 TB).
- :class:`MinHasher` / :func:`minhash_lsh_dedup` — shingle → minhash
  signature → banded LSH buckets → per-bucket candidate verification with
  true n-gram Jaccard.  The only shuffle is ``groupby(band_key)`` over
  (band_key, doc_id, signature) rows.
- :func:`simhash` — 64-bit SimHash over token frequencies (vectorized);
  near-dup = Hamming distance ≤ t, found by the same banded-groupby trick
  (4×16-bit chunks → exact match on any chunk is a candidate, Charikar /
  Manku-Jain-Sarma pattern from the public literature).
- :func:`ngram_jaccard` — exact Jaccard between shingle sets (the
  verifier used inside LSH buckets; also exposed standalone).

The reference has no dedup at all (SURVEY.md §2.6); these are new
first-class operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from elasticsearch_assets_ray.stages.textstats import polynomial_hash

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _content_hash(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit content hash per row (shared rolling-hash kernel)."""
    return polynomial_hash(col).astype(np.int64)


def dynamic_n_groups(
    n_rows_hint: int | None,
    target_rows_per_group: int = 50_000,
    lo: int = 64,
    hi: int = 1 << 15,
) -> int:
    """Coarse-group count that scales with input size (power of two).

    A FIXED group count means group size grows linearly with the corpus —
    at 100 TB one group is ~terabytes.  Derive it from a row-count hint
    (Parquet footer counts are free) so each ``map_groups`` group stays
    ~``target_rows_per_group`` rows regardless of scale."""
    import math

    if not n_rows_hint or n_rows_hint <= 0:
        return lo
    want = max(1, n_rows_hint // target_rows_per_group)
    return max(lo, min(hi, 1 << math.ceil(math.log2(want))))


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    n_rows_hint: int | None = None,
) -> ray.data.Dataset:
    """Keep exactly one row (lowest ``id_col``) per distinct ``text_col``
    value.

    ONE bounded shuffle, nothing through the driver: rows are hashed on
    content and shuffled by ``hash % n_groups``; within each coarse group
    a single vectorized sort by (hash, content, id) + first-run mask
    picks the winners.  Comparing the CONTENT inside each hash run (it is
    co-located anyway) makes a 64-bit hash collision harmless — two
    distinct documents that collide sort into different runs and both
    survive (at multi-billion-row scale 64-bit collisions are expected).
    The winner set never materializes on the driver (the broadcast-winners
    variant shipped a whole-corpus key table through the driver)."""
    n_groups = dynamic_n_groups(n_rows_hint)

    def add_hash(batch: pa.Table) -> pa.Table:
        out = {n: batch[n] for n in batch.column_names}
        h = _content_hash(batch[text_col])
        out["__chash"] = pa.array(h)
        out["__grp"] = pa.array(
            (h.astype(np.uint64) % np.uint64(n_groups)).astype(np.int64)
        )
        return pa.table(out)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    names = ds.schema().names

    def pick(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("__chash", "ascending"),
                (text_col, "ascending"),
                (id_col, "ascending"),
            ],
        )
        g = group.take(idx)
        from elasticsearch_assets_ray.stages.bulk import _first_mask

        mask = _first_mask(g, ["__chash", text_col])
        return g.filter(mask).select(names)

    return hashed.groupby("__grp").map_groups(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def _token_lists_full(
    col: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(kept token strings, flat token hash array uint64, offsets) for
    lowercase [a-z0-9]+ tokens of each row."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9]+")
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = toks.values
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    keep = lens > 0
    n = len(toks)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    vals = vals.filter(pa.array(keep))
    doc_idx = doc_idx[keep]
    th = _content_hash(vals).astype(np.uint64)
    # rebuild offsets over kept tokens
    counts = np.bincount(doc_idx, minlength=n)
    new_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return vals, th, new_off


def _token_lists(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hash array uint64, offsets) for lowercase [a-z0-9]+
    tokens of each row."""
    _vals, th, new_off = _token_lists_full(col)
    return th, new_off


def _shingle_hashes(tok_hash: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Unique k-token shingle hashes per doc (rolling polynomial combine),
    fully vectorized across the batch: k gather passes build every doc's
    shingles simultaneously; a single lexsort dedupes within docs.
    Returns (flat sorted-unique shingle hashes uint64, offsets per doc).
    Docs shorter than k tokens hash with the last token repeated (clamped
    gather); empty docs contribute one zero shingle."""
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    lens = np.diff(offsets)
    m = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)  # shingles per doc
    total = int(m.sum())
    doc_of = np.repeat(np.arange(n, dtype=np.int64), m)
    cum_m = np.concatenate(([0], np.cumsum(m)))
    j_within = np.arange(total, dtype=np.int64) - cum_m[doc_of]
    starts = offsets[:-1][doc_of] + j_within
    doc_last = np.maximum(offsets[1:] - 1, offsets[:-1])[doc_of]  # clamp target
    B = np.uint64(1099511628211)
    sh = np.zeros(total, dtype=np.uint64)
    nonempty = (lens > 0)[doc_of]
    for p in range(k):
        take = np.minimum(starts + p, doc_last)
        sh = sh * B + np.where(nonempty, tok_hash[np.minimum(take, len(tok_hash) - 1)] if len(tok_hash) else 0, np.uint64(0))
    sh[~nonempty] = np.uint64(0)
    # per-doc unique: sort by (doc, hash), drop consecutive dups within doc
    order = np.lexsort((sh, doc_of))
    sd, sv = doc_of[order], sh[order]
    keep = np.ones(total, dtype=bool)
    if total > 1:
        keep[1:] = (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])
    sd, sv = sd[keep], sv[keep]
    counts = np.bincount(sd, minlength=n).astype(np.int64)
    new_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    return sv, new_off


class MinHasher:
    """Actor-pool stage: adds ``minhash`` (fixed_size_list<uint64>) per
    row.  The permutation parameters are built once per actor in
    ``__init__`` (seeded → identical across actors)."""

    def __init__(
        self,
        text_col: str = "text",
        num_perm: int = 64,
        shingle_k: int = 3,
        seed: int = 7,
    ):
        self.text_col = text_col
        self.num_perm = num_perm
        self.k = shingle_k
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 minhash of one shingle set (vectorized over
        perm × shingle)."""
        # (P, S) = a[:,None]*sh[None,:] + b  (mod 2^64 wraps fine for minhash)
        v = self.a[:, None] * shingles[None, :] + self.b[:, None]
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, off = _token_lists(batch[self.text_col])
        flat, soff = _shingle_hashes(th, off, self.k)
        n = batch.num_rows
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        # vectorized across docs: one pass per permutation, per-doc min
        # via segment reduceat (every doc has >=1 shingle by construction)
        seg = soff[:-1]
        for p in range(self.num_perm):
            v = self.a[p] * flat + self.b[p]
            sigs[:, p] = np.minimum.reduceat(v, seg) if len(flat) else np.uint64(0)
        out = {name: batch[name] for name in batch.column_names}
        out["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm
        )
        return pa.table(out)


def band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) int64 band bucket keys: hash of each band's rows."""
    n, p = sigs.shape
    rows_per = p // bands
    out = np.empty((n, bands), dtype=np.uint64)
    B = np.uint64(1099511628211)
    for b in range(bands):
        chunk = sigs[:, b * rows_per : (b + 1) * rows_per].astype(np.uint64)
        acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for j in range(rows_per):
            acc = acc * B + chunk[:, j]
        out[:, b] = acc
    return out.astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def neardup_components(
    pairs: pa.Table, all_ids: np.ndarray | pa.Array | None = None
) -> pa.Table:
    """Canonical-doc assignment over a near-dup PAIR graph — the
    keep-one-per-cluster step a training pipeline runs after pair
    generation.  Returns (doc_id, canonical_id, keep): every doc labeled
    with its connected component's MINIMUM doc_id; ``keep`` marks the
    canonical survivor.

    Fully vectorized min-label propagation with pointer doubling (no
    per-pair Python): O(log diameter) sweeps of ``np.minimum.at`` over
    the edge arrays.  Work/memory ∝ |pairs| + |ids| — the pair list is
    this op's input contract (it is the bounded OUTPUT of the near-dup
    pipelines; at pair volumes beyond one machine, run the same
    propagation as iterated ``map_batches`` joins over a
    ``distinct_pairs_ds`` dataset).

    ``all_ids``: the full doc universe (singletons become their own
    canonical row); defaults to just the ids present in pairs."""
    a = pairs["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if all_ids is None:
        universe = np.unique(np.concatenate([a, b])) if len(a) else np.empty(0, np.int64)
    else:
        if isinstance(all_ids, (pa.Array, pa.ChunkedArray)):
            all_ids = all_ids.to_numpy(zero_copy_only=False)
        universe = np.unique(
            np.concatenate([np.asarray(all_ids, dtype=np.int64), a, b])
        )
    n = universe.size
    da = np.searchsorted(universe, a)
    db = np.searchsorted(universe, b)
    label = np.arange(n, dtype=np.int64)
    while True:
        before = label.copy()
        if da.size:
            m = np.minimum(label[da], label[db])
            np.minimum.at(label, da, m)
            np.minimum.at(label, db, m)
        while True:  # pointer doubling: label ← label[label]
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, before):
            break
    canon = universe[label]
    return pa.table(
        {
            "doc_id": pa.array(universe),
            "canonical_id": pa.array(canon),
            "keep": pa.array(universe == canon),
        }
    )


def neardup_components_ds(
    pairs_ds: ray.data.Dataset,
    *,
    universe: ray.data.Dataset | None = None,
    num_partitions: int = 32,
    max_iters: int = 50,
) -> ray.data.Dataset:
    """Distributed :func:`neardup_components` — for pair graphs too large
    for one machine.  Iterative min-label propagation expressed in
    Dataset relational ops: each round hash-joins the current labels onto
    the (bidirectional) edge list and re-minimizes per node; the sum of
    labels is monotonically non-increasing and integer, so fixpoint
    detection is one cheap aggregate per round.  Rounds needed = graph
    diameter (near-dup clusters are dense → few); ``max_iters`` bounds
    pathological chains.

    ``universe``: optional Dataset with a ``doc_id`` column adding
    singleton docs.  Returns (doc_id, canonical_id, keep)."""

    def bidir(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks() if isinstance(t["id_a"], pa.ChunkedArray) else t["id_a"]
        b = t["id_b"].combine_chunks() if isinstance(t["id_b"], pa.ChunkedArray) else t["id_b"]
        return pa.table(
            {
                "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    edges = pairs_ds.map_batches(bidir, batch_format="pyarrow")
    # initial label(n) = min(n, min neighbor): one aggregate seeds a
    # 1-hop-converged start
    lab = edges.groupby("src").min("dst")
    lab = lab.map_batches(
        lambda t: pa.table(
            {
                "node": t["src"],
                "label": pc.min_element_wise(t["src"], t["min(dst)"]),
            }
        ),
        batch_format="pyarrow",
    )
    if universe is not None:
        singles = universe.map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t["doc_id"], pa.int64()),
                    "label": pc.cast(t["doc_id"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        lab = lab.union(singles)
        lab = lab.groupby("node").min("label").map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["min(label)"]}),
            batch_format="pyarrow",
        )
    lab = lab.materialize()
    prev_sum = lab.sum("label")
    for _ in range(max_iters):
        j = edges.join(
            lab,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )
        cand = j.map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        merged = lab.union(cand).groupby("node").min("label")
        lab = merged.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["min(label)"]}),
            batch_format="pyarrow",
        )
        # pointer doubling: label(n) ← label(label(n)) — every label is
        # itself a node (edge endpoints + universe), so the inner
        # self-join is total; this makes chain convergence logarithmic
        dbl = lab.join(
            lab,
            join_type="inner",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("node",),
            left_suffix="",
            right_suffix="_r",
        )
        lab = dbl.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pc.min_element_wise(t["label"], t["label_r"]),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        s = lab.sum("label")
        if s == prev_sum:  # integer, monotone → exact fixpoint test
            break
        prev_sum = s
    return lab.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["node"],
                "canonical_id": t["label"],
                "keep": pc.equal(t["node"], t["label"]),
            }
        ),
        batch_format="pyarrow",
    )


def distinct_pairs_ds(
    pairs_ds: ray.data.Dataset, val_col: str, agg: str = "max", n_groups: int = 256
) -> ray.data.Dataset:
    """Distributed distinct over (id_a, id_b) pairs: coarse-group shuffle
    + ONE vectorized Arrow group_by per group.  The scale path for pair
    outputs too large to concat on the driver (the ``materialize=False``
    branch of the near-dup pipelines)."""

    def add_grp(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        g = ((a * np.uint64(1099511628211) + b) % np.uint64(n_groups)).astype(np.int64)
        return t.append_column("__grp", pa.array(g))

    def pick(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["__grp"])
            .group_by(["id_a", "id_b"], use_threads=False)
            .aggregate([(val_col, agg)])
        )
        return g.rename_columns(["id_a", "id_b", val_col])

    return pairs_ds.map_batches(add_grp, batch_format="pyarrow").groupby(
        "__grp"
    ).map_groups(pick, batch_format="pyarrow")


def _make_jaccard_verifier(threshold: float):
    """Factory for the per-coarse-group exact-Jaccard candidate
    verifier shared by :func:`minhash_lsh_dedup` (bucket key = LSH
    band hash) and :func:`ngram_jaccard_pairs` (bucket key = prefix
    shingle hash).  Input groups carry columns (band_key, id,
    shingles); output is (id_a, id_b, jaccard_sim) with id_a < id_b."""

    def verify_group(group: pa.Table) -> pa.Table:
        """Exact-Jaccard verification of one coarse group's band buckets,
        vectorized: ONE `_flat_binary` pass over the whole group's shingle
        column (no per-row ``.as_py()``), then per bucket a sorted-run
        sweep — a run of one shingle value shared by m docs contributes
        its C(m,2) pairs to an intersection-count matrix, so every pair's
        |A∩B| lands in one pass and |A∪B| follows from per-doc set sizes.
        Work ∝ Σ_runs C(m,2) = Σ_pairs |A∩B| — the inherent verify cost —
        with no nested Python pair loop (the round-2 shape was O(b²)
        Python per bucket, which a dup-heavy corpus makes large)."""
        from elasticsearch_assets_ray.index.build import _flat_binary

        order = pc.sort_indices(
            group, sort_keys=[("band_key", "ascending"), ("id", "ascending")]
        )
        g = group.take(order)
        bk = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        a_parts, b_parts, s_parts = [], [], []
        if n:
            flat, counts = _flat_binary(g["shingles"], np.uint64)
            offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
            starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
            ends = np.append(starts[1:], n)
            multi = np.flatnonzero(ends - starts >= 2)  # only buckets with ≥2 rows
            for r in multi:
                lo, hi = int(starts[r]), int(ends[r])
                bucket_ids = ids[lo:hi]
                um = np.concatenate(([True], bucket_ids[1:] != bucket_ids[:-1]))
                sel = np.arange(lo, hi)[um]
                bids = bucket_ids[um]
                b = len(bids)
                if b < 2:
                    continue
                sizes = counts[sel].astype(np.int64)
                if b <= 8:
                    # small bucket (the dominant LSH case): ≤28 pairs —
                    # per-pair sorted intersections over zero-copy slices
                    # beat the matrix machinery's fixed numpy overhead
                    sets = [flat[offs[i] : offs[i + 1]] for i in sel]
                    iu_l, ju_l, sim_l = [], [], []
                    for x in range(b):
                        for y in range(x + 1, b):
                            inter = np.intersect1d(
                                sets[x], sets[y], assume_unique=True
                            ).size
                            union = sets[x].size + sets[y].size - inter
                            sim = inter / union if union else 1.0
                            if sim >= threshold:
                                iu_l.append(x)
                                ju_l.append(y)
                                sim_l.append(sim)
                    if iu_l:
                        a_parts.append(bids[np.array(iu_l)])
                        b_parts.append(bids[np.array(ju_l)])
                        s_parts.append(np.array(sim_l, dtype=np.float64))
                    continue
                # large (dup-heavy) bucket: sorted-run sweep — all pairs'
                # intersections in one pass, no O(b²) Python
                lab = np.repeat(np.arange(b, dtype=np.int64), sizes)
                arr = np.concatenate([flat[offs[i] : offs[i + 1]] for i in sel])
                srt = np.lexsort((lab, arr))
                a_s, l_s = arr[srt], lab[srt]
                run_start = np.flatnonzero(
                    np.concatenate(([True], a_s[1:] != a_s[:-1]))
                )
                run_end = np.append(run_start[1:], a_s.size)
                m = run_end - run_start
                # runs shared by exactly 2 docs: one vectorized shot
                two = run_start[m == 2]
                li_all = [l_s[two]]
                lj_all = [l_s[two + 1]]
                for s_, e_ in zip(run_start[m > 2], run_end[m > 2]):
                    labs = l_s[s_:e_]  # sorted, distinct (sets are unique)
                    pi, pj = np.triu_indices(labs.size, 1)
                    li_all.append(labs[pi])
                    lj_all.append(labs[pj])
                li = np.concatenate(li_all)
                lj = np.concatenate(lj_all)
                # SPARSE pair counting: memory ∝ intersecting pairs, never
                # a dense b×b matrix (a 30k-doc mass-duplicate bucket would
                # make that 7 GB per map_groups worker)
                if threshold > 0:
                    if li.size == 0:
                        continue
                    uc, inter = np.unique(li * np.int64(b) + lj, return_counts=True)
                    iu, ju = uc // np.int64(b), uc % np.int64(b)
                else:
                    # threshold ≤ 0 keeps disjoint pairs: enumerate all
                    # (output is O(b²) by contract here)
                    iu, ju = np.triu_indices(b, 1)
                    inter = np.zeros(iu.size, dtype=np.int64)
                    if li.size:
                        uc, cnt = np.unique(li * np.int64(b) + lj, return_counts=True)
                        pos = np.searchsorted(iu * np.int64(b) + ju, uc)
                        inter[pos] = cnt
                union = sizes[iu] + sizes[ju] - inter
                sim = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
                keep = sim >= threshold
                if keep.any():
                    a_parts.append(bids[iu[keep]])
                    b_parts.append(bids[ju[keep]])
                    s_parts.append(sim[keep])
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
                "jaccard_sim": pa.array(s_all.astype(np.float64)),
            }
        )

    return verify_group


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    concurrency: int | tuple[int, int] = (1, 8),
    n_rows_hint: int | None = None,
    materialize: bool = True,
) -> pa.Table | ray.data.Dataset:
    """Near-duplicate *pairs* via MinHash LSH, verified with exact shingle
    Jaccard.  Returns pa.Table (id_a, id_b, jaccard_sim) with id_a < id_b
    (``materialize=False`` → a Dataset deduped by a distributed
    coarse-group distinct, for pair sets too large for the driver).

    Dataflow: map_batches(MinHasher) → flat_map to (band_key, id, shingles
    fingerprint) → groupby(band_key) emits candidate pairs → exact verify
    inside the group (shingle sets travel with the row — bounded by
    bucket size, not corpus size) → global distinct on pairs."""
    sigged = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, num_perm=num_perm, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    k = shingle_k

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sigs = (
            batch["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.uint64).reshape(n, num_perm)
        )
        bk = band_keys(sigs, bands)  # (n, bands)
        th, off = _token_lists(batch[text_col])
        flat, soff = _shingle_hashes(th, off, k)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        from elasticsearch_assets_ray.index.build import _binary_from_offsets

        sh_col = _binary_from_offsets(flat, soff)  # zero-copy per-doc cells
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
        return pa.table(
            {
                "band_key": pa.array(bk.reshape(-1)),
                "id": pa.array(np.repeat(ids, bands)),
                "shingles": sh_col.take(rep),
            }
        )

    # coarse shuffle key: groupby(band_key) would invoke Python once per
    # DISTINCT band key (≈ rows, mostly singleton buckets); hashing band
    # keys into coarse groups keeps the shuffle but processes thousands of
    # buckets per vectorized group call (same lesson as the (shard,
    # bucket) posting merge).  Group count scales with the exploded row
    # count (rows × bands) so group payloads stay bounded at any corpus size.
    n_groups = dynamic_n_groups(
        (n_rows_hint or 0) * bands, target_rows_per_group=20_000
    )

    def add_group(t: pa.Table) -> pa.Table:
        g = pc.bit_wise_and(t["band_key"], pa.scalar(n_groups - 1, pa.int64()))
        return t.append_column("grp", g)

    exploded = sigged.map_batches(explode, batch_format="pyarrow").map_batches(
        add_group, batch_format="pyarrow"
    )

    verify_group = _make_jaccard_verifier(threshold)

    pairs_ds = exploded.groupby("grp").map_groups(
        verify_group, batch_format="pyarrow"
    )
    # distinct pairs (same pair can surface from multiple bands) ALWAYS
    # dedup distributed (distinct_pairs_ds) — the gate path and the
    # 100 TB path are the same code; ``materialize`` only chooses whether
    # the already-distinct result (bounded by verified-pair count, with
    # the band-duplication already removed cluster-side) is collected
    out = distinct_pairs_ds(pairs_ds, "jaccard_sim", "max")
    return _collect_pairs(out, "jaccard_sim", materialize)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash(batch: pa.Table, text_col: str = "text", out_col: str = "simhash") -> pa.Table:
    """64-bit SimHash over token hashes weighted by tf (vectorized:
    bit-matrix accumulate via np.unpackbits)."""
    th, off = _token_lists(batch[text_col])
    n = len(off) - 1
    out = np.zeros(n, dtype=np.uint64)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = bits * 2 - 1  # ±1 per bit
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    acc = np.zeros((n, 64), dtype=np.int64)
    np.add.at(acc, doc_idx, contrib)
    outbits = (acc > 0).astype(np.uint64)
    out = (outbits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    cols = {name: batch[name] for name in batch.column_names}
    cols[out_col] = pa.array(out.astype(np.int64))
    return pa.table(cols)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
        if not x.any():
            break
    return cnt


def blocked_triangle_pairs(b, block_matrix, qualifies, cap_cells: int = 4_000_000):
    """Strict-upper-triangle pair sweep over an implicit b×b pair matrix,
    computed in row blocks so scratch never exceeds ``cap_cells`` cells no
    matter how large the bucket (a mass-duplicate bucket would otherwise
    allocate a gigabyte-scale dense matrix).

    ``block_matrix(s0, e0, c0)`` returns the pair-statistic matrix for rows
    ``[s0, e0)`` against columns ``[c0, b)`` — columns before ``c0 = s0+1``
    are never requested because they lie entirely in the lower triangle,
    halving the average per-block compute.  ``qualifies(M)`` returns the
    boolean mask of qualifying cells.  Yields ``(rows, cols, vals)`` triples
    of global indices for qualifying strict-upper-triangle pairs.
    """
    step = max(1, cap_cells // max(b, 1))
    for s0 in range(0, b - 1, step):
        e0 = min(s0 + step, b - 1)
        c0 = s0 + 1
        M = block_matrix(s0, e0, c0)
        ii, jj = np.nonzero(qualifies(M))
        keep = jj >= ii  # global col (jj+c0) > global row (ii+s0)
        ii, jj = ii[keep], jj[keep]
        if ii.size:
            yield ii + s0, jj + c0, M[ii, jj]


def simhash_near_dups(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    concurrency: int | tuple[int, int] = (1, 8),
    n_rows_hint: int | None = None,
    materialize: bool = True,
) -> pa.Table | ray.data.Dataset:
    """Near-dup pairs by SimHash: 4×16-bit chunk banding (a pair within
    Hamming ≤3 of 64 bits must agree exactly on ≥1 of 4 chunks) →
    groupby(chunk value) → in-group Hamming verify.  Returns
    (id_a, id_b, hamming) sorted."""

    def explode(batch: pa.Table) -> pa.Table:
        b2 = simhash(batch, text_col=text_col)
        h = b2[ "simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        keys, rid, rh = [], [], []
        for c in range(4):
            chunk = ((h >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            keys.append(chunk + (c << 16))
            rid.append(ids)
            rh.append(h.astype(np.int64))
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(keys)),
                "id": pa.array(np.concatenate(rid)),
                "sh": pa.array(np.concatenate(rh)),
            }
        )

    n_groups = dynamic_n_groups((n_rows_hint or 0) * 4, target_rows_per_group=20_000)

    def add_group(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "grp", pc.bit_wise_and(t["band_key"], pa.scalar(n_groups - 1, pa.int64()))
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow").map_batches(
        add_group, batch_format="pyarrow"
    )

    def verify(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("band_key", "ascending"), ("id", "ascending")]
        )
        g = group.take(order)
        bk = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        sh = g["sh"].to_numpy(zero_copy_only=False)
        n = len(ids)
        a_parts, b_parts, h_parts = [], [], []
        if n:
            starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
            ends = np.append(starts[1:], n)
            for r in np.flatnonzero(ends - starts >= 2):
                lo, hi = int(starts[r]), int(ends[r])
                bi, bs = ids[lo:hi], sh[lo:hi]
                um = np.concatenate(([True], bi[1:] != bi[:-1]))
                bi, bs = bi[um], bs[um]
                b = len(bi)
                if b < 2:
                    continue
                # blocked upper-triangle Hamming sweep: one broadcast
                # XOR/popcount per row block (no per-row Python loop),
                # scratch bounded by blocked_triangle_pairs
                for ia, ja, dv in blocked_triangle_pairs(
                    b,
                    lambda s0, e0, c0: hamming64(bs[s0:e0, None], bs[None, c0:]),
                    lambda D: D <= max_hamming,
                ):
                    a_parts.append(bi[ia])
                    b_parts.append(bi[ja])
                    h_parts.append(dv)
        if a_parts:
            a_all = np.concatenate(a_parts)
            b_all = np.concatenate(b_parts)
            h_all = np.concatenate(h_parts)
        else:
            a_all = b_all = h_all = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "id_a": pa.array(a_all.astype(np.int64)),
                "id_b": pa.array(b_all.astype(np.int64)),
                "hamming": pa.array(h_all.astype(np.int64)),
            }
        )

    pairs_ds = exploded.groupby("grp").map_groups(verify, batch_format="pyarrow")
    # one code path for gate and scale: distributed distinct, then an
    # optional result-bounded collect (see minhash_lsh_dedup)
    out = distinct_pairs_ds(pairs_ds, "hamming", "min")
    return _collect_pairs(out, "hamming", materialize, val_type=pa.int64())


def ngram_jaccard(
    text_a: str, text_b: str, k: int = 3
) -> float:
    """Exact k-token-shingle Jaccard between two strings (reference
    verifier; used standalone and inside LSH buckets)."""
    ta = pa.array([text_a, text_b])
    th, off = _token_lists(ta)
    flat, soff = _shingle_hashes(th, off, k)
    return jaccard(flat[soff[0] : soff[1]], flat[soff[1] : soff[2]])


def _collect_pairs(
    out: ray.data.Dataset,
    val_col: str,
    materialize: bool,
    val_type: pa.DataType | None = None,
) -> pa.Table | ray.data.Dataset:
    """Collect an already-distinct pair dataset (or pass it through when
    ``materialize=False`` — the 100 TB path)."""
    if not materialize:
        return out
    batches = list(out.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                val_col: pa.array([], val_type or pa.float64()),
            }
        )
    return pa.concat_tables(batches).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
    n_rows_hint: int | None = None,
    materialize: bool = True,
) -> pa.Table | ray.data.Dataset:
    """EXACT n-gram Jaccard similarity self-join via prefix filtering
    (the AllPairs / PPJoin family: Bayardo, Ma & Srikant WWW'07; Xiao et
    al. WWW'08).  Unlike :func:`minhash_lsh_dedup` (probabilistic LSH
    candidate recall), this join is COMPLETE: every pair with true
    k-shingle Jaccard ≥ ``threshold`` is returned — no signature
    approximation anywhere, no false negatives.

    Candidate generation: each doc's shingle set is sorted under the
    global order "shingle hash ascending".  For a qualifying pair,
    I = |A∩B| ≥ ⌈τ·|A|⌉, and the globally-smallest common shingle
    provably lies within the first |A| − ⌈τ·|A|⌉ + 1 shingles of BOTH
    docs (prefix-filtering lemma: if it didn't, ≥ |A| − t_A + 1 non-
    intersection elements of A would precede it, leaving I < t_A).  So
    emitting only that prefix into a ``groupby(shingle)`` inverted index
    loses nothing, and shuffle volume is Σ prefix lengths ≈ (1−τ)·total
    shingles — never all-pairs.  Verification reuses the shared
    vectorized per-bucket exact-Jaccard kernel, and pairs surfacing from
    several shared prefix shingles dedup through the distributed
    :func:`distinct_pairs_ds` (same code at gate scale and 100 TB).

    Scale note: hash order is a uniform-random global order; the PPJoin
    refinement (rarest-first document-frequency order, one extra df
    pre-pass + broadcast rank table) shrinks hot buckets further and
    slots in here without API change.
    """
    k = shingle_k
    tau = float(threshold)

    def explode_prefix(batch: pa.Table) -> pa.Table:
        th, off = _token_lists(batch[text_col])
        flat, soff = _shingle_hashes(th, off, k)
        n = batch.num_rows
        from elasticsearch_assets_ray.index.build import _binary_from_offsets

        sh_col = _binary_from_offsets(flat, soff)
        sizes = np.diff(soff)
        if tau > 0:
            # ceil(tau*s) with a downward float guard: erring DOWN only
            # lengthens the prefix (still complete); erring up would not be
            t_req = np.ceil(tau * sizes - 1e-9).astype(np.int64)
            t_req = np.clip(t_req, 1, sizes)
        else:
            t_req = np.ones(n, dtype=np.int64)
        plen = (sizes - t_req + 1).astype(np.int64)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), plen)
        cum = np.concatenate(([0], np.cumsum(plen)))
        j_within = np.arange(int(plen.sum()), dtype=np.int64) - cum[doc_of]
        take = soff[:-1][doc_of] + j_within
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_key": pa.array(flat[take].astype(np.int64)),
                "id": pa.array(ids[doc_of]),
                "shingles": sh_col.take(pa.array(doc_of)),
            }
        )

    # exploded rows ≈ rows × (1−τ)·shingles-per-doc; coarse groups sized so
    # vectorized verify calls see thousands of buckets each (same lesson as
    # the minhash band shuffle)
    n_groups = dynamic_n_groups(
        int((n_rows_hint or 0) * 32), target_rows_per_group=20_000
    )

    def add_group(t: pa.Table) -> pa.Table:
        g = pc.bit_wise_and(t["band_key"], pa.scalar(n_groups - 1, pa.int64()))
        return t.append_column("grp", g)

    exploded = ds.map_batches(explode_prefix, batch_format="pyarrow").map_batches(
        add_group, batch_format="pyarrow"
    )
    pairs_ds = exploded.groupby("grp").map_groups(
        _make_jaccard_verifier(threshold), batch_format="pyarrow"
    )
    out = distinct_pairs_ds(pairs_ds, "jaccard_sim", "max")
    return _collect_pairs(out, "jaccard_sim", materialize)


# ---------------------------------------------------------------------------
# Duplicated n-gram SPAN statistics (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better", arXiv:2107.06499 — the
# repeated-substring signal, computed at shingle granularity)
# ---------------------------------------------------------------------------


def _position_shingles(
    tok_hash: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-POSITION k-token shingle hashes with multiplicity (one shingle
    per starting position; docs shorter than k tokens contribute none) —
    unlike :func:`_shingle_hashes` there is no within-doc dedup and no
    short-doc clamping, because span statistics count positions.
    Returns (doc_idx int64, shingle uint64, doc-local start position
    int64), each of length Σ max(len-k+1, 0)."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    m = np.maximum(lens - k + 1, 0).astype(np.int64)
    total = int(m.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), m)
    cum = np.concatenate(([0], np.cumsum(m)))
    local = np.arange(total, dtype=np.int64) - cum[doc_of]
    starts = offsets[:-1][doc_of] + local
    B = np.uint64(1099511628211)
    sh = np.zeros(total, dtype=np.uint64)
    for p in range(k):
        sh = sh * B + tok_hash[starts + p]
    return doc_of, sh, local


def duplicated_span_stats(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_rows_hint: int | None = None,
) -> ray.data.Dataset:
    """Per-document duplicated-span counts: a position is DUPLICATED when
    its k-token shingle occurs ≥ 2 times in the whole corpus (any doc,
    any position — including elsewhere in the same doc).  Returns a
    Dataset of (doc_id, dup_ngram_positions, distinct_dup_ngrams); docs
    with no duplicated span are absent (zero-fill is the caller's join).

    Scale shape (the classic inverted-index exchange, every stage bounded):
    1. map_batches: tokenize + per-position shingles, then ONE lexsort →
       per-(doc, shingle) occurrence rows — the shuffled relation is
       pre-combined within batch, ≤ distinct (doc, shingle) pairs.
    2. groupby(shingle-hash coarse group): vectorized total-per-shingle
       (sort + reduceat), keep rows of shingles with total ≥ 2.
    3. partial_agg by doc_id: sums — output is ≤ one row per doc.
    """
    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg

    nb = dynamic_n_groups(n_rows_hint)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        th, off = _token_lists(batch[text_col])
        doc_of, sh, _pos = _position_shingles(th, off, k)
        if sh.size == 0:
            return pa.table(
                {"grp": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "sh": pa.array([], pa.uint64()), "occ": pa.array([], pa.int64())}
            )
        order = np.lexsort((sh, doc_of))
        sd, sv = doc_of[order], sh[order]
        first = np.concatenate(([True], (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])))
        idx = np.flatnonzero(first)
        occ = np.diff(np.concatenate((idx, [sd.size])))
        sd, sv = sd[idx], sv[idx]
        return pa.table(
            {
                "grp": pa.array((sv % np.uint64(nb)).astype(np.int64)),
                "doc_id": pa.array(ids[sd]),
                "sh": pa.array(sv),
                "occ": pa.array(occ.astype(np.int64)),
            }
        )

    def keep_dups(group: pa.Table) -> pa.Table:
        sh = group["sh"].to_numpy(zero_copy_only=False)
        occ = group["occ"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(sh, kind="stable")
        sh, occ, doc = sh[order], occ[order], doc[order]
        first = np.concatenate(([True], sh[1:] != sh[:-1]))
        idx = np.flatnonzero(first)
        totals = np.add.reduceat(occ, idx)
        grp_of = np.cumsum(first) - 1
        dup = (totals >= 2)[grp_of]
        return pa.table(
            {
                "doc_id": pa.array(doc[dup]),
                "dup_ngram_positions": pa.array(occ[dup]),
                "distinct_dup_ngrams": pa.array(np.ones(int(dup.sum()), dtype=np.int64)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    dups = exploded.groupby("grp").map_groups(keep_dups, batch_format="pyarrow")
    return partial_agg(
        dups,
        ["doc_id"],
        [
            AggSpec("dup_ngram_positions", "dup_ngram_positions", "sum"),
            AggSpec("distinct_dup_ngrams", "distinct_dup_ngrams", "sum"),
        ],
        n_groups=nb,
    )


def exact_substr_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_rows_hint: int | None = None,
) -> ray.data.Dataset:
    """ExactSubstr deduplication (Lee et al., arXiv:2107.06499 §4.1):
    remove from every document each token covered by a k-token window
    whose shingle occurs ≥ 2 times ANYWHERE in the corpus (any doc, any
    position — including elsewhere in the same doc), i.e. delete every
    duplicated substring of ≥ k tokens at k-token granularity.  The
    paper scans a suffix array; this is the same relation re-expressed
    Ray-Data-first as an inverted shingle exchange.

    Output rows: (doc_id, n_tokens, n_removed, clean_text) for EVERY
    input doc, where clean_text is the kept TOKEN stream joined by ' '
    (token-space normalization — lowercased, punctuation-split — which
    the SQL twin mirrors exactly).

    Scale shape — two bounded exchanges, no join:
    1. map_batches: per-position shingles (the token-sized relation the
       algorithm fundamentally needs — the cost class of the suffix
       array it replaces);
    2. groupby(shingle % nb).map_groups: positions whose shingle is
       corpus-duplicated → (doc_id, pos) rows, ≤ duplicated positions;
    3. docs ∪ dup-positions tagged union, ONE groupby(hash(doc_id) % nb)
       cogroup, vectorized difference-array coverage + Arrow list
       rebuild per coarse group — the text crosses the wire exactly
       once, and no groupby output ever feeds a Dataset.join (the
       zero-column empty-block hazard).
    """
    nb = dynamic_n_groups(n_rows_hint)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        th, off = _token_lists(batch[text_col])
        doc_of, sh, pos = _position_shingles(th, off, k)
        return pa.table(
            {
                "grp": pa.array((sh % np.uint64(nb)).astype(np.int64)),
                "doc_id": pa.array(ids[doc_of]),
                "sh": pa.array(sh),
                "pos": pa.array(pos),
            }
        )

    def keep_dup_positions(group: pa.Table) -> pa.Table:
        sh = group["sh"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = group["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(sh, kind="stable")
        sh, doc, pos = sh[order], doc[order], pos[order]
        first = np.concatenate(([True], sh[1:] != sh[:-1]))
        idx = np.flatnonzero(first)
        totals = np.diff(np.concatenate((idx, [sh.size])))
        dup = (totals >= 2)[np.cumsum(first) - 1]
        return pa.table({"doc_id": pa.array(doc[dup]), "pos": pa.array(pos[dup])})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    dup_pos = exploded.groupby("grp").map_groups(
        lambda g: keep_dup_positions(g.drop_columns(["grp", ])),
        batch_format="pyarrow",
    )

    docs_tagged = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b[id_col].cast(pa.int64()),
                "text": b[text_col],
                "pos": pa.nulls(b.num_rows, pa.int64()).fill_null(-1),
            }
        ),
        batch_format="pyarrow",
    )
    dups_tagged = dup_pos.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "text": pa.nulls(b.num_rows, pa.string()),
                "pos": b["pos"],
            }
        ),
        batch_format="pyarrow",
    )
    unioned = docs_tagged.union(dups_tagged)

    from elasticsearch_assets_ray.stages.relational import key_group_column

    with_grp = unioned.map_batches(
        lambda b: b.append_column("__grp", key_group_column(b, ["doc_id"], nb)),
        batch_format="pyarrow",
    )

    def clean(group: pa.Table) -> pa.Table:
        pos_all = group["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_doc = pos_all < 0
        docs = group.filter(pa.array(is_doc))
        ids_d = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sort_d = np.argsort(ids_d, kind="stable")
        ids_d = ids_d[sort_d]
        texts = docs["text"].combine_chunks().take(pa.array(sort_d, pa.int64()))
        vals, _th, off = _token_lists_full(texts)
        total = int(off[-1])
        ids_p = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[~is_doc]
        pos_p = pos_all[~is_doc]
        row = np.searchsorted(ids_d, ids_p)
        # difference-array interval coverage: dup start p covers tokens
        # [p, p+k-1] (p+k <= doc len by shingle construction)
        arr = np.zeros(total + 1, dtype=np.int64)
        lo = off[:-1][row] + pos_p
        np.add.at(arr, lo, 1)
        np.add.at(arr, lo + k, -1)
        covered = np.cumsum(arr[:-1]) > 0
        keep = ~covered
        cumk = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
        kept_per_doc = cumk[off[1:]] - cumk[off[:-1]]
        new_off = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_vals = vals.filter(pa.array(keep))
        lst = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), kept_vals.combine_chunks()
            if isinstance(kept_vals, pa.ChunkedArray) else kept_vals
        )
        n_tokens = np.diff(off)
        return pa.table(
            {
                "doc_id": pa.array(ids_d),
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "n_removed": pa.array((n_tokens - kept_per_doc).astype(np.int64)),
                "clean_text": pc.binary_join(lst, pa.scalar(" ")),
            }
        )

    return with_grp.groupby("__grp").map_groups(
        lambda g: clean(g.drop_columns(["__grp"])), batch_format="pyarrow"
    )
