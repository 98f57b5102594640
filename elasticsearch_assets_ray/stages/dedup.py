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


def exact_dedup(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Keep exactly one row (lowest ``id_col``) per distinct ``text_col``
    value.  Hash-partition + per-group-first (the spec'd exact-dedup
    pattern): batches shuffle only (content_hash, id) pairs; survivors are
    re-joined to their batch of origin — content never crosses the wire."""

    def add_hash(batch: pa.Table) -> pa.Table:
        out = {n: batch[n] for n in batch.column_names}
        out["__chash"] = pa.array(_content_hash(batch[text_col]))
        return pa.table(out)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # winners: min id per hash — partial-agg combiner then tiny groupby
    def local_min(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["__chash", id_col])
            .group_by(["__chash"], use_threads=False)
            .aggregate([(id_col, "min")])
        )
        return g.rename_columns(["__chash", id_col])

    winners_ds = hashed.map_batches(local_min, batch_format="pyarrow")
    winners_ds = winners_ds.groupby("__chash").map_groups(
        lambda g: g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")])[:1]),
        batch_format="pyarrow",
    )
    winners = pa.concat_tables(
        list(winners_ds.iter_batches(batch_format="pyarrow"))
    )
    ref = ray.put(winners)

    def keep_winners(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        j = batch.join(w, keys=["__chash", id_col], join_type="left semi", use_threads=False)
        return j.drop_columns(["__chash"])

    return hashed.map_batches(keep_winners, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def _token_lists(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hash array uint64, offsets) for lowercase [a-z0-9]+
    tokens of each row."""
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
    return th, new_off


def _shingle_hashes(tok_hash: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per doc (rolling polynomial combine).
    Returns (flat shingle hashes uint64, offsets per doc).  Docs with
    fewer than k tokens contribute their single whole-doc hash."""
    n = len(offsets) - 1
    out_parts: list[np.ndarray] = []
    out_counts = np.zeros(n, dtype=np.int64)
    B = np.uint64(1099511628211)
    for i in range(n):
        t = tok_hash[offsets[i] : offsets[i + 1]]
        if len(t) == 0:
            sh = np.zeros(1, dtype=np.uint64)
        elif len(t) < k:
            acc = np.uint64(0)
            for v in t:
                acc = acc * B + v
            sh = np.array([acc], dtype=np.uint64)
        else:
            m = len(t) - k + 1
            sh = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                sh = sh * B + t[j : j + m]
        out_parts.append(np.unique(sh))
        out_counts[i] = len(out_parts[-1])
    flat = np.concatenate(out_parts) if out_parts else np.empty(0, dtype=np.uint64)
    new_off = np.concatenate(([0], np.cumsum(out_counts))).astype(np.int64)
    return flat, new_off


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
        for i in range(n):
            sh = flat[soff[i] : soff[i + 1]]
            if len(sh) == 0:
                sigs[i] = np.uint64(0)
            else:
                sigs[i] = self.signature(sh)
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
) -> pa.Table:
    """Near-duplicate *pairs* via MinHash LSH, verified with exact shingle
    Jaccard.  Returns pa.Table (id_a, id_b, jaccard_sim) with id_a < id_b.

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
        rows_id = np.repeat(ids, bands)
        rows_band = bk.reshape(-1)
        sh_bytes = [
            flat[soff[i] : soff[i + 1]].tobytes() for i in range(n)
        ]
        rep_sh = [sh_bytes[i] for i in range(n) for _ in range(bands)]
        return pa.table(
            {
                "band_key": pa.array(rows_band),
                "id": pa.array(rows_id),
                "shingles": pa.array(rep_sh, type=pa.large_binary()),
            }
        )

    exploded = sigged.map_batches(explode, batch_format="pyarrow")

    def verify_group(group: pa.Table) -> pa.Table:
        ids = group["id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        uniq_mask = np.concatenate(([True], ids[1:] != ids[:-1]))
        sel = order[uniq_mask]
        ids = ids[uniq_mask]
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                 "jaccard_sim": pa.array([], pa.float64())}
            )
        shingle_sets = [
            np.frombuffer(group["shingles"][int(i)].as_py(), dtype=np.uint64)
            for i in sel
        ]
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                sim = jaccard(shingle_sets[i], shingle_sets[j])
                if sim >= threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    s_out.append(sim)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "jaccard_sim": pa.array(s_out, pa.float64()),
            }
        )

    pairs_ds = exploded.groupby("band_key").map_groups(
        verify_group, batch_format="pyarrow"
    )
    pairs = pa.concat_tables(list(pairs_ds.iter_batches(batch_format="pyarrow")))
    if pairs.num_rows == 0:
        return pairs
    # distinct pairs (same pair can surface from multiple bands)
    g = pairs.group_by(["id_a", "id_b"], use_threads=False).aggregate(
        [("jaccard_sim", "max")]
    )
    return g.rename_columns(["id_a", "id_b", "jaccard_sim"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


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


def simhash_near_dups(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    concurrency: int | tuple[int, int] = (1, 8),
) -> pa.Table:
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

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        ids = group["id"].to_numpy(zero_copy_only=False)
        sh = group["sh"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        uniq = np.concatenate(([True], ids[1:] != ids[:-1]))
        ids, sh = ids[uniq], sh[uniq]
        a_o, b_o, h_o = [], [], []
        for i in range(len(ids)):
            d = hamming64(np.array([sh[i]] * (len(ids) - i - 1)), sh[i + 1 :])
            ok = np.where(d <= max_hamming)[0]
            for j in ok:
                a_o.append(int(ids[i]))
                b_o.append(int(ids[i + 1 + j]))
                h_o.append(int(d[j]))
        return pa.table(
            {
                "id_a": pa.array(a_o, pa.int64()),
                "id_b": pa.array(b_o, pa.int64()),
                "hamming": pa.array(h_o, pa.int64()),
            }
        )

    pairs_ds = exploded.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    pairs = pa.concat_tables(list(pairs_ds.iter_batches(batch_format="pyarrow")))
    if pairs.num_rows == 0:
        return pairs
    g = pairs.group_by(["id_a", "id_b"], use_threads=False).aggregate([("hamming", "min")])
    return g.rename_columns(["id_a", "id_b", "hamming"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def ngram_jaccard(
    text_a: str, text_b: str, k: int = 3
) -> float:
    """Exact k-token-shingle Jaccard between two strings (reference
    verifier; used standalone and inside LSH buckets)."""
    ta = pa.array([text_a, text_b])
    th, off = _token_lists(ta)
    flat, soff = _shingle_hashes(th, off, k)
    return jaccard(flat[soff[0] : soff[1]], flat[soff[1] : soff[2]])
