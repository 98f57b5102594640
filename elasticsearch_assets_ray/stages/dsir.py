"""DSIR — Data Selection via Importance Resampling (Xie et al.,
arXiv:2302.03169).

The canonical LLM-pretraining data-selection recipe: score every raw
document by how much it resembles a TARGET distribution (e.g. curated
text) relative to the RAW distribution, then keep the top-weighted
docs.  Both distributions are bag-of-hashed-n-gram multinomials:

1. Feature = every unigram and space-joined bigram of the analyzed
   token stream, Horner-hashed (the repo's pinned uint64 polynomial —
   ``textstats.polynomial_hash``) into ``n_buckets`` buckets.
2. ``p[b] = (target_count[b] + 1) / (target_total + n_buckets)`` and
   likewise ``q[b]`` over the raw corpus (add-one smoothing, the
   paper's §3.1 estimator).
3. Per-doc importance log-weight
   ``logw(d) = Σ_{g ∈ ngrams(d)} (ln p[bucket(g)] − ln q[bucket(g)])``
   — occurrences count, exactly the multinomial log-likelihood ratio.
4. Selection keeps the k highest weights (deterministic variant of the
   paper's Gumbel top-k: rank by round-9 weight, docID tie-break — the
   repo-wide ranking contract).

Ray-Data shape (the 100 TB contract): the two distribution passes emit
sparse per-batch ``(bucket, count)`` PARTIALS whose shuffle is bounded
by ``n_buckets`` (never corpus rows); the λ = ln p − ln q vector is
built once on the driver and broadcast via ``ray.put``; the scoring
pass is one stateless vectorized ``map_batches`` (flat ngram buckets →
``np.bincount`` with λ weights); top-k selection merges per-batch local
top-k partials.  No stage ever materializes corpus text off its batch.

Reference scope: beyond-reference training-data surface (the reference
repo has no data-selection operators); SURVEY.md §6.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from elasticsearch_assets_ray.stages.textstats import polynomial_hash
from elasticsearch_assets_ray.stages.tokenizer import tokenize_column

__all__ = ["dsir_weights", "dsir_select", "hashed_ngram_buckets"]


def hashed_ngram_buckets(
    texts: pa.Array | pa.ChunkedArray, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """Unigram + bigram hashed-feature buckets of a doc column.
    Returns (flat bucket ids, flat→doc index), occurrences preserved."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    toks = tokenize_column(texts)
    flat = toks.flatten()
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
    if len(keep) and not keep.all():
        flat = flat.filter(pa.array(keep))
        ck = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
        off = np.concatenate(([0], np.cumsum(ck[off[1:]] - ck[off[:-1]])))
    n = len(texts)
    lens = off[1:] - off[:-1]
    uni_doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    parts: list[pa.Array] = [flat]
    doc_parts = [uni_doc]
    if len(flat) > 1:
        # bigrams: adjacent token pairs, masked at doc boundaries
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1)
        bi = pc.binary_join_element_wise(left, right, " ")
        within = uni_doc[:-1] == uni_doc[1:]
        if within.any():
            bi = bi.filter(pa.array(within))
            parts.append(bi)
            doc_parts.append(uni_doc[:-1][within])
    grams = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts]
    )
    doc_idx = np.concatenate(doc_parts)
    buckets = (polynomial_hash(grams) % np.uint64(n_buckets)).astype(np.int64)
    return buckets, doc_idx


def _bucket_totals(
    ds: ray.data.Dataset, text_col: str, n_buckets: int
) -> np.ndarray:
    """Distribution pass: sparse per-batch (bucket, count) partials →
    one shuffle bounded by n_buckets → dense count vector."""

    def partial(batch: pa.Table) -> pa.Table:
        b, _ = hashed_ngram_buckets(batch[text_col], n_buckets)
        cnt = np.bincount(b, minlength=n_buckets).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(nz), "n": pa.array(cnt[nz])})

    totals = (
        ds.map_batches(partial, batch_format="pyarrow").groupby("b").sum("n")
    )
    out = np.zeros(n_buckets, dtype=np.int64)
    for t in totals.iter_batches(batch_format="pyarrow"):
        out[t["b"].to_numpy(zero_copy_only=False)] = t["sum(n)"].to_numpy(
            zero_copy_only=False
        )
    return out


def dsir_weights(
    raw: ray.data.Dataset,
    target: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 10_000,
) -> ray.data.Dataset:
    """Per-doc DSIR importance log-weights over the raw corpus.
    Returns a Dataset of ``(id_col, logw)``; docs with no ngrams get 0."""
    tc = _bucket_totals(target, text_col, n_buckets)
    rc = _bucket_totals(raw, text_col, n_buckets)
    lam = np.log((tc + 1.0) / (tc.sum() + n_buckets)) - np.log(
        (rc + 1.0) / (rc.sum() + n_buckets)
    )
    lam_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        lam_v = ray.get(lam_ref)
        b, doc_idx = hashed_ngram_buckets(batch[text_col], n_buckets)
        logw = np.bincount(
            doc_idx, weights=lam_v[b], minlength=batch.num_rows
        )
        return pa.table(
            {id_col: batch[id_col], "logw": pa.array(logw, pa.float64())}
        )

    return raw.map_batches(score, batch_format="pyarrow")


def dsir_select(
    raw: ray.data.Dataset,
    target: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_buckets: int = 10_000,
    k: int = 1000,
) -> ray.data.Dataset:
    """DSIR weights + deterministic top-k selection flag.  The k-th
    weight threshold comes from merging per-batch local top-k partials
    (each bounded by k — the similarity-search merge shape); the flag
    pass re-ranks nothing, it just compares against the broadcast
    cutoff at the round-9 contract with docID tie-break."""
    from elasticsearch_assets_ray.query.bm25 import round_half_up

    # the weights lineage is consumed twice (cutoff probe + flag pass);
    # materializing the two-column (id, logw) intermediate keeps the
    # corpus TEXT to a single scan — the narrow table is what spills,
    # never the documents
    w = dsir_weights(
        raw, target, text_col, id_col, n_buckets=n_buckets
    ).materialize()

    def local_topk(batch: pa.Table) -> pa.Table:
        lw = round_half_up(batch["logw"].to_numpy(zero_copy_only=False), 9)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -lw))[:k]
        return pa.table(
            {id_col: pa.array(ids[order]), "r9": pa.array(lw[order])}
        )

    parts = list(
        w.map_batches(local_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    if parts:
        top = pa.concat_tables(parts)
        ids = top[id_col].to_numpy(zero_copy_only=False)
        r9 = top["r9"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -r9))[:k]
        if order.size:
            cut = (r9[order][-1], int(ids[order][-1]))
        else:
            cut = (-np.inf, np.iinfo(np.int64).max)
    else:
        cut = (-np.inf, np.iinfo(np.int64).max)
    cut_ref = ray.put(cut)

    def flag(batch: pa.Table) -> pa.Table:
        cw, cid = ray.get(cut_ref)
        lw = round_half_up(batch["logw"].to_numpy(zero_copy_only=False), 9)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = (lw > cw) | ((lw == cw) & (ids <= cid))
        return batch.append_column("selected", pa.array(sel.astype(np.int64)))

    return w.map_batches(flag, batch_format="pyarrow")
