"""ES ``weighted_tokens`` / ``text_expansion`` — the learned-sparse
retrieval surface (ELSER / SPLADE class; ES 8.13 query-dsl
weighted-tokens-query).

A query is a bag of (token, weight) pairs produced by a sparse encoder;
the document side is served straight from the inverted index:
``score(doc) = Σ_t w_t · tf_doc(t)`` — the linear ``rank_features``
dot-product with raw term frequency as the stored doc-side weight (the
pinned contract; ES stores learned per-doc weights in a rank_features
field — tf is the text-index stand-in, documented divergence).

Pruning (the ES ``pruning_config``): a token is dropped when BOTH
``df(t) > freq_ratio_threshold × mean(df over the query's tokens)``
(too frequent — behaves like a stopword) and
``w_t < weight_threshold`` (too weak to matter).  High-weight tokens
are never pruned regardless of frequency, matching the ES rule's
intent.

Serving: the function takes ANY searcher exposing the raw per-term
surface (``term_postings_many`` / ``term_dfs`` — both Searcher and
ShardedSearcher quack it, the combined_fields duck-type), so the
distributed path is the same code: one postings scatter per query, the
wire carries df-bounded candidate rows.  Weights that are exact binary
fractions (0.25 steps) make every product and sum bit-exact in float64
regardless of accumulation order — the oracle's SQL sum matches
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.query import bm25

__all__ = ["weighted_tokens"]


def weighted_tokens(
    searcher,
    tokens: dict[str, float],
    k: int = 10,
    *,
    freq_ratio_threshold: float | None = None,
    weight_threshold: float = 0.0,
) -> pa.Table:
    """Top-k sparse dot-product search; see module docstring."""
    if not tokens:
        raise ValueError("weighted_tokens needs at least one token")
    toks = sorted(tokens)
    if freq_ratio_threshold is not None:
        dfs = searcher.term_dfs(toks)
        avg = sum(int(dfs.get(t, 0)) for t in toks) / len(toks)
        toks = [
            t
            for t in toks
            if not (
                int(dfs.get(t, 0)) > freq_ratio_threshold * avg
                and float(tokens[t]) < weight_threshold
            )
        ]
        if not toks:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
    posts = searcher.term_postings_many(toks)
    parts = [posts[t][0] for t in toks if posts[t][0].size]
    if not parts:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    union = np.unique(np.concatenate(parts))
    score = np.zeros(union.size, dtype=np.float64)
    for t in toks:
        d, tf = posts[t]
        if d.size:
            score[np.searchsorted(union, d)] += float(tokens[t]) * tf.astype(
                np.float64
            )
    ids, sc = bm25.sort_topk(union, score, k)
    return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})
