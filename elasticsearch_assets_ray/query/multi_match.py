"""ES ``multi_match``: best_fields / most_fields / cross_fields over
per-field indexes.

Lucene stores one postings list PER FIELD with per-field statistics
(df, dl, avgdl); ``multi_match`` then combines per-field scores.  This
repo follows the same storage shape Ray-Data-first: each field is its
own single-field index over the SAME corpus (one extra ``build_index``
pass per field — cheap, resumable, cacheable), and multi_match combines
per-doc scores across the field searchers on the ORIGINAL doc ids:

- ``best_fields``  — dis_max:  max(s_f) + tie_breaker · (Σ s_f − max)
  (non-matching fields contribute 0; BM25 scores are ≥ 0, so the
  2-field combine is exact and order-free);
- ``most_fields``  — Σ s_f, fields added in sorted-field-name order
  (pinned float order, mirrored by the SQL twin);
- ``cross_fields`` — term-centric blending: every term is scored
  against every field with the BLENDED df (max df across fields — ES's
  blended term statistics), the per-term contribution is the best
  field's, and a doc's score sums its terms in sorted-term order.

Scale shape: per-field searches run through each field index's normal
serving path (replica or sharded — the per-field index directories
shard exactly like the main one); the combine is a bounded per-doc
merge of the per-field result sets.  This gate-scale implementation
fetches each field's full match set (multi_match candidates are a
union of per-field matches); the block-max WAND top-k per field with a
union-refetch is the drop-in upgrade for broad queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.query.parser import parse_query
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

MM_TYPES = ("best_fields", "most_fields", "cross_fields")


def _orig_map(searcher, ids: np.ndarray) -> np.ndarray:
    h = searcher.hydrate(np.sort(ids), columns=["doc_id", "orig_doc_id"])
    m = dict(
        zip(
            h["doc_id"].to_numpy(zero_copy_only=False),
            h["orig_doc_id"].to_numpy(zero_copy_only=False),
        )
    )
    return np.array([m[int(i)] for i in ids], dtype=np.int64)


def _field_scores(searcher, qstr: str, df_override: dict[str, int] | None = None):
    """(orig_ids, scores) of the FULL match set of ``qstr`` on one field
    index."""
    n, _ = searcher.match_count(qstr)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    if df_override is None:
        res = searcher.search(qstr, k=n)
    else:
        q = searcher._rewrite_prefixes(parse_query(qstr))
        res = searcher.search_prepared(q, k=n, df_override=df_override)
    ids = res["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return _orig_map(searcher, ids), res["score"].to_numpy(zero_copy_only=False)


def _combine(parts: list[tuple[np.ndarray, np.ndarray]], how: str, tie_breaker: float):
    """Per-orig-doc combine of per-part (ids, scores): ``sum`` adds parts
    in the given order, ``dismax`` = max + tie_breaker · (sum − max),
    ``max`` keeps the best part."""
    ids = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    if ids.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    uids = np.unique(ids)
    sums = np.zeros(uids.size, dtype=np.float64)
    maxs = np.zeros(uids.size, dtype=np.float64)
    for pids, ps in parts:
        if pids.size == 0:
            continue
        idx = np.searchsorted(uids, pids)
        sums[idx] += ps
        np.maximum.at(maxs, idx, ps)
    if how == "sum":
        return uids, sums
    if how == "max":
        return uids, maxs
    if how == "dismax":
        return uids, maxs + tie_breaker * (sums - maxs)
    raise ValueError(how)


def multi_match(
    searchers: dict[str, object],
    query: str,
    mm_type: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
) -> pa.Table:
    """Top-k multi_match → (doc_id, score) on ORIGINAL doc ids.
    ``searchers`` maps field name → that field's index Searcher (or
    ShardedSearcher)."""
    if mm_type not in MM_TYPES:
        raise ValueError(f"unknown multi_match type {mm_type!r}")
    fields = sorted(searchers)
    terms = sorted(set(tokenize_text(query)))
    qstr = " ".join(terms)
    if mm_type in ("best_fields", "most_fields"):
        parts = [_field_scores(searchers[f], qstr) for f in fields]
        how = "dismax" if mm_type == "best_fields" else "sum"
        uids, sc = _combine(parts, how, tie_breaker)
    else:  # cross_fields: blended df per term, best field per term, sum
        dfs = {f: searchers[f].term_dfs(terms) for f in fields}
        acc: list[tuple[np.ndarray, np.ndarray]] = []
        for t in terms:
            blended = max(dfs[f].get(t, 0) for f in fields)
            if blended == 0:
                continue
            tparts = [
                _field_scores(searchers[f], t, df_override={t: blended})
                for f in fields
            ]
            acc.append(_combine(tparts, "max", 0.0))
        uids, sc = _combine(acc, "sum", 0.0)
    if uids.size > k:
        sel = np.lexsort((uids, -sc))[:k]
        uids, sc = uids[sel], sc[sel]
    return pa.table({"doc_id": pa.array(uids), "score": pa.array(sc)})


def combined_fields(
    searchers: dict[str, object],
    query: str,
    weights: dict[str, float] | None = None,
    k: int = 10,
) -> pa.Table:
    """ES ``combined_fields`` query (Lucene CombinedFieldQuery): the
    fields are merged into one SYNTHETIC field and scored with plain
    BM25 over it —

        tf_c(d, t)  = Σ_f w_f · tf_f(d, t)
        dl_c(d)     = Σ_f w_f · dl_f(d)
        avgdl_c     = Σ_f w_f · avgdl_f
        df_blend(t) = max_f df_f(t)          (blended term statistics)
        score(d)    = Σ_t idf(df_blend) · sat(tf_c, dl_c, avgdl_c)

    summed in sorted-term order with fields folded in sorted-field-name
    order (pinned float arithmetic; ≤2-field sums are order-free
    anyway).  ES requires per-field weights ≥ 1 and a shared analyzer;
    the per-field indexes here index the SAME corpus with the same
    builder, so internal docIDs align across fields (checked via
    n_docs).  Works on raw per-field postings (Searcher.term_postings),
    not per-field scores — combined_fields is NOT a score combiner like
    multi_match."""
    from elasticsearch_assets_ray.query import bm25

    fields = sorted(searchers)
    w = {f: 1.0 for f in fields}
    for f, v in (weights or {}).items():
        if f not in w:
            raise KeyError(f"unknown combined_fields field {f!r}")
        if v < 1.0:
            raise ValueError("ES combined_fields requires field weights >= 1")
        w[f] = float(v)
    s0 = searchers[fields[0]]
    n = s0.n_docs
    for f in fields[1:]:
        if searchers[f].n_docs != n:
            raise ValueError(
                "combined_fields needs row-aligned per-field indexes "
                "(same corpus, same build)"
            )
    terms = sorted(set(tokenize_text(query)))
    avgdl_c = sum(w[f] * searchers[f].avgdl for f in fields)
    # batched stats + postings: ONE term_dfs and ONE postings fetch per
    # FIELD (a scatter each on the sharded duck-type), never per term
    dfs = {f: searchers[f].term_dfs(terms) for f in fields}
    posts = {f: searchers[f].term_postings_many(terms) for f in fields}
    per_term = []
    union: list[np.ndarray] = []
    for t in terms:
        plist = {f: posts[f][t] for f in fields}
        df_blend = max(dfs[f].get(t, 0) for f in fields)
        per_term.append((t, df_blend, plist))
        union.extend(p[0] for p in plist.values())
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )
    union = [u for u in union if u.size]
    if not union:
        return empty
    cand = np.unique(np.concatenate(union))
    dl_c = np.zeros(cand.size, dtype=np.float64)
    for f in fields:
        dl_c += w[f] * searchers[f].doclens_for(cand).astype(np.float64)
    scores = np.zeros(cand.size, dtype=np.float64)
    for t, df_blend, plist in per_term:
        if df_blend == 0:
            continue
        tf_c = np.zeros(cand.size, dtype=np.float64)
        for f in fields:
            ids_f, tf_f = plist[f]
            if ids_f.size:
                tf_c[np.searchsorted(cand, ids_f)] += w[f] * tf_f
        m = tf_c > 0
        if not m.any():
            continue
        idf_t = bm25.math_idf(df_blend, n)
        scores[m] += idf_t * bm25.tf_saturation(tf_c[m], dl_c[m], avgdl_c)
    hit = scores > 0
    ids, sc = cand[hit], scores[hit]
    sel = np.lexsort((ids, -sc))[:k]
    ids, sc = ids[sel], sc[sel]
    return pa.table({"doc_id": pa.array(_orig_map(s0, ids)), "score": pa.array(sc)})
