"""Hybrid retrieval: reciprocal-rank fusion of BM25 and vector rankings.

ES 8.x exposes hybrid search as the ``rrf`` retriever (``standard`` BM25 +
``knn`` sub-retrievers): each document's fused score is
``sum over lists of 1 / (rank_constant + rank)`` counting only lists where
the document appears within the per-list rank window.  The fusion is a
pure function of the INTEGER ranks, so with both input rankings pinned by
the engine's round-9 ranking contract the fused ranking is exactly
reproducible in SQL (integer ranks -> IEEE double arithmetic, <= 2 addends
per doc -> order-free).

No analog in the reference repo (retrieval is ES-delegated end to end;
the reference never fuses rankings itself) — this is ES-API parity for
the hybrid-search surface, composed from two already-verified operators:
the native BM25 engine (query/engine.py) and the ANN scorers
(stages/similarity.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rrf_fuse(
    rankings: list[pa.Table],
    *,
    k: int = 10,
    rank_constant: int = 60,
    id_cols: list[str] | None = None,
) -> pa.Table:
    """Fuse ranked lists into (query_id, doc_id, rank, rrf) top-k.

    Each input table carries ``query_id``, a doc-id column (``doc_id`` by
    default, override per list via ``id_cols``) and an integer ``rank``
    (1-based, already windowed by the caller — every row participates).
    Contributions ``1 / (rank_constant + rank)`` are summed per
    (query, doc) in list order; the fused ranking breaks score ties by
    doc id ascending on the engine-wide round-9 contract.

    Vectorized end to end: one concat, one lexsort, one ``reduceat``.
    Scale note: inputs are top-window tables (Q x window rows), never
    corpus-sized — fusion is a driver-side O(Q*W log QW) step no matter
    the corpus size.
    """
    if id_cols is None:
        id_cols = ["doc_id"] * len(rankings)
    qs, ds_, cs = [], [], []
    for t, idc in zip(rankings, id_cols):
        if t.num_rows == 0:
            continue
        qs.append(t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        ds_.append(t[idc].to_numpy(zero_copy_only=False).astype(np.int64))
        rk = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        cs.append(1.0 / (rank_constant + rk))
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "rrf": pa.array([], pa.float64()),
        }
    )
    if not qs:
        return empty
    q = np.concatenate(qs)
    d = np.concatenate(ds_)
    c = np.concatenate(cs)
    # group (query, doc): lexsort is stable, so list order survives
    # within a group and the <=N-addend sums are deterministic
    order = np.lexsort((d, q))
    q, d, c = q[order], d[order], c[order]
    starts = np.concatenate(([True], (q[1:] != q[:-1]) | (d[1:] != d[:-1])))
    idx = np.flatnonzero(starts)
    rrf = np.add.reduceat(c, idx)
    gq, gd = q[idx], d[idx]
    # rank within query by (round9(rrf) desc, doc asc) — half-UP rounding
    # (bm25.round_half_up), matching DuckDB round() in the SQL twin;
    # np.round is half-to-even and can flip a midpoint tie-break
    from elasticsearch_assets_ray.query import bm25

    r9 = bm25.round_half_up(rrf, 9)
    srt = np.lexsort((gd, -r9, gq))
    gq, gd, rrf = gq[srt], gd[srt], rrf[srt]
    seg = np.concatenate(([True], gq[1:] != gq[:-1]))
    first = np.flatnonzero(seg)
    grp = np.cumsum(seg) - 1
    rank = np.arange(gq.size) - first[grp] + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(gq[keep]),
            "doc_id": pa.array(gd[keep]),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "rrf": pa.array(rrf[keep]),
        }
    )


def rrf_sql(
    bm25_sql: str,
    cosine_sql: str,
    *,
    k: int = 10,
    rank_constant: int = 60,
    cosine_id_col: str = "vec_id",
) -> str:
    """The DuckDB twin of :func:`rrf_fuse` over two ranked-list oracle
    SQLs (each yielding query_id, <id>, rank within its window)."""
    return f"""
WITH bm AS ({bm25_sql}), co AS ({cosine_sql}),
contrib AS (
  SELECT query_id, doc_id, 1.0 / ({rank_constant} + rank) AS c FROM bm
  UNION ALL
  SELECT query_id, {cosine_id_col} AS doc_id, 1.0 / ({rank_constant} + rank) AS c FROM co
), fused AS (
  SELECT query_id, doc_id, sum(c) AS rrf FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id ORDER BY round(rrf, 9) DESC, doc_id) AS rank,
       round(rrf, 6) AS score_r
FROM fused
QUALIFY rank <= {k}
"""


def linear_fuse(
    rankings: list[pa.Table],
    *,
    weights: list[float],
    k: int = 10,
    id_cols: list[str] | None = None,
    score_cols: list[str] | None = None,
) -> pa.Table:
    """ES 8.18 ``linear`` retriever: fused = Σᵢ wᵢ · minmaxᵢ(score),
    min-max normalized per (list, query) over the list's rank window;
    docs missing from a list contribute 0 there; a degenerate window
    (max == min) normalizes to 0.

    Determinism contract: inputs carry the engine's ROUND-6 reported
    scores (the same doubles the SQL twins produce), so the
    normalization arithmetic — and therefore the fused ranking under the
    round-9 comparator — is exactly reproducible in SQL.  With ≤ 2 lists
    the per-doc sum is order-free IEEE addition.
    """
    if len(weights) != len(rankings):
        raise ValueError("one weight per ranking")
    if id_cols is None:
        id_cols = ["doc_id"] * len(rankings)
    if score_cols is None:
        score_cols = ["score_r"] * len(rankings)
    qs, ds_, cs = [], [], []
    for t, idc, scc, w in zip(rankings, id_cols, score_cols, weights):
        if t.num_rows == 0:
            continue
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[idc].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t[scc].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(q, kind="stable")
        q, d, s = q[order], d[order], s[order]
        starts = np.concatenate(([True], q[1:] != q[:-1]))
        idx = np.flatnonzero(starts)
        mins = np.minimum.reduceat(s, idx)
        maxs = np.maximum.reduceat(s, idx)
        grp = np.cumsum(starts) - 1
        mn, mx = mins[grp], maxs[grp]
        span = mx - mn
        norm = np.where(span > 0, (s - mn) / np.where(span > 0, span, 1.0), 0.0)
        qs.append(q)
        ds_.append(d)
        cs.append(w * norm)
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "fused": pa.array([], pa.float64()),
        }
    )
    if not qs:
        return empty
    q = np.concatenate(qs)
    d = np.concatenate(ds_)
    c = np.concatenate(cs)
    order = np.lexsort((d, q))
    q, d, c = q[order], d[order], c[order]
    starts = np.concatenate(([True], (q[1:] != q[:-1]) | (d[1:] != d[:-1])))
    idx = np.flatnonzero(starts)
    fused = np.add.reduceat(c, idx)
    gq, gd = q[idx], d[idx]
    from elasticsearch_assets_ray.query import bm25

    r9 = bm25.round_half_up(fused, 9)
    srt = np.lexsort((gd, -r9, gq))
    gq, gd, fused = gq[srt], gd[srt], fused[srt]
    seg = np.concatenate(([True], gq[1:] != gq[:-1]))
    first = np.flatnonzero(seg)
    grp = np.cumsum(seg) - 1
    rank = np.arange(gq.size) - first[grp] + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(gq[keep]),
            "doc_id": pa.array(gd[keep]),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "fused": pa.array(fused[keep]),
        }
    )


def linear_sql(
    bm25_sql: str,
    cosine_sql: str,
    *,
    w_bm25: float,
    w_knn: float,
    k: int = 10,
    cosine_id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`linear_fuse` over the two ranked-window
    oracle SQLs (bm25 → score_r, cosine → sim_r)."""
    return f"""
WITH bm AS ({bm25_sql}), co AS ({cosine_sql}),
bmn AS (
  SELECT query_id, doc_id,
         {w_bm25!r} * (CASE WHEN mx > mn THEN (score_r - mn) / (mx - mn) ELSE 0.0 END) AS c
  FROM (SELECT query_id, doc_id, score_r,
               min(score_r) OVER (PARTITION BY query_id) AS mn,
               max(score_r) OVER (PARTITION BY query_id) AS mx FROM bm)
), con AS (
  SELECT query_id, {cosine_id_col} AS doc_id,
         {w_knn!r} * (CASE WHEN mx > mn THEN (sim_r - mn) / (mx - mn) ELSE 0.0 END) AS c
  FROM (SELECT query_id, {cosine_id_col}, sim_r,
               min(sim_r) OVER (PARTITION BY query_id) AS mn,
               max(sim_r) OVER (PARTITION BY query_id) AS mx FROM co)
), fused AS (
  SELECT query_id, doc_id, sum(c) AS s
  FROM (SELECT * FROM bmn UNION ALL SELECT * FROM con) GROUP BY query_id, doc_id
)
SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id ORDER BY round(s, 9) DESC, doc_id) AS rank,
       round(s, 6) AS score_r
FROM fused
QUALIFY rank <= {k}
"""
