"""BM25 scoring — ONE module shared by the index-side WAND scorer and the
brute-force oracle so rank identity is structural, not coincidental
(SURVEY.md §7.4: pinned idf formula, float64 end-to-end, docID tie-break).

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))          (Lucene form)
    sat(tf, dl) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d, q) = Σ_{t ∈ unique(q), sorted} idf(t) * sat(tf_td, len_d)

Summation is over *sorted unique* query terms in both implementations so
float addition order is identical.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: int | np.ndarray, n_docs: int) -> float | np.ndarray:
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_saturation(
    tf: np.ndarray, doclen: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    """Vectorized tf component, float64."""
    tf = tf.astype(np.float64)
    norm = k1 * (1.0 - b + b * (doclen.astype(np.float64) / avgdl))
    return tf * (k1 + 1.0) / (tf + norm)


def block_max_score(
    idf_t: float, max_tf: float, min_dl: float, avgdl: float, k1: float = K1, b: float = B
) -> float:
    """Upper bound of idf*sat over a block given (max_tf, min_dl): sat is
    increasing in tf and decreasing in dl, so this dominates every doc in
    the block."""
    norm = k1 * (1.0 - b + b * (min_dl / avgdl))
    return idf_t * (max_tf * (k1 + 1.0) / (max_tf + norm))


def term_max_score(idf_t: float, k1: float = K1) -> float:
    """Global upper bound for a term: sat(tf→∞) = k1 + 1 (used by WAND
    before block metadata is consulted)."""
    return idf_t * (k1 + 1.0)


def round_half_up(x, digits: int):
    """DuckDB ROUND parity for doubles: half AWAY FROM ZERO in scaled
    double space (``std::round(x*10^d)/10^d``), unlike numpy/pyarrow's
    half-to-even — a score within 1 ulp of a decimal midpoint must round
    the same way on both sides of a value-hash gate or a pagination
    cursor."""
    p = 10.0 ** digits
    return np.trunc(np.abs(x) * p + 0.5) * np.sign(x) / p


def sort_topk(docids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k: score desc, docid asc tie-break.

    Fast path: argpartition to ~k candidates, then include every doc tied
    with the boundary score (ties are bit-equal floats — same summation
    order) so the docID tie-break sees the full tie group, then sort just
    that candidate set.  Avoids a full lexsort of all matching docs."""
    if docids.size == 0:
        return docids.astype(np.int64), scores.astype(np.float64)
    n = docids.size
    if n > 4 * k and n > 64:
        part = np.argpartition(-scores, k - 1)[:k]
        boundary = scores[part].min()
        sel = np.flatnonzero(scores >= boundary)
        docids, scores = docids[sel], scores[sel]
    order = np.lexsort((docids, -scores))[:k]
    return docids[order].astype(np.int64), scores[order].astype(np.float64)


def score_accumulate(
    n_docs: int,
    avgdl: float,
    term_postings: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Exact scoring by accumulation (oracle path and small-index path).

    ``term_postings``: for each *sorted unique* query term present in the
    index, ``(df, docids, tfs, doclens)``.  Returns (docids, scores) for
    every doc matching ≥1 term.  Vectorized: per-term partial scores are
    concatenated term-major and summed per doc with np.bincount, whose
    sequential accumulation reproduces left-to-right addition in sorted
    term order — the same order the WAND engine uses.
    """
    if not term_postings:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    id_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    for df, docids, tfs, doclens in term_postings:
        w = idf(df, n_docs)
        id_parts.append(docids.astype(np.int64))
        score_parts.append(w * tf_saturation(tfs, doclens, avgdl))
    all_ids = np.concatenate(id_parts)
    all_scores = np.concatenate(score_parts)
    if all_ids.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    sums = np.bincount(inv, weights=all_scores, minlength=uniq.size)
    return uniq.astype(np.int64), sums.astype(np.float64)


def math_idf(df: int, n_docs: int) -> float:
    """Scalar idf as a Python float.  MUST route through np.log1p: numpy's
    and math's log1p differ by 1 ULP on ~30% of inputs, which breaks
    bit-identity between the engine and the oracle."""
    return float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))
