"""ES ``_rank_eval`` API analog: search-quality metrics over ranked results.

ES's ranking-evaluation API takes a set of *rated requests* (a query plus
relevance judgments) and a metric, runs each query through the normal
search path, and reports the metric per request plus the mean.  This
module reproduces that contract Ray-Data-first:

- the searches run through the ordinary serving path (replica
  :class:`Searcher` or the doc-partitioned ``ShardedSearcher`` — the
  caller passes whichever), so the evaluation exercises the same
  distributed top-k the application uses;
- judgments come from a *rating rule* instead of a hand-labeled list:
  ``rating(q, d) = number of distinct analyzed query terms present in
  d``'s token set (graded 0..n_terms).  Ratings for the *retrieved*
  docs are computed from a k-row hydrate (bounded, never a corpus
  scan on the driver); the corpus-wide rating **histogram** — needed
  only for the recall denominator and the NDCG ideal ordering — is a
  distributed embarrassingly-parallel ``map_batches`` scan reduced to
  a ≤ n_terms-row table per query (see
  :func:`rating_histograms`), exactly the shape that still works at
  100 TB.

Metrics (the five ES ``_rank_eval`` offers):

- ``precision``   relevant-retrieved / retrieved          (rating ≥ 1)
- ``recall``      relevant-retrieved / total-relevant
- ``mrr``         1 / rank of the first relevant hit (0 when none)
- ``ndcg``        DCG@k / IDCG@k with the standard exponential gain
                  ``(2^g - 1) / log2(rank + 1)``; the ideal ordering
                  draws from ALL rated docs (the histogram), matching
                  ES's "all rated documents, best first"
- ``err``         expected reciprocal rank with
                  ``R = (2^g - 1) / 2^gmax`` and ``gmax = n_terms``
                  (ES's ``maximum_relevance``); the stop-probability
                  prefix product is evaluated as ``exp(Σ ln(1-R))`` so
                  the float path is the SAME expression the DuckDB
                  oracle runs.

Reference parity: the reference has no rank_eval (it delegates search
quality to ES itself); this is the ES REST API surface
(``/_rank_eval``) the reference's users reach through the same cluster.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

METRICS = ("precision", "recall", "mrr", "ndcg", "err")


def term_membership(text: pa.ChunkedArray | pa.Array, term: str) -> np.ndarray:
    """Vectorized full-token membership test: does ``term`` occur as a
    complete ``[a-z0-9]+`` token of ``lower(text)``?  This is the exact
    semantics of the oracle's ``list_contains(regexp_extract_all(...))``
    — one compiled-regex Arrow kernel per (term, batch), no Python rows."""
    pat = f"(^|[^a-z0-9]){re.escape(term)}([^a-z0-9]|$)"
    lo = pc.utf8_lower(text)
    return pc.match_substring_regex(lo, pat).to_numpy(zero_copy_only=False)


def query_terms(query: str) -> list[str]:
    """The analyzed, deduplicated, sorted term set of a rated request."""
    return sorted(set(tokenize_text(query)))


def rating_hist_batch(batch: pa.Table, terms_by_query: list[list[str]], text_col: str) -> pa.Table:
    """Per-batch partial of the corpus rating histogram: for every query,
    count docs at each rating level g ≥ 1 (g = number of distinct query
    terms present).  Output (query_id, g, n) — bounded by
    Σ n_terms rows per batch, so the follow-up reduce is tiny."""
    qids, gs, ns = [], [], []
    for qid, terms in enumerate(terms_by_query):
        if not terms:
            continue
        acc = np.zeros(batch.num_rows, dtype=np.int64)
        for t in terms:
            acc += term_membership(batch[text_col], t)
        counts = np.bincount(acc, minlength=len(terms) + 1)
        for g in range(1, len(terms) + 1):
            if counts[g]:
                qids.append(qid)
                gs.append(g)
                ns.append(int(counts[g]))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "g": pa.array(gs, pa.int64()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def rating_histograms(
    ds, queries: list[str], text_col: str = "text"
) -> dict[int, dict[int, int]]:
    """Distributed rating histogram per query: one vectorized pass over
    the corpus Dataset, per-batch partials (≤ n_terms rows each), one
    tiny driver-side reduce.  Nothing per-doc ever reaches the driver."""
    terms = [query_terms(q) for q in queries]
    parts = ds.map_batches(
        lambda b: rating_hist_batch(b, terms, text_col), batch_format="pyarrow"
    )
    hists: dict[int, dict[int, int]] = {qid: {} for qid in range(len(queries))}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qid, g, n in zip(
            b["query_id"].to_pylist(), b["g"].to_pylist(), b["n"].to_pylist()
        ):
            hists[qid][g] = hists[qid].get(g, 0) + n
    return hists


def _dcg(gains: list[int]) -> float:
    return sum(
        (2.0**g - 1.0) / math.log2(i + 1.0) for i, g in enumerate(gains, start=1)
    )


def metric_values(
    ranked_gains: list[int], hist: dict[int, int], k: int, gmax: int
) -> dict[str, float]:
    """The five metrics from a ranked gain list + the corpus histogram.
    Pure; unit-testable without an index."""
    retrieved = len(ranked_gains)
    rel_ret = sum(1 for g in ranked_gains if g >= 1)
    total_rel = sum(hist.values())
    precision = rel_ret / retrieved if retrieved else 0.0
    recall = rel_ret / total_rel if total_rel else 0.0
    mrr = 0.0
    for i, g in enumerate(ranked_gains, start=1):
        if g >= 1:
            mrr = 1.0 / i
            break
    # ideal ordering: all rated docs best-first, truncated to k
    ideal: list[int] = []
    for g in sorted(hist, reverse=True):
        take = min(hist[g], k - len(ideal))
        ideal.extend([g] * take)
        if len(ideal) >= k:
            break
    idcg = _dcg(ideal)
    ndcg = _dcg(ranked_gains) / idcg if idcg > 0 else 0.0
    # ERR: R_i = (2^g - 1) / 2^gmax; prefix product via exp(Σ ln(1-R))
    # (the SAME float expression as the SQL twin, for round-6 stability)
    err = 0.0
    lnacc = 0.0
    for i, g in enumerate(ranked_gains, start=1):
        r = (2.0**g - 1.0) / (2.0**gmax)
        err += (r / i) * math.exp(lnacc)
        lnacc += math.log(1.0 - r)
    return {
        "precision": precision,
        "recall": recall,
        "mrr": mrr,
        "ndcg": ndcg,
        "err": err,
    }


def _gains_for(texts: list[str], terms: list[str]) -> list[int]:
    """Graded relevance of each text: distinct query terms present."""
    if not texts:
        return []
    arr = pa.array(texts, pa.string())
    acc = np.zeros(len(texts), dtype=np.int64)
    for t in terms:
        acc += term_membership(arr, t)
    return [int(x) for x in acc]


def rank_eval_from_gains(
    queries: list[str],
    gains_by_query: dict[int, list[int]],
    hists: dict[int, dict[int, int]],
    k: int = 10,
) -> pa.Table:
    """Metrics table from per-query ranked gain lists (rank order, top-k)
    + corpus rating histograms: (query_id, metric, value_r) tall, plus a
    ``mean`` row per metric at query_id = -1 — ES's per-request +
    overall ``metric_score`` response shape."""
    per_query: dict[str, list[float]] = {m: [] for m in METRICS}
    qids_out, metric_out, val_out = [], [], []
    for qid, q in enumerate(queries):
        terms = query_terms(q)
        vals = metric_values(
            gains_by_query.get(qid, []), hists.get(qid, {}), k, gmax=len(terms)
        )
        for m in METRICS:
            per_query[m].append(vals[m])
            qids_out.append(qid)
            metric_out.append(m)
            val_out.append(round(vals[m], 6))
    for m in METRICS:
        qids_out.append(-1)
        metric_out.append(m)
        val_out.append(
            round(sum(per_query[m]) / len(queries), 6) if queries else 0.0
        )
    return pa.table(
        {
            "query_id": pa.array(qids_out, pa.int64()),
            "metric": pa.array(metric_out, pa.string()),
            "value_r": pa.array(val_out, pa.float64()),
        }
    )


def rank_eval(
    searcher,
    queries: list[str],
    hists: dict[int, dict[int, int]],
    k: int = 10,
    content_col: str = "text",
) -> pa.Table:
    """ES-facing wrapper: run every rated request through ``searcher``
    (replica Searcher or ShardedSearcher — both expose ``search`` +
    ``hydrate``), grade the top-k with a k-row hydrate, and delegate to
    :func:`rank_eval_from_gains`."""
    gains_by_query: dict[int, list[int]] = {}
    for qid, q in enumerate(queries):
        terms = query_terms(q)
        res = searcher.search(q, k=k)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        gains: list[int] = []
        if ids.size:
            h = searcher.hydrate(ids, columns=["doc_id", content_col])
            texts = dict(
                zip(
                    h["doc_id"].to_numpy(zero_copy_only=False),
                    h[content_col].to_pylist(),
                )
            )
            gains = _gains_for([texts[int(d)] for d in ids], terms)
        gains_by_query[qid] = gains
    return rank_eval_from_gains(queries, gains_by_query, hists, k)
