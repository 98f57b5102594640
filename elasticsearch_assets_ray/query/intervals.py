"""ES ``intervals`` query — the minimal-interval proximity algebra
(www.elastic.co/guide query-dsl-intervals-query; Lucene's
IntervalsSource, after Vigna's minimal-interval semantics).

Supported sources, mirroring the ES JSON one-to-one:

    {"match":  {"query": "fast scan", "max_gaps": 2, "ordered": True}}
    {"all_of": {"intervals": [<spec>...], "max_gaps": g, "ordered": True}}
    {"any_of": {"intervals": [<spec>...]}}

Pinned contract (the repo's positional precedent):

- intervals FILTER exactly; scoring is bag-of-words BM25 over the
  spec's terms (sum of matching clauses — Lucene scores intervals by
  interval frequency instead; documented divergence, same class as the
  phrase contract).
- ``ordered=True`` only (the unordered single-``match`` case is already
  served by the ``"a b"~uN`` unordered-proximity query); ``max_gaps``
  counts the slack beyond the clauses' minimal total width, ES's gap
  rule for term clauses.
- translation target is the span evaluator (query/spans.py):
  ``match`` → ``span_near`` over term clauses, ``all_of`` →
  ``span_near`` over translated children, ``any_of`` → ``span_or``
  (the union-of-minimal-intervals primitive) — exactly Lucene's own
  lowering of intervals onto span iterators.

Serving: single-process here, per-shard inside the ShardedSearcher
actors through the ``intervals`` dispatch (coordinator global df,
per-doc filter ⇒ exact shard merges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.query import spans
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

_UNBOUNDED = 1 << 30


def intervals_to_spans(spec: dict) -> dict:
    """ES intervals JSON → span spec (raises on unsupported shapes)."""
    if "match" in spec:
        m = spec["match"]
        if not m.get("ordered", True):
            raise ValueError(
                'intervals match(ordered=False) is served by the "a b"~uN '
                "unordered-proximity query; the intervals tree is ordered-only"
            )
        toks = tokenize_text(m["query"])
        if not toks:
            raise ValueError("intervals match analyzed to no terms")
        gaps = int(m.get("max_gaps", -1))
        clauses = [{"span_term": t} for t in toks]
        if len(clauses) == 1:
            # a one-term interval is the term span regardless of gaps
            return clauses[0]
        return {
            "span_near": {
                "clauses": clauses,
                "slop": _UNBOUNDED if gaps < 0 else gaps,
                "in_order": True,
            }
        }
    if "all_of" in spec:
        a = spec["all_of"]
        if not a.get("ordered", True):
            raise ValueError("intervals all_of(ordered=False) unsupported")
        gaps = int(a.get("max_gaps", -1))
        return {
            "span_near": {
                "clauses": [intervals_to_spans(c) for c in a["intervals"]],
                "slop": _UNBOUNDED if gaps < 0 else gaps,
                "in_order": True,
            }
        }
    if "any_of" in spec:
        return {
            "span_or": {
                "clauses": [
                    intervals_to_spans(c) for c in spec["any_of"]["intervals"]
                ]
            }
        }
    raise ValueError(f"unknown intervals source: {sorted(spec)}")


def intervals_search(searcher, spec: dict, k: int = 10) -> pa.Table:
    """Top-k intervals search: candidates = the OR match set of every
    term the spec mentions (complete — any interval match contains at
    least one of them), filtered by span-evaluator existence, scored
    bag-of-words (terms present in the doc score; absent branches
    contribute nothing — the engine's OR scoring).  Respects
    ``searcher._df_override`` (the sharded dfs phase)."""
    sspec = intervals_to_spans(spec)
    terms = spans.all_terms(sspec)
    r = searcher.all_scores(" ".join(terms))
    ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if ids.size == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
    scores = r["score"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    cs = ids[order]
    keys = spans.position_keys(searcher, terms, cs)
    sk, _ = spans.eval_spans(sspec, keys)
    ok_cidx = np.unique(sk >> 32)
    mask = np.zeros(cs.size, dtype=bool)
    mask[ok_cidx] = True
    keep = np.zeros(ids.size, dtype=bool)
    keep[order] = mask
    ids, scores = ids[keep], scores[keep]
    sel = np.lexsort((ids, -scores))[:k]
    ids, scores = ids[sel], scores[sel]
    return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})
