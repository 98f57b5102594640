"""Percolator — ES's reverse search (the percolate query,
https://www.elastic.co/guide/en/elasticsearch/reference/current/query-dsl-percolate-query.html):
REGISTER the queries once, then stream documents through them and emit
(doc, query) matches.  The classic uses are alerting ("tell me when a
doc matching my saved search arrives") and, in a training-data pipeline,
rule-based routing/tagging of documents at ingest.

Ray-Data shape: the registered query set is compiled ONCE (parse +
analyze + a term→query candidate index) and broadcast via ``ray.put``;
each ``map_batches`` task tokenizes its batch vectorized and evaluates
only the CANDIDATE queries per doc (queries sharing no positive term
with the doc are never touched — the same inverted-index trick ES's
percolator uses to avoid running every query against every doc).  The
corpus streams; no shuffle; per-batch work ∝ matched (doc, query)
candidates.

Query support (the engine's flat surface): should terms (≥1 matches, ES
percolate semantics), ``+must`` / ``-must_not`` terms, quoted phrases
(verified with the engine's ``contains_spec`` — THE positional
reference shared with search), ``minimum_should_match``, and exact
metadata equality filters (``field:value``).  Boolean trees / prefixes /
fuzzies are rejected at registration (keep registered percolator
queries simple and cheap — the same guidance ES gives).

Reference analog: none in terascope/elasticsearch-assets (it never
percolates); this is first-class ES API surface beyond the reference,
listed in SURVEY.md §2.7.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from elasticsearch_assets_ray.query.engine import Searcher
from elasticsearch_assets_ray.query.parser import ParsedQuery, parse_query
from elasticsearch_assets_ray.stages.tokenizer import tokenize_column


def compile_queries(queries: dict[str, str]) -> dict:
    """Parse + validate a named query set into the broadcastable
    percolator program: per-query specs plus the term→query candidate
    postings."""
    names = sorted(queries)
    specs = []
    term_to_q: dict[str, list[int]] = {}
    relevant: set[str] = set()
    for qi, name in enumerate(names):
        q: ParsedQuery = parse_query(queries[name])
        unsupported = (
            q.bool_tree is not None
            or q.prefixes or q.must_prefixes or q.not_prefixes
            or q.wildcards or q.must_wildcards or q.not_wildcards
            or q.fuzzies or q.must_fuzzies or q.not_fuzzies
            or q.regexps or q.must_regexps or q.not_regexps
            or q.sloppy_phrases or q.not_sloppy_phrases
            or q.phrase_prefixes or q.not_phrase_prefixes
            or q.range_filters or q.not_range_filters
            or q.exists_filters or q.not_exists_filters
            or q.match_filters or q.not_match_filters
        )
        if unsupported:
            raise ValueError(
                f"percolator query {name!r}: only terms, +must/-must_not, "
                "quoted phrases, minimum_should_match and field:value "
                "equality filters are supported at registration"
            )
        positives = sorted(
            set(q.should) | set(q.must) | {t for p in q.phrases for t in p}
        )
        if not positives:
            raise ValueError(
                f"percolator query {name!r} has no positive term — it "
                "would need evaluating against every document"
            )
        # candidate trigger: must terms (and phrase terms) are REQUIRED,
        # so any one of them works as the trigger (fewer candidates than
        # a should-term trigger); pure-should queries trigger on any
        # should term
        trigger = sorted(set(q.must) or {t for p in q.phrases for t in p} or set(q.should))
        for t in trigger:
            term_to_q.setdefault(t, []).append(qi)
        relevant |= set(positives) | set(q.must_not) | {
            t for p in q.not_phrases for t in p
        }
        specs.append(
            {
                "name": name,
                "should": sorted(set(q.should)),
                "must": sorted(set(q.must)),
                "must_not": sorted(set(q.must_not)),
                "phrases": [tuple(p) for p in q.phrases],
                "not_phrases": [tuple(p) for p in q.not_phrases],
                "msm": int(q.minimum_should_match),
                "filters": sorted(set(q.filters)),
            }
        )
    return {
        "names": names,
        "specs": specs,
        "term_to_q": term_to_q,
        # every term ANY registered query references — the per-batch
        # isin mask that keeps the Python side off the token hot path
        "relevant": np.array(sorted(relevant), dtype=object),
    }


class PercolateStage:
    """Actor-pool ``map_batches`` stage: emits one (id, query) row per
    registered query matching each document.  Compile once per actor in
    ``__init__`` (or pass ``program_ref`` from ``compile_queries`` +
    ``ray.put`` to share one compiled program across the pool)."""

    def __init__(
        self,
        queries: dict[str, str] | None = None,
        program_ref=None,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        if (queries is None) == (program_ref is None):
            raise ValueError("pass exactly one of queries / program_ref")
        self.prog = (
            compile_queries(queries) if queries is not None else ray.get(program_ref)
        )
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        prog = self.prog
        toks = tokenize_column(batch[self.text_col].combine_chunks()).fill_null([])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(toks.values.to_numpy(zero_copy_only=False), dtype=object)
        n = batch.num_rows
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        # vectorized prefilter: only tokens some registered query
        # references survive (np.isin over the batch's token column) —
        # the Python side below walks RELEVANT (doc, term) hits, never
        # the raw token stream
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        rel_mask = np.isin(flat, prog["relevant"])
        tsets: dict[int, set] = {}
        for d, t in zip(doc_idx[rel_mask].tolist(), flat[rel_mask].tolist()):
            tsets.setdefault(d, set()).add(t)
        t2q = prog["term_to_q"]
        cand: dict[int, set[int]] = {}
        for d, ts in tsets.items():
            qs: set[int] = set()
            for t in ts:
                hit = t2q.get(t)
                if hit:
                    qs.update(hit)
            if qs:
                cand[d] = qs
        # metadata filter columns hydrate lazily (only if some query uses them)
        meta_cols = {
            f
            for s in prog["specs"]
            for f, _v in s["filters"]
        }
        meta = {f: batch[f].to_pylist() for f in meta_cols}
        out_id, out_q = [], []
        token_lists: dict[int, list[str]] = {}
        for d, qs in sorted(cand.items()):
            ts = tsets.get(d, set())
            for qi in sorted(qs):
                s = prog["specs"][qi]
                if any(t not in ts for t in s["must"]):
                    continue
                if any(t in ts for t in s["must_not"]):
                    continue
                if s["msm"] > 0 and sum(t in ts for t in s["should"]) < s["msm"]:
                    continue
                elif s["msm"] == 0 and s["should"] and not any(
                    t in ts for t in s["should"]
                ):
                    # ES percolate: the query must MATCH the doc (≥1
                    # should term when there are no other positive parts)
                    if not s["must"] and not s["phrases"]:
                        continue
                ok = True
                for f, v in s["filters"]:
                    if str(meta[f][d]) != v:
                        ok = False
                        break
                if not ok:
                    continue
                if s["phrases"] or s["not_phrases"]:
                    tl = token_lists.get(d)
                    if tl is None:
                        tl = flat[offsets[d] : offsets[d + 1]].tolist()
                        token_lists[d] = tl
                    if any(
                        not Searcher.contains_spec(tl, p, 0) for p in s["phrases"]
                    ):
                        continue
                    if any(
                        Searcher.contains_spec(tl, p, 0) for p in s["not_phrases"]
                    ):
                        continue
                out_id.append(int(ids[d]))
                out_q.append(prog["names"][qi])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "query_name": pa.array(out_q, pa.string()),
            }
        )


def percolate(
    ds: ray.data.Dataset,
    queries: dict[str, str],
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Stream a document Dataset through a registered query set →
    Dataset(doc_id, query_name), one row per match.  The compiled
    program is ``ray.put`` once and shared by every actor."""
    ref = ray.put(compile_queries(queries))
    return ds.map_batches(
        PercolateStage,
        fn_constructor_kwargs={
            "program_ref": ref,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
