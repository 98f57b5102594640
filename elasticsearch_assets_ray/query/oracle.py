"""Brute-force BM25 reference scorer — the in-repo oracle the engine must
be rank-identical against (BASELINE.json north_rule).  Scans every
document, no index, no pruning; shares the tokenizer and the scoring
module with the engine so identity is structural.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elasticsearch_assets_ray.query import bm25
from elasticsearch_assets_ray.query.parser import ParsedQuery, parse_query
from elasticsearch_assets_ray.stages.tokenizer import doc_term_freqs


class OracleIndex:
    """In-memory term → (docids, tfs) map over a small corpus table."""

    def __init__(
        self,
        table: pa.Table,
        content_col: str = "content",
        id_col: str = "doc_id",
        chunk_rows: int = 50_000,
        analyzer=None,
    ):
        """Builds in row chunks so corpora whose content exceeds Arrow's
        2 GiB single-array limit still oracle-check."""
        self.n_docs = table.num_rows
        self.doc_ids = table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # id → raw content, for phrase adjacency verification
        self.contents: dict[int, str] = dict(
            zip(self.doc_ids.tolist(), table[content_col].to_pylist())
        )
        self.postings: dict[str, list] = {}
        total_tokens = 0
        for lo in range(0, self.n_docs, chunk_rows):
            chunk = table.slice(lo, chunk_rows)
            ids = chunk[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            tb = doc_term_freqs(chunk[content_col], analyzer=analyzer)
            total_tokens += int(tb.doc_len.sum())
            uterms, inv = np.unique(tb.terms, return_inverse=True)
            o = np.lexsort((tb.doc_idx, inv))
            s_term, s_doc, s_tf = inv[o], tb.doc_idx[o], tb.tfs[o]
            bounds = (
                np.concatenate(([0], np.flatnonzero(np.diff(s_term)) + 1, [len(s_term)]))
                if len(s_term)
                else np.zeros(1, dtype=np.int64)
            )
            for i, t in enumerate(uterms):
                a, b = bounds[i], bounds[i + 1]
                d = s_doc[a:b]
                self.postings.setdefault(str(t), []).append(
                    (ids[d], s_tf[a:b], tb.doc_len[d])
                )
        # chunks arrive in ascending doc order → concatenation stays sorted
        self.postings = {
            t: tuple(np.concatenate(cols) for cols in zip(*parts))
            for t, parts in self.postings.items()
        }
        self.avgdl = (total_tokens / self.n_docs) if self.n_docs else 0.0
        self.analyzer = analyzer

    def all_scores(self, query: str | ParsedQuery) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, bm25) for every doc matching the query (must/must_not
        honoured), unordered-by-contract."""
        pq_ = parse_query(query) if isinstance(query, str) else query
        if isinstance(query, str) and self.analyzer is not None:
            from elasticsearch_assets_ray.stages.analysis import analyze_parsed

            pq_ = analyze_parsed(pq_, self.analyzer)
        if pq_.has_multiterm:
            # same rewrite as the engine: positive expansions → SHOULD
            # terms (+ a must_any group for `+` clauses), negative
            # expansions → MUST_NOT, from the vocabulary — this reference
            # scorer expands by brute force over every posting key
            import re as _re

            from elasticsearch_assets_ray.query import expand as _exp

            def _lev(a: str, b: str) -> int:
                prev = list(range(len(b) + 1))
                for i, ca in enumerate(a, 1):
                    cur = [i]
                    for j, cb in enumerate(b, 1):
                        cur.append(
                            min(prev[j] + 1, cur[j - 1] + 1,
                                prev[j - 1] + (ca != cb))
                        )
                    prev = cur
                return prev[-1]

            expanded = ParsedQuery(
                should=list(pq_.should),
                must=list(pq_.must),
                must_not=list(pq_.must_not),
                phrases=list(pq_.phrases),
                not_phrases=list(pq_.not_phrases),
                sloppy_phrases=list(pq_.sloppy_phrases),
                not_sloppy_phrases=list(pq_.not_sloppy_phrases),
                phrase_prefixes=list(pq_.phrase_prefixes),
                not_phrase_prefixes=list(pq_.not_phrase_prefixes),
                must_any=[list(g) for g in pq_.must_any],
            )
            sets = [
                (pq_.prefixes, "should", lambda p: lambda t: t.startswith(p)),
                (pq_.must_prefixes, "must", lambda p: lambda t: t.startswith(p)),
                (pq_.not_prefixes, "not", lambda p: lambda t: t.startswith(p)),
                (pq_.wildcards, "should",
                 lambda w: lambda t, rx=_re.compile(_exp.wildcard_regex(w)): bool(rx.match(t))),
                (pq_.must_wildcards, "must",
                 lambda w: lambda t, rx=_re.compile(_exp.wildcard_regex(w)): bool(rx.match(t))),
                (pq_.not_wildcards, "not",
                 lambda w: lambda t, rx=_re.compile(_exp.wildcard_regex(w)): bool(rx.match(t))),
                (pq_.fuzzies, "should",
                 lambda tn: lambda t: _lev(tn[0], t) <= tn[1]),
                (pq_.must_fuzzies, "must",
                 lambda tn: lambda t: _lev(tn[0], t) <= tn[1]),
                (pq_.not_fuzzies, "not",
                 lambda tn: lambda t: _lev(tn[0], t) <= tn[1]),
            ]
            for clauses, kind, mk in sets:
                for c in clauses:
                    pred = mk(c)
                    terms = sorted(t for t in self.postings if pred(t))
                    if kind == "not":
                        expanded.must_not.extend(terms)
                    else:
                        expanded.should.extend(terms)
                        if kind == "must":
                            expanded.must_any.append(terms)
            pq_ = expanded
        plist = [
            (len(self.postings[t][0]), *self.postings[t])
            for t in pq_.scoring_terms
            if t in self.postings
        ]
        ids, scores = bm25.score_accumulate(self.n_docs, self.avgdl, plist)
        mask = np.ones(ids.size, dtype=bool)
        for t in set(pq_.must):
            have = self.postings.get(t, (np.empty(0, dtype=np.int64),))[0]
            mask &= np.isin(ids, have)
        for t in set(pq_.must_not):
            have = self.postings.get(t, (np.empty(0, dtype=np.int64),))[0]
            mask &= ~np.isin(ids, have)
        for grp in pq_.must_any:
            parts = [self.postings[t][0] for t in grp if t in self.postings]
            have = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
            mask &= np.isin(ids, have)
        ids, scores = ids[mask], scores[mask]
        if pq_.has_phrases:
            from elasticsearch_assets_ray.query.engine import Searcher
            from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

            # resolve every phrase form into the shared (terms, slop)
            # spec shape — phrase-prefix stems expand over THIS
            # reference's vocabulary (same contract as the engine's
            # term dictionary)
            pos_specs = [(p, 0) for p in pq_.phrases] + list(pq_.sloppy_phrases)
            neg_specs = [(p, 0) for p in pq_.not_phrases] + list(
                pq_.not_sloppy_phrases
            )
            for p, stem in pq_.phrase_prefixes:
                exp = frozenset(t for t in self.postings if t.startswith(stem))
                pos_specs.append((tuple(p) + (exp,), 0))
            for p, stem in pq_.not_phrase_prefixes:
                exp = frozenset(t for t in self.postings if t.startswith(stem))
                neg_specs.append((tuple(p) + (exp,), 0))
            keep = np.ones(ids.size, dtype=bool)
            for i, d in enumerate(ids):
                toks = tokenize_text(self.contents.get(int(d)) or "", self.analyzer)
                ok = all(
                    Searcher.contains_spec(toks, p, n) for p, n in pos_specs
                ) and not any(
                    Searcher.contains_spec(toks, p, n) for p, n in neg_specs
                )
                keep[i] = ok
            ids, scores = ids[keep], scores[keep]
        return ids, scores

    def topk(self, query: str | ParsedQuery, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        ids, scores = self.all_scores(query)
        return bm25.sort_topk(ids, scores, k)
