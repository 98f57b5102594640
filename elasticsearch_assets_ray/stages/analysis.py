"""Configurable analysis chain — ES token filters over the canonical
tokenizer (stages/tokenizer.py).

The reference delegates all analysis to Elasticsearch (the `analyzer`
half of an index mapping; reference: ElasticsearchReaderClient.ts
search/count calls are tokenized entirely ES-side).  This module is the
native analog: an :class:`AnalyzerSpec` names an ordered chain of token
FILTERS applied after the canonical tokenization, at BOTH index build
time (stages/tokenizer.doc_term_freqs) and query time
(:func:`analyze_parsed` rewrites a ParsedQuery through the same chain),
so index terms and query terms always agree — the ES contract.

Supported filters (each a published, SQL-replicable transform so the
DuckDB oracles can hash-check an analyzed index end-to-end):

- ``stop`` — drop members of a stopword list (default: Lucene's
  English ``ENGLISH_STOP_WORDS_SET``, public).  Dropped tokens do NOT
  count toward the BM25 doc length and positions re-number over the
  KEPT tokens (the repo-wide convention already used for over-long
  tokens; documented divergence: Lucene leaves position GAPS, so
  phrases here match across removed stopwords — "the quick fox"
  matches the adjacency quick→fox).
- ``s_stem`` — Harman's S-stemmer (Harman 1991, "How effective is
  suffixing?"): three suffix rules (ies→y unless eies/aies; drop final
  s of -es unless aes/ees/oes; drop final -s unless us/ss).  Chosen
  over Porter/Snowball deliberately: it is exactly replicable as a SQL
  CASE expression, so the oracle checks the stemmed index by equality,
  not approximation.  A token that stems to "" is dropped.
- ``asciifold`` — ES ``asciifolding``: NFKD-decompose and strip
  combining marks, then drop any remaining non-ASCII codepoints.
  (Not part of the oracle-checked chain — the synthetic corpus is
  ASCII — but tested in pytest.)

Filters apply in the spec's order.  The spec serializes into the index
manifest; ``Searcher`` re-hydrates it and routes every string query
through :func:`analyze_parsed`, so a user can never query an analyzed
index with unanalyzed terms.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field, replace as _dc_replace

import numpy as np

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public, 33 words).
LUCENE_ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)

_KNOWN_FILTERS = ("stop", "s_stem", "asciifold")


def s_stem(term: str) -> str:
    """Harman (1991) S-stemmer.  The rules dispatch on the LONGEST
    matching suffix; a word whose suffix rule is blocked by its guard
    stays unchanged (it does NOT fall through to a shorter-suffix rule
    — otherwise the ees/oes/aes guards would be meaningless, rule 2 and
    rule 3 both just drop the final s).  May return "" ("s" itself);
    callers drop empty results."""
    if term.endswith("ies"):
        if not term.endswith(("eies", "aies")):
            return term[:-3] + "y"
        return term
    if term.endswith("es"):
        if not term.endswith(("aes", "ees", "oes")):
            return term[:-1]
        return term
    if term.endswith("s"):
        if not term.endswith(("us", "ss")):
            return term[:-1]
        return term
    return term


def asciifold(term: str) -> str:
    """NFKD decomposition, combining marks stripped, non-ASCII dropped."""
    out = unicodedata.normalize("NFKD", term)
    return "".join(c for c in out if not unicodedata.combining(c) and ord(c) < 128)


@dataclass(frozen=True)
class AnalyzerSpec:
    """Ordered token-filter chain.  Immutable and hashable so Searcher
    instances can share compiled state keyed by the spec."""

    filters: tuple[str, ...] = ()
    stopwords: tuple[str, ...] = LUCENE_ENGLISH_STOPWORDS

    def __post_init__(self):
        for f in self.filters:
            if f not in _KNOWN_FILTERS:
                raise ValueError(
                    f"unknown token filter {f!r} (known: {_KNOWN_FILTERS})"
                )

    # ---- (de)serialization (index manifest) ----
    def to_dict(self) -> dict:
        return {"filters": list(self.filters), "stopwords": list(self.stopwords)}

    @classmethod
    def from_dict(cls, d: dict) -> "AnalyzerSpec":
        return cls(
            filters=tuple(d.get("filters", ())),
            stopwords=tuple(d.get("stopwords", LUCENE_ENGLISH_STOPWORDS)),
        )

    # ---- scalar path (oracle / query rewriting) ----
    def apply_token(self, term: str) -> str | None:
        """One token through the chain; None = dropped."""
        stop = None
        for f in self.filters:
            if f == "stop":
                if stop is None:
                    stop = set(self.stopwords)
                if term in stop:
                    return None
            elif f == "s_stem":
                term = s_stem(term)
                if not term:
                    return None
            else:  # asciifold
                term = asciifold(term)
                if not term:
                    return None
        return term

    def apply_tokens(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            t2 = self.apply_token(t)
            if t2 is not None:
                out.append(t2)
        return out

    # ---- vectorized path (index build hot loop) ----
    def apply_vocab(self, vocab: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Transform the batch's UNIQUE terms (object array) through the
        chain.  Returns (new_terms, keep) aligned to ``vocab`` — the
        builder maps flat token streams through these by dictionary
        code, so per-token work is one gather regardless of corpus
        size; the Python loop here runs over the (small) per-batch
        vocabulary only."""
        n = len(vocab)
        keep = np.ones(n, dtype=bool)
        out = vocab.copy()
        for f in self.filters:
            if f == "stop":
                stop = set(self.stopwords)
                for i in range(n):
                    if keep[i] and out[i] in stop:
                        keep[i] = False
            elif f == "s_stem":
                for i in range(n):
                    if keep[i]:
                        t = s_stem(out[i])
                        if t:
                            out[i] = t
                        else:
                            keep[i] = False
            else:  # asciifold
                for i in range(n):
                    if keep[i]:
                        t = asciifold(out[i])
                        if t:
                            out[i] = t
                        else:
                            keep[i] = False
        return out, keep

    # ---- SQL twin ----
    def sql_term_expr(self, col: str) -> str:
        """DuckDB expression computing this chain over a token column —
        rows must additionally be filtered with :meth:`sql_keep_expr`.
        Raises for chains the oracle cannot replicate (asciifold)."""
        expr = col
        for f in self.filters:
            if f == "s_stem":
                # mirrors s_stem exactly: dispatch on the longest
                # matching suffix, guard-blocked words stay UNCHANGED
                expr = (
                    f"(CASE WHEN {expr} LIKE '%ies' THEN"
                    f" (CASE WHEN {expr} NOT LIKE '%eies'"
                    f" AND {expr} NOT LIKE '%aies'"
                    f" THEN substr({expr}, 1, length({expr}) - 3) || 'y'"
                    f" ELSE {expr} END)"
                    f" WHEN {expr} LIKE '%es' THEN"
                    f" (CASE WHEN {expr} NOT LIKE '%aes'"
                    f" AND {expr} NOT LIKE '%ees' AND {expr} NOT LIKE '%oes'"
                    f" THEN substr({expr}, 1, length({expr}) - 1)"
                    f" ELSE {expr} END)"
                    f" WHEN {expr} LIKE '%s' THEN"
                    f" (CASE WHEN {expr} NOT LIKE '%us'"
                    f" AND {expr} NOT LIKE '%ss'"
                    f" THEN substr({expr}, 1, length({expr}) - 1)"
                    f" ELSE {expr} END)"
                    f" ELSE {expr} END)"
                )
            elif f == "asciifold":
                raise ValueError("asciifold has no SQL twin")
        return expr

    def sql_keep_expr(self, col: str) -> str:
        """DuckDB predicate: token survives the chain (stop filter +
        stem-to-empty drops).  Stop applies to the PRE-stem surface form
        when it precedes s_stem in the chain (and vice versa)."""
        preds = []
        expr = col
        for f in self.filters:
            if f == "stop":
                words = ", ".join(f"'{w}'" for w in self.stopwords)
                preds.append(f"{expr} NOT IN ({words})")
            elif f == "s_stem":
                expr = self.sql_term_expr_upto(col, "s_stem")
                preds.append(f"{expr} <> ''")
        return " AND ".join(preds) if preds else "TRUE"

    def sql_term_expr_upto(self, col: str, upto: str) -> str:
        """The chain's SQL through (and including) the first ``upto``
        filter — used to express order-sensitive keep predicates."""
        sub = []
        for f in self.filters:
            sub.append(f)
            if f == upto:
                break
        return _dc_replace(self, filters=tuple(sub)).sql_term_expr(col)


def analyze_parsed(q, spec: AnalyzerSpec):
    """Rewrite a ParsedQuery through the filter chain — the query half
    of the ES analyzer contract.  Term clauses stem; stopword terms
    vanish (ES: the clause disappears); phrase tuples stem per-term and
    drop stopwords (kept-token adjacency, see module docstring), a
    tuple shrunk to one term degrades to a plain term clause, to zero
    vanishes.  Term-DICTIONARY clauses (prefix / wildcard / regexp /
    fuzzy stems) are untouched: Lucene multi-term queries match raw
    index terms, not analyzed text.  Field/range filters are metadata,
    not text — untouched.  Boolean trees rewrite term leaves in place;
    a dropped leaf propagates exactly like the parser's
    analyzed-to-nothing tokens (and/or prune it, NOT over nothing is
    vacuous) and the rewritten tree is re-checked for groundedness."""
    from elasticsearch_assets_ray.query.parser import check_tree_grounded

    def one(t: str) -> str | None:
        return spec.apply_token(t)

    def terms(lst: list[str]) -> list[str]:
        return [t2 for t in lst if (t2 := one(t)) is not None]

    def tup(ts: tuple[str, ...]) -> tuple[str, ...]:
        return tuple(t2 for t in ts if (t2 := one(t)) is not None)

    q2 = _dc_replace(
        q,
        should=terms(q.should),
        must=terms(q.must),
        must_not=terms(q.must_not),
        must_any=[g2 for g in q.must_any if (g2 := terms(g))],
    )

    # positive phrase TERMS are already MUST clauses (the parser's
    # quoted-phrase contract), so a phrase shrunk to ≤1 kept term just
    # drops — the surviving term still scores and filters via `must`.
    # NEGATIVE phrases stand alone; shrunk to exactly one term, phrase
    # containment degenerates to term containment → must_not; shrunk to
    # nothing, the clause vanishes (ES drops analyzed-empty clauses).
    q2.phrases = [ts2 for ts in q.phrases if len(ts2 := tup(ts)) >= 2]
    q2.sloppy_phrases = [
        (ts2, slop) for ts, slop in q.sloppy_phrases if len(ts2 := tup(ts)) >= 2
    ]
    neg_phr, neg_slop = [], []
    for ts in q.not_phrases:
        ts2 = tup(ts)
        if len(ts2) >= 2:
            neg_phr.append(ts2)
        elif len(ts2) == 1:
            q2.must_not.append(ts2[0])
    for ts, slop in q.not_sloppy_phrases:
        ts2 = tup(ts)
        if len(ts2) >= 2:
            neg_slop.append((ts2, slop))
        elif len(ts2) == 1:
            q2.must_not.append(ts2[0])
    q2.not_phrases = neg_phr
    q2.not_sloppy_phrases = neg_slop

    for src in ("phrase_prefixes", "not_phrase_prefixes"):
        out = []
        for ts, stem in getattr(q, src):
            # the trailing stem is a dictionary prefix — raw by design
            out.append((tup(ts), stem))
        setattr(q2, src, out)

    if q.bool_tree is not None:

        def walk(node):
            if node is None:
                return None
            kind = node[0]
            if kind == "term":
                t = one(node[1])
                return None if t is None else ("term", t)
            if kind in ("and", "or"):
                kids = [walk(c) for c in node[1]]
                kids = [c for c in kids if c is not None]
                if not kids:
                    return None
                return kids[0] if len(kids) == 1 else (kind, kids)
            if kind == "not":
                c = walk(node[1])
                return None if c is None else ("not", c)
            if kind == "boost":
                c = walk(node[1])
                return None if c is None else ("boost", c, node[2])
            return node  # prefix/wildcard/fuzzy/filter leaves: raw

        tree = walk(q.bool_tree)
        if tree is None:
            raise ValueError(
                "boolean query analyzed to nothing against this index's "
                f"analyzer ({spec.filters})"
            )
        check_tree_grounded(tree)
        q2 = _dc_replace(q2, bool_tree=tree)

    return q2
