"""Query parsing — the native analog of the reference's lucene
``query_string`` passthrough (reference: utils.ts:94-100 builds
``query_string`` clauses; SpacesReaderClient.translateSearchQuery:134-262
is the DSL→xLucene printer our ``to_string`` mirrors, SURVEY.md Q4/Q8).

Grammar (lucene subset, whitespace-separated clauses):

    clause := ['+'|'-'] text
    text   := bare word | '"quoted text"'

- bare clause   → SHOULD terms (ranked disjunction, BM25-summed)
- ``+`` clause  → MUST terms (doc must contain every one; still scored)
- ``-`` clause  → MUST_NOT terms (doc excluded if it contains any)
- quoted multi-term text is a PHRASE: the doc must contain the terms
  CONSECUTIVELY in order (Lucene query_string phrase semantics — the
  reference hands these to Lucene, utils.ts:94-100).  ``"a b"`` and
  ``+"a b"`` are conjunctive phrase filters whose terms also score;
  ``-"a b"`` excludes docs containing the phrase (without excluding
  docs that merely contain the words).  By default scoring stays
  bag-of-words over the phrase's terms (documented divergence: Lucene
  scores phrase frequency; the adjacency FILTER matches).
  ``Searcher(phrase_scoring="phrase_freq")`` closes the divergence on
  positional indexes: each phrase clause scores Σ member idf ×
  tf-saturation of its occurrence count, Lucene PhraseQuery-style.

Each clause's text runs through the SAME analyzer as indexing
(:mod:`..stages.tokenizer`), so ``+fooBar`` expands to must-terms
``foo`` and ``bar``.  Scoring terms = sorted unique (should ∪ must).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from elasticsearch_assets_ray.query.expand import is_wildcard_pattern
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

_CLAUSE_RE = re.compile(
    # a clause is a quoted phrase, a fielded clause with a quoted value
    # (`source:"web x"` — must come before \S+ or the space splits it),
    # a fielded RANGE clause (`n:[10 TO 20}` — contains spaces), or a
    # bare token
    r'([+-]?)("([^"]*)"'
    r'|[A-Za-z_][A-Za-z0-9_.]*:"[^"]*"'
    r"|[A-Za-z_][A-Za-z0-9_.]*:[\[{][^\]}]*[\]}]"
    r"|\S+)"
)
_FUZZY_RE = re.compile(r"^(.+)~([0-2]?)$")
# fielded clause `field:value` — identifier-shaped field, nonempty value
_FIELD_RE = re.compile(r'^([A-Za-z_][A-Za-z0-9_.]*):("(?:[^"]*)"|[^"\s]+)$')
# fielded range `field:[lo TO hi]` — `[`/`]` inclusive, `{`/`}`
# exclusive, `*` = open endpoint.  The mixed form `field:[a TO b}` is
# exactly what the reference emits for its date windows
# (SpacesReaderClient.ts:250: `${field}:[${start} TO ${end}}`).
_RANGE_RE = re.compile(
    r"^([A-Za-z_][A-Za-z0-9_.]*):([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$"
)
# fielded comparator `field:>=v` / `:>v` / `:<=v` / `:<v` — sugar for a
# half-open range
_CMP_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.]*):(>=|<=|>|<)([^\s\"]+)$")


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    # consecutive-term filters (tuples of analyzed terms, len >= 2)
    phrases: list[tuple[str, ...]] = field(default_factory=list)
    not_phrases: list[tuple[str, ...]] = field(default_factory=list)
    # trailing-star prefix clauses (`fie*` → prefix "fie"): expanded
    # against the term dictionary at search time; expanded terms score
    # individually (Lucene's scoring-rewrite of multi-term queries).
    # `+fie*` is conjunctive: the doc must match ≥1 expanded term.
    prefixes: list[str] = field(default_factory=list)
    must_prefixes: list[str] = field(default_factory=list)
    not_prefixes: list[str] = field(default_factory=list)
    # general wildcard clauses (`t?ble`, `*ark`, `s*t`): lowercased
    # patterns over the term alphabet + `*`/`?`, expanded against the
    # term dictionary (regex over a prefix-narrowed sorted range);
    # expansion terms score individually, like prefixes
    wildcards: list[str] = field(default_factory=list)
    must_wildcards: list[str] = field(default_factory=list)
    not_wildcards: list[str] = field(default_factory=list)
    # fuzzy clauses `spark~1` / `tabel~` (default 2): (analyzed stem,
    # max plain-Levenshtein edits); see query/expand.py for the
    # documented Lucene divergence (no transposition discount)
    fuzzies: list[tuple[str, int]] = field(default_factory=list)
    must_fuzzies: list[tuple[str, int]] = field(default_factory=list)
    not_fuzzies: list[tuple[str, int]] = field(default_factory=list)
    # conjunctive ANY-groups (filled by the engine's prefix rewrite):
    # a doc must contain ≥1 term of EACH group
    must_any: list[list[str]] = field(default_factory=list)
    # fielded clauses `field:value` over docstore METADATA columns —
    # FILTER CONTEXT (ES bool.filter): conjunctive, non-scoring, exact
    # keyword equality on the raw (unanalyzed) value.  Documented
    # divergence from Lucene query_string, where a bare fielded term is
    # a scoring should-clause over that field's own inverted index; our
    # metadata columns are stored, not indexed, so they filter.
    filters: list[tuple[str, str]] = field(default_factory=list)
    not_filters: list[tuple[str, str]] = field(default_factory=list)
    # fielded RANGE clauses `field:[lo TO hi}` / `field:>=v` — filter
    # context like `filters`, compared in the COLUMN's type (numeric
    # columns numerically, strings lexicographically — ES range
    # semantics).  Tuple: (field, lo, lo_inclusive, hi, hi_inclusive);
    # an open endpoint (`*`) is None with inclusive=True.
    range_filters: list[tuple[str, str | None, bool, str | None, bool]] = field(
        default_factory=list
    )
    not_range_filters: list[tuple[str, str | None, bool, str | None, bool]] = field(
        default_factory=list
    )

    @property
    def scoring_terms(self) -> list[str]:
        """Sorted unique terms that contribute to BM25 (pins float
        addition order engine- and oracle-side)."""
        return sorted(set(self.should) | set(self.must))

    @property
    def has_phrases(self) -> bool:
        return bool(self.phrases or self.not_phrases)

    @property
    def has_prefixes(self) -> bool:
        return bool(self.prefixes or self.must_prefixes or self.not_prefixes)

    @property
    def has_multiterm(self) -> bool:
        """Any clause that needs term-dictionary expansion (prefix,
        wildcard or fuzzy) before scoring."""
        return self.has_prefixes or bool(
            self.wildcards
            or self.must_wildcards
            or self.not_wildcards
            or self.fuzzies
            or self.must_fuzzies
            or self.not_fuzzies
        )

    def to_string(self) -> str:
        """Canonical printable form (golden-string tests, Q8 analog)."""
        parts = (
            [f"+{t}" for t in sorted(set(self.must))]
            + [f"-{t}" for t in sorted(set(self.must_not))]
            + sorted(set(self.should))
            + ['+"' + " ".join(p) + '"' for p in sorted(set(self.phrases))]
            + ['-"' + " ".join(p) + '"' for p in sorted(set(self.not_phrases))]
            + [f"{p}*" for p in sorted(set(self.prefixes))]
            + [f"+{p}*" for p in sorted(set(self.must_prefixes))]
            + [f"-{p}*" for p in sorted(set(self.not_prefixes))]
            + sorted(set(self.wildcards))
            + [f"+{w}" for w in sorted(set(self.must_wildcards))]
            + [f"-{w}" for w in sorted(set(self.not_wildcards))]
            + [f"{t}~{n}" for t, n in sorted(set(self.fuzzies))]
            + [f"+{t}~{n}" for t, n in sorted(set(self.must_fuzzies))]
            + [f"-{t}~{n}" for t, n in sorted(set(self.not_fuzzies))]
            + [
                f'{f}:"{v}"' if " " in v else f"{f}:{v}"
                for f, v in sorted(set(self.filters))
            ]
            + [
                f'-{f}:"{v}"' if " " in v else f"-{f}:{v}"
                for f, v in sorted(set(self.not_filters))
            ]
            + [
                _range_str(r, neg=False)
                for r in sorted(set(self.range_filters), key=_range_key)
            ]
            + [
                _range_str(r, neg=True)
                for r in sorted(set(self.not_range_filters), key=_range_key)
            ]
        )
        return " ".join(parts)


def _range_key(r):
    """Sort key over mixed None/str endpoints (None sorts first)."""
    f, lo, loi, hi, hii = r
    return (f, lo is not None, lo or "", loi, hi is not None, hi or "", hii)


def _range_str(r, neg: bool) -> str:
    f, lo, loi, hi, hii = r
    return (
        ("-" if neg else "")
        + f"{f}:"
        + ("[" if loi else "{")
        + (lo if lo is not None else "*")
        + " TO "
        + (hi if hi is not None else "*")
        + ("]" if hii else "}")
    )


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    for m in _CLAUSE_RE.finditer(q or ""):
        op, body, quoted = m.group(1), m.group(2), m.group(3)
        text = quoted if quoted is not None else body
        if quoted is None:
            rm = _RANGE_RE.match(body) or _CMP_RE.match(body)
            if rm is not None:
                # fielded range filter: bracket form `n:[10 TO 20}` or
                # comparator sugar `n:>=10`; `-` negates the whole range
                if rm.re is _RANGE_RE:
                    fld, lob, lo, hi, hib = rm.groups()
                    spec = (
                        fld,
                        None if lo == "*" else lo,
                        lob == "[" or lo == "*",
                        None if hi == "*" else hi,
                        hib == "]" or hi == "*",
                    )
                else:
                    fld, cmp_, v = rm.groups()
                    spec = (
                        fld,
                        v if cmp_ in (">=", ">") else None,
                        cmp_ != ">",
                        v if cmp_ in ("<=", "<") else None,
                        cmp_ != "<",
                    )
                (out.not_range_filters if op == "-" else out.range_filters).append(
                    spec
                )
                continue
            km = _FIELD_RE.match(body)
            if km is not None:
                # fielded metadata filter clause `lang:en` /
                # `source:"web x"`; `+` and bare are the same (filter
                # context is always conjunctive), `-` excludes
                val = km.group(2)
                if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
                    val = val[1:-1]
                if val:
                    if op == "-":
                        out.not_filters.append((km.group(1), val))
                    else:
                        out.filters.append((km.group(1), val))
                    continue
            fm = _FUZZY_RE.match(body)
            if fm is not None:
                # fuzzy clause `stem~` / `stem~N` (N ∈ 0..2, default 2);
                # the stem runs through the analyzer and must stay one
                # token, else the clause degrades to plain terms
                stem = tokenize_text(fm.group(1))
                if len(stem) == 1:
                    n = int(fm.group(2)) if fm.group(2) else 2
                    if op == "-":
                        out.not_fuzzies.append((stem[0], n))
                    elif op == "+":
                        out.must_fuzzies.append((stem[0], n))
                    else:
                        out.fuzzies.append((stem[0], n))
                    continue
                if stem:
                    # multi-token stem (fooBar~1): the fuzzy suffix drops,
                    # the analyzed stem terms stay plain clauses
                    if op == "+":
                        out.must.extend(stem)
                    elif op == "-":
                        out.must_not.extend(stem)
                    else:
                        out.should.extend(stem)
                    continue
        if quoted is None and ("?" in body or "*" in body[:-1]):
            # general wildcard (`t?ble`, `*ark`, `s*t`, `gr*up*`): must be
            # a valid term-alphabet pattern after lowering, else the
            # clause degrades to plain analyzed terms
            low = body.lower()
            if is_wildcard_pattern(low):
                if op == "-":
                    out.not_wildcards.append(low)
                elif op == "+":
                    out.must_wildcards.append(low)
                else:
                    out.wildcards.append(low)
                continue
        if quoted is None and body.endswith("*") and len(body) > 1:
            # trailing-star prefix clause (Lucene `fie*`); the stem runs
            # through the analyzer and must stay a single token
            stem = tokenize_text(body[:-1])
            if len(stem) == 1:
                if op == "-":
                    out.not_prefixes.append(stem[0])
                elif op == "+":
                    out.must_prefixes.append(stem[0])
                else:
                    out.prefixes.append(stem[0])
                continue
            # multi-token stems (e.g. fooBar*) degrade to plain terms
        terms = tokenize_text(text)
        if not terms:
            continue
        if quoted is not None and len(terms) >= 2:
            if op == "-":
                # exclude docs containing the phrase; the bare words alone
                # do NOT exclude
                out.not_phrases.append(tuple(terms))
            else:
                # phrase implies every term present → MUST; adjacency is
                # verified by the engine's phrase filter
                out.phrases.append(tuple(terms))
                out.must.extend(terms)
            continue
        if op == "+":
            out.must.extend(terms)
        elif op == "-":
            out.must_not.extend(terms)
        else:
            out.should.extend(terms)
    return out
