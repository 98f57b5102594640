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

from elasticsearch_assets_ray.query.expand import (
    is_wildcard_pattern,
    lower_regex_pattern,
)
from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

_CLAUSE_RE = re.compile(
    # a clause is a quoted phrase (with an optional `~N` ordered-slop or
    # `~uN` unordered-proximity suffix — Lucene sloppy-phrase syntax plus
    # our span_near(in_order=false) extension), a fielded clause with a
    # quoted value (`source:"web x"` — must come before \S+ or the space
    # splits it), a fielded RANGE clause (`n:[10 TO 20}` — contains
    # spaces), or a bare token
    r'([+-]?)("([^"]*)"(~u?\d+)?'
    r'|[A-Za-z_][A-Za-z0-9_.]*:"[^"]*"'
    r"|[A-Za-z_][A-Za-z0-9_.]*:[\[{][^\]}]*[\]}]"
    r"|\S+)"
)
_FUZZY_RE = re.compile(r"^(.+)~([0-2]?)$")


def encode_unordered_slop(n: int) -> int:
    """Unordered proximity `"a b"~uN` travels through the shared
    ``(terms, slop)`` spec tuples as ``slop = -(N+1)`` so no consumer's
    tuple shape changes; verifiers branch on ``slop < 0``."""
    return -(int(n) + 1)


def _match_clause(fld: str, val: str) -> tuple[str, str]:
    """`field.text:value` → (base_field, analyzed_token).  The value
    must analyze to exactly one token (ES match-in-filter over multiple
    tokens is OR-by-default; one clause per token keeps the semantics
    explicit)."""
    base = fld[: -len(".text")]
    if not base:
        raise ValueError("'.text' needs a base field name")
    toks = tokenize_text(val)
    if len(toks) != 1:
        raise ValueError(
            f"{fld}:{val!r} must analyze to exactly one token (got "
            f"{toks}); write one clause per token"
        )
    return (base, toks[0])


def unordered_window(terms_len: int, slop: int) -> int | None:
    """Max span WIDTH for an unordered spec (``terms_len + N``), or
    ``None`` when ``slop`` encodes an ordered spec."""
    return terms_len + (-slop - 1) if slop < 0 else None


def _slop_suffix(slop: int) -> str:
    """Canonical printed suffix after `~`: `N` ordered, `uN` unordered."""
    return f"u{-slop - 1}" if slop < 0 else str(slop)
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
_CMP_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.]*):(>=|<=|>|<)([^\s\"^]+)$")

# boolean-expression mode triggers: a standalone uppercase AND/OR/NOT
# token or a parenthesis OUTSIDE quoted regions (Lucene query_string
# boolean operators — the reference hands the whole string to Lucene,
# utils.ts:94-100, so the operators are part of its accepted surface)
_QUOTED_RE = re.compile(r'"[^"]*"')
# `/regexp/` spans are atomic: parens INSIDE a pattern are pattern
# syntax, not boolean grouping — strip them (like quotes) before
# boolean-mode detection, and lex them as one token
_REGEXP_SPAN_RE = re.compile(r"/[^\s/]+/")
_BOOL_TRIGGER_RE = re.compile(r"(?:^|[\s(])(?:AND|OR|NOT)(?:[\s)]|$)|[()]")
_BOOL_TOKEN_RE = re.compile(
    r'"[^"]*"'
    r"|[+-]?/[^\s/]+/"
    r'|[A-Za-z_][A-Za-z0-9_.]*:"[^"]*"'
    # range clause, keeping an attached boost (`n:[1 TO 2]^2`) in the
    # SAME token — otherwise the `^2` would lex as a separate juxtaposed
    # term "2" and silently OR into the query
    r"|[A-Za-z_][A-Za-z0-9_.]*:[\[{][^\]}]*[\]}](?:\^\d+(?:\.\d+)?)?"
    r"|[()]"
    r"|[^\s()]+"
)


@dataclass
class ParsedQuery:
    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    # consecutive-term filters (tuples of analyzed terms, len >= 2)
    phrases: list[tuple[str, ...]] = field(default_factory=list)
    not_phrases: list[tuple[str, ...]] = field(default_factory=list)
    # sloppy phrases `"a b"~N` (Lucene slop): the terms must appear IN
    # ORDER with total span ≤ (len-1) + slop — i.e. up to `slop` extra
    # tokens interleaved.  (Documented divergence: Lucene's slop also
    # admits reordering at cost 2 per transposition; our `~N` is
    # ordered-only.)  Tuple: (terms, slop).
    # UNORDERED proximity `"a b"~uN` (our span_near(in_order=false)
    # extension): one DISTINCT position per term instance, in ANY order,
    # within a span of width ≤ len + N.  Encoded in the same list with
    # slop = -(N+1) (see encode_unordered_slop) so the shared
    # (terms, slop) spec tuples flow unchanged through every verifier;
    # consumers branch on slop < 0.
    sloppy_phrases: list[tuple[tuple[str, ...], int]] = field(default_factory=list)
    not_sloppy_phrases: list[tuple[tuple[str, ...], int]] = field(
        default_factory=list
    )
    # phrase-prefix `"quick bro*"` (ES match_phrase_prefix): the
    # complete terms adjacent in order, immediately followed by ANY
    # index term starting with the stem.  Tuple: (complete terms, stem).
    # Complete terms are MUST and score; the prefix position is a
    # match constraint only (documented divergence: Lucene scores the
    # capped expansion too).
    phrase_prefixes: list[tuple[tuple[str, ...], str]] = field(default_factory=list)
    not_phrase_prefixes: list[tuple[tuple[str, ...], str]] = field(
        default_factory=list
    )
    # trailing-star prefix clauses (`fie*` → prefix "fie"): expanded
    # against the term dictionary at search time; expanded terms score
    # individually (Lucene's scoring-rewrite of multi-term queries).
    # `+fie*` is conjunctive: the doc must match ≥1 expanded term.
    prefixes: list[str] = field(default_factory=list)
    must_prefixes: list[str] = field(default_factory=list)
    not_prefixes: list[str] = field(default_factory=list)
    # regexp clauses (Lucene `/pat/` syntax): anchored-RE2 expansion
    # against the term dictionary; expansion terms score individually
    regexps: list[str] = field(default_factory=list)
    must_regexps: list[str] = field(default_factory=list)
    not_regexps: list[str] = field(default_factory=list)
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
    # ANALYZED fielded clauses `field.text:value` — the ES multi-field
    # convention inverted (ES: `field` text / `field.keyword` raw; here
    # `field` raw / `field.text` analyzed): the value runs through the
    # shared analyzer and must stay ONE token; a doc matches when the
    # token appears in tokenize(column).  Filter context like `filters`.
    # Tuple: (base_field, analyzed_token).
    match_filters: list[tuple[str, str]] = field(default_factory=list)
    not_match_filters: list[tuple[str, str]] = field(default_factory=list)
    # `_exists_:field` clauses (ES existence query) — filter context:
    # the doc's metadata column must hold a non-null value
    exists_filters: list[str] = field(default_factory=list)
    not_exists_filters: list[str] = field(default_factory=list)
    # ES minimum_should_match (request parameter, not query syntax):
    # when > 0, a matching doc must contain at least this many DISTINCT
    # should terms.  Scoring unchanged (all matched terms score).
    minimum_should_match: int = 0
    # ES search_after cursor (request parameter): ``(round9_score,
    # doc_id)`` — only docs strictly AFTER that sort position in
    # (score desc, doc_id asc) order match.  Set via
    # ``Searcher.search(search_after=...)``, never by query syntax.
    search_after: tuple[float, int] | None = None
    # boolean-expression mode (Lucene AND/OR/NOT + parentheses): when
    # set, the query is the TREE and every flat field above is empty.
    # Nodes are tuples: ("term", t), ("prefix", stem), ("wildcard", pat),
    # ("fuzzy", stem, n), ("filter", pred) with pred = ("eq", fld, val) |
    # ("range", fld, lo, loi, hi, hii), ("and", [nodes]), ("or",
    # [nodes]), ("not", node).  Match = tree evaluation over per-doc
    # term-presence / metadata predicates; score = bag-of-words BM25 over
    # the POSITIVE-polarity term leaves the doc contains (Lucene's
    # sum-of-matching-clauses rule — clauses under NOT never score).
    bool_tree: tuple | None = None

    @property
    def scoring_terms(self) -> list[str]:
        """Sorted unique terms that contribute to BM25 (pins float
        addition order engine- and oracle-side)."""
        if self.bool_tree is not None:
            return sorted(tree_terms(self.bool_tree, polarity=True))
        return sorted(set(self.should) | set(self.must))

    @property
    def has_phrases(self) -> bool:
        return bool(
            self.phrases
            or self.not_phrases
            or self.sloppy_phrases
            or self.not_sloppy_phrases
            or self.phrase_prefixes
            or self.not_phrase_prefixes
        )

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
            or self.regexps
            or self.must_regexps
            or self.not_regexps
        )

    def to_string(self) -> str:
        """Canonical printable form (golden-string tests, Q8 analog)."""
        if self.bool_tree is not None:
            return tree_to_string(self.bool_tree)
        parts = (
            [f"+{t}" for t in sorted(set(self.must))]
            + [f"-{t}" for t in sorted(set(self.must_not))]
            + sorted(set(self.should))
            + ['+"' + " ".join(p) + '"' for p in sorted(set(self.phrases))]
            + ['-"' + " ".join(p) + '"' for p in sorted(set(self.not_phrases))]
            + [
                f'+"{" ".join(p)}"~{_slop_suffix(n)}'
                for p, n in sorted(set(self.sloppy_phrases))
            ]
            + [
                f'-"{" ".join(p)}"~{_slop_suffix(n)}'
                for p, n in sorted(set(self.not_sloppy_phrases))
            ]
            + [
                f'+"{" ".join(p)} {st}*"'
                for p, st in sorted(set(self.phrase_prefixes))
            ]
            + [
                f'-"{" ".join(p)} {st}*"'
                for p, st in sorted(set(self.not_phrase_prefixes))
            ]
            + [f"{p}*" for p in sorted(set(self.prefixes))]
            + [f"+{p}*" for p in sorted(set(self.must_prefixes))]
            + [f"-{p}*" for p in sorted(set(self.not_prefixes))]
            + sorted(set(self.wildcards))
            + [f"+{w}" for w in sorted(set(self.must_wildcards))]
            + [f"-{w}" for w in sorted(set(self.not_wildcards))]
            + [f"/{r}/" for r in sorted(set(self.regexps))]
            + [f"+/{r}/" for r in sorted(set(self.must_regexps))]
            + [f"-/{r}/" for r in sorted(set(self.not_regexps))]
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
                f"{f}.text:{t}" for f, t in sorted(set(self.match_filters))
            ]
            + [
                f"-{f}.text:{t}"
                for f, t in sorted(set(self.not_match_filters))
            ]
            + [
                _range_str(r, neg=False)
                for r in sorted(set(self.range_filters), key=_range_key)
            ]
            + [
                _range_str(r, neg=True)
                for r in sorted(set(self.not_range_filters), key=_range_key)
            ]
            + [f"_exists_:{f}" for f in sorted(set(self.exists_filters))]
            + [f"-_exists_:{f}" for f in sorted(set(self.not_exists_filters))]
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


# ---------------------------------------------------------------------------
# boolean-expression mode (Lucene AND / OR / NOT + parentheses)
# ---------------------------------------------------------------------------
#
# Grammar (documented subset of Lucene query_string):
#
#     expr  := and ((OR | juxtaposition) and)*      # juxtaposition ≡ OR
#     and   := unary (AND unary)*                   # AND binds tighter
#     unary := NOT unary | '(' expr ')' | leaf
#     leaf  := bare term | prefix* | wild?card | fuzzy~N
#            | field:value | field:[lo TO hi] | field:>=v
#
# Divergences (documented): quoted phrases and '+'/'-' clause prefixes
# are rejected inside boolean expressions (use the flat syntax, or AND /
# NOT); a bare token that analyzes to several terms becomes an OR group
# (the default-operator reading).  A query must be GROUNDED: it may not
# be satisfiable by a document containing none of its term leaves (e.g.
# `a OR NOT b` matches every doc lacking both a and b — rejected, like
# ES rejects unbounded pure-negative contexts).  Groundedness makes the
# candidate set "docs containing ≥1 positive-polarity term" complete:
# flipping only negative-polarity leaves True can never turn the
# all-False evaluation (False, by groundedness) into True.


class QueryParseError(ValueError):
    pass


# postfix boost `clause^2` / `(group)^1.5` (Lucene query_string boost:
# the clause's score is multiplied by the factor; matching unchanged)
_BOOST_RE = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")
# `_exists_:field` — ES existence query (field has a non-null value)
_EXISTS_RE = re.compile(r"^_exists_:([A-Za-z_][A-Za-z0-9_.]*)$")


def _bool_leaf(tok: str):
    """One boolean-mode token → leaf node (or None when the token
    analyzes to nothing)."""
    if tok.startswith('"'):
        raise QueryParseError(
            f"phrases are not supported inside boolean expressions "
            f"({tok!r}); use the flat '+\"...\"' syntax"
        )
    if tok[0] in "+-" and len(tok) > 1:
        raise QueryParseError(
            f"'+'/'-' clause prefixes are not supported inside boolean "
            f"expressions ({tok!r}); use AND / NOT"
        )
    bm = _BOOST_RE.match(tok)
    if bm is not None and not _RANGE_RE.match(tok) and not _CMP_RE.match(tok):
        inner = _bool_leaf(bm.group(1))
        return None if inner is None else ("boost", inner, float(bm.group(2)))
    em = _EXISTS_RE.match(tok)
    if em is not None:
        return ("filter", ("exists", em.group(1)))
    rm = _RANGE_RE.match(tok) or _CMP_RE.match(tok)
    if rm is not None:
        if rm.re is _RANGE_RE:
            fld, lob, lo, hi, hib = rm.groups()
            pred = (
                "range",
                fld,
                None if lo == "*" else lo,
                lob == "[" or lo == "*",
                None if hi == "*" else hi,
                hib == "]" or hi == "*",
            )
        else:
            fld, cmp_, v = rm.groups()
            pred = (
                "range",
                fld,
                v if cmp_ in (">=", ">") else None,
                cmp_ != ">",
                v if cmp_ in ("<=", "<") else None,
                cmp_ != "<",
            )
        return ("filter", pred)
    km = _FIELD_RE.match(tok)
    if km is not None:
        val = km.group(2)
        if len(val) >= 2 and val[0] == '"' and val[-1] == '"':
            val = val[1:-1]
        if val:
            if km.group(1).endswith(".text"):
                return ("filter", ("match", *_match_clause(km.group(1), val)))
            return ("filter", ("eq", km.group(1), val))
    if len(tok) > 2 and tok.startswith("/") and tok.endswith("/"):
        # Lucene regexp leaf `/pat/` — the lexer keeps the whole span
        # (incl. parens, which are pattern syntax) as one token
        return ("regexp", lower_regex_pattern(tok[1:-1]))
    fm = _FUZZY_RE.match(tok)
    if fm is not None:
        stem = tokenize_text(fm.group(1))
        if len(stem) == 1:
            return ("fuzzy", stem[0], int(fm.group(2)) if fm.group(2) else 2)
    if "?" in tok or "*" in tok[:-1]:
        low = tok.lower()
        if is_wildcard_pattern(low):
            return ("wildcard", low)
    if tok.endswith("*") and len(tok) > 1:
        stem = tokenize_text(tok[:-1])
        if len(stem) == 1:
            return ("prefix", stem[0])
    terms = tokenize_text(tok)
    if not terms:
        return None
    if len(terms) == 1:
        return ("term", terms[0])
    return ("or", [("term", t) for t in terms])


def _parse_bool_tree(q: str):
    toks = _BOOL_TOKEN_RE.findall(q)
    # binary-NOT sugar (Lucene query_string): `foo NOT bar` means
    # `foo AND NOT bar`.  A NOT that FOLLOWS a clause or ')' (i.e. is
    # not at expression start nor right after AND/OR/NOT/'(') desugars
    # to AND NOT in the token stream; prefix NOT is untouched.
    desugared: list[str] = []
    for i, t in enumerate(toks):
        if (
            t == "NOT"
            and i > 0
            and toks[i - 1] not in ("AND", "OR", "NOT", "(")
        ):
            desugared.append("AND")
        desugared.append(t)
    toks = desugared
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def parse_expr():
        nonlocal pos
        nodes = [parse_and()]
        while True:
            t = peek()
            if t == "OR":
                pos += 1
                nodes.append(parse_and())
            elif t is not None and t != ")":
                nodes.append(parse_and())  # juxtaposition ≡ OR
            else:
                break
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else ("or", nodes)

    def parse_and():
        nonlocal pos
        nodes = [parse_unary()]
        while peek() == "AND":
            pos += 1
            nodes.append(parse_unary())
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else ("and", nodes)

    def parse_unary():
        nonlocal pos
        t = peek()
        if t is None or t in (")", "AND", "OR"):
            raise QueryParseError(f"expected a clause, got {t!r} in {q!r}")
        if t == "NOT":
            pos += 1
            child = parse_unary()
            # a NOT over an analyzed-to-nothing token is vacuous
            return None if child is None else ("not", child)
        if t == "(":
            pos += 1
            node = parse_expr()
            if peek() != ")":
                raise QueryParseError(f"unbalanced '(' in {q!r}")
            pos += 1
            nxt = peek()
            if nxt is not None and re.fullmatch(r"\^\d+(?:\.\d+)?", nxt):
                # group boost `(a OR b)^2`
                pos += 1
                if node is not None:
                    node = ("boost", node, float(nxt[1:]))
            return node
        pos += 1
        return _bool_leaf(t)

    tree = parse_expr()
    if pos < len(toks):
        raise QueryParseError(f"unbalanced ')' in {q!r}")
    return tree


def tree_terms(node, polarity: bool | None = None, _neg: bool = False) -> set[str]:
    """Term-leaf strings of a tree.  ``polarity=True`` → only leaves in
    positive polarity (under an even number of NOTs — the scoring
    terms), ``False`` → only negative-polarity leaves, ``None`` → all."""
    if node is None:
        return set()
    kind = node[0]
    if kind == "term":
        return {node[1]} if polarity is None or polarity != _neg else set()
    if kind in ("and", "or"):
        out: set[str] = set()
        for c in node[1]:
            out |= tree_terms(c, polarity, _neg)
        return out
    if kind == "not":
        return tree_terms(node[1], polarity, not _neg)
    if kind == "boost":
        return tree_terms(node[1], polarity, _neg)
    return set()  # prefix/wildcard/fuzzy (pre-expansion) and filter leaves


def tree_boost_mults(node, _mult: float = 1.0, _neg: bool = False, _out=None):
    """Per-term upper-bound multiplier: Σ over the term's
    POSITIVE-polarity occurrences of the product of boosts along each
    occurrence's path.  A doc matching several occurrences scores each
    one (an OR sums its matching children), so the summed products bound
    the term's total contribution — the block-max pruning bound must use
    this, not a bare idf, or boosted/duplicated terms overrun it."""
    out = {} if _out is None else _out
    if node is None:
        return out
    kind = node[0]
    if kind == "term":
        if not _neg:
            out[node[1]] = out.get(node[1], 0.0) + _mult
        return out
    if kind == "boost":
        return tree_boost_mults(node[1], _mult * node[2], _neg, out)
    if kind == "not":
        return tree_boost_mults(node[1], _mult, not _neg, out)
    if kind in ("and", "or"):
        for c in node[1]:
            tree_boost_mults(c, _mult, _neg, out)
    return out


def tree_multiterm_leaves(node) -> bool:
    """True when the tree still holds unexpanded prefix/wildcard/fuzzy
    leaves (the engine's dictionary rewrite replaces them)."""
    if node is None:
        return False
    kind = node[0]
    if kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        return True
    if kind in ("and", "or"):
        return any(tree_multiterm_leaves(c) for c in node[1])
    if kind in ("not", "boost"):
        return tree_multiterm_leaves(node[1])
    return False


def _tree_possible(node) -> set[bool]:
    """Possible truth values when every term-ish leaf is False (the doc
    contains none of the query's terms) and filter leaves range free."""
    kind = node[0]
    if kind in ("term", "prefix", "wildcard", "fuzzy", "regexp"):
        return {False}
    if kind == "filter":
        return {True, False}
    if kind == "boost":
        return _tree_possible(node[1])
    if kind == "not":
        return {not v for v in _tree_possible(node[1])}
    sets = [_tree_possible(c) for c in node[1]]
    if kind == "and":
        out = set()
        if all(True in s for s in sets):
            out.add(True)
        if any(False in s for s in sets):
            out.add(False)
        return out
    out = set()
    if any(True in s for s in sets):
        out.add(True)
    if all(False in s for s in sets):
        out.add(False)
    return out


def check_tree_grounded(node) -> None:
    """Raise unless the tree is grounded (unsatisfiable by a doc that
    contains none of its term leaves) — see the grammar notes above."""
    if node is not None and True in _tree_possible(node):
        raise QueryParseError(
            "boolean query is not grounded: it can match documents "
            "containing none of its terms (e.g. a pure-negative or "
            "filter-only branch reachable at the top level)"
        )


def _tree_required_groups(node) -> list[frozenset[str]]:
    """Conjunctive term-presence requirements of a boolean tree: a list
    of groups such that ANY matching doc contains ≥1 term of EVERY
    group.  Sound, not complete — negative/filter branches contribute
    nothing (``[]`` = no requirement), an OR requires one group only
    when every child carries a requirement (then: the union of one
    group per child — a doc matching some child satisfies that child's
    groups, in particular its first)."""
    kind = node[0]
    if kind == "term":
        return [frozenset((node[1],))]
    if kind == "boost":
        return _tree_required_groups(node[1])
    if kind == "and":
        out: list[frozenset[str]] = []
        for c in node[1]:
            out.extend(_tree_required_groups(c))
        return out
    if kind == "or":
        kids = [_tree_required_groups(c) for c in node[1]]
        if not kids or any(not k for k in kids):
            return []
        return [frozenset().union(*(k[0] for k in kids))]
    # "not" (presence of the negated term is never REQUIRED), "filter"
    # (docstore predicate, no index term), unexpanded multi-term leaves
    # (conservative: unknown expansion)
    return []


def required_term_groups(q: "ParsedQuery") -> list[frozenset[str]]:
    """Term-presence requirements of a PREPARED query (multi-term
    clauses already dictionary-expanded) — the coordinator's
    ``can_match`` evidence.  Every group is a set of index terms of
    which any matching doc must contain at least one; a shard whose
    term dictionary intersects no member of some group cannot hold a
    match.  An EMPTY group means no doc anywhere can match (e.g. a
    term-free flat query: engine candidates are the union of
    scoring-term postings — ``Searcher._match_ids``/``_score`` — so no
    terms ⇒ no candidates).  An empty LIST means "no usable evidence,
    search every shard"."""
    if q.bool_tree is not None:
        # grounded trees (check_tree_grounded, enforced at evaluation)
        # cannot match a doc containing none of the tree's term leaves
        base = frozenset(tree_terms(q.bool_tree))
        if not base:
            return []  # ungrounded/filter-only tree: no pruning
        return [base] + _tree_required_groups(q.bool_tree)
    groups: list[frozenset[str]] = []
    base = frozenset(q.should) | frozenset(q.must)
    if base:
        groups.append(base)
    for t in q.must:
        groups.append(frozenset((t,)))
    for grp in q.must_any:
        groups.append(frozenset(grp))
    for _cterms, stem in q.phrase_prefixes:
        # prepared phrase-prefix stems are frozensets of expansion
        # terms; the prefix POSITION must match one of them (complete
        # terms are already MUST).  An unprepared str stem yields no
        # evidence.
        if isinstance(stem, frozenset):
            groups.append(stem)
    if not groups:
        # term-free flat query (pure filter context): the engine's
        # candidate stream is empty — mirror that exactly
        groups.append(frozenset())
    return groups


def tree_to_string(node) -> str:
    """Canonical printable form with minimal parentheses (AND binds
    tighter than OR; NOT is prefix)."""
    if node is None:
        return ""
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "prefix":
        return node[1] + "*"
    if kind == "wildcard":
        return node[1]
    if kind == "regexp":
        return f"/{node[1]}/"
    if kind == "fuzzy":
        return f"{node[1]}~{node[2]}"
    if kind == "filter":
        pred = node[1]
        if pred[0] == "eq":
            f, v = pred[1], pred[2]
            return f'{f}:"{v}"' if " " in v else f"{f}:{v}"
        if pred[0] == "exists":
            return f"_exists_:{pred[1]}"
        if pred[0] == "match":
            return f"{pred[1]}.text:{pred[2]}"
        return _range_str(pred[1:], neg=False)
    if kind == "boost":
        inner = tree_to_string(node[1])
        if node[1][0] in ("and", "or", "not"):
            inner = f"({inner})"
        f = node[2]
        return f"{inner}^{int(f) if f == int(f) else f}"
    if kind == "not":
        inner = tree_to_string(node[1])
        if node[1][0] in ("and", "or"):
            inner = f"({inner})"
        return f"NOT {inner}"
    sep = " AND " if kind == "and" else " OR "
    parts = []
    for c in node[1]:
        s = tree_to_string(c)
        # an OR child of an AND needs parens (AND binds tighter)
        if kind == "and" and c[0] == "or":
            s = f"({s})"
        parts.append(s)
    return sep.join(parts)


def parse_query(q: str) -> ParsedQuery:
    stripped = _REGEXP_SPAN_RE.sub(" ", _QUOTED_RE.sub(" ", q or ""))
    if _BOOL_TRIGGER_RE.search(stripped):
        tree = _parse_bool_tree(q or "")
        check_tree_grounded(tree)
        return ParsedQuery(bool_tree=tree)
    out = ParsedQuery()
    for m in _CLAUSE_RE.finditer(q or ""):
        op, body, quoted = m.group(1), m.group(2), m.group(3)
        slop = None
        if m.group(4):
            suf = m.group(4)[1:]  # strip '~'
            if suf.startswith("u"):
                slop = encode_unordered_slop(int(suf[1:]))
            else:
                slop = int(suf)
        text = quoted if quoted is not None else body
        if quoted is None:
            em = _EXISTS_RE.match(body)
            if em is not None:
                # `_exists_:field` — filter context; `-` excludes docs
                # where the column is non-null
                (out.not_exists_filters if op == "-" else out.exists_filters).append(
                    em.group(1)
                )
                continue
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
                    if km.group(1).endswith(".text"):
                        spec = _match_clause(km.group(1), val)
                        if op == "-":
                            out.not_match_filters.append(spec)
                        else:
                            out.match_filters.append(spec)
                    elif op == "-":
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
        if (
            quoted is None
            and len(body) > 2
            and body.startswith("/")
            and body.endswith("/")
        ):
            # Lucene regexp clause `/pat/`: anchored term-dictionary
            # expansion (validated at expansion time); literal chars
            # lowercase, backslash escapes preserved
            pat = lower_regex_pattern(body[1:-1])
            if op == "-":
                out.not_regexps.append(pat)
            elif op == "+":
                out.must_regexps.append(pat)
            else:
                out.regexps.append(pat)
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
        if quoted is not None and slop is None and text.rstrip().endswith("*"):
            # phrase-prefix `"quick bro*"` (ES match_phrase_prefix):
            # complete terms adjacent, then any term with the stem
            words = text.split()
            stem = tokenize_text(words[-1][:-1] if words else "")
            rest = tokenize_text(" ".join(words[:-1]))
            if len(stem) == 1 and rest:
                if op == "-":
                    out.not_phrase_prefixes.append((tuple(rest), stem[0]))
                else:
                    out.phrase_prefixes.append((tuple(rest), stem[0]))
                    out.must.extend(rest)
                continue
            if len(stem) == 1 and not rest:
                # single-word quoted prefix degrades to a prefix clause
                if op == "-":
                    out.not_prefixes.append(stem[0])
                elif op == "+":
                    out.must_prefixes.append(stem[0])
                else:
                    out.prefixes.append(stem[0])
                continue
            # multi-token stem or empty → fall through to plain terms
        terms = tokenize_text(text)
        if not terms:
            continue
        if quoted is not None and len(terms) >= 2:
            if slop:
                # sloppy phrase `"a b"~N`: ordered within a window
                if op == "-":
                    out.not_sloppy_phrases.append((tuple(terms), slop))
                else:
                    out.sloppy_phrases.append((tuple(terms), slop))
                    out.must.extend(terms)
            elif op == "-":
                # exclude docs containing the phrase; the bare words alone
                # do NOT exclude
                out.not_phrases.append(tuple(terms))
            else:
                # phrase implies every term present → MUST; adjacency is
                # verified by the engine's phrase filter (`~0` ≡ exact)
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
