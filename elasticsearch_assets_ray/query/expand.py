"""Multi-term query expansion kernels — wildcard patterns and fuzzy
(edit-distance) matching against the index term dictionary.

The reference hands ``query_string`` clauses like ``t?ble`` and
``spark~1`` to Lucene (reference utils.ts:94-100); our native engine
expands them against its own term dictionary and scores the expansion
terms individually (Lucene's scoring rewrite of multi-term queries),
exactly like the trailing-star prefix path (query/engine.py
``_rewrite_multiterm``).

Divergence note (documented): fuzzy distance is PLAIN Levenshtein
(insert/delete/substitute, each cost 1).  Modern Lucene's FuzzyQuery
counts a transposition as ONE edit (Damerau/OSA); classic Lucene and
DuckDB's ``levenshtein()`` — our SQL oracle — count it as two.  Plain
Levenshtein keeps the engine bit-identical to the oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# the analyzer's token alphabet (stages/tokenizer.py: [a-z0-9]+ runs)
_TERM_ALPHABET = "a-z0-9"
_WILDCARD_OK = re.compile(r"^[a-z0-9*?]+$")


def is_wildcard_pattern(s: str) -> bool:
    """True when ``s`` (already lowercased) is a valid wildcard clause:
    term-alphabet literals plus ``*``/``?``, with at least one literal
    character (a bare ``*``/``?``/``**`` match-all is rejected — the
    deterministic analog of Lucene's leading-wildcard guard)."""
    return bool(_WILDCARD_OK.match(s)) and bool(re.search(r"[a-z0-9]", s))


def wildcard_regex(pattern: str) -> str:
    """Anchored RE2 regex for a Lucene wildcard pattern (``*`` = any run
    of term characters, ``?`` = exactly one).  The same regex string runs
    through pyarrow (engine side) and DuckDB ``regexp_matches`` (oracle
    side) — both RE2, identical semantics."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(f"[{_TERM_ALPHABET}]*")
        elif ch == "?":
            out.append(f"[{_TERM_ALPHABET}]")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def wildcard_literal_prefix(pattern: str) -> str:
    """The literal run before the first wildcard — used to narrow the
    term-dictionary scan to a sorted range before the regex pass."""
    m = re.match(r"^[a-z0-9]*", pattern)
    return m.group(0) if m else ""


def _char_matrix(terms: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(N, L) uint8 char-code matrix (0-padded) + per-term lengths for an
    ASCII Arrow string array — one vectorized scatter, no per-term Python
    loop (terms are analyzer output: ``[a-z0-9]+``, always ASCII)."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return np.zeros((0, 0), dtype=np.uint8), np.zeros(0, dtype=np.int64)
    offs = np.frombuffer(terms.buffers()[1], dtype=np.int32)[
        terms.offset : terms.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(terms.buffers()[2] or b"", dtype=np.uint8)
    lens = np.diff(offs)
    length = int(lens.max()) if n else 0
    mat = np.zeros((n, length), dtype=np.uint8)
    cols = np.arange(length)
    valid = cols < lens[:, None]
    mat[valid] = data[(offs[:-1, None] + cols)[valid]]
    return mat, lens


def levenshtein_batch(query: str, terms: pa.Array) -> np.ndarray:
    """Plain Levenshtein distance from ``query`` to every term of an
    Arrow string array, vectorized over terms: the DP advances one
    (query-char, term-position) cell per numpy op — O(|q|·L) vector ops
    over all N candidates at once, no per-term Python."""
    mat, lens = _char_matrix(terms)
    n, length = mat.shape
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    q = np.frombuffer(query.encode("ascii", "replace"), dtype=np.uint8)
    m = q.size
    prev = np.broadcast_to(np.arange(length + 1, dtype=np.int64), (n, length + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (mat != q[i - 1]).astype(np.int64)
        dele = prev[:, 1:] + 1
        best = np.minimum(sub, dele)
        # insertion (left neighbor) has a sequential dependency along the
        # term axis; L is a term length (≤ a few dozen), so this inner
        # loop is L vector ops over all N candidates
        for j in range(1, length + 1):
            cur[:, j] = np.minimum(best[:, j - 1], cur[:, j - 1] + 1)
        prev = cur
    return prev[np.arange(n), lens]


def damerau_levenshtein(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein distance (insert / delete /
    substitute / transpose-adjacent, transposed blocks may be edited
    again) — the classic last-occurrence DP.  Pinned to agree with
    DuckDB's ``damerau_levenshtein`` (property-tested), so the fuzzy
    transposition oracle is equality-by-construction.  Lucene's
    transposition automata implement the same primitive-transposition
    distance."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    maxd = la + lb
    # d has a sentinel row/col of maxd at index 0; string index i maps
    # to d row i+1
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            i_ = last_row.get(b[j - 1], 0)
            j_ = last_col
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                last_col = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                # transpose a[i_-1..i-1] with b[j_-1..j-1]
                d[i_][j_] + (i - i_ - 1) + 1 + (j - j_ - 1),
            )
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


def fuzzy_mask(
    query: str, terms: pa.Array, max_edits: int, transpositions: bool = False
) -> np.ndarray:
    """Boolean mask of terms within ``max_edits`` edits of ``query``.
    Default metric is plain Levenshtein; ``transpositions=True`` uses
    Damerau-Levenshtein (adjacent transposition = ONE edit — Lucene /
    ES ``fuzzy_transpositions`` semantics, and ES's default).

    A length pre-band (||t|-|q|| ≤ n) prunes the DP input first — cheap
    and exact (length difference lower-bounds BOTH metrics).  The
    transposition path stays vectorized-first: DL ≤ plain Levenshtein ≤
    2·DL (a transposition is two plain edits), so the vectorized plain
    DP at threshold 2n yields a complete candidate superset and the
    exact per-pair DL runs only on those few survivors."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=bool)
    import pyarrow.compute as pc

    lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
    band = np.abs(lens - len(query)) <= max_edits
    out = np.zeros(n, dtype=bool)
    idx = np.flatnonzero(band)
    if idx.size == 0:
        return out
    cand = terms.take(pa.array(idx, type=pa.int64()))
    plain = levenshtein_batch(query, cand)
    if not transpositions:
        out[idx] = plain <= max_edits
        return out
    hit = plain <= max_edits  # DL ≤ plain: these are already in
    near = np.flatnonzero(~hit & (plain <= 2 * max_edits))
    if near.size:
        cl = cand.to_pylist()
        for k in near:
            if damerau_levenshtein(query, cl[int(k)]) <= max_edits:
                hit[k] = True
    out[idx] = hit
    return out


_REGEX_META = set(".?*+()[]{}|\\^$")


def regex_literal_prefix(pattern: str) -> str:
    """Leading literal run of a regex (chars before the first
    metacharacter) — narrows the term-dictionary scan to a sorted range,
    the same cost model as the wildcard literal prefix.  Conservative:
    a literal followed by `?`/`*`/`{` drops its last char too (that
    char is optional/repeated, so it may not appear), and ANY top-level
    alternation (`table|scan`) voids the prefix entirely — the leading
    literal is only mandatory for the first alternative."""
    if "|" in pattern:
        return ""
    lit = []
    for i, c in enumerate(pattern):
        if c in _REGEX_META:
            if c in "?*{" and lit:
                lit.pop()
            break
        lit.append(c)
    return "".join(lit)


def lower_regex_pattern(pattern: str) -> str:
    """Lowercase a regex pattern's LITERAL characters while leaving
    backslash escapes untouched — plain ``.lower()`` would corrupt
    ``\\D``/``\\W``/``\\S``/``\\B`` into their inverted classes."""
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(c)
            out.append(pattern[i + 1])
            i += 2
            continue
        out.append(c.lower())
        i += 1
    return "".join(out)
