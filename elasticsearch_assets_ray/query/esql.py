"""ES|QL — Elasticsearch's piped query language, compiled onto Ray Data.

ES|QL (GA in Elasticsearch 8.14; the reference's users are migrating
their search/agg bodies to it) is a pipe language: ``FROM index | WHERE
... | EVAL ... | STATS ... BY ... | SORT ... | LIMIT n``.  The reference
delegates all query execution to ES
(ElasticsearchReaderClient.ts:53-86); here each pipe command lowers onto
a Ray Data primitive:

- ``FROM``        → column-pruned ``read_parquet`` — only the columns
                    the pipe references leave storage
- ``WHERE``       → vectorized boolean mask inside ``map_batches``
                    (pyarrow compute kernels, Kleene 3-valued logic)
- ``EVAL``        → appended/replaced columns in the same pass
- ``STATS .. BY`` → combiner-first :func:`partial_agg` (the shuffle
                    moves per-batch partials, never rows);
                    COUNT_DISTINCT / MEDIAN / PERCENTILE run as bounded
                    (keys, value)-dedup side branches
- ``LOOKUP JOIN`` → broadcast hash join (``ray.put`` once, zero-copy
                    plasma read per task).  ES requires lookup indexes
                    to be single-node small — exactly the broadcast
                    contract
- ``SORT``+``LIMIT`` → streaming per-batch top-k prune + one driver
                    k-merge (:func:`topk`) — never a full distributed
                    sort.  ES|QL's implicit final ``LIMIT 1000`` is
                    applied when no explicit LIMIT follows, so an
                    unbounded SORT is impossible by construction
- ``MATCH(field, q)`` → analyzed-token membership filter through the
                    canonical tokenizer chain, evaluated per batch —
                    ES|QL filter context (no scores), composable
                    anywhere in the pipe

Determinism contracts (the repo-wide oracle conventions):

- integer sums/counts are exact and association-order independent;
  money rides EVAL-ed cents ``TO_LONG(ROUND(x * 100))`` with ROUND
  half-away-from-zero (= SQL ``round()``; Arrow's default half-to-even
  diverges on exact .5 doubles)
- MEDIAN / PERCENTILE are EXACT (linear interpolation, the SQL
  ``quantile_cont`` convention) where ES t-digests, and COUNT_DISTINCT
  is exact where ES switches to HLL sketches — both are documented
  strengthenings of the ES contract
- AVG divides once, in the finalizer, in float64 (sum and non-null
  count merge as integers/partials first)

Documented divergences from ES|QL, all deliberate:

- STATS/EVAL outputs must be explicitly named (``n = COUNT(*)``);
  ES|QL would name the column by its source text
- no multivalue columns / MV_* functions in v1
- ``DATE_FORMAT`` takes strftime patterns, not Java DateTimeFormatter
- SORT places nulls last on both ASC and DESC by default (= DuckDB);
  ES|QL treats null as the largest value (nulls FIRST under DESC).
  ``NULLS FIRST`` / ``NULLS LAST`` are honored when given uniformly.
- unknown ``{{param}}``-less mustache handling etc. is out of scope;
  templates render through query/templates.py upstream of this parser
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

IMPLICIT_LIMIT = 1000  # ES|QL's default result cap

# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "FROM", "ROW", "WHERE", "EVAL", "STATS", "BY", "SORT", "LIMIT", "KEEP",
    "DROP", "RENAME", "AS", "ASC", "DESC", "NULLS", "FIRST", "LAST", "AND",
    "OR", "NOT", "IN", "LIKE", "RLIKE", "IS", "NULL", "TRUE", "FALSE",
    "LOOKUP", "JOIN", "ON", "METADATA", "DISSECT", "GROK", "MV_EXPAND",
    "FORK", "ENRICH", "WITH", "SAMPLE", "SEED", "CHANGE_POINT",
    "INLINESTATS",
}

_DURATION_UNITS = {
    "year", "years", "quarter", "quarters", "month", "months", "week",
    "weeks", "day", "days", "hour", "hours", "minute", "minutes", "second",
    "seconds",
}

_TOKEN_RE = re.compile(
    r"""(?P<ws>\s+)
      | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
      | (?P<int>\d+)
      | (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<op>==|!=|<=|>=|\|\s*|[,()+\-*/%<>=])
    """,
    re.X,
)


@dataclass(frozen=True)
class Tok:
    kind: str  # KW IDENT INT FLOAT STRING OP EOF
    val: Any
    pos: int


def _lex(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ESQLSyntaxError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "float":
            toks.append(Tok("FLOAT", float(text), m.start()))
        elif kind == "int":
            toks.append(Tok("INT", int(text), m.start()))
        elif kind == "string":
            body = text[1:-1]
            body = re.sub(r"\\(.)", lambda g: {"n": "\n", "t": "\t"}.get(g.group(1), g.group(1)), body)
            toks.append(Tok("STRING", body, m.start()))
        elif kind == "ident":
            up = text.upper()
            if up in _KEYWORDS:
                toks.append(Tok("KW", up, m.start()))
            else:
                toks.append(Tok("IDENT", text, m.start()))
        else:
            op = text.strip()
            toks.append(Tok("OP", op, m.start()))
    toks.append(Tok("EOF", None, len(src)))
    return toks


class ESQLSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Lit:
    val: Any


@dataclass(frozen=True)
class Col:
    name: str


@dataclass(frozen=True)
class Star:
    pass


@dataclass(frozen=True)
class Duration:
    n: int
    unit: str  # singular: day, hour, ...


@dataclass(frozen=True)
class Bin:
    op: str
    l: Any
    r: Any


@dataclass(frozen=True)
class Un:
    op: str  # NOT, NEG
    e: Any


@dataclass(frozen=True)
class InList:
    e: Any
    items: tuple
    neg: bool


@dataclass(frozen=True)
class LikeRx:
    e: Any
    regex: str
    neg: bool


@dataclass(frozen=True)
class IsNull:
    e: Any
    neg: bool


@dataclass(frozen=True)
class Func:
    name: str
    args: tuple


class IdSet:
    """Plan-time replacement for an index-accelerated MATCH conjunct:
    membership of ``col`` in a precomputed id set (Arrow array in the
    closure — ships once per task with the serialized batch fn).  Plain
    class (not a frozen dataclass): the ids array is unhashable and the
    node never participates in equality."""

    def __init__(self, col: str, ids):
        self.col = col
        self.ids = ids


# commands
@dataclass(frozen=True)
class From:
    table: str


@dataclass(frozen=True)
class Row:
    assigns: tuple  # (name, expr)


@dataclass(frozen=True)
class Where:
    e: Any


@dataclass(frozen=True)
class Eval:
    assigns: tuple


@dataclass(frozen=True)
class AggItem:
    out: str
    func: str
    arg: Any  # expr | Star
    p: float | None = None  # PERCENTILE's percent
    arg2: Any = None  # WEIGHTED_AVG's weight expr
    n: int | None = None  # TOP's size
    order: str | None = None  # TOP's "asc"/"desc"


@dataclass(frozen=True)
class Stats:
    aggs: tuple
    by: tuple  # (name, expr)


@dataclass(frozen=True)
class InlineStats:
    stats: Stats


@dataclass(frozen=True)
class SortKey:
    col: str
    order: str  # ascending / descending
    nulls: str | None  # at_start / at_end / None


@dataclass(frozen=True)
class Sort:
    keys: tuple


@dataclass(frozen=True)
class Limit:
    n: int


@dataclass(frozen=True)
class Keep:
    cols: tuple


@dataclass(frozen=True)
class Drop:
    cols: tuple


@dataclass(frozen=True)
class Rename:
    pairs: tuple  # (old, new)


@dataclass(frozen=True)
class LookupJoin:
    table: str
    on: str


@dataclass(frozen=True)
class Dissect:
    col: str
    regex: str        # compiled from the dissect/grok pattern
    outs: tuple       # (name, cast_type or None)


@dataclass(frozen=True)
class MvExpand:
    col: str


@dataclass(frozen=True)
class Fork:
    branches: tuple  # tuple of command tuples


@dataclass(frozen=True)
class Enrich:
    policy: str
    on: str
    with_fields: tuple  # empty = all enrich fields


@dataclass(frozen=True)
class Sample:
    p: float
    on: str
    seed: int


@dataclass(frozen=True)
class ChangePointCmd:
    val: str
    key: str


# ---------------------------------------------------------------------------
# Parser (Pratt for expressions)
# ---------------------------------------------------------------------------

_CMP_OPS = {"==", "!=", "<", "<=", ">", ">="}
_AGG_FUNCS = {
    "COUNT", "COUNT_DISTINCT", "SUM", "AVG", "MIN", "MAX", "MEDIAN",
    "PERCENTILE", "STD_DEV", "WEIGHTED_AVG", "VALUES", "TOP",
}


class _Parser:
    def __init__(self, src: str):
        self.toks = _lex(src)
        self.i = 0

    def peek(self, ahead: int = 0) -> Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: Any = None) -> Tok:
        t = self.next()
        if t.kind != kind or (val is not None and t.val != val):
            raise ESQLSyntaxError(
                f"expected {val or kind} at {t.pos}, got {t.kind} {t.val!r}"
            )
        return t

    def at_kw(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.val in vals

    def at_op(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.val in vals

    # -- pipeline ----------------------------------------------------------
    def parse(self) -> list:
        cmds: list = [self.parse_source()]
        while self.at_op("|"):
            self.next()
            cmds.append(self.parse_command())
        self.expect("EOF")
        return cmds

    def parse_source(self):
        if self.at_kw("FROM"):
            self.next()
            name = self.expect("IDENT").val
            if self.at_kw("METADATA"):  # parsed, ignored (no _index/_id here)
                self.next()
                self.expect("IDENT")
            return From(name)
        if self.at_kw("ROW"):
            self.next()
            return Row(tuple(self.parse_assign_list()))
        raise ESQLSyntaxError("query must start with FROM or ROW")

    def parse_command(self):
        t = self.next()
        if t.kind != "KW":
            raise ESQLSyntaxError(f"expected a command at {t.pos}")
        if t.val == "WHERE":
            return Where(self.parse_expr())
        if t.val == "EVAL":
            return Eval(tuple(self.parse_assign_list()))
        if t.val == "STATS":
            return self.parse_stats()
        if t.val == "INLINESTATS":
            st = self.parse_stats()
            for name, e in st.by:
                if not (isinstance(e, Col) and e.name == name):
                    raise ESQLSyntaxError(
                        "INLINESTATS BY supports plain columns (EVAL the "
                        "expression first)"
                    )
            return InlineStats(st)
        if t.val == "SORT":
            return self.parse_sort()
        if t.val == "LIMIT":
            return Limit(int(self.expect("INT").val))
        if t.val == "KEEP":
            return Keep(tuple(self.parse_ident_list()))
        if t.val == "DROP":
            return Drop(tuple(self.parse_ident_list()))
        if t.val == "RENAME":
            pairs = []
            while True:
                old = self.expect("IDENT").val
                self.expect("KW", "AS")
                pairs.append((old, self.expect("IDENT").val))
                if not self.at_op(","):
                    break
                self.next()
            return Rename(tuple(pairs))
        if t.val == "LOOKUP":
            self.expect("KW", "JOIN")
            name = self.expect("IDENT").val
            self.expect("KW", "ON")
            return LookupJoin(name, self.expect("IDENT").val)
        if t.val == "DISSECT":
            col = self.expect("IDENT").val
            rx, outs = _compile_dissect(self.expect("STRING").val)
            return Dissect(col, rx, outs)
        if t.val == "GROK":
            col = self.expect("IDENT").val
            rx, outs = _compile_grok(self.expect("STRING").val)
            return Dissect(col, rx, outs)
        if t.val == "MV_EXPAND":
            return MvExpand(self.expect("IDENT").val)
        if t.val == "ENRICH":
            policy = self.expect("IDENT").val
            self.expect("KW", "ON")
            on = self.expect("IDENT").val
            fields: list[str] = []
            if self.at_kw("WITH"):
                self.next()
                fields = self.parse_ident_list()
            return Enrich(policy, on, tuple(fields))
        if t.val == "SAMPLE":
            pt = self.next()
            if pt.kind not in ("FLOAT", "INT"):
                raise ESQLSyntaxError("SAMPLE needs a probability")
            self.expect("KW", "ON")  # determinism divergence: keyed hash
            on = self.expect("IDENT").val
            seed = 0
            if self.at_kw("SEED"):
                self.next()
                seed = int(self.expect("INT").val)
            return Sample(float(pt.val), on, seed)
        if t.val == "CHANGE_POINT":
            val = self.expect("IDENT").val
            self.expect("KW", "ON")
            return ChangePointCmd(val, self.expect("IDENT").val)
        if t.val == "FORK":
            branches = []
            while self.at_op("("):
                self.next()
                cmds = [self.parse_command()]
                while self.at_op("|"):
                    self.next()
                    cmds.append(self.parse_command())
                self.expect("OP", ")")
                branches.append(tuple(cmds))
            if len(branches) < 2:
                raise ESQLSyntaxError("FORK needs at least two (branch) groups")
            return Fork(tuple(branches))
        raise ESQLSyntaxError(f"unknown command {t.val} at {t.pos}")

    def parse_ident_list(self) -> list[str]:
        out = [self._ident_or_pattern()]
        while self.at_op(","):
            self.next()
            out.append(self._ident_or_pattern())
        return out

    def _ident_or_pattern(self) -> str:
        """IDENT, optionally a trailing-star pattern (`lang*`) or a bare
        `*` — the ES|QL KEEP/DROP wildcard subset.  The lexer splits
        `a*` into IDENT + OP, so adjacency (token positions touch)
        distinguishes a pattern from multiplication."""
        if self.at_op("*"):
            self.next()
            return "*"
        t = self.expect("IDENT")
        nxt = self.peek()
        if (
            nxt.kind == "OP"
            and nxt.val == "*"
            and nxt.pos == t.pos + len(str(t.val))
        ):
            self.next()
            return str(t.val) + "*"
        return str(t.val)

    def parse_assign_list(self) -> list[tuple[str, Any]]:
        out = []
        while True:
            name = self.expect("IDENT").val
            self.expect("OP", "=")
            out.append((name, self.parse_expr()))
            if not self.at_op(","):
                return out
            self.next()

    def parse_stats(self) -> Stats:
        aggs = [self.parse_agg_item()]
        while self.at_op(","):
            self.next()
            aggs.append(self.parse_agg_item())
        by: list[tuple[str, Any]] = []
        if self.at_kw("BY"):
            self.next()
            while True:
                name = self.expect("IDENT").val
                if self.at_op("="):
                    self.next()
                    by.append((name, self.parse_expr()))
                else:
                    by.append((name, Col(name)))
                if not self.at_op(","):
                    break
                self.next()
        return Stats(tuple(aggs), tuple(by))

    def parse_agg_item(self) -> AggItem:
        out = self.expect("IDENT").val
        self.expect("OP", "=")
        fname = self.expect("IDENT").val.upper()
        if fname not in _AGG_FUNCS:
            raise ESQLSyntaxError(f"unknown aggregate {fname}")
        self.expect("OP", "(")
        p = None
        arg2 = None
        topn = None
        order = None
        if self.at_op("*"):
            self.next()
            arg: Any = Star()
            if fname != "COUNT":
                raise ESQLSyntaxError("only COUNT accepts *")
        else:
            arg = self.parse_expr()
            if fname == "PERCENTILE":
                self.expect("OP", ",")
                pt = self.next()
                if pt.kind not in ("INT", "FLOAT"):
                    raise ESQLSyntaxError("PERCENTILE needs a numeric percent")
                p = float(pt.val)
            elif fname == "WEIGHTED_AVG":
                self.expect("OP", ",")
                arg2 = self.parse_expr()
            elif fname == "TOP":
                self.expect("OP", ",")
                topn = int(self.expect("INT").val)
                self.expect("OP", ",")
                order = str(self.expect("STRING").val).lower()
                if order not in ("asc", "desc"):
                    raise ESQLSyntaxError("TOP order must be \"asc\" or \"desc\"")
        self.expect("OP", ")")
        return AggItem(out, fname, arg, p, arg2, topn, order)

    def parse_sort(self) -> Sort:
        keys = []
        while True:
            col = self.expect("IDENT").val
            order = "ascending"
            nulls = None
            if self.at_kw("ASC", "DESC"):
                order = "ascending" if self.next().val == "ASC" else "descending"
            if self.at_kw("NULLS"):
                self.next()
                t = self.next()
                if t.kind != "KW" or t.val not in ("FIRST", "LAST"):
                    raise ESQLSyntaxError("expected FIRST or LAST after NULLS")
                nulls = "at_start" if t.val == "FIRST" else "at_end"
            keys.append(SortKey(col, order, nulls))
            if not self.at_op(","):
                return Sort(tuple(keys))
            self.next()

    # -- expressions ---------------------------------------------------------
    def parse_expr(self, rbp: int = 0):
        left = self.parse_prefix()
        while True:
            t = self.peek()
            lbp = self._lbp(t)
            if lbp <= rbp:
                return left
            left = self.parse_infix(left)

    def _lbp(self, t: Tok) -> int:
        if t.kind == "KW":
            return {"OR": 10, "AND": 20, "IN": 30, "LIKE": 30, "RLIKE": 30,
                    "IS": 30, "NOT": 30}.get(t.val, 0)
        if t.kind == "OP":
            if t.val in _CMP_OPS:
                return 30
            if t.val in ("+", "-"):
                return 40
            if t.val in ("*", "/", "%"):
                return 50
        return 0

    def parse_prefix(self):
        t = self.next()
        if t.kind == "INT":
            nt = self.peek()
            if nt.kind == "IDENT" and nt.val.lower() in _DURATION_UNITS:
                self.next()
                return Duration(t.val, nt.val.lower().rstrip("s"))
            return Lit(t.val)
        if t.kind == "FLOAT":
            return Lit(t.val)
        if t.kind == "STRING":
            return Lit(t.val)
        if t.kind == "KW" and t.val in ("TRUE", "FALSE"):
            return Lit(t.val == "TRUE")
        if t.kind == "KW" and t.val == "NULL":
            return Lit(None)
        if t.kind == "KW" and t.val == "NOT":
            return Un("NOT", self.parse_expr(25))
        if t.kind == "OP" and t.val == "-":
            return Un("NEG", self.parse_expr(55))
        if t.kind == "OP" and t.val == "(":
            e = self.parse_expr()
            self.expect("OP", ")")
            return e
        if t.kind == "IDENT":
            if self.at_op("("):
                self.next()
                args = []
                if not self.at_op(")"):
                    args.append(self.parse_expr())
                    while self.at_op(","):
                        self.next()
                        args.append(self.parse_expr())
                self.expect("OP", ")")
                return Func(t.val.upper(), tuple(args))
            return Col(t.val)
        raise ESQLSyntaxError(f"unexpected token {t.val!r} at {t.pos}")

    def parse_infix(self, left):
        t = self.next()
        if t.kind == "KW":
            if t.val == "OR":
                return Bin("OR", left, self.parse_expr(10))
            if t.val == "AND":
                return Bin("AND", left, self.parse_expr(20))
            if t.val == "IN":
                return InList(left, self._paren_items(), False)
            if t.val == "LIKE":
                return LikeRx(left, _wildcard_rx(self.expect("STRING").val), False)
            if t.val == "RLIKE":
                return LikeRx(left, f"^(?:{self.expect('STRING').val})$", False)
            if t.val == "IS":
                neg = False
                if self.at_kw("NOT"):
                    self.next()
                    neg = True
                self.expect("KW", "NULL")
                return IsNull(left, neg)
            if t.val == "NOT":
                nt = self.next()
                if nt.kind == "KW" and nt.val == "IN":
                    return InList(left, self._paren_items(), True)
                if nt.kind == "KW" and nt.val == "LIKE":
                    return LikeRx(left, _wildcard_rx(self.expect("STRING").val), True)
                if nt.kind == "KW" and nt.val == "RLIKE":
                    return LikeRx(left, f"^(?:{self.expect('STRING').val})$", True)
                raise ESQLSyntaxError(f"expected IN/LIKE/RLIKE after NOT at {nt.pos}")
        if t.kind == "OP" and (t.val in _CMP_OPS or t.val in "+-*/%"):
            rbp = self._lbp(t)
            return Bin(t.val, left, self.parse_expr(rbp))
        raise ESQLSyntaxError(f"unexpected operator {t.val!r} at {t.pos}")

    def _paren_items(self) -> tuple:
        self.expect("OP", "(")
        items = [self.parse_expr()]
        while self.at_op(","):
            self.next()
            items.append(self.parse_expr())
        self.expect("OP", ")")
        return tuple(items)


_DISSECT_KEY_RE = re.compile(r"%\{([A-Za-z0-9_]*)\}")

#: the GROK pattern subset shipped (the ES-relevant core); each maps to a
#: regex fragment — %{NUMBER:name:int} adds an int64 cast
_GROK_PATTERNS = {
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "INT": r"[+-]?\d+",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
}


def _compile_dissect(pattern: str) -> tuple[str, tuple]:
    """ES DISSECT: literal delimiters + ``%{key}`` captures (``%{}``
    skips).  Compiled to one anchored regex with non-greedy captures —
    equivalent on non-ambiguous patterns, which is what DISSECT's strict
    splitting requires anyway."""
    out: list[tuple[str, Any]] = []
    parts: list[str] = []
    last = 0
    for i, m in enumerate(_DISSECT_KEY_RE.finditer(pattern)):
        parts.append(re.escape(pattern[last:m.start()]))
        name = m.group(1)
        if name:
            parts.append(f"(?P<{name}>.*?)")
            out.append((name, None))
        else:
            parts.append(r".*?")
        last = m.end()
    parts.append(re.escape(pattern[last:]))
    if not out:
        raise ESQLSyntaxError("DISSECT pattern has no %{key} captures")
    return "^" + "".join(parts) + "$", tuple(out)


def _compile_grok(pattern: str) -> tuple[str, tuple]:
    """ES GROK over the shipped pattern subset: ``%{SYNTAX:name[:type]}``
    (type ∈ int/long/float/double) plus raw regex in between."""
    out: list[tuple[str, Any]] = []

    def sub(m: re.Match) -> str:
        syntax, name, typ = m.group(1), m.group(2), m.group(3)
        if syntax not in _GROK_PATTERNS:
            raise ESQLSyntaxError(f"unknown grok pattern %{{{syntax}}}")
        if not name:
            return f"(?:{_GROK_PATTERNS[syntax]})"
        cast = None
        if typ in ("int", "long"):
            cast = pa.int64()
        elif typ in ("float", "double"):
            cast = pa.float64()
        out.append((name, cast))
        return f"(?P<{name}>{_GROK_PATTERNS[syntax]})"

    rx = re.sub(
        r"%\{([A-Z]+)(?::([A-Za-z0-9_]+))?(?::([a-z]+))?\}", sub, pattern
    )
    if not out:
        raise ESQLSyntaxError("GROK pattern has no named captures")
    return rx, tuple(out)


def _wildcard_rx(pat: str) -> str:
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


# ---------------------------------------------------------------------------
# Expression evaluation (vectorized, per Arrow batch)
# ---------------------------------------------------------------------------


def _arr(x) -> bool:
    return isinstance(x, (pa.Array, pa.ChunkedArray))


def _as_array(x, n: int) -> pa.Array | pa.ChunkedArray:
    if _arr(x):
        return x
    if isinstance(x, pa.Scalar):
        x = x.as_py()
    return pa.array([x] * n)


def _coerce_pair(l, r):
    """Minimal literal coercion: a string literal compared against a
    timestamp column parses as an ISO timestamp."""
    for a, b in ((l, r), (r, l)):
        if _arr(a) and pa.types.is_timestamp(a.type) and isinstance(b, str):
            ts = pa.scalar(np.datetime64(b), type=a.type)
            return (a, ts) if a is l else (ts, a)
    return l, r


def _null_mask(x) -> np.ndarray | None:
    if _arr(x):
        v = pc.is_null(x)
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        m = v.to_numpy(zero_copy_only=False)
        return m if m.any() else None
    return None


def _np_mod(l, r) -> pa.Array:
    """`%` — Arrow lacks a modulo kernel; numpy fmod keeps the dividend's
    sign (= Java/ES|QL), nulls re-applied from either input."""
    ml, mr = _null_mask(l), _null_mask(r)
    la = l.to_numpy(zero_copy_only=False) if _arr(l) else l
    ra = r.to_numpy(zero_copy_only=False) if _arr(r) else r
    out = np.fmod(la, ra)
    if np.ndim(out) == 0:  # scalar % scalar
        return pa.scalar(out.item())
    mask = None
    if ml is not None or mr is not None:
        mask = (ml if ml is not None else False) | (mr if mr is not None else False)
    return pa.array(out, mask=mask)


class Evaluator:
    """Compiles/evaluates an expression AST against an Arrow batch.
    MATCH() needs the analyzer chain; imported lazily so the parser has
    no Ray dependency."""

    def __init__(self):
        #: (field, query, op) → analyzed token list (MATCH re-evaluates
        #: per batch; the tokenization is shared)
        self._match_cache: dict[tuple, list[str]] = {}

    def ev(self, node, batch: pa.Table):
        n = batch.num_rows
        if isinstance(node, Lit):
            return node.val
        if isinstance(node, Col):
            if node.name not in batch.column_names:
                raise KeyError(f"unknown column {node.name!r}")
            return batch[node.name]
        if isinstance(node, Un):
            v = self.ev(node.e, batch)
            if node.op == "NEG":
                return pc.negate_checked(v) if _arr(v) else -v
            return pc.invert(_as_array(v, n).cast(pa.bool_())) if _arr(v) else (None if v is None else not v)
        if isinstance(node, Bin):
            return self._bin(node, batch)
        if isinstance(node, InList):
            v = self.ev(node.e, batch)
            items = [self.ev(i, batch) for i in node.items]
            res = pc.is_in(_as_array(v, n), value_set=pa.array(items))
            return pc.invert(res) if node.neg else res
        if isinstance(node, LikeRx):
            v = self.ev(node.e, batch)
            res = pc.match_substring_regex(_as_array(v, n), node.regex)
            return pc.invert(res) if node.neg else res
        if isinstance(node, IsNull):
            v = self.ev(node.e, batch)
            res = pc.is_null(_as_array(v, n))
            return pc.invert(res) if node.neg else res
        if isinstance(node, Func):
            return self._func(node, batch)
        if isinstance(node, IdSet):
            return pc.is_in(batch[node.col], value_set=node.ids)
        if isinstance(node, Duration):
            return node  # consumed by DATE_TRUNC
        raise TypeError(f"cannot evaluate {node!r}")

    def _bin(self, node: Bin, batch: pa.Table):
        op = node.op
        l = self.ev(node.l, batch)
        r = self.ev(node.r, batch)
        n = batch.num_rows
        if op in ("AND", "OR"):
            la = _as_array(l, n).cast(pa.bool_()) if _arr(l) or l is not None else pa.nulls(n, pa.bool_())
            ra = _as_array(r, n).cast(pa.bool_()) if _arr(r) or r is not None else pa.nulls(n, pa.bool_())
            return pc.and_kleene(la, ra) if op == "AND" else pc.or_kleene(la, ra)
        if op in _CMP_OPS:
            l, r = _coerce_pair(l, r)
            fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
                  "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
            return fn(l, r)
        if op == "+":
            return pc.add_checked(l, r)
        if op == "-":
            return pc.subtract_checked(l, r)
        if op == "*":
            return pc.multiply_checked(l, r)
        if op == "/":
            # Arrow divide on two integers is integer division truncated
            # toward zero — exactly Java/ES|QL `/`
            return pc.divide_checked(l, r)
        if op == "%":
            return _np_mod(l, r)
        raise ESQLSyntaxError(f"unknown operator {op}")

    # -- scalar functions ----------------------------------------------------
    def _func(self, node: Func, batch: pa.Table):
        name, args = node.name, node.args
        n = batch.num_rows
        if name == "MATCH":
            return self._match(node, batch)
        if name.startswith("MV_"):
            ev = [self.ev(a, batch) for a in args]
            return _mv_func(name, ev, n)
        if name == "CASE":
            return self._case(args, batch)
        if name == "DATE_TRUNC":
            unit_node, ts_node = args
            if isinstance(unit_node, Duration):
                if unit_node.n != 1:
                    raise ESQLSyntaxError("DATE_TRUNC supports 1-unit durations")
                unit = unit_node.unit
            else:
                unit = str(self.ev(unit_node, batch)).lower().rstrip("s")
            ts = self.ev(ts_node, batch)
            return pc.floor_temporal(ts, unit=unit)
        ev = [self.ev(a, batch) for a in args]
        if name == "ROUND":
            nd = int(ev[1]) if len(ev) > 1 else 0
            return pc.round(ev[0], ndigits=nd, round_mode="half_towards_infinity")
        if name == "ABS":
            return pc.abs_checked(ev[0])
        if name == "CEIL":
            return pc.ceil(ev[0])
        if name == "FLOOR":
            return pc.floor(ev[0])
        if name == "SQRT":
            return pc.sqrt_checked(ev[0])
        if name == "EXP":
            return pc.exp(ev[0])
        if name == "LOG":
            if len(ev) == 2:  # LOG(base, value)
                return pc.divide(pc.ln_checked(ev[1]), pc.ln_checked(_as_array(ev[0], n) if _arr(ev[0]) else pa.scalar(float(ev[0]))))
            return pc.ln_checked(ev[0])
        if name == "LOG10":
            return pc.log10_checked(ev[0])
        if name == "POW":
            return pc.power_checked(ev[0], ev[1])
        if name == "LENGTH":
            return pc.utf8_length(ev[0])
        if name == "SUBSTRING":
            start = int(ev[1])
            ln = int(ev[2]) if len(ev) > 2 else None
            if start > 0:
                s0 = start - 1
                s1 = s0 + ln if ln is not None else None
            else:  # negative start counts from the end (ES|QL)
                s0 = start
                s1 = start + ln if ln is not None and start + ln < 0 else None
            kw = {"start": s0}
            if s1 is not None:
                kw["stop"] = s1
            return pc.utf8_slice_codeunits(ev[0], **kw)
        if name == "CONCAT":
            parts = [_as_array(e, n) if not _arr(e) else e for e in ev]
            return pc.binary_join_element_wise(*parts, "")
        if name == "TO_UPPER":
            return pc.utf8_upper(ev[0])
        if name == "TO_LOWER":
            return pc.utf8_lower(ev[0])
        if name == "TRIM":
            return pc.utf8_trim_whitespace(ev[0])
        if name == "LTRIM":
            return pc.utf8_ltrim_whitespace(ev[0])
        if name == "RTRIM":
            return pc.utf8_rtrim_whitespace(ev[0])
        if name == "LEFT":
            return pc.utf8_slice_codeunits(ev[0], start=0, stop=int(ev[1]))
        if name == "RIGHT":
            return pc.utf8_slice_codeunits(ev[0], start=-int(ev[1]))
        if name == "REPLACE":  # regex replace, like ES|QL
            return pc.replace_substring_regex(ev[0], pattern=str(ev[1]), replacement=str(ev[2]))
        if name == "SPLIT":
            return pc.split_pattern(ev[0], pattern=str(ev[1]))
        if name == "STARTS_WITH":
            return pc.starts_with(ev[0], pattern=str(ev[1]))
        if name == "ENDS_WITH":
            return pc.ends_with(ev[0], pattern=str(ev[1]))
        if name == "LOCATE":
            return pc.add(pc.find_substring(ev[0], pattern=str(ev[1])), 1)
        if name == "REVERSE":
            return pc.utf8_reverse(ev[0])
        if name == "DATE_EXTRACT":
            part = str(ev[0]).lower()
            fn = {"year": pc.year, "month": pc.month, "day": pc.day,
                  "hour": pc.hour, "minute": pc.minute, "second": pc.second,
                  "day_of_week": pc.day_of_week, "day_of_year": pc.day_of_year}
            if part not in fn:
                raise ESQLSyntaxError(f"DATE_EXTRACT part {part!r} unsupported")
            return pc.cast(fn[part](ev[1]), pa.int64())
        if name == "DATE_FORMAT":
            return pc.strftime(ev[1], format=str(ev[0]))
        if name == "DATE_DIFF":
            unit = str(ev[0]).lower().rstrip("s")
            us = {"second": 1_000_000, "minute": 60_000_000,
                  "hour": 3_600_000_000, "day": 86_400_000_000}[unit]
            a = pc.cast(ev[1], pa.int64())
            b = pc.cast(ev[2], pa.int64())
            return pc.divide_checked(pc.subtract_checked(b, a), pa.scalar(us, pa.int64()))
        if name == "TO_LONG":
            return self._to_int(ev[0], pa.int64())
        if name == "TO_INTEGER":
            return self._to_int(ev[0], pa.int32())
        if name == "TO_DOUBLE":
            return pc.cast(ev[0], pa.float64())
        if name == "TO_STRING":
            return pc.cast(ev[0], pa.string())
        if name == "TO_DATETIME":
            return pc.cast(ev[0], pa.timestamp("us"))
        if name == "COALESCE":
            return pc.coalesce(*[_as_array(e, n) if not _arr(e) else e for e in ev])
        if name == "GREATEST":
            return pc.max_element_wise(*ev)
        if name == "LEAST":
            return pc.min_element_wise(*ev)
        raise ESQLSyntaxError(f"unknown function {name}")

    @staticmethod
    def _to_int(v, typ):
        if _arr(v) and pa.types.is_floating(v.type):
            # truncate toward zero (ES|QL TO_LONG(5.9) == 5)
            v = pc.trunc(v)
            return pc.cast(v, typ, safe=False)
        return pc.cast(v, typ) if _arr(v) else int(v)

    def _case(self, args: tuple, batch: pa.Table):
        n = batch.num_rows
        pairs = list(args)
        default = None
        if len(pairs) % 2 == 1:
            default = pairs.pop()
        out = self.ev(default, batch) if default is not None else None
        for i in range(len(pairs) - 2, -1, -2):
            cond = _as_array(self.ev(pairs[i], batch), n).cast(pa.bool_())
            val = self.ev(pairs[i + 1], batch)
            val = _as_array(val, n) if not _arr(val) else val
            if out is None:
                out = pc.if_else(cond, val, pa.nulls(n, val.type))
            else:
                out = pc.if_else(cond, val, _as_array(out, n) if not _arr(out) else out)
        return out

    # -- MATCH ----------------------------------------------------------------
    def _match(self, node: Func, batch: pa.Table):
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_column, tokenize_text

        if not isinstance(node.args[0], Col) or not isinstance(node.args[1], Lit):
            raise ESQLSyntaxError("MATCH(field, \"query\"[, \"operator\"]) needs a column and a literal")
        field = node.args[0].name
        query = str(node.args[1].val)
        op = "or"
        if len(node.args) > 2:
            op = str(node.args[2].val).lower()
        ck = (field, query, op)
        if ck in self._match_cache:
            qtoks = self._match_cache[ck]
        else:
            qtoks = sorted(set(tokenize_text(query)))
            self._match_cache[ck] = qtoks
        if not qtoks:
            return pa.array(np.zeros(batch.num_rows, dtype=bool))
        toks = tokenize_column(batch[field]).fill_null([])
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values
        if op == "or":
            hit = pc.is_in(flat, value_set=pa.array(qtoks)).to_numpy(zero_copy_only=False)
            return pa.array(_segment_any(hit, off))
        acc = None
        for t in qtoks:  # AND: every query term present (few terms, one pass each)
            hit = pc.equal(flat, t).fill_null(False).to_numpy(zero_copy_only=False)
            seg = _segment_any(hit, off)
            acc = seg if acc is None else (acc & seg)
        return pa.array(acc)


def _mv_func(name: str, ev: list, n: int):
    """ES|QL MV_* multivalue functions over list columns (a non-list
    input is ES's single-value multivalue: COUNT=1, FIRST/LAST/MIN/MAX/
    SUM/AVG = identity).  Per-list reductions are offset arithmetic +
    np reduceat — no Python loop over rows; empty/null lists → null."""
    v = ev[0]
    v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
    if not (_arr(v) and pa.types.is_list(v.type)):
        if name == "MV_COUNT":
            a = _as_array(v, n)
            return pc.if_else(
                pc.is_valid(a), pa.scalar(1, pa.int64()), pa.nulls(n, pa.int64())
            )
        if name in ("MV_FIRST", "MV_LAST", "MV_MIN", "MV_MAX", "MV_SUM", "MV_AVG"):
            return v
        if name == "MV_JOIN":
            return pc.cast(_as_array(v, n), pa.string())
        raise ESQLSyntaxError(f"unknown function {name}")
    lst = v.fill_null([])
    null_in = pc.is_null(v).to_numpy(zero_copy_only=False)
    off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    empty = (lens == 0) | null_in
    if name == "MV_COUNT":
        out = lens.astype(np.int64)
        return pa.array(out, mask=empty)
    if name == "MV_JOIN":
        delim = str(ev[1]) if len(ev) > 1 else ","
        slst = lst if pa.types.is_string(lst.type.value_type) else pc.cast(
            lst, pa.list_(pa.string())
        )
        joined = pc.binary_join(slst, pa.scalar(delim))
        return pc.if_else(pa.array(~empty), joined, pa.nulls(len(lens), pa.string()))
    if name in ("MV_FIRST", "MV_LAST"):
        pos = off[:-1] if name == "MV_FIRST" else np.maximum(off[1:] - 1, 0)
        pos = np.where(empty, 0, pos)
        if len(lst.values) == 0:
            return pa.nulls(len(lens), lst.type.value_type)
        picked = lst.values.take(pa.array(pos, pa.int64()))
        return pc.if_else(pa.array(~empty), picked, pa.nulls(len(lens), picked.type))
    # numeric reductions
    vals = lst.values.to_numpy(zero_copy_only=False).astype(np.float64)
    nonempty = ~empty
    out = np.full(len(lens), np.nan)
    if vals.size and nonempty.any():
        starts = off[:-1][nonempty]
        if name == "MV_SUM":
            out[nonempty] = np.add.reduceat(vals, starts)
        elif name == "MV_AVG":
            out[nonempty] = np.add.reduceat(vals, starts) / lens[nonempty]
        elif name == "MV_MIN":
            out[nonempty] = np.minimum.reduceat(vals, starts)
        elif name == "MV_MAX":
            out[nonempty] = np.maximum.reduceat(vals, starts)
        else:
            raise ESQLSyntaxError(f"unknown function {name}")
    elif name not in ("MV_SUM", "MV_AVG", "MV_MIN", "MV_MAX"):
        raise ESQLSyntaxError(f"unknown function {name}")
    res = pa.array(out, mask=empty)
    if name in ("MV_SUM", "MV_MIN", "MV_MAX") and pa.types.is_integer(
        lst.type.value_type
    ):
        return pc.cast(res, pa.int64(), safe=False)
    return res


def _segment_any(mask: np.ndarray, off: np.ndarray) -> np.ndarray:
    """any(mask) per list segment given list offsets (empty → False)."""
    n = off.size - 1
    out = np.zeros(n, dtype=bool)
    nonempty = off[:-1] < off[1:]
    if nonempty.any() and mask.size:
        red = np.bitwise_or.reduceat(mask, off[:-1][nonempty])
        out[nonempty] = red
    return out


# ---------------------------------------------------------------------------
# Column analysis
# ---------------------------------------------------------------------------


def _expr_cols(node, out: set[str]):
    if isinstance(node, Col):
        out.add(node.name)
    elif isinstance(node, IdSet):
        out.add(node.col)
    elif isinstance(node, Bin):
        _expr_cols(node.l, out)
        _expr_cols(node.r, out)
    elif isinstance(node, Un):
        _expr_cols(node.e, out)
    elif isinstance(node, (InList, LikeRx, IsNull)):
        _expr_cols(node.e, out)
        if isinstance(node, InList):
            for i in node.items:
                _expr_cols(i, out)
    elif isinstance(node, Func):
        for a in node.args:
            _expr_cols(a, out)


def referenced_columns(cmds: list) -> set[str]:
    cols: set[str] = set()
    for c in cmds:
        if isinstance(c, Where):
            _expr_cols(c.e, cols)
        elif isinstance(c, (Eval, Row)):
            for _, e in c.assigns:
                _expr_cols(e, cols)
        elif isinstance(c, (Stats, InlineStats)):
            st = c.stats if isinstance(c, InlineStats) else c
            for a in st.aggs:
                if not isinstance(a.arg, Star):
                    _expr_cols(a.arg, cols)
                if a.arg2 is not None:
                    _expr_cols(a.arg2, cols)
            for _, e in st.by:
                _expr_cols(e, cols)
        elif isinstance(c, Sort):
            cols.update(k.col for k in c.keys)
        elif isinstance(c, Keep):
            cols.update(e for e in c.cols if not e.endswith("*"))
        elif isinstance(c, Rename):
            cols.update(o for o, _ in c.pairs)
        elif isinstance(c, LookupJoin):
            cols.add(c.on)
        elif isinstance(c, Dissect):
            cols.add(c.col)
        elif isinstance(c, MvExpand):
            cols.add(c.col)
        elif isinstance(c, Fork):
            for branch in c.branches:
                cols |= referenced_columns(list(branch))
        elif isinstance(c, Enrich):
            cols.add(c.on)
        elif isinstance(c, Sample):
            cols.add(c.on)
        elif isinstance(c, ChangePointCmd):
            cols.add(c.val)
            cols.add(c.key)
    return cols


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


def esql(
    query: str,
    tables: dict[str, Any],
    *,
    stats_hint: int | None = None,
    enrich_policies: dict[str, dict] | None = None,
    indexes: dict[str, dict] | None = None,
):
    """Compile and run an ES|QL pipe; returns a ``ray.data.Dataset``.

    ``tables`` maps index names to parquet paths (column-pruned read) or
    live Datasets.  ``stats_hint``: expected group cardinality for STATS
    (threaded into :func:`partial_agg`'s driver-fold fast path for
    low-cardinality aggregates).  ``enrich_policies`` registers ENRICH
    policies: name → {"table": path-or-Dataset, "match_field": col,
    "enrich_fields": [cols]} (the ES enrich-policy `_execute` output is
    the lookup table here).  ``indexes`` registers fulltext indexes for
    MATCH pushdown: table → {"dir": index_dir, "field": content col,
    "key": source id col} — a top-level MATCH conjunct on that field
    resolves ONCE through the index's score-free ``match_ids`` (no
    per-batch tokenization; exactly how ES|QL itself serves MATCH) and
    becomes an id-membership filter; other conjuncts evaluate as usual.
    Semantics identical to the scan path (pinned by tests)."""
    import ray.data

    from elasticsearch_assets_ray.stages.relational import broadcast_join, topk

    cmds = _Parser(query).parse()
    src = cmds[0]
    body = list(cmds[1:])
    if indexes and isinstance(src, From) and src.table in indexes:
        body = _pushdown_match(body, indexes[src.table])
    # prune against the REWRITTEN body: a pushed-down MATCH releases the
    # content column from the scan and pins the key column instead
    needed = referenced_columns(body)
    if isinstance(src, Row):
        tab = pa.table({k: pa.array([_lit_only(e)]) for k, e in src.assigns})
        ds = ray.data.from_arrow(tab)
        cols = [k for k, _ in src.assigns]
    else:
        base = tables[src.table]
        if isinstance(base, str):
            import pyarrow.parquet as pq

            schema = pq.read_schema(base)
            # prune ONLY when the output schema is bounded by a STATS or
            # a wildcard-free KEEP downstream; a bare `FROM t | WHERE
            # ...` returns full rows (the ES|QL output contract) and a
            # wildcard KEEP can only be expanded post-scan, so both read
            # every column
            bounded = any(
                isinstance(c, Stats)
                or (isinstance(c, Keep) and not any(e.endswith("*") for e in c.cols))
                for c in body
            )
            if bounded:
                use = [c for c in schema.names if c in needed] or schema.names[:1]
            else:
                use = list(schema.names)
            ds = ray.data.read_parquet(base, columns=use)
            cols = list(use)
        else:
            ds = base
            cols = list(ds.schema().names)

    evaluator = Evaluator()
    ds, cols, explicit_limit = _run_pipe(
        ds, cols, body, evaluator, tables, needed, stats_hint,
        enrich_policies or {},
    )
    if not explicit_limit:
        ds = ds.limit(IMPLICIT_LIMIT)  # ES|QL's implicit result cap
    return ds


def _run_pipe(
    ds,
    cols: list[str],
    cmds: list,
    evaluator: Evaluator,
    tables: dict[str, Any],
    needed: set[str],
    stats_hint: int | None,
    enrich_policies: dict[str, dict] | None = None,
):
    """Apply a command list to a Dataset; returns (ds, cols,
    explicit_limit).  Shared by the top-level pipe and FORK branches."""
    import ray.data

    from elasticsearch_assets_ray.stages.relational import broadcast_join

    pending_sort: Sort | None = None
    explicit_limit = False

    def flush_sort(limit_n: int | None, terminal: bool = True):
        nonlocal ds, pending_sort
        if pending_sort is None:
            if limit_n is not None:
                ds = ds.limit(limit_n)
            return
        keys = [(s.col, s.order) for s in pending_sort.keys]
        placements = {s.nulls for s in pending_sort.keys if s.nulls is not None}
        if len(placements) > 1:
            raise ESQLSyntaxError("mixed NULLS FIRST/LAST not supported")
        if limit_n is None and not terminal:
            # a SORT feeding further commands must not truncate — the
            # implicit LIMIT is an END-of-query cap in ES|QL.  Full
            # distributed sort (Ray Data all-to-all); block order is
            # preserved by the downstream map stages.
            if placements:
                raise ESQLSyntaxError(
                    "NULLS FIRST/LAST on a mid-pipe SORT not supported"
                )
            ds = ds.sort(
                [s.col for s in pending_sort.keys],
                descending=[s.order == "descending" for s in pending_sort.keys],
            )
            pending_sort = None
            return
        k = limit_n if limit_n is not None else IMPLICIT_LIMIT
        t = _topk_nulls(ds, keys, k, placements.pop() if placements else "at_end")
        ds = ray.data.from_arrow(t)
        pending_sort = None

    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        if pending_sort is not None:
            if isinstance(cmd, Limit):
                flush_sort(cmd.n)
                explicit_limit = True
                i += 1
                continue
            flush_sort(None, terminal=False)
        if isinstance(cmd, Where):
            ds = _apply_where(ds, cmd.e, evaluator)
        elif isinstance(cmd, Eval):
            ds = _apply_eval(ds, cmd.assigns, evaluator)
            for name, _ in cmd.assigns:
                if name not in cols:
                    cols.append(name)
        elif isinstance(cmd, Stats):
            ds, cols = _apply_stats(ds, cmd, evaluator, stats_hint)
        elif isinstance(cmd, InlineStats):
            ds, cols = _apply_inline_stats(ds, cols, cmd.stats, evaluator, stats_hint)
        elif isinstance(cmd, Sort):
            pending_sort = cmd
        elif isinstance(cmd, Limit):
            ds = ds.limit(cmd.n)
            explicit_limit = True
        elif isinstance(cmd, Keep):
            expanded = _expand_col_patterns(cmd.cols, cols, "KEEP")
            ds = ds.select_columns(expanded)
            cols = expanded
        elif isinstance(cmd, Drop):
            dropped = set(_expand_col_patterns(cmd.cols, cols, "DROP"))
            keep = [c for c in cols if c not in dropped]
            ds = ds.select_columns(keep)
            cols = keep
        elif isinstance(cmd, Rename):
            mapping = dict(cmd.pairs)
            ds = ds.map_batches(
                lambda b, m=mapping: b.rename_columns([m.get(c, c) for c in b.column_names]),
                batch_format="pyarrow",
            )
            cols = [mapping.get(c, c) for c in cols]
        elif isinstance(cmd, Dissect):
            ds = _apply_dissect(ds, cmd)
            for name, _ in cmd.outs:
                if name not in cols:
                    cols.append(name)
        elif isinstance(cmd, MvExpand):
            ds = _apply_mv_expand(ds, cmd.col)
        elif isinstance(cmd, Fork):
            ds, cols = _apply_fork(
                ds, cols, cmd, evaluator, tables, needed, stats_hint,
                enrich_policies,
            )
        elif isinstance(cmd, Enrich):
            ds, cols = _apply_enrich(ds, cols, cmd, enrich_policies or {})
        elif isinstance(cmd, Sample):
            ds = _apply_sample(ds, cmd)
        elif isinstance(cmd, ChangePointCmd):
            ds = _apply_change_point(ds, cmd)
            if "cp_type" not in cols:
                cols = cols + ["cp_type"]
        elif isinstance(cmd, LookupJoin):
            side = tables[cmd.table]
            if isinstance(side, str):
                import pyarrow.parquet as pq

                schema = pq.read_schema(side)
                use = sorted(({cmd.on} | needed) & set(schema.names))
                small = pq.read_table(side, columns=use)
            else:
                small = pa.concat_tables(list(side.iter_batches(batch_format="pyarrow")))
            ds = broadcast_join(ds, small, keys=[cmd.on], join_type="left")
            cols = cols + [c for c in small.column_names if c != cmd.on and c not in cols]
        else:
            raise ESQLSyntaxError(f"unsupported command {cmd!r}")
        i += 1
    if pending_sort is not None:
        flush_sort(None)
        explicit_limit = True
    return ds, cols, explicit_limit


def _apply_enrich(ds, cols: list[str], cmd: Enrich, policies: dict[str, dict]):
    """ENRICH: broadcast left join against a registered policy's lookup
    table — the ES enrich processor's query-time twin.  ``WITH`` narrows
    the appended fields."""
    import pyarrow.parquet as pq_

    from elasticsearch_assets_ray.stages.relational import broadcast_join

    if cmd.policy not in policies:
        raise ESQLSyntaxError(f"unknown enrich policy {cmd.policy!r}")
    pol = policies[cmd.policy]
    match = pol["match_field"]
    fields = list(cmd.with_fields) or list(pol["enrich_fields"])
    bad = [f for f in fields if f not in pol["enrich_fields"]]
    if bad:
        raise ESQLSyntaxError(f"fields {bad} not in policy {cmd.policy!r}")
    side = pol["table"]
    if isinstance(side, str):
        small = pq_.read_table(side, columns=[match, *fields])
    else:
        small = pa.concat_tables(list(side.iter_batches(batch_format="pyarrow"))).select(
            [match, *fields]
        )
    ds = broadcast_join(ds, small, keys=[cmd.on], join_type="left", right_keys=[match])
    return ds, cols + [f for f in fields if f not in cols]


def _apply_sample(ds, cmd: Sample):
    """SAMPLE: deterministic Bernoulli via the repo's keyed splitmix64
    hash (ES|QL samples randomly per run; keying on a column + SEED
    makes the sample reproducible — documented divergence, and the same
    contract as stages/sampling)."""
    from elasticsearch_assets_ray.stages.sampling import _threshold, id_hash

    if not 0.0 < cmd.p <= 1.0:
        raise ESQLSyntaxError("SAMPLE probability must be in (0, 1]")
    thr = _threshold(cmd.p)
    salt = f"esql-sample-{cmd.seed}"

    def run(batch: pa.Table) -> pa.Table:
        h = id_hash(batch[cmd.on], salt)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(run, batch_format="pyarrow")


_CHANGE_POINT_MAX_ROWS = 100_000


def _apply_change_point(ds, cmd: ChangePointCmd):
    """CHANGE_POINT (ES|QL 8.18 tech preview, step_change subset): over
    the key-ordered series, append ``cp_type`` — "step_change" on the
    first bucket of the new regime, null elsewhere.  The input is a
    bucket series (post-STATS), so materializing is bounded; a row cap
    guards misuse on raw streams (ES caps at 1000 buckets)."""
    from elasticsearch_assets_ray.query.pipeline_aggs import change_point

    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    if t.num_rows > _CHANGE_POINT_MAX_ROWS:
        raise ESQLSyntaxError(
            "CHANGE_POINT input exceeds the bucket cap — aggregate first"
        )
    t = t.take(pc.sort_indices(t, sort_keys=[(cmd.key, "ascending")]))
    r = change_point(t, cmd.val)
    tag = np.full(t.num_rows, None, dtype=object)
    tag[r["index"] - 1] = "step_change"
    import ray.data

    return ray.data.from_arrow(t.append_column("cp_type", pa.array(tag, pa.string())))


def _apply_fork(
    ds,
    cols: list[str],
    fork: Fork,
    evaluator: Evaluator,
    tables: dict[str, Any],
    needed: set[str],
    stats_hint: int | None,
    enrich_policies: dict[str, dict] | None = None,
):
    """FORK (ES 8.19): run each (branch) sub-pipeline on the current
    stream and union the results, tagged with a ``_fork`` discriminator
    ("fork1", "fork2", …).  v1 restriction (documented divergence): all
    branches must end with the SAME column set — ES null-fills the
    column union; requiring alignment keeps the plan schema static.
    Each branch consumes the shared upstream lineage independently
    (branches re-execute the upstream plan; ES executes subplans per
    branch as well)."""
    branch_out = []
    branch_cols: list[list[str]] = []
    for bi, bcmds in enumerate(fork.branches):
        bds, bcols, _ = _run_pipe(
            ds, list(cols), list(bcmds), evaluator, tables, needed, stats_hint,
            enrich_policies,
        )
        tag = f"fork{bi + 1}"

        def add_tag(batch: pa.Table, t=tag) -> pa.Table:
            return batch.append_column(
                "_fork", pa.array([t] * batch.num_rows, pa.string())
            )

        branch_out.append(bds.map_batches(add_tag, batch_format="pyarrow"))
        branch_cols.append(sorted(bcols))
    if any(bc != branch_cols[0] for bc in branch_cols[1:]):
        raise ESQLSyntaxError(
            f"FORK branches must produce the same columns; got {branch_cols}"
        )
    # align physical column order so the union's schema is consistent
    order = [c for c in (branch_cols[0] + ["_fork"])]
    aligned = [
        b.map_batches(
            lambda t, o=tuple(order): t.select(list(o)), batch_format="pyarrow"
        )
        for b in branch_out
    ]
    out = aligned[0].union(*aligned[1:])
    return out, branch_cols[0] + ["_fork"]


def _expand_col_patterns(entries: tuple, cols: list[str], what: str) -> list[str]:
    """Expand KEEP/DROP entries against the tracked column list: exact
    names must exist; `prefix*` / `*` patterns expand in current column
    order (first occurrence wins on duplicates)."""
    out: list[str] = []
    for e in entries:
        if e.endswith("*"):
            pref = e[:-1]
            matches = [c for c in cols if c.startswith(pref)]
            out.extend(m for m in matches if m not in out)
        else:
            if e not in cols:
                raise KeyError(f"{what} of unknown column {e!r}")
            if e not in out:
                out.append(e)
    if not out:
        raise ESQLSyntaxError(f"{what} matched no columns")
    return out


def _pushdown_match(cmds: list, spec: dict) -> list:
    """Rewrite top-level MATCH conjuncts of LEADING WHERE commands into
    id-membership filters resolved through the registered fulltext index
    (one score-free match_ids probe on the driver).  Only WHEREs before
    any reshaping command are eligible — after STATS/JOIN/RENAME the key
    column's identity is no longer the source table's."""
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    searcher: list[Searcher | None] = [None]  # lazy, at most one load

    def probe(node: Func):
        field = node.args[0].name
        if field != spec["field"]:
            return node
        query = str(node.args[1].val)
        op = str(node.args[2].val).lower() if len(node.args) > 2 else "or"
        toks = sorted(set(tokenize_text(query)))
        if not toks:
            return Lit(False)
        if searcher[0] is None:
            searcher[0] = Searcher(spec["dir"])
        s = searcher[0]
        qs = " ".join(("+" + t) for t in toks) if op == "and" else " ".join(toks)
        ids = s.match_ids(qs)
        orig = s.hydrate(np.sort(ids), columns=["orig_doc_id"])["orig_doc_id"]
        return IdSet(spec["key"], orig.combine_chunks())

    def rewrite(e):
        if isinstance(e, Bin) and e.op == "AND":
            return Bin("AND", rewrite(e.l), rewrite(e.r))
        if isinstance(e, Func) and e.name == "MATCH" and isinstance(e.args[0], Col):
            return probe(e)
        return e

    out: list = []
    for i, c in enumerate(cmds):
        if isinstance(c, Where):
            out.append(Where(rewrite(c.e)))
        elif isinstance(c, Sample):  # key identity unchanged
            out.append(c)
        elif isinstance(c, Eval) and not any(
            name in (spec["key"], spec["field"]) for name, _ in c.assigns
        ):
            # an EVAL that reassigns the key or the indexed field makes
            # the index view stale — stop pushing past it
            out.append(c)
        else:
            out.extend(cmds[i:])
            break
    else:
        return out
    return out


def _lit_only(e) -> Any:
    if not isinstance(e, Lit):
        raise ESQLSyntaxError("ROW supports literal values only")
    return e.val


def _topk_nulls(ds, keys, k: int, null_placement: str) -> pa.Table:
    """topk with a null placement (the shared topk() assumes at_end)."""

    def local(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=keys, null_placement=null_placement)[:k]
        return batch.take(idx)

    pruned = ds.map_batches(local, batch_format="pyarrow")
    batches = list(pruned.iter_batches(batch_format="pyarrow"))
    if not batches:  # empty input: keep the schema
        sch = ds.schema()
        return pa.table(
            {n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)}
        )
    t = pa.concat_tables(batches)
    idx = pc.sort_indices(t, sort_keys=keys, null_placement=null_placement)[:k]
    return t.take(idx)


def _apply_where(ds, expr, evaluator: Evaluator):
    def run(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mask = evaluator.ev(expr, batch)
        mask = _as_array(mask, batch.num_rows)
        return batch.filter(mask)  # nulls drop (SQL WHERE)

    return ds.map_batches(run, batch_format="pyarrow")


def _apply_eval(ds, assigns: tuple, evaluator: Evaluator):
    def run(batch: pa.Table) -> pa.Table:
        for name, expr in assigns:
            v = evaluator.ev(expr, batch)
            v = _as_array(v, batch.num_rows)
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, v)
            else:
                batch = batch.append_column(name, v)
        return batch

    return ds.map_batches(run, batch_format="pyarrow")


def _apply_dissect(ds, cmd: Dissect):
    """DISSECT/GROK: one vectorized ``pc.extract_regex`` per batch; a row
    that doesn't match yields nulls in every output (ES puts no fields on
    the doc — null is the columnar equivalent)."""

    def run(batch: pa.Table) -> pa.Table:
        s = pc.extract_regex(batch[cmd.col], cmd.regex)
        for name, cast in cmd.outs:
            v = pc.struct_field(s, name)
            if cast is not None:
                v = pc.cast(v, cast)
            v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, v)
            else:
                batch = batch.append_column(name, v)
        return batch

    return ds.map_batches(run, batch_format="pyarrow")


def _apply_mv_expand(ds, col: str):
    """MV_EXPAND: unnest a list column — one output row per element;
    a null/empty list yields ONE row with a null value (ES|QL keeps the
    row).  Pure offset arithmetic, no Python loop."""

    def run(batch: pa.Table) -> pa.Table:
        lst = batch[col]
        lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        if not pa.types.is_list(lst.type):
            return batch  # already scalar — ES|QL MV_EXPAND is a no-op
        lst = lst.fill_null([])
        off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        counts = np.maximum(lens, 1)
        n_out = int(counts.sum())
        row_idx = np.repeat(np.arange(lens.size, dtype=np.int64), counts)
        first = np.concatenate(([0], np.cumsum(counts[:-1])))
        within = np.arange(n_out, dtype=np.int64) - first[row_idx]
        flatpos = off[:-1][row_idx] + within
        is_null = lens[row_idx] == 0
        flatpos[is_null] = 0
        flat = lst.values
        if len(flat) == 0:
            vals = pa.nulls(n_out, lst.type.value_type)
        else:
            vals = flat.take(pa.array(flatpos, pa.int64()))
            if is_null.any():
                vals = pc.if_else(pa.array(~is_null), vals, pa.nulls(n_out, vals.type))
        take = pa.array(row_idx, pa.int64())
        out = {c: batch[c].take(take) for c in batch.column_names if c != col}
        out[col] = vals
        return pa.table({c: out[c] for c in batch.column_names})

    return ds.map_batches(run, batch_format="pyarrow")


def _apply_inline_stats(
    ds, cols: list[str], st: Stats, evaluator: Evaluator, hint: int | None
):
    """INLINESTATS: compute the (bounded) bucket table like STATS, then
    broadcast-join it back onto the stream — every row gains its group's
    aggregates without collapsing (the ES|QL window-function analog).
    The aggregation pass re-executes the shared upstream lineage once."""
    agg_ds, _ = _apply_stats(ds, st, evaluator, hint)
    buckets = pa.concat_tables(list(agg_ds.iter_batches(batch_format="pyarrow")))
    new_cols = [a.out for a in st.aggs]
    if not st.by:
        # global aggregates: append as constants
        scalars = {a.out: buckets[a.out][0].as_py() for a in st.aggs}

        def add_const(batch: pa.Table) -> pa.Table:
            for name, v in scalars.items():
                batch = batch.append_column(name, pa.array([v] * batch.num_rows))
            return batch

        return ds.map_batches(add_const, batch_format="pyarrow"), cols + new_cols
    keys = [k for k, _ in st.by]
    # per-batch index_in lookup, NOT an Acero join: the stream may carry
    # list columns (Acero rejects list non-key fields) and index_in also
    # matches null keys positionally via the combined string key
    def keyed(t: pa.Table, src) -> pa.Array:
        k = pc.cast(src(keys[0]), pa.string()).fill_null("\x00null")
        for kn in keys[1:]:
            k = pc.binary_join_element_wise(
                k, pc.cast(src(kn), pa.string()).fill_null("\x00null"), "\x1f"
            )
        return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k

    bucket_key = keyed(buckets, lambda kn: buckets[kn])
    agg_cols = {a.out: buckets[a.out].combine_chunks() for a in st.aggs}

    def add(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(keyed(batch, lambda kn: batch[kn]), value_set=bucket_key)
        for name, colv in agg_cols.items():
            batch = batch.append_column(name, colv.take(idx))
        return batch

    return ds.map_batches(add, batch_format="pyarrow"), cols + new_cols


def _apply_stats(ds, st: Stats, evaluator: Evaluator, hint: int | None):
    """STATS lowering: ONE prep map computes group keys + agg inputs,
    the additive aggregates ride one combiner-first partial_agg, and each
    COUNT_DISTINCT / MEDIAN / PERCENTILE rides a bounded
    (keys, value)-dedup side branch (re-executes the upstream pipe — ES
    runs these as separate shard phases too; fusing the branches into
    the main shuffle is the documented optimization seam).  Output
    cardinality = group count, so branch results are driver-mergeable by
    construction."""
    import ray.data

    from elasticsearch_assets_ray.query.engine import percentiles_from_value_counts
    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg

    keys = [k for k, _ in st.by] or ["__all"]
    synthetic_all = not st.by

    def prep(batch: pa.Table) -> pa.Table:
        out: dict[str, Any] = {}
        if synthetic_all:
            out["__all"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        for name, expr in st.by:
            v = _as_array(evaluator.ev(expr, batch), batch.num_rows)
            out[name] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        for i, a in enumerate(st.aggs):
            if isinstance(a.arg, Star):
                v: Any = pa.array(np.ones(batch.num_rows, dtype=np.int64))
            else:
                v = _as_array(evaluator.ev(a.arg, batch), batch.num_rows)
            if a.func == "COUNT" and not isinstance(a.arg, Star):
                v = pc.cast(pc.is_valid(v), pa.int64())
            out[f"__in{i}"] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            if a.func == "STD_DEV":
                out[f"__in{i}_sq"] = pc.multiply_checked(out[f"__in{i}"], out[f"__in{i}"])
            elif a.func == "WEIGHTED_AVG":
                w = _as_array(evaluator.ev(a.arg2, batch), batch.num_rows)
                w = w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w
                out[f"__in{i}_xw"] = pc.multiply_checked(out[f"__in{i}"], w)
                # a null value drops its weight from the denominator
                out[f"__in{i}_w"] = pc.if_else(
                    pc.is_valid(out[f"__in{i}"]), w, pa.nulls(batch.num_rows, w.type)
                )
        return pa.table(out)

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    main_specs: list[AggSpec] = []
    finalizers: list[tuple[str, str, int]] = []  # (out, kind, idx)
    branches: list[tuple[int, AggItem]] = []
    for i, a in enumerate(st.aggs):
        if a.func in ("COUNT",):
            main_specs.append(AggSpec(f"__m{i}", f"__in{i}", "sum"))
            finalizers.append((a.out, "int", i))
        elif a.func == "SUM":
            main_specs.append(AggSpec(f"__m{i}", f"__in{i}", "sum"))
            finalizers.append((a.out, "raw", i))
        elif a.func in ("MIN", "MAX"):
            main_specs.append(AggSpec(f"__m{i}", f"__in{i}", a.func.lower()))
            finalizers.append((a.out, "raw", i))
        elif a.func == "AVG":
            main_specs.append(AggSpec(f"__m{i}", f"__in{i}", "sum"))
            main_specs.append(AggSpec(f"__m{i}_n", f"__in{i}_v", "sum"))
            finalizers.append((a.out, "avg", i))
        elif a.func == "STD_DEV":
            main_specs.append(AggSpec(f"__m{i}", f"__in{i}", "sum"))
            main_specs.append(AggSpec(f"__m{i}_q", f"__in{i}_sq", "sum"))
            main_specs.append(AggSpec(f"__m{i}_n", f"__in{i}_v", "sum"))
            finalizers.append((a.out, "stddev", i))
        elif a.func == "WEIGHTED_AVG":
            main_specs.append(AggSpec(f"__m{i}", f"__in{i}_xw", "sum"))
            main_specs.append(AggSpec(f"__m{i}_w", f"__in{i}_w", "sum"))
            finalizers.append((a.out, "wavg", i))
        else:
            branches.append((i, a))

    needs_valid = [
        i for i, a in enumerate(st.aggs) if a.func in ("AVG", "STD_DEV")
    ]
    if needs_valid:
        inner_prep = prepped

        def add_valid(batch: pa.Table) -> pa.Table:
            for i in needs_valid:
                batch = batch.append_column(
                    f"__in{i}_v", pc.cast(pc.is_valid(batch[f"__in{i}"]), pa.int64())
                )
            return batch

        prepped = inner_prep.map_batches(add_valid, batch_format="pyarrow")

    main_ds = (
        partial_agg(prepped, keys, main_specs, distinct_hint=hint)
        if main_specs
        else None
    )

    out_names = keys + [a.out for a in st.aggs]
    if synthetic_all:
        out_names = [c for c in out_names if c != "__all"]

    if not branches:
        def finish(batch: pa.Table) -> pa.Table:
            return _finalize_stats(batch, keys, st, finalizers, synthetic_all)

        return main_ds.map_batches(finish, batch_format="pyarrow"), out_names

    # branches exist: collect the (bounded) bucket tables and join.
    # BOUND CONTRACT: everything below this line materializes tables whose
    # row count is the GROUP cardinality (and, for the partial_agg side
    # branches, groups × distinct-values-per-group after the per-batch
    # dedup) — sized by ``stats_hint``, never by the input row count.  The
    # driver-side concat / to_pandas().drop_duplicates() / tuple-map joins
    # are safe ONLY under that bound; do not reuse this tail for unbounded
    # keys (a raw high-cardinality BY column) — route those through the
    # no-branch combiner-first path above instead.
    base: pa.Table | None = None
    if main_ds is not None:
        base = pa.concat_tables(list(main_ds.iter_batches(batch_format="pyarrow")))
    branch_tabs: dict[int, pa.Table] = {}
    for i, a in branches:
        sel = keys + [f"__in{i}"]
        b_ds = prepped.map_batches(
            lambda b, s=sel, c=f"__in{i}": b.select(s).filter(pc.is_valid(b[c])),
            batch_format="pyarrow",
        )
        vc = partial_agg(
            b_ds, keys + [f"__in{i}"], [AggSpec("__c", f"__in{i}", "count")]
        )
        t = pa.concat_tables(list(vc.iter_batches(batch_format="pyarrow")))
        if a.func == "COUNT_DISTINCT":
            g = t.group_by(keys, use_threads=False).aggregate([("__c", "count")])
            branch_tabs[i] = pa.table(
                {**{k: g[k] for k in keys}, a.out: g["__c_count"]}
            )
        elif a.func in ("VALUES", "TOP"):
            branch_tabs[i] = _per_key_collect(t, keys, f"__in{i}", a)
        else:  # MEDIAN / PERCENTILE — exact, from per-key (value, count)
            p = 50.0 if a.func == "MEDIAN" else float(a.p)
            branch_tabs[i] = _per_key_percentile(t, keys, f"__in{i}", a.out, p)
    if base is None:
        allk = pa.concat_tables([branch_tabs[i].select(keys) for i, _ in branches])
        base = pa.Table.from_pandas(
            allk.to_pandas().drop_duplicates(), preserve_index=False
        )
    for i, a in branches:
        # align by key TUPLES, not an Acero join: SQL joins never equate
        # null keys, but ES|QL's null group is a real bucket whose
        # branch aggregates must land on it (None == None in dict keys);
        # list payloads (VALUES/TOP) are unjoinable in Acero anyway
        bt = branch_tabs[i]
        mapping = dict(
            zip(
                zip(*[bt[k].to_pylist() for k in keys]),
                bt[a.out].to_pylist(),
            )
        )
        base_keys = zip(*[base[k].to_pylist() for k in keys])
        vals = [mapping.get(kt) for kt in base_keys]
        if a.func == "COUNT_DISTINCT":
            # count(distinct) of an all-null group is 0, not null
            base = base.append_column(
                a.out, pa.array([v if v is not None else 0 for v in vals], pa.int64())
            )
        else:
            base = base.append_column(
                a.out, pa.array(vals, bt.schema.field(a.out).type)
            )
    final = _finalize_stats(base, keys, st, finalizers, synthetic_all)
    import ray.data as rd

    return rd.from_arrow(final), out_names


def _finalize_stats(
    batch: pa.Table,
    keys: list[str],
    st: Stats,
    finalizers: list[tuple[str, str, int]],
    synthetic_all: bool,
) -> pa.Table:
    cols: dict[str, Any] = {}
    for k in keys:
        if not (synthetic_all and k == "__all"):
            cols[k] = batch[k]
    done = {n for n in cols}
    for out, kind, i in finalizers:
        if kind == "int":
            cols[out] = pc.cast(batch[f"__m{i}"], pa.int64())
        elif kind == "avg":
            s = pc.cast(batch[f"__m{i}"], pa.float64())
            n = pc.cast(batch[f"__m{i}_n"], pa.float64())
            cols[out] = pc.if_else(pc.greater(n, 0.0), pc.divide(s, n), pa.nulls(batch.num_rows, pa.float64()))
        elif kind == "stddev":
            # pinned-DOUBLE population variance: ((q − (s·s)/n)/n), every
            # operand float64 FIRST, clamped at 0 — the SQL twin must be
            # sqrt(greatest((CAST(q AS DOUBLE) − CAST(s AS DOUBLE)*
            # CAST(s AS DOUBLE)/CAST(n AS DOUBLE))/CAST(n AS DOUBLE), 0))
            s = batch[f"__m{i}"].to_numpy(zero_copy_only=False).astype(np.float64)
            q = batch[f"__m{i}_q"].to_numpy(zero_copy_only=False).astype(np.float64)
            n = batch[f"__m{i}_n"].to_numpy(zero_copy_only=False).astype(np.float64)
            nz = np.maximum(n, 1.0)
            var = (q - (s * s) / nz) / nz
            cols[out] = pa.array(
                np.sqrt(np.maximum(var, 0.0)), mask=(n == 0)
            )
        elif kind == "wavg":
            xw = pc.cast(batch[f"__m{i}"], pa.float64())
            w = pc.cast(batch[f"__m{i}_w"], pa.float64())
            cols[out] = pc.if_else(
                pc.not_equal(w, 0.0), pc.divide(xw, w), pa.nulls(batch.num_rows, pa.float64())
            )
        else:
            cols[out] = batch[f"__m{i}"]
        done.add(out)
    for a in st.aggs:  # branch outputs already present on the batch
        if a.out not in done and a.out in batch.column_names:
            cols[a.out] = batch[a.out]
    ordered = [k for k in keys if not (synthetic_all and k == "__all")]
    ordered += [a.out for a in st.aggs]
    return pa.table({c: cols[c] for c in ordered})


def _per_key_collect(
    vc: pa.Table, keys: list[str], val_col: str, a: AggItem
) -> pa.Table:
    """VALUES (sorted distinct multivalue) / TOP (top-n WITH
    multiplicity) per key, from the (keys, value, count) table."""
    asc = a.func == "VALUES" or a.order == "asc"
    sort_keys = [(k, "ascending") for k in keys] + [
        (val_col, "ascending" if asc else "descending")
    ]
    t = vc.take(pc.sort_indices(vc, sort_keys=sort_keys))
    starts, ends = _key_group_bounds(t, keys)
    rows_k: list[int] = []
    lists: list[list] = []
    counts = t["__c"].to_pylist()
    vals = t[val_col].to_pylist()
    for s, e in zip(starts, ends):
        rows_k.append(int(s))
        if a.func == "VALUES":
            lists.append(vals[s:e])
        else:
            acc: list = []
            need = int(a.n)
            for j in range(s, e):
                if need <= 0:
                    break
                take = min(int(counts[j]), need)
                acc.extend([vals[j]] * take)
                need -= take
            lists.append(acc)
    out_cols = {k: t[k].take(pa.array(rows_k, pa.int64())) for k in keys}
    out_cols[a.out] = pa.array(
        lists, pa.list_(t.schema.field(val_col).type)
    )
    return pa.table(out_cols)


def _key_group_bounds(t: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of maximal equal-key runs in a key-sorted table.
    Object arrays (to_pylist), not to_numpy: null keys become None and
    None == None, whereas numeric nulls would surface as NaN and NaN !=
    NaN would fragment the null group into singleton runs."""
    key_arrs = [np.array(t[k].to_pylist(), dtype=object) for k in keys]
    if key_arrs and t.num_rows:
        change = np.zeros(t.num_rows, dtype=bool)
        change[0] = True
        for ka in key_arrs:
            change[1:] |= ka[1:] != ka[:-1]
        starts = np.flatnonzero(change)
    else:
        starts = np.array([0], dtype=np.int64) if t.num_rows else np.array([], dtype=np.int64)
    ends = np.concatenate([starts[1:], [t.num_rows]]).astype(np.int64)
    return starts, ends


def _per_key_percentile(
    vc: pa.Table, keys: list[str], val_col: str, out: str, p: float
) -> pa.Table:
    """Exact per-key percentile from a (keys, value, count) table —
    value-ascending walk per key through cumulative counts (shared
    convention with percentiles_from_value_counts)."""
    from elasticsearch_assets_ray.query.engine import percentiles_from_value_counts

    sort_keys = [(k, "ascending") for k in keys] + [(val_col, "ascending")]
    t = vc.take(pc.sort_indices(vc, sort_keys=sort_keys))
    starts, ends = _key_group_bounds(t, keys)
    rows_k: list[int] = []
    vals: list[float | None] = []
    for s, e in zip(starts, ends):
        seg = t.slice(s, e - s)
        r = percentiles_from_value_counts(
            pa.table({"value": pc.cast(seg[val_col], pa.float64()), "count": seg["__c"]}),
            (p,),
        )
        rows_k.append(int(s))
        vals.append(r["value"][0].as_py())
    out_cols = {k: t[k].take(pa.array(rows_k, pa.int64())) for k in keys}
    out_cols[out] = pa.array(vals, pa.float64())
    return pa.table(out_cols)
