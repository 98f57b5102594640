"""Query engine: BM25 top-k over the on-disk index with block-max dynamic
pruning, plus an actor-pool batch-serving stage.

Rank identity with the brute-force oracle is structural: same tokenizer,
same scoring module (:mod:`.bm25`), same per-doc float addition order.

**Pruning (WAND family).**  The index stores each term's postings as
bucket rows over *disjoint, ordered docID ranges* (build.py phase 2), each
row carrying per-128-doc-block (last_docid, max_tf, min_dl).  The engine
scores bucket-at-a-time:

1. per bucket, upper bound = Σ_terms max-block-impact in that bucket
   (valid because BM25's tf-saturation is increasing in tf, decreasing
   in doclen — bm25.block_max_score);
2. buckets are processed in descending bound order; once the running
   top-k threshold θ ≥ bound, every remaining bucket is provably unable
   to place a doc in the top-k and is skipped *undecoded*;
3. surviving buckets are scored exactly with vectorized accumulation.

This is the block-max pruning of BMW applied at the docID-range level
that our partitioned layout gives for free, and it vectorizes (numpy)
instead of a per-doc pivot walk; skipped work = whole compressed ranges.
The reference delegates this entirely to Elasticsearch/Lucene (SURVEY.md
Q4: lucene ``query_string`` passthrough, utils.ts:94-100).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from elasticsearch_assets_ray.index.codec import (
    decode_block,
    decode_block_pfor,
    decode_postings,
    decode_postings_pfor,
)
from elasticsearch_assets_ray.query import bm25
from elasticsearch_assets_ray.query import expand as expand_mod
from elasticsearch_assets_ray.query import parser as parser_mod
from elasticsearch_assets_ray.query.parser import ParsedQuery, parse_query


#: ES runtime fields (runtime_mappings / script_fields): name →
#: (base stored column, vectorized float64→float64 script).  Resolved
#: inside Searcher.field_values_for, so a runtime field is usable
#: anywhere a stored numeric field is — sorting, value_counts-family
#: aggregations, function_score — at query time, with no reindex
#: (exactly ES's pitch for runtime fields).
RUNTIME_FIELDS: dict[str, tuple[str, "callable"]] = {}

#: named score scripts for ES ``script_score`` — vectorized
#: fn(scores, values, params) -> np.ndarray.  Registered driver-side and
#: shipped to shard actors by VALUE (cloudpickle), the way ES ships
#: script source to shards with the request.
_SCORE_SCRIPTS: dict[str, "callable"] = {}


def register_score_script(name: str):
    """Decorator: register a vectorized score script under ``name``."""

    def deco(fn):
        _SCORE_SCRIPTS[name] = fn
        return fn

    return deco


def register_runtime_field(name: str, base_field: str, fn) -> None:
    """Register an ES-style runtime field.  ``fn`` must be a pure
    vectorized numpy transform (NaN in → NaN out for nulls); the SQL
    oracle states the identical expression over the base column."""
    RUNTIME_FIELDS[name] = (base_field, fn)


def _bisect_sorted(sorted_arr: pa.Array, x: str) -> int:
    """Leftmost insertion point of ``x`` in a sorted Arrow string array
    (O(log n) scalar reads — the array itself stays Arrow)."""
    lo, hi = 0, len(sorted_arr)
    while lo < hi:
        mid = (lo + hi) // 2
        if sorted_arr[mid].as_py() < x:
            lo = mid + 1
        else:
            hi = mid
    return lo

def collapse_winners(
    ids: np.ndarray, sc: np.ndarray, vals: pa.Array, k: int
) -> np.ndarray:
    """THE collapse winner-selection comparator, shared by the single
    searcher and the sharded coordinator so the ranking contract cannot
    diverge: winner per group = first of (value, round9-score desc,
    doc_id asc); final top-k re-ranked the same way.  Null collapse
    values stay singleton groups, keyed by doc_id (ES keeps them as
    individual hits).  Returns selected row indices."""
    from elasticsearch_assets_ray.query import bm25 as _bm25

    r9 = _bm25.round_half_up(sc, 9)
    codes = (
        pc.dictionary_encode(pc.fill_null(vals, ""))
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nullmask = pc.is_null(vals).to_numpy(zero_copy_only=False)
    codes = codes.copy()
    codes[nullmask] = ids[nullmask] + codes.max() + 1
    grp_order = np.lexsort((ids, -r9, codes))
    g = codes[grp_order]
    first = np.ones(g.size, dtype=bool)
    first[1:] = g[1:] != g[:-1]
    win = grp_order[first]
    top = np.lexsort((ids[win], -_bm25.round_half_up(sc[win], 9)))[:k]
    return win[top]


def _validate_decay(scale: float, decay: float) -> None:
    """ES rejects these at parse time; silently-wrong multipliers
    (decay=1 → no-op, decay>1 → boosts FAR docs) must not slip through."""
    if not scale > 0:
        raise ValueError(f"decay scale must be > 0, got {scale!r}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay!r}")


def top_metrics_impl(
    s,
    query,
    sort_field: str,
    metrics: list[str],
    size: int,
    desc: bool,
    minimum_should_match: int,
) -> "pa.Table":
    """Shared ES top_metrics body over any object exposing
    ``sort_by_field`` + ``hydrate`` (Searcher and ShardedSearcher): the
    winners' metric columns ride ONE hydrate, aligned by the hydrate
    request-order contract."""
    t = s.sort_by_field(
        query, sort_field, k=size, desc=desc,
        minimum_should_match=minimum_should_match,
    )
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cols: dict = {"doc_id": t["doc_id"], "sort_value": t["value"]}
    h = s.hydrate(ids, columns=["doc_id", *metrics])
    for m in metrics:
        cols[m] = h[m]
    return pa.table(cols)


def decay_multiplier(
    kind: str, v: np.ndarray, origin: float, scale: float, offset: float, decay: float
) -> np.ndarray:
    """ES decay-function multipliers (Lucene FunctionScoreQuery docs):
    distance = max(0, |v − origin| − offset); the multiplier equals
    ``decay`` exactly at distance == scale.  Shared by the engine and the
    SQL-twin generator (same precomputed constants → same doubles)."""
    _validate_decay(scale, decay)
    dist = np.maximum(np.abs(v - origin) - offset, 0.0)
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * np.log(decay))
        return np.exp(-(dist * dist) / (2.0 * sigma2))
    if kind == "exp":
        lam = np.log(decay) / scale
        return np.exp(lam * dist)
    if kind == "linear":
        s = scale / (1.0 - decay)
        return np.maximum((s - dist) / s, 0.0)
    raise ValueError(f"unknown decay kind {kind!r} (gauss | exp | linear)")


def decay_sql_expr(
    kind: str, col: str, origin: float, scale: float, offset: float, decay: float
) -> str:
    """The DuckDB expression twin of :func:`decay_multiplier` — constants
    precomputed in Python and embedded via repr (round-trip-exact
    doubles)."""
    _validate_decay(scale, decay)
    dist = f"greatest(abs({col} - {origin!r}) - {offset!r}, 0.0)"
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * float(np.log(decay)))
        return f"exp(-({dist} * {dist}) / (2.0 * {sigma2!r}))"
    if kind == "exp":
        lam = float(np.log(decay)) / scale
        return f"exp({lam!r} * {dist})"
    if kind == "linear":
        s = scale / (1.0 - decay)
        return f"greatest(({s!r} - {dist}) / {s!r}, 0.0)"
    raise ValueError(f"unknown decay kind {kind!r}")


def knn_similarity_cut(t: pa.Table, similarity: float | None) -> pa.Table:
    """ES knn ``similarity`` cutoff: drop hits with round9(sim) below it.
    Rows are already (round9 desc, docID) ranked, so survivors are a
    per-query PREFIX and the existing rank values stay contiguous."""
    if similarity is None or t.num_rows == 0:
        return t
    from elasticsearch_assets_ray.query import bm25 as _bm25

    r9 = _bm25.round_half_up(t["sim"].to_numpy(zero_copy_only=False), 9)
    return t.filter(pa.array(r9 >= similarity))


def knn_rank(q: np.ndarray, d: np.ndarray, s: np.ndarray, k: int) -> pa.Table:
    """THE kNN ranking comparator, shared by the single searcher and the
    sharded coordinator (exact merge: the doc space is partitioned, so
    the global top-k is in the union of local top-k's): per query, rank
    by (round9(sim) desc, docID asc), keep k, report raw sim."""
    from elasticsearch_assets_ray.query import bm25 as _bm25

    r9 = _bm25.round_half_up(s, 9)
    order = np.lexsort((d, -r9, q))
    q, d, s = q[order], d[order], s[order]
    seg = np.concatenate(([True], q[1:] != q[:-1]))
    first = np.flatnonzero(seg)
    grp = np.cumsum(seg) - 1
    rank = np.arange(q.size) - first[grp] + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(q[keep].astype(np.int64)),
            "doc_id": pa.array(d[keep].astype(np.int64)),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "sim": pa.array(s[keep].astype(np.float64)),
        }
    )


_SEG_COLS = [
    "term",
    "bucket",
    "df",
    "min_docid",
    "max_docid",
    "n_blocks",
    "blob",
    "block_last",
    "block_off",
    "block_maxtf",
    "block_mindl",
]
_SEG_COLS_POS = _SEG_COLS + ["pos"]


class Searcher:
    """Loads index metadata once; per-query work reads only the segment
    rows of the query's terms (shard-pruned).  Use one instance per
    process/actor — this is the state the reference keeps in its
    state-storage/API-factory actors (SURVEY.md T1/T2)."""

    def __init__(
        self,
        index_dir: str,
        prune: bool = True,
        shard_resident: bool = True,
        phrase_scoring: str = "terms",
        bucket_range: tuple[int, int] | None = None,
        pit: str | None = None,
        fuzzy_transpositions: bool = False,
    ):
        """``shard_resident=True`` (default) faults whole segment shards
        into actor memory once — fastest, memory ∝ touched shards.
        ``shard_resident=False`` is the COLD mode for indexes whose
        shards exceed actor memory: every term lookup is a filtered
        Parquet read (``term`` is sorted within segment files, so row-
        group statistics prune the scan); memory ∝ query terms only.

        ``bucket_range=(lo, hi)`` restricts this searcher to the docID
        buckets ``lo <= bucket < hi`` — the doc-partitioned serving
        shard of :class:`ShardedSearcher` (query/sharded.py).  Postings
        outside the range are never loaded (memory ∝ own range), so BM25
        df must be injected globally via ``search_prepared``'s
        ``df_override`` (the ES ``dfs_query_then_fetch`` contract).

        ``phrase_scoring``: ``"terms"`` (default) scores phrase members
        as bag-of-words (adjacency is a pure filter — the documented
        Lucene divergence); ``"phrase_freq"`` scores each phrase clause
        like Lucene's PhraseQuery — Σ member idf × tf-saturation of the
        phrase OCCURRENCE count — and stops scoring members individually.
        Needs positional postings (``index_positions=True``)."""
        if phrase_scoring not in ("terms", "phrase_freq"):
            raise ValueError(f"unknown phrase_scoring {phrase_scoring!r}")
        self.phrase_scoring = phrase_scoring
        #: ES ``fuzzy_transpositions``: fuzzy clauses expand by
        #: Damerau-Levenshtein (adjacent swap = 1 edit) instead of plain
        #: Levenshtein.  Off by default — the repo's pinned fuzzy
        #: contract stays plain (see query/expand.py) and this is the
        #: opt-in ES-default behavior.
        self.fuzzy_transpositions = fuzzy_transpositions
        self.index_dir = index_dir
        self.shard_resident = shard_resident
        self.bucket_range = bucket_range
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"])
        self.num_shards = int(self.manifest["num_shards"])
        # index-time analysis chain — every string query re-parses
        # through the same chain (self._q), the ES analyzer contract
        if self.manifest.get("analyzer"):
            from elasticsearch_assets_ray.stages.analysis import AnalyzerSpec

            self.analyzer = AnalyzerSpec.from_dict(self.manifest["analyzer"])
        else:
            self.analyzer = None
        # shard routing must use the hash the index was BUILT with — a
        # hash change without a manifest bump would silently miss terms
        from elasticsearch_assets_ray.index.build import TERM_HASH_ID

        th = self.manifest.get("term_hash", TERM_HASH_ID)
        if th != TERM_HASH_ID:
            raise RuntimeError(
                f"index {index_dir} built with term hash {th!r}; this "
                f"engine routes with {TERM_HASH_ID!r} — rebuild the index"
            )
        self.prune = prune
        #: ES point-in-time id (index/deletes.open_pit) — when set, the
        #: tombstone view is the PIT's snapshot, not the current file
        self.pit = pit
        self._set_codec(self.manifest.get("codec", "varint"))
        self._seg = pads.dataset(
            os.path.join(index_dir, "segments"), partitioning="hive"
        )
        self._init_runtime_state()

    def _set_codec(self, codec: str) -> None:
        if codec == "pfor":
            self._decode_postings = decode_postings_pfor
            self._decode_block = decode_block_pfor
        else:
            self._decode_postings = decode_postings
            self._decode_block = decode_block

    def _init_runtime_state(self) -> None:
        """Per-instance caches (also used by subclasses that bypass
        __init__, e.g. MultiSearcher)."""
        from collections import OrderedDict

        from elasticsearch_assets_ray.sources.partition import DOC_SHIFT

        self._doc_shift = int(self.manifest.get("doc_shift", DOC_SHIFT))
        self._rpb = int(self.manifest.get("runs_per_bucket", 32))
        # subclasses that bypass __init__ (MultiSearcher) default to
        # bag-of-words phrase scoring and resident segments (children
        # manage their own residency)
        self.phrase_scoring = getattr(self, "phrase_scoring", "terms")
        self.shard_resident = getattr(self, "shard_resident", True)
        self.fuzzy_transpositions = getattr(self, "fuzzy_transpositions", False)
        self.analyzer = getattr(self, "analyzer", None)
        # pid -> docstore parquet path / row count (footer metadata only)
        self._pid_files: dict[int, str] | None = None
        self._pid_ndocs: dict[int, int] = {}
        # pid -> doc_len int32 array, loaded lazily per pid an actor's
        # queries actually touch — NEVER the whole corpus (at 1B docs the
        # global doclen array is 8 GB per actor)
        self._doclen_cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._doclen_cache_bytes = 0
        self.doclen_cache_budget = 1 << 28  # 256 MB of int32 doclens
        # bucket -> (pids int64[], base-rank int64[]) for bucket-local
        # dense scoring
        self._bucket_state: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # bucket -> reusable (scores, hit) scratch; only TOUCHED entries
        # are reset after each use, so reuse is O(candidates) not O(bucket).
        # BYTE-budgeted LRU: without a bound a workload touching every
        # bucket would accumulate ~9 bytes × corpus docs per actor — the
        # very ceiling bucket-local scoring exists to avoid.
        self._scratch: "OrderedDict[int, tuple[np.ndarray, np.ndarray]]" = OrderedDict()
        self._scratch_bytes = 0
        self.scratch_budget = 1 << 28  # 256 MB of scratch per actor
        # term -> its segment rows (a small pa.Table) | None when absent;
        # repeated query terms skip the shard lookup + take entirely
        self._term_rows_cache: dict[str, pa.Table | None] = {}
        # shard id -> (segment table, term -> row-index array); loaded once
        # per Searcher (i.e. once per actor), NOT per query
        self._shard_cache: dict[int, tuple[pa.Table, dict[str, np.ndarray]]] = {}
        # decoded-postings LRU: (term, bucket) -> (docids, tfs, doclens);
        # hot query terms decode once per actor, not once per query
        self._post_cache: "OrderedDict[tuple[str, int], tuple]" = OrderedDict()
        # idf each key's cached wsat was computed with (df_override safety)
        self._post_cache_w: dict[tuple[str, int], float] = {}
        self._post_cache_bytes = 0
        self.post_cache_budget = 1 << 30  # 24B/posting → ~45M cached postings
        # (term, bucket) -> (block_last, block_sat, sat_max): the
        # query-invariant part of every block upper bound (idf scaling is
        # per query).  One segment row per (term, shard, bucket) is a
        # merge invariant, so the key is unique.  Without this cache the
        # bounds pass re-runs frombuffer + tf_saturation over every
        # term's block arrays on EVERY query — measured as the pruned
        # path losing to exhaustive on warm queries.
        self._blockub_cache: "OrderedDict[tuple[str, int], tuple]" = OrderedDict()
        self._blockub_bytes = 0
        self.blockub_budget = 1 << 28
        # delete-by-query tombstones (index/deletes.py): sorted docids
        # excluded from every search/count; BM25 stats intentionally
        # UNCHANGED until expunge (Lucene deleted-doc semantics)
        self._tombstones = np.empty(0, dtype=np.int64)
        if getattr(self, "index_dir", None):
            if getattr(self, "pit", None):
                from elasticsearch_assets_ray.index.deletes import pit_tombstones

                self._tombstones = pit_tombstones(self.index_dir, self.pit)
            else:
                from elasticsearch_assets_ray.index.deletes import load_tombstones

                self._tombstones = load_tombstones(self.index_dir)
        # fielded metadata filters (`lang:en`): (field, value, pid) ->
        # bool row bitmap from the docstore part's column — byte-budgeted
        # LRU so repeated filtered queries pay one column read per
        # touched pid, never a corpus-wide scan
        self._filterbits_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._filterbits_bytes = 0
        self.filterbits_budget = 1 << 27  # 128 MB of bool rows per actor
        self._docstore_fields: frozenset[str] | None = None
        # global-df injection for doc-partitioned serving (set transiently
        # by search_prepared; None ⇒ df summed from this searcher's own
        # segment rows, which IS global for an unrestricted searcher)
        self._df_override: dict[str, int] | None = None
        # NOT redundant with __init__: MultiSearcher bypasses __init__
        # and calls _init_runtime_state directly
        self.bucket_range = getattr(self, "bucket_range", None)
        # ids-only decoded-postings LRU for the score-free count path
        # (_match_ids): separate from _post_cache because its entries
        # carry no tf-saturation floats (computing them is exactly the
        # work the count path exists to skip)
        from collections import OrderedDict as _OD

        self._ids_cache: "_OD[tuple[str, int], np.ndarray]" = _OD()
        self._ids_cache_bytes = 0
        self.ids_cache_budget = 1 << 28
        # term -> global df memo for the coordinator's term_dfs()
        self._df_cache: dict[str, int] = {}
        # (field, pid) -> float64 column array: the numeric-column analog
        # of the doclen cache, behind sort-by-field / value_counts /
        # stats / percentiles — repeated agg queries pay one column read
        # per touched pid, not one per call
        self._numcol_cache: "_OD[tuple[str, int], np.ndarray]" = _OD()
        self._numcol_bytes = 0
        self.numcol_budget = 1 << 28
        # index-resident dense vectors (index/vectors.py sidecar): meta
        # loaded lazily on first knn(); per-pid (mmap vecs, mask, norms)
        # in a byte-budgeted LRU (norms are the only resident floats —
        # the matrices stay mmapped and page in under OS control)
        self._vec_meta: dict | None | bool = False  # False = not probed yet
        self._vec_cache: "_OD[int, tuple]" = _OD()
        self._vec_cache_bytes = 0
        self.vec_cache_budget = 1 << 27
        # join-field parent/child id maps (ES global-ordinals analog):
        # relation name -> (sorted routing values, aligned docids),
        # built once per searcher from this shard's docstore
        self._join_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # hydrate pruning observability: docstore part files opened
        self.hydrate_files_opened = 0
        # serving gauges (reference ReaderAPIFetcher.ts:22-33 records
        # fetched/slice counters; these are the engine-side analogs,
        # surfaced via metrics() into bench records and tests)
        self.queries_served = 0
        self.records_served = 0
        # pruning observability (cumulative across this searcher's queries)
        self.stats = {
            "buckets_considered": 0,
            "buckets_skipped": 0,  # whole buckets never decoded (θ bound)
            "rows_full_decode": 0,
            "rows_partial_decode": 0,  # only surviving 128-doc blocks decoded
            "rows_skipped": 0,  # rows with no surviving interval
            "count_score_free": 0,  # match_ids served without BM25 arithmetic
            "count_fallback_scored": 0,  # match_ids fell back to the scorer
        }

    # ---------- doc-length lookup (norms analog) ----------
    def _pid_map(self) -> dict[int, str]:
        """pid → docstore part file, from directory listing (docstore rows
        of pid p are exactly docids p<<shift + row, in row order)."""
        if self._pid_files is None:
            import glob as _glob

            m: dict[int, str] = {}
            for f in _glob.glob(
                os.path.join(self.index_dir, "docstore", "part-*.parquet")
            ):
                m[int(os.path.basename(f)[5:-8])] = f
            self._pid_files = m
        return self._pid_files

    def _pid_n_docs(self, pid: int) -> int:
        n = self._pid_ndocs.get(pid)
        if n is None:
            import pyarrow.parquet as pq

            n = pq.ParquetFile(self._pid_map()[pid]).metadata.num_rows
            self._pid_ndocs[pid] = n
        return n

    def _doclens_pid(self, pid: int) -> np.ndarray:
        hit = self._doclen_cache.get(pid)
        if hit is not None:
            self._doclen_cache.move_to_end(pid)
            return hit
        import pyarrow.parquet as pq

        t = pq.read_table(self._pid_map()[pid], columns=["doc_len"])
        arr = t["doc_len"].to_numpy(zero_copy_only=False).astype(np.int32)
        self._doclen_cache[pid] = arr
        self._doclen_cache_bytes += arr.nbytes
        while self._doclen_cache_bytes > self.doclen_cache_budget and len(self._doclen_cache) > 1:
            _, old = self._doclen_cache.popitem(last=False)
            self._doclen_cache_bytes -= old.nbytes
        return arr

    def _numcol_pid(self, pid: int, field: str) -> np.ndarray:
        """One docstore part's numeric column as float64 (NaN for nulls),
        LRU'd by bytes — the doclen-cache pattern generalized to any
        numeric agg/sort field."""
        key = (field, pid)
        hit = self._numcol_cache.get(key)
        if hit is not None:
            self._numcol_cache.move_to_end(key)
            return hit
        import pyarrow.parquet as pq

        col = pq.read_table(self._pid_map()[pid], columns=[field])[field]
        if pa.types.is_integer(col.type):
            # float64 carries 53 mantissa bits: int64 values beyond that
            # (e.g. ns-epoch timestamps) would silently COLLAPSE distinct
            # values in cardinality/value_counts — refuse loudly and
            # point at the sketch paths
            mx = pc.max(pc.abs(col)).as_py()
            if mx is not None and int(mx) > (1 << 53):
                raise ValueError(
                    f"field {field!r} holds integers beyond 2^53 — exact "
                    "float64 aggregation would lose precision; use the "
                    "t-digest/HLL sketch paths or re-scale the field"
                )
        arr = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        self._numcol_cache[key] = arr
        self._numcol_bytes += arr.nbytes
        while self._numcol_bytes > self.numcol_budget and len(self._numcol_cache) > 1:
            _, old = self._numcol_cache.popitem(last=False)
            self._numcol_bytes -= old.nbytes
        return arr

    def field_values_for(self, docids: np.ndarray, field: str) -> np.ndarray:
        """float64 value per docID (NaN where null) via the per-pid
        column cache — a bare gather, like doclens_for.  A registered
        RUNTIME field (ES runtime_mappings / script_fields) resolves
        here too: the base column gathers from the same cache and the
        script applies vectorized, so every consumer of this seam —
        sort_by_field, value_counts/stats/percentiles/cardinality,
        function_score, scripted_metric — accepts runtime fields with
        no further plumbing.  Runtime names take precedence over stored
        columns (the ES shadowing rule)."""
        rt = RUNTIME_FIELDS.get(field)
        if rt is not None:
            return rt[1](self.field_values_for(docids, rt[0]))
        pid = docids >> self._doc_shift
        out = np.empty(docids.size, dtype=np.float64)
        for p in np.unique(pid):
            mask = pid == p
            base = int(p) << self._doc_shift
            out[mask] = self._numcol_pid(int(p), field)[docids[mask] - base]
        return out

    def doclens_for(self, docids: np.ndarray) -> np.ndarray:
        """doc_len per docID, via the per-pid lazy cache (docids within a
        pid are doc_base + row, so the lookup is a bare gather)."""
        pid = docids >> self._doc_shift
        out = np.empty(docids.size, dtype=np.int64)
        for p in np.unique(pid):
            mask = pid == p
            base = int(p) << self._doc_shift
            out[mask] = self._doclens_pid(int(p))[docids[mask] - base]
        return out

    def _bucket_rank_state(self, bucket: int) -> tuple[np.ndarray, np.ndarray]:
        """(pids, base_ranks) of the bucket: pids sorted, base_ranks[i] =
        Σ docs of earlier pids; base_ranks[-1] = total docs in bucket.
        Bounds every per-query allocation to ONE bucket's doc count
        (≤ runs_per_bucket × partition_rows) instead of the corpus."""
        hit = self._bucket_state.get(bucket)
        if hit is not None:
            return hit
        pids = np.array(
            sorted(p for p in self._pid_map() if p // self._rpb == bucket),
            dtype=np.int64,
        )
        counts = np.array([self._pid_n_docs(int(p)) for p in pids], dtype=np.int64)
        base = np.concatenate(([0], np.cumsum(counts)))
        # contiguous pid range → rank lookup is pure arithmetic, no
        # searchsorted (the common steady-state layout)
        contig = bool(pids.size) and bool(np.all(np.diff(pids) == 1))
        self._bucket_state[bucket] = (pids, base, contig)
        return self._bucket_state[bucket]

    # ---------- segment lookup ----------
    def _load_shard(self, shard: int) -> tuple[pa.Table, dict[str, np.ndarray]]:
        """Load one segment shard into memory ONCE (term-dictionary +
        postings rows).  At cluster scale each query actor is assigned a
        subset of shards; here an actor lazily faults in the shards its
        queries touch."""
        hit = self._shard_cache.get(shard)
        if hit is not None:
            return hit
        cols = _SEG_COLS_POS if self.manifest.get("index_positions") else _SEG_COLS
        if not self._seg.files:  # empty index (zero tokens)
            empty = pa.table({"term": pa.array([], pa.string())})
            self._shard_cache[shard] = (
                empty,
                (empty["term"].combine_chunks(), np.empty(0, dtype=np.int64)),
            )
            return self._shard_cache[shard]
        filt = pc.field("shard") == shard
        if self.bucket_range is not None:
            lo, hi = self.bucket_range
            filt = filt & (pc.field("bucket") >= lo) & (pc.field("bucket") < hi)
        tbl = self._seg.to_table(columns=cols, filter=filt)
        # term dictionary stays an ARROW array: sorted index + binary
        # search per query term (O(log n) scalar reads) instead of
        # materializing every term of the shard as a Python string
        arr = tbl["term"].combine_chunks()
        order = pc.sort_indices(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        sorted_arr = arr.take(pa.array(order))
        self._shard_cache[shard] = (tbl, (sorted_arr, order))
        return self._shard_cache[shard]

    @staticmethod
    def _term_row_indices(index, term: str) -> np.ndarray:
        """Row indices of ``term`` in a shard's segment table (binary
        search over the sorted Arrow term array)."""
        sorted_arr, order = index
        n = len(sorted_arr)

        def bisect(side: str) -> int:
            lo, hi = 0, n
            while lo < hi:
                mid = (lo + hi) // 2
                v = sorted_arr[mid].as_py()
                if v < term or (side == "right" and v == term):
                    lo = mid + 1
                else:
                    hi = mid
            return lo

        left = bisect("left")
        right = bisect("right")
        return order[left:right]

    def _segment_rows(self, terms: list[str]) -> pa.Table:
        """All (term, bucket) rows for the given terms from the per-shard
        cache (no per-query parquet scan).  Per-TERM results are memoized,
        so repeated query terms cost a dict hit."""
        if not terms:
            return None
        if len(self._term_rows_cache) > 200_000:
            # coarse bound, applied BEFORE this query's lookups so the
            # entries about to be read are never cleared from under us
            self._term_rows_cache.clear()
        missing = [t for t in terms if t not in self._term_rows_cache]
        if missing:
            from elasticsearch_assets_ray.index.build import term_shard

            shards = term_shard(missing, self.num_shards)
            cold_cols = (
                _SEG_COLS_POS if self.manifest.get("index_positions") else _SEG_COLS
            )
            for t, sh in zip(missing, shards):
                if self.shard_resident:
                    tbl, index = self._load_shard(int(sh))
                    r = self._term_row_indices(index, t)
                    self._term_rows_cache[t] = (
                        tbl.take(pa.array(r, type=pa.int64())) if r.size else None
                    )
                elif not self._seg.files:  # empty index (zero tokens)
                    self._term_rows_cache[t] = None
                else:
                    # cold mode: one filtered, statistics-pruned read
                    filt = (pc.field("shard") == int(sh)) & (pc.field("term") == t)
                    if self.bucket_range is not None:
                        lo, hi = self.bucket_range
                        filt = filt & (pc.field("bucket") >= lo) & (pc.field("bucket") < hi)
                    got = self._seg.to_table(columns=cold_cols, filter=filt)
                    self._term_rows_cache[t] = got if got.num_rows else None
        parts = [p for t in terms if (p := self._term_rows_cache[t]) is not None]
        if not parts:
            return None
        return pa.concat_tables(parts)

    # ---------- multi-term (prefix / wildcard / fuzzy) expansion ----------
    def _term_dict_slices(self, lo: str | None = None, hi: str | None = None):
        """Yield the index's term-dictionary Arrow arrays, optionally
        narrowed to the sorted range ``[lo, hi)``.  Warm mode: a
        binary-searched slice of each resident shard's sorted term array;
        cold mode: ONE statistics-pruned range read over the segment's
        term column.  Arrays may repeat terms across shards/buckets —
        callers dedupe."""
        if not self.shard_resident:
            if not self._seg.files:  # empty index
                return
            filt = (
                (pc.field("term") >= lo) & (pc.field("term") < hi)
                if lo is not None
                else None
            )
            got = self._seg.to_table(columns=["term"], filter=filt)
            yield pc.unique(got["term"])
            return
        for s in range(self.num_shards):
            _, (sorted_arr, _order) = self._load_shard(s)
            n = len(sorted_arr)
            left, right = 0, n
            if lo is not None:
                left, right = _bisect_sorted(sorted_arr, lo), _bisect_sorted(sorted_arr, hi)
            if right > left:
                yield sorted_arr.slice(left, right - left)

    def expand_prefix(self, prefix: str, max_expansions: int = 1024) -> list[str]:
        """All index terms starting with ``prefix`` (sorted), via binary
        search over every shard's sorted term dictionary — no term scan.
        Raises when the expansion exceeds ``max_expansions`` (the
        deterministic analog of Lucene's rewrite cap)."""
        found: set[str] = set()
        for arr in self._term_dict_slices(prefix, prefix + "\U0010ffff"):
            found.update(arr.to_pylist())
            if len(found) > max_expansions:
                raise ValueError(
                    f"prefix {prefix!r}* expands to more than "
                    f"{max_expansions} terms — narrow the prefix"
                )
        return sorted(found)

    def _expand_matching(
        self, rx: str, lit: str, label: str, max_expansions: int
    ) -> list[str]:
        """Shared dictionary-expansion core for wildcard and regexp
        clauses: the literal prefix narrows the scan to a sorted range
        (binary search / a statistics-pruned read), then ONE vectorized
        RE2 pass per term-dictionary slice."""
        lo = lit if lit else None
        hi = lit + "\U0010ffff" if lit else None
        found: set[str] = set()
        for arr in self._term_dict_slices(lo, hi):
            m = pc.match_substring_regex(arr, rx)
            found.update(arr.filter(m).to_pylist())
            if len(found) > max_expansions:
                raise ValueError(
                    f"{label} expands to more than {max_expansions} "
                    "terms — narrow the pattern"
                )
        return sorted(found)

    def expand_wildcard(self, pattern: str, max_expansions: int = 1024) -> list[str]:
        """All index terms matching a Lucene wildcard pattern (``*`` any
        run, ``?`` one char), sorted — a leading-wildcard pattern scans
        the whole dictionary, exactly Lucene's cost model."""
        return self._expand_matching(
            expand_mod.wildcard_regex(pattern),
            expand_mod.wildcard_literal_prefix(pattern),
            f"wildcard {pattern!r}",
            max_expansions,
        )

    def expand_regexp(self, pattern: str, max_expansions: int = 1024) -> list[str]:
        """All index terms fully matching a Lucene `/regexp/` pattern
        (anchored), sorted — the regexp analog of :meth:`expand_wildcard`.
        The pattern is validated against RE2 (the engine pyarrow AND the
        DuckDB oracle actually run), not Python `re` — the two syntaxes
        differ in both directions (lookaheads, some escape classes)."""
        rx = f"^(?:{pattern})$"
        try:
            # one-element probe: pyarrow skips regex compilation for
            # empty inputs, so an empty-array probe validates nothing
            pc.match_substring_regex(pa.array([""], pa.string()), rx)
        except pa.ArrowInvalid as e:
            raise ValueError(f"invalid regexp {pattern!r}: {e}") from e
        return self._expand_matching(
            rx,
            expand_mod.regex_literal_prefix(pattern),
            f"regexp /{pattern}/",
            max_expansions,
        )

    def expand_fuzzy(
        self, term: str, max_edits: int, max_expansions: int = 1024
    ) -> list[str]:
        """All index terms within ``max_edits`` PLAIN Levenshtein edits of
        ``term``, sorted (see query/expand.py for the documented
        divergence from modern Lucene's transposition-aware automata).
        Length-banded + numpy-vectorized DP over each term-dictionary
        slice — no per-term Python."""
        found: set[str] = set()
        for arr in self._term_dict_slices():
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            mask = expand_mod.fuzzy_mask(
                term, arr, max_edits, transpositions=self.fuzzy_transpositions
            )
            if mask.any():
                found.update(
                    arr.take(pa.array(np.flatnonzero(mask), type=pa.int64())).to_pylist()
                )
            if len(found) > max_expansions:
                raise ValueError(
                    f"fuzzy {term!r}~{max_edits} expands to more than "
                    f"{max_expansions} terms — raise max_expansions or "
                    "lower the edit distance"
                )
        return sorted(found)

    def _rewrite_prefixes(self, q: ParsedQuery) -> ParsedQuery:
        """Expand every multi-term clause (trailing-star prefix, general
        wildcard, fuzzy) against the term dictionary: positive expansions
        become SHOULD terms (each scored with its own idf — Lucene's
        scoring rewrite), ``+`` expansions additionally form a
        conjunctive must_any group, negative expansions become MUST_NOT
        terms.  An unmatched positive clause contributes nothing."""
        if q.bool_tree is not None:
            # boolean-expression mode: expand prefix/wildcard/fuzzy
            # LEAVES in place (each becomes an OR group of its expansion
            # terms — positive-polarity expansions score, Lucene's
            # scoring rewrite; an empty expansion is a False leaf).
            # Request parameters (the search_after cursor) must survive
            # the rewrite — dropping them here silently re-served page 1
            # to paginated multi-term tree queries.
            if parser_mod.tree_multiterm_leaves(q.bool_tree):
                return ParsedQuery(
                    bool_tree=self._rewrite_tree(q.bool_tree),
                    search_after=q.search_after,
                )
            return q
        if not q.has_multiterm:
            return q
        out = ParsedQuery(
            should=list(q.should),
            must=list(q.must),
            must_not=list(q.must_not),
            phrases=list(q.phrases),
            not_phrases=list(q.not_phrases),
            sloppy_phrases=list(q.sloppy_phrases),
            not_sloppy_phrases=list(q.not_sloppy_phrases),
            phrase_prefixes=list(q.phrase_prefixes),
            not_phrase_prefixes=list(q.not_phrase_prefixes),
            must_any=[list(g) for g in q.must_any],
            filters=list(q.filters),
            not_filters=list(q.not_filters),
            match_filters=list(q.match_filters),
            not_match_filters=list(q.not_match_filters),
            range_filters=list(q.range_filters),
            not_range_filters=list(q.not_range_filters),
            exists_filters=list(q.exists_filters),
            not_exists_filters=list(q.not_exists_filters),
            minimum_should_match=q.minimum_should_match,
            search_after=q.search_after,
        )
        expansions: list[tuple[list, object]] = [
            (q.prefixes, self.expand_prefix),
            (q.must_prefixes, self.expand_prefix),
            (q.not_prefixes, self.expand_prefix),
            (q.wildcards, self.expand_wildcard),
            (q.must_wildcards, self.expand_wildcard),
            (q.not_wildcards, self.expand_wildcard),
            (q.fuzzies, lambda tn: self.expand_fuzzy(*tn)),
            (q.must_fuzzies, lambda tn: self.expand_fuzzy(*tn)),
            (q.not_fuzzies, lambda tn: self.expand_fuzzy(*tn)),
            (q.regexps, self.expand_regexp),
            (q.must_regexps, self.expand_regexp),
            (q.not_regexps, self.expand_regexp),
        ]
        for (clauses, fn), kind in zip(
            expansions, ["should", "must", "not"] * 4
        ):
            for c in clauses:
                terms = fn(c)
                if kind == "not":
                    out.must_not.extend(terms)
                else:
                    out.should.extend(terms)
                    if kind == "must":
                        # conjunctive: ≥1 expanded term must match (an
                        # empty expansion matches nothing — the group
                        # filters all docs)
                        out.must_any.append(terms)
        return out

    def _rewrite_tree(self, node):
        """Expand multi-term leaves of a boolean tree against the term
        dictionary (prefix → sorted expansion terms, wildcard/fuzzy
        likewise); structure nodes recurse, other leaves pass through."""
        kind = node[0]
        if kind == "prefix":
            terms = self.expand_prefix(node[1])
        elif kind == "wildcard":
            terms = self.expand_wildcard(node[1])
        elif kind == "regexp":
            terms = self.expand_regexp(node[1])
        elif kind == "fuzzy":
            terms = self.expand_fuzzy(node[1], node[2])
        elif kind == "not":
            return ("not", self._rewrite_tree(node[1]))
        elif kind == "boost":
            return ("boost", self._rewrite_tree(node[1]), node[2])
        elif kind in ("and", "or"):
            return (kind, [self._rewrite_tree(c) for c in node[1]])
        else:
            return node
        return ("or", [("term", t) for t in terms])

    def _require_docstore_fields(self, preds) -> None:
        """Validate that every metadata predicate names an existing
        docstore column (shared by the flat filter context and the
        boolean-tree path)."""
        if not preds:
            return
        if self._docstore_fields is None:
            some = next(iter(self._pid_map().values()))
            self._docstore_fields = frozenset(pq.read_schema(some).names)
        for pred in preds:
            if pred[1] not in self._docstore_fields:
                raise ValueError(
                    f"unknown filter field {pred[1]!r}; docstore has "
                    f"{sorted(self._docstore_fields)}"
                )

    def _pred_mask(self, pred: tuple, ids: np.ndarray) -> np.ndarray:
        """Per-doc bool mask for ONE metadata predicate over docID array
        ``ids`` — the single-leaf form of the conjunctive filter context
        (same pid-local `_filter_bits` bitmaps, same LRU)."""
        if ids.size == 0:
            return np.empty(0, dtype=bool)
        pid = ids >> self._doc_shift
        off = ids - (pid << self._doc_shift)
        m = np.empty(ids.size, dtype=bool)
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(pid)) + 1, [ids.size]))
        for a, b in zip(bounds[:-1], bounds[1:]):
            m[a:b] = self._filter_bits(pred, int(pid[a]))[off[a:b]]
        return m

    def _tree_eval(
        self, node, ids: np.ndarray, per_term: dict, idf_by_term: dict
    ) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized boolean-tree evaluation over candidate docIDs →
        (match mask, clause score).  Term leaves are postings membership
        with their BM25 contribution, filter leaves metadata bitmaps
        (never scoring), structure nodes numpy logic.  Scoring follows
        Lucene's BooleanQuery rule: an OR sums its MATCHING children, an
        AND that fails contributes NOTHING (even when some of its terms
        are present), anything under NOT never scores.  Children
        accumulate left-to-right — the oracle prints the same explicit
        addition order.  Candidates (docs holding ≥1 positive-polarity
        term) are COMPLETE for grounded trees — see query/parser.py's
        grammar notes."""
        kind = node[0]
        if kind == "term":
            t = node[1]
            hit = per_term.get(t)
            m = np.zeros(ids.size, dtype=bool)
            s = np.zeros(ids.size, dtype=np.float64)
            if hit is not None and hit[0].size:
                d, sat, wsat = hit
                pos = np.minimum(np.searchsorted(d, ids), d.size - 1)
                m = d[pos] == ids
                if wsat is None:
                    wsat = idf_by_term.get(t, 0.0) * sat
                s[m] = wsat[pos[m]]
            return m, s
        if kind == "filter":
            return self._pred_mask(node[1], ids), np.zeros(ids.size)
        if kind == "not":
            m, _s = self._tree_eval(node[1], ids, per_term, idf_by_term)
            return ~m, np.zeros(ids.size)
        if kind == "boost":
            m, s = self._tree_eval(node[1], ids, per_term, idf_by_term)
            return m, s * node[2]
        child = [self._tree_eval(c, ids, per_term, idf_by_term) for c in node[1]]
        if not child:
            # an empty OR (a multi-term leaf that expanded to nothing)
            # matches nothing; an empty AND is vacuously true
            return (
                np.full(ids.size, kind == "and", dtype=bool),
                np.zeros(ids.size),
            )
        s = child[0][1].copy()
        for _cm, cs in child[1:]:
            s += cs
        if kind == "and":
            m = child[0][0].copy()
            for cm, _cs in child[1:]:
                m &= cm
            s[~m] = 0.0  # a failed conjunction contributes nothing
            return m, s
        m = child[0][0].copy()
        for cm, _cs in child[1:]:
            m |= cm
        return m, s

    def _tree_filter_preds(self, node) -> list[tuple]:
        kind = node[0]
        if kind == "filter":
            return [node[1]]
        if kind in ("not", "boost"):
            return self._tree_filter_preds(node[1])
        if kind in ("and", "or"):
            return [p for c in node[1] for p in self._tree_filter_preds(c)]
        return []

    @staticmethod
    def _apply_msm(q: ParsedQuery, minimum_should_match: int) -> ParsedQuery:
        if minimum_should_match <= 0:
            return q
        if q.bool_tree is not None:
            raise ValueError(
                "minimum_should_match does not apply to boolean "
                "expressions — the tree states the requirement explicitly"
            )
        if q.has_multiterm:
            raise ValueError(
                "minimum_should_match with prefix/wildcard/fuzzy clauses "
                "is not supported (expansion terms would each count as a "
                "clause)"
            )
        import dataclasses

        return dataclasses.replace(q, minimum_should_match=minimum_should_match)

    def _q(self, query: str | ParsedQuery) -> ParsedQuery:
        """Parse a query string and, on an analyzed index, rewrite the
        parsed terms through the index's token-filter chain
        (stages/analysis.analyze_parsed) so query analysis always
        matches index analysis — the ES analyzer contract.  ParsedQuery
        inputs pass through UNCHANGED: internal callers rebuild
        sub-queries from already-analyzed index terms, which must not
        be re-stemmed."""
        if not isinstance(query, str):
            return query
        q = parse_query(query)
        if self.analyzer is not None:
            from elasticsearch_assets_ray.stages.analysis import analyze_parsed

            q = analyze_parsed(q, self.analyzer)
        return q

    # ---------- search ----------
    def search(
        self,
        query: str | ParsedQuery,
        k: int = 10,
        minimum_should_match: int = 0,
        search_after: tuple[float, int] | None = None,
        from_: int = 0,
    ) -> pa.Table:
        """Top-k → pa.Table(doc_id int64, score float64), score desc,
        docID-asc tie-break.  ``minimum_should_match`` is the ES request
        parameter: a matching doc must contain at least that many
        distinct should terms (scoring unchanged).  ``search_after`` is
        the ES cursor-pagination parameter: pass the last hit's
        ``(score, doc_id)`` to fetch the next k hits strictly after that
        sort position — position compares at round-9 score granularity
        (the same granularity the value-hash / oracle ranking uses), so
        pagination is stable under float noise.  ``from_`` is the ES
        offset parameter: skip the first ``from_`` hits (fetches
        ``from_ + k`` then slices — deep offsets cost O(from+k), the
        same contract ES enforces via max_result_window; prefer
        ``search_after`` for deep paging)."""
        if from_ < 0:
            raise ValueError("from_ must be >= 0")
        if from_:
            r = self.search(
                query, k=from_ + k, minimum_should_match=minimum_should_match,
                search_after=search_after,
            )
            return r.slice(from_, k)
        q = self._q(query)
        q = self._apply_msm(q, minimum_should_match)
        if search_after is not None:
            import dataclasses

            s_raw, aid = search_after
            q = dataclasses.replace(
                q,
                search_after=(float(bm25.round_half_up(s_raw, 9)), int(aid)),
            )
        q = self._rewrite_prefixes(q)
        if q.has_phrases:
            ids, scores = self._search_phrases(q, k)
        else:
            ids, scores = self._score(q, k=k if self.prune else None)
            ids, scores = bm25.sort_topk(ids, scores, k)
        self.queries_served += 1
        self.records_served += int(ids.size)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})

    def profile(self, query: str | ParsedQuery, k: int = 10) -> dict:
        """ES ``profile: true`` analog: run the query once and return a
        per-stage timing breakdown (parse / rewrite / df+segment lookup /
        score) plus the pruning-counter DELTAS this query caused
        (buckets considered/skipped, rows fully/partially decoded) — the
        engine-side observability ES exposes per shard."""
        import time as _time

        before = dict(self.stats)
        t0 = _time.perf_counter()
        q = self._q(query)
        t1 = _time.perf_counter()
        q = self._rewrite_prefixes(q)
        t2 = _time.perf_counter()
        need = sorted(set(q.scoring_terms) | set(q.must_not))
        self._segment_rows(need)
        t3 = _time.perf_counter()
        res = self.search(q, k=k)
        t4 = _time.perf_counter()
        deltas = {f"d_{k_}": self.stats[k_] - before.get(k_, 0) for k_ in self.stats}
        return {
            "parse_ms": round((t1 - t0) * 1e3, 3),
            "rewrite_ms": round((t2 - t1) * 1e3, 3),
            "segments_ms": round((t3 - t2) * 1e3, 3),
            "search_ms": round((t4 - t3) * 1e3, 3),
            "total_ms": round((t4 - t0) * 1e3, 3),
            "hits": res.num_rows,
            **deltas,
        }

    def metrics(self) -> dict:
        """Serving gauges + pruning counters for observability exports
        (bench records, tests): queries/records served, docstore part
        files opened by hydrate, and the block-max pruning stats."""
        return {
            "queries_served": self.queries_served,
            "records_served": self.records_served,
            "hydrate_files_opened": self.hydrate_files_opened,
            **self.stats,
        }

    def suggest_terms(
        self, text: str, size: int = 5, max_edits: int = 2
    ) -> pa.Table:
        """ES term-suggester analog ("did you mean"): for each analyzed
        token of ``text``, the index terms within ``max_edits`` plain
        Levenshtein edits, ranked (distance asc, df desc, term asc) and
        truncated to ``size`` per token → pa.Table(token, suggestion,
        distance, df).  An exact-match token (distance 0) still lists —
        callers typically skip tokens whose top suggestion is
        distance 0."""
        from elasticsearch_assets_ray.query.expand import levenshtein_batch
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        out_tok, out_sug, out_d, out_df = [], [], [], []
        for tok in tokenize_text(text, self.analyzer):
            # per-token degradation, never a whole-request crash: a huge
            # edit-neighborhood narrows to 1 edit, then drops the token
            # (an ES suggester always answers)
            cands = None
            for edits in range(max_edits, 0, -1):
                try:
                    cands = self.expand_fuzzy(tok, edits, max_expansions=4096)
                    break
                except ValueError:
                    continue
            if not cands:
                continue
            seg = self._segment_rows(cands)
            df: dict[str, int] = {}
            if seg is not None:
                for t, d in zip(
                    seg["term"].to_pylist(), seg["df"].to_pylist()
                ):
                    df[t] = df.get(t, 0) + int(d)
            dist = levenshtein_batch(tok, pa.array(cands, pa.string()))
            ranked = sorted(
                (
                    (int(dist[i]), -df.get(c, 0), c)
                    for i, c in enumerate(cands)
                    if c in df
                ),
            )[:size]
            for d, negdf, c in ranked:
                out_tok.append(tok)
                out_sug.append(c)
                out_d.append(d)
                out_df.append(-negdf)
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                "suggestion": pa.array(out_sug, pa.string()),
                "distance": pa.array(out_d, pa.int64()),
                "df": pa.array(out_df, pa.int64()),
            }
        )

    def scan(self, query: str | ParsedQuery, page_size: int = 1000):
        """ES scroll/PIT analog: iterate the FULL match set in stable
        (round-9 score desc, docID asc) order as bounded pages, driven
        by ``search_after`` cursors — a generator, so callers stream
        without ever holding the whole match set (the deep-pagination
        path ES routes to scroll instead of from/size)."""
        if page_size <= 0:
            raise ValueError("page_size must be positive")
        cursor = None
        while True:
            page = self.search(query, k=page_size, search_after=cursor)
            if page.num_rows == 0:
                return
            yield page
            if page.num_rows < page_size:
                return
            cursor = (
                float(page["score"][-1].as_py()),
                int(page["doc_id"][-1].as_py()),
            )

    def terms_enum(
        self, string: str, size: int = 10, max_expansions: int = 2048
    ) -> pa.Table:
        """ES ``_terms_enum`` analog: index terms beginning with
        ``string``, ascending, with df — a sorted-dictionary read (the
        autocomplete API; no postings decode)."""
        terms = sorted(self.expand_prefix(string, max_expansions=max_expansions))[:size]
        dfs = self.term_dfs(terms)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([dfs[t] for t in terms], pa.int64()),
            }
        )

    def term_vectors(self, doc_id: int) -> pa.Table:
        """ES ``_termvectors`` analog: the doc's (term, tf) — and token
        positions when the index is positional — straight from a
        docstore content re-analysis (one pid-pruned hydrate), term-asc
        → pa.Table(term, tf, positions list<int32>)."""
        content_col = self.manifest.get("content_col")
        if not self.manifest.get("store_content") or not content_col:
            raise RuntimeError("term_vectors needs store_content=True")
        from elasticsearch_assets_ray.stages.tokenizer import doc_term_freqs

        h = self.hydrate(np.array([doc_id], dtype=np.int64), columns=[content_col])
        if h.num_rows == 0:
            raise KeyError(f"unknown doc_id {doc_id}")
        tb = doc_term_freqs(h[content_col], with_positions=True)
        order = np.argsort(tb.terms.astype(str), kind="stable")
        pos_lists = [
            tb.pos_flat[tb.pos_off[i] : tb.pos_off[i + 1]].tolist() for i in order
        ]
        return pa.table(
            {
                "term": pa.array(tb.terms[order].astype(str), pa.string()),
                "tf": pa.array(tb.tfs[order].astype(np.int64)),
                "positions": pa.array(pos_lists, pa.list_(pa.int32())),
            }
        )

    def analyze(self, text: str) -> pa.Table:
        """ES ``_analyze`` analog: the index's canonical analysis chain
        over one string → (token, position, start_offset, end_offset),
        offsets into the original text (stages/tokenizer.analyze)."""
        from elasticsearch_assets_ray.stages.tokenizer import analyze

        return analyze(text)

    def field_caps(self) -> pa.Table:
        """ES ``_field_caps`` analog: every docstore field with its
        ES-mapped type and capability flags, derived from the stored
        Parquet schema (one footer read).  The indexed content column is
        ``text`` (searchable, not aggregatable); strings map to
        ``keyword``, integers to ``long``, floats to ``double`` —
        searchable-as-filter and aggregatable."""
        import pyarrow.parquet as pq

        some = next(iter(self._pid_map().values()))
        schema = pq.read_schema(some)
        content_col = self.manifest.get("content_col")
        rows = []
        for f in schema:
            if f.name == content_col:
                es_type = "text"
                agg = False
            elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
                es_type = "keyword"
                agg = True
            elif pa.types.is_integer(f.type):
                es_type = "long"
                agg = True
            elif pa.types.is_floating(f.type):
                es_type = "double"
                agg = True
            else:
                es_type = str(f.type)
                agg = False
            rows.append((f.name, es_type, True, agg))
        return pa.table(
            {
                "field": pa.array([r[0] for r in rows], pa.string()),
                "type": pa.array([r[1] for r in rows], pa.string()),
                "searchable": pa.array([r[2] for r in rows], pa.bool_()),
                "aggregatable": pa.array([r[3] for r in rows], pa.bool_()),
            }
        ).sort_by([("field", "ascending")])

    def mget(self, doc_ids, columns: list[str] | None = None) -> pa.Table:
        """ES ``_mget`` analog: one row PER REQUESTED id, in request
        order (duplicates kept), with a ``found`` flag — missing ids keep
        their slot with null fields, exactly the ES multi-get envelope.
        One pid-pruned hydrate serves the whole batch."""
        req = np.asarray(list(doc_ids), dtype=np.int64)
        cols = None if columns is None else ["doc_id", *[c for c in columns if c != "doc_id"]]
        uniq = np.unique(req) if req.size else req
        h = self.hydrate(uniq, columns=cols)
        got = h["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(got, req)
        pos_c = np.clip(pos, 0, max(got.size - 1, 0))
        found = (got[pos_c] == req) if got.size else np.zeros(req.size, dtype=bool)
        idx = pa.array(
            np.where(found, pos_c, 0), type=pa.int64(), mask=~found
        )  # masked take → null row for misses
        body = h.take(idx)
        body = body.set_column(
            body.schema.get_field_index("doc_id"), "doc_id", pa.array(req)
        )
        return body.append_column("found", pa.array(found))

    def suggest_completion(
        self, prefix: str, size: int = 5, max_expansions: int = 4096
    ) -> pa.Table:
        """ES completion-suggester analog (prefix autosuggest): index
        terms starting with the analyzed ``prefix``, ranked by df desc /
        term asc (ES ranks by suggestion weight; df is the natural
        corpus-derived weight) → pa.Table(prefix, suggestion, df), top
        ``size``.  A dictionary read only — no postings, no scoring."""
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        toks = tokenize_text(prefix)
        if len(toks) != 1:
            raise ValueError(
                f"completion prefix {prefix!r} must analyze to one token "
                f"(got {toks})"
            )
        cands = self.expand_prefix(toks[0], max_expansions)
        dfs = self.term_dfs(cands)
        ranked = sorted(((-dfs.get(c, 0), c) for c in cands if dfs.get(c)))[:size]
        return pa.table(
            {
                "prefix": pa.array([toks[0]] * len(ranked), pa.string()),
                "suggestion": pa.array([c for _n, c in ranked], pa.string()),
                "df": pa.array([-n for n, _c in ranked], pa.int64()),
            }
        )

    def _gather_term_scores(
        self, terms: list[str], sorted_ids: np.ndarray
    ) -> np.ndarray:
        """Bag-of-words BM25 contributions of ``terms`` gathered at the
        SORTED candidate docids only (per-term postings searchsorted
        into the candidates — never a corpus-wide scatter-add).  Sorted
        term iteration and one bucket row per (term, doc) pin the float
        addition order to the normal scorer's."""
        out = np.zeros(sorted_ids.size, dtype=np.float64)
        if not terms or sorted_ids.size == 0:
            return out
        seg = self._segment_rows(terms)
        if seg is None or not seg.num_rows:
            return out
        seg_term = np.asarray(seg["term"].to_pylist(), dtype=object)
        seg_df = seg["df"].to_numpy(zero_copy_only=False)
        seg_bucket = seg["bucket"].to_numpy(zero_copy_only=False)
        df_by_term: dict[str, int] = {}
        for t, d in zip(seg_term, seg_df):
            df_by_term[t] = df_by_term.get(t, 0) + int(d)
        if self._df_override is not None:
            # doc-partitioned shard: use the coordinator's global df
            df_by_term = {
                t: self._df_override.get(t, d) for t, d in df_by_term.items()
            }
        for t in terms:
            if t not in df_by_term:
                continue
            w = bm25.math_idf(df_by_term[t], self.n_docs)
            for i in np.flatnonzero(seg_term == t):
                d, sat, _ = self._decode_row_cached(
                    seg, int(i), t, int(seg_bucket[i]), w=w
                )
                j = np.searchsorted(d, sorted_ids)
                ok = (j < d.size) & (d[np.minimum(j, d.size - 1)] == sorted_ids)
                out[ok] += w * sat[j[ok]]
        return out

    def rescore(
        self,
        query: str | ParsedQuery,
        rescore_query: str | ParsedQuery,
        k: int = 10,
        window_size: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
    ) -> pa.Table:
        """ES rescore API analog: take the primary query's top
        ``window_size`` hits (at the round-9 ranking contract), add the
        rescore query's bag-of-words BM25 over JUST those docs, and
        return the top-k by ``primary·query_weight +
        secondary·rescore_weight``.  Docs in the window that don't
        match the rescore query keep their primary score (×weight) —
        the rescore query never filters, exactly ES semantics."""
        if window_size <= 0 or k <= 0:
            raise ValueError("k and window_size must be positive")
        if k > window_size:
            raise ValueError(
                f"k ({k}) must not exceed window_size ({window_size}) — "
                "hits below the window are not rescored; widen the window"
            )
        q2 = self._q(rescore_query)
        q2 = self._rewrite_prefixes(q2)
        if (
            q2.has_phrases
            or q2.bool_tree is not None
            or q2.must
            or q2.must_not
            or q2.must_any
            or q2.filters
            or q2.not_filters
            or q2.match_filters
            or q2.not_match_filters
            or q2.range_filters
            or q2.not_range_filters
            or q2.exists_filters
            or q2.not_exists_filters
        ):
            # the window gather sums SHOULD contributions; accepting
            # match-constraining clauses here would silently ignore them
            raise ValueError(
                "rescore queries are bag-of-SHOULD-words (plain terms, "
                "prefixes, wildcards, fuzzies); +must/-not/phrases/"
                "filters/boolean expressions belong in the primary query"
            )
        r = self.all_scores(query)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        order = np.lexsort((ids, -bm25.round_half_up(sc, 9)))[:window_size]
        w_ids, w_sc = ids[order], sc[order]
        # secondary contributions gathered AT THE WINDOW ONLY
        sort2 = np.argsort(w_ids, kind="stable")
        sw = w_ids[sort2].astype(np.int64)
        sec_sorted = self._gather_term_scores(q2.scoring_terms, sw)
        sec = np.empty_like(sec_sorted)
        sec[sort2] = sec_sorted
        total = w_sc * query_weight + sec * rescore_weight
        top_i, top_s = bm25.sort_topk(w_ids, total, k)
        return pa.table({"doc_id": pa.array(top_i), "score": pa.array(top_s)})

    def function_score(
        self,
        query: str | ParsedQuery,
        field: str,
        k: int = 10,
        factor: float = 1.0,
        modifier: str = "log1p",
        missing: float = 0.0,
    ) -> pa.Table:
        """ES function_score / field_value_factor analog: every hit's
        BM25 score is MULTIPLIED by ``modifier(factor · field_value)``
        (modifier ∈ none | log1p | sqrt; null field values use
        ``missing``) — e.g. popularity or recency boosting from a
        stored metadata column.  Exhaustive over the match set (the
        factor is unbounded, so no score-only pruning bound holds);
        field reads are pid-pruned via :meth:`hydrate`."""
        mods = {
            "none": lambda v: v,
            "log1p": np.log1p,
            "sqrt": np.sqrt,
        }
        if modifier not in mods:
            raise ValueError(f"unknown modifier {modifier!r} ({sorted(mods)})")
        return self._field_scored(
            query, field, k, missing, lambda sc, v: sc * mods[modifier](factor * v)
        )

    def _field_scored(self, query, field, k, missing, score_fn) -> pa.Table:
        """Shared body of the field-scoring family (function_score /
        decay_score multipliers, rank_feature addends): exhaustive
        match-set scores combined per doc with one pid-pruned docstore
        column via ``score_fn(scores, values)``."""
        r = self.all_scores(query)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        order = np.argsort(ids)
        ids, sc = ids[order], sc[order]
        v = self.field_values_for(ids.astype(np.int64), field)
        v = np.where(np.isnan(v), missing, v)
        total = score_fn(sc, v)
        top_i, top_s = bm25.sort_topk(ids, total, k)
        return pa.table({"doc_id": pa.array(top_i), "score": pa.array(top_s)})

    def rank_feature(
        self,
        query: str | ParsedQuery,
        field: str,
        k: int = 10,
        boost: float = 1.0,
        function: str = "saturation",
        pivot: float = 1.0,
        scaling: float = 1.0,
        exponent: float = 1.0,
        missing: float = 0.0,
    ) -> pa.Table:
        """ES ``rank_feature`` query in a bool-should context: each hit's
        BM25 score gets ``boost · f(v)`` ADDED, where v is the doc's
        value of a stored numeric feature column and f is one of ES's
        three monotone shapes — saturation v/(v+pivot), log
        ln(scaling + v), sigmoid v^exp/(v^exp + pivot^exp)
        (www.elastic.co/docs rank-feature-query; the reference delegates
        this via its raw-search escape hatch).  ES derives a default
        pivot from the index's approximate feature median; here pivot is
        explicit so results are deterministic.  Candidates = the text
        query's matches (the feature clause boosts, never selects)."""
        fns = {
            "saturation": lambda v: v / (v + pivot),
            "log": lambda v: np.log(scaling + v),
            "sigmoid": lambda v: v**exponent / (v**exponent + pivot**exponent),
        }
        if function not in fns:
            raise ValueError(f"unknown rank_feature function {function!r} ({sorted(fns)})")
        return self._field_scored(
            query, field, k, missing, lambda sc, v: sc + boost * fns[function](v)
        )

    def distance_feature(
        self,
        query: str | ParsedQuery,
        field: str,
        origin: float,
        pivot: float,
        k: int = 10,
        boost: float = 1.0,
        missing: float = 0.0,
    ) -> pa.Table:
        """ES ``distance_feature`` query in a bool-should context:
        ``boost · pivot / (pivot + |v − origin|)`` ADDED to BM25 —
        proximity boosting for dates/numbers/geo (www.elastic.co/docs
        distance-feature-query; the score halves at distance ``pivot``).
        Like rank_feature the addend is a pure per-doc function of one
        stored column, so shard-local top-k merges stay exact."""
        if pivot <= 0:
            raise ValueError("distance_feature pivot must be > 0")
        return self._field_scored(
            query, field, k, missing,
            lambda sc, v: sc + boost * (pivot / (pivot + np.abs(v - origin))),
        )

    def script_score(
        self,
        query: str | ParsedQuery,
        field: str,
        script,
        k: int = 10,
        params: dict | None = None,
        missing: float = 0.0,
    ) -> pa.Table:
        """ES ``script_score`` query: the script REPLACES the relevance
        score, computed from ``_score`` and one stored numeric column
        (doc values).  ``script`` is a registered score-script name (see
        :func:`register_score_script`) or a vectorized callable
        ``fn(scores, values, params) -> np.ndarray``; negative outputs
        raise, matching ES's script_score contract."""
        fn = _SCORE_SCRIPTS[script] if isinstance(script, str) else script
        p = dict(params or {})

        def combine(sc: np.ndarray, v: np.ndarray) -> np.ndarray:
            out = np.asarray(fn(sc, v, p), dtype=np.float64)
            if out.shape != sc.shape:
                raise ValueError("score script must return one score per hit")
            # NaN/inf must be rejected BEFORE the sign check: nan < 0.0
            # is False, so a min()-only guard silently passes NaN through
            if out.size and not np.isfinite(out).all():
                raise ValueError("script_score produced a non-finite score")
            if out.size and float(out.min()) < 0.0:
                raise ValueError(
                    "script_score produced a negative score (ES forbids this)"
                )
            return out

        return self._field_scored(query, field, k, missing, combine)

    def terms_set(
        self,
        terms: list[str],
        min_field: str,
        k: int = 10,
        min_offset: int = 0,
        min_mod: int = 0,
    ) -> pa.Table:
        """ES ``terms_set`` query with ``minimum_should_match_field``:
        a doc matches iff at least m DISTINCT terms of ``terms`` appear
        in it, where m is the doc's own value of numeric docstore column
        ``min_field`` (Lucene CoveringQuery semantics: candidates are
        the union of the per-term match sets, so m ≤ 0 admits every doc
        containing ≥1 term, and m > len(terms) can never match).
        Scoring is bool-should BM25 over the PRESENT terms.  The stored
        value can be affine-adjusted (m = offset + value, or
        offset + value % mod when ``min_mod`` > 0) so any numeric column
        can serve as the requirement field.  Per-term membership is
        score-free (match_ids); only the surviving docs' BM25 comes from
        the scored pass."""
        uniq = sorted(set(terms))
        if not uniq:
            raise ValueError("terms_set needs at least one term")
        r = self.all_scores(" ".join(uniq))
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        order = np.argsort(ids)
        ids, sc = ids[order], sc[order]
        cnt = np.zeros(ids.size, dtype=np.int64)
        for t in uniq:
            m = np.sort(self.match_ids(t))
            if m.size == 0:
                continue
            pos = np.searchsorted(m, ids)
            pos[pos >= m.size] = 0
            cnt += (m[pos] == ids).astype(np.int64)
        need = self.field_values_for(ids.astype(np.int64), min_field)
        if min_mod > 0:
            need = np.mod(need, float(min_mod))
        need = need + float(min_offset)
        keep = cnt >= need  # NaN requirement (missing field) never matches
        top_i, top_s = bm25.sort_topk(ids[keep], sc[keep], k)
        return pa.table({"doc_id": pa.array(top_i), "score": pa.array(top_s)})

    # pinned docs outrank any BM25 score; spaced so round(score, 9) keeps
    # the given pin order exactly
    PINNED_BASE = 1.0e9

    def pinned(
        self, pin_ids: list[int], query: str | ParsedQuery, k: int = 10
    ) -> pa.Table:
        """ES ``pinned`` query: the given internal docIDs rank first IN
        THE ORDER GIVEN (artificial descending scores PINNED_BASE − i,
        above any organic BM25 — ES uses the same trick with
        Float.MAX_VALUE/2 − rank), organic matches follow by BM25 with
        the pinned ids removed.  Pinned ids absent from the index are
        dropped (ES only surfaces pins that resolve)."""
        pins = list(dict.fromkeys(int(i) for i in pin_ids))  # order-keeping dedup
        present = self.hydrate(
            np.array(pins, dtype=np.int64), columns=["doc_id"]
        )["doc_id"].to_numpy(zero_copy_only=False)
        pset = set(present.tolist())
        pins = [i for i in pins if i in pset][:k]
        r = self.all_scores(query)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        if pins:
            mask = ~np.isin(ids, np.array(pins, dtype=ids.dtype if ids.size else np.int64))
            ids, sc = ids[mask], sc[mask]
        o_ids, o_sc = bm25.sort_topk(ids, sc, max(0, k - len(pins)))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        [np.array(pins, dtype=np.int64), o_ids.astype(np.int64)]
                    )
                ),
                "score": pa.array(
                    np.concatenate(
                        [
                            self.PINNED_BASE - np.arange(len(pins), dtype=np.float64),
                            o_sc,
                        ]
                    )
                ),
            }
        )

    def decay_score(
        self,
        query: str | ParsedQuery,
        field: str,
        kind: str,
        origin: float,
        scale: float,
        offset: float = 0.0,
        decay: float = 0.5,
        k: int = 10,
        missing: float = 0.0,
    ) -> pa.Table:
        """ES function_score DECAY functions (gauss | exp | linear):
        BM25 × decay(|field − origin|), the distance-based boosting ES
        documents for recency/geo/price proximity.  Multiplier formulas
        match ES exactly (decay value reached at distance ``scale``
        beyond ``offset``); constants are precomputed so the SQL twin
        embeds the identical doubles."""
        return self._field_scored(
            query, field, k, missing,
            lambda sc, v: sc * decay_multiplier(kind, v, origin, scale, offset, decay),
        )

    def random_score(
        self,
        query: str | ParsedQuery,
        seed: str = "0",
        k: int = 10,
        id_field: str | None = None,
    ) -> pa.Table:
        """ES function_score ``random_score`` (seeded, reproducible):
        BM25 × u(doc) with u = (splitmix64(horner(f"{id}:{seed}"))
        >> 11) / 2^53 ∈ [0, 1).  ES derives the variate from the seed
        plus a per-document field (default ``_seq_no``); here the id is
        the internal docID, or a stored numeric id column when
        ``id_field`` names one (e.g. ``orig_doc_id``, which is what the
        SQL twin hashes).  Either way the multiplier is a pure per-doc
        function, so shard-local top-k merges are exact (same argument
        as decay).  The >>11 keeps the dividend under 2^53, so the
        float64 quotient is exact and the DuckDB twin (HUGEINT
        splitmix64 emulation, pipelines/oracles_hard.py) reproduces it
        bit-for-bit."""
        from elasticsearch_assets_ray.stages.sampling import id_hash

        r = self.all_scores(query)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        ids = ids.astype(np.int64)
        if id_field is None:
            keys = ids
        else:
            # stored id columns are integers < 2^53 — the float64
            # round-trip through the numeric column cache is exact
            keys = self.field_values_for(ids, id_field).astype(np.int64)
        h = id_hash(pa.array(keys), seed) >> np.uint64(11)
        total = sc * (h.astype(np.float64) / float(1 << 53))
        top_i, top_s = bm25.sort_topk(ids, total, k)
        return pa.table({"doc_id": pa.array(top_i), "score": pa.array(top_s)})

    def highlight(
        self,
        query: str | ParsedQuery,
        docids: np.ndarray,
        window: int = 10,
    ) -> pa.Table:
        """Deterministic highlighter: for each doc, the ``window``-token
        span containing the MOST of the query's analyzed scoring terms
        (after multi-term expansion), earliest span on ties →
        pa.Table(doc_id, start, n_matched, snippet).  ``start`` is the
        1-based token index; a doc with no matching term reports
        n_matched 0 with its leading window; a doc with no analyzable
        content yields no row (ES returns no highlight).  (ES
        highlighters re-run
        the query per fragment; this is the vectorized-window analog —
        the span-selection contract is exact and oracle-checked.)"""
        if window <= 0:
            raise ValueError("window must be positive")
        content_col = self.manifest.get("content_col")
        if not self.manifest.get("store_content") or not content_col:
            raise RuntimeError("highlight needs store_content=True")
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        q = self._q(query)
        q = self._rewrite_prefixes(q)
        terms = set(q.scoring_terms)
        # phrase-prefix stems highlight their expansions too
        for _p, stem in q.phrase_prefixes:
            terms |= set(stem) if isinstance(stem, frozenset) else set(self.expand_prefix(stem))
        docids = np.asarray(docids, dtype=np.int64)
        h = self.hydrate(np.sort(docids), columns=["doc_id", content_col])
        texts = dict(
            zip(h["doc_id"].to_pylist(), h[content_col].to_pylist())
        )
        out_d, out_s, out_n, out_t = [], [], [], []
        for d in docids.tolist():
            toks = tokenize_text(texts.get(int(d)) or "", self.analyzer)
            n = len(toks)
            if n == 0:
                continue  # no analyzable content → no highlight (ES-like)
            m = np.fromiter((t in terms for t in toks), dtype=np.int64, count=n)
            # windowed match counts via cumsum difference (vectorized)
            cum = np.concatenate(([0], np.cumsum(m)))
            hi = np.minimum(np.arange(n) + window, n)
            counts = cum[hi] - cum[:n]
            best = int(np.argmax(counts))  # argmax takes the FIRST max
            out_d.append(d)
            out_s.append(best + 1)  # 1-based
            out_n.append(int(counts[best]))
            out_t.append(" ".join(toks[best : best + window]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "start": pa.array(out_s, pa.int64()),
                "n_matched": pa.array(out_n, pa.int64()),
                "snippet": pa.array(out_t, pa.string()),
            }
        )

    def lookup_docids(self, values, col: str = "orig_doc_id") -> dict:
        """Reverse id lookup: docstore value → internal docID, via one
        column-pruned read per part file (a gate/REPL convenience — at
        serving scale keep the forward map from your own ingest)."""
        vals = pa.array(values)
        out: dict = {}
        for _pid, f in sorted(self._pid_map().items()):
            t = pq.read_table(f, columns=["doc_id", col])
            m = pc.is_in(t[col], value_set=vals)
            hit = t.filter(m)
            for d, v in zip(hit["doc_id"].to_pylist(), hit[col].to_pylist()):
                out[v] = int(d)
        return out

    # ---------- join field (ES parent/child), index-resident ----------
    def _join_meta(self) -> tuple[str, str, dict]:
        """(join col, routing col, relations) from the manifest — set by
        index/routing.py build_routed_index(join_field=...)."""
        jf = self.manifest.get("join_field")
        if not jf:
            raise ValueError(
                "index has no join_field mapping; build it with "
                "build_routed_index(join_field=...)"
            )
        routing = self.manifest.get("routing") or {}
        if not routing.get("col"):
            raise ValueError("join_field requires a routed index")
        return jf["col"], routing["col"], jf.get("relations", {})

    def _resolve_relation(
        self, parent: str | None, child: str | None
    ) -> tuple[str, str]:
        _, _, relations = self._join_meta()
        if parent is None:
            if len(relations) != 1:
                raise ValueError(
                    f"index declares relations {sorted(relations)}; pass parent="
                )
            parent = next(iter(relations))
        kids = relations.get(parent) or []
        if child is None:
            if len(kids) != 1:
                raise ValueError(
                    f"relation {parent!r} has children {kids}; pass child="
                )
            child = kids[0]
        elif child not in kids:
            raise ValueError(f"{child!r} is not a child of {parent!r} ({kids})")
        return parent, child

    def _join_map(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        """(sorted routing values, aligned docids) of live docs whose
        join field == name, restricted to this searcher's bucket range —
        the ES global-ordinals / parent-id-map analog, built once per
        searcher from the docstore and cached (memory ∝ docs of that
        relation in this shard, exactly like ES's eager global
        ordinals)."""
        hit = self._join_cache.get(name)
        if hit is not None:
            return hit
        join_col, routing_col, _ = self._join_meta()
        t = self.hydrate(
            self.live_ids(), columns=["doc_id", join_col, routing_col]
        )
        t = t.filter(pc.equal(t[join_col], pa.scalar(name)))
        routing = t[routing_col].to_numpy(zero_copy_only=False)
        docids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(routing, kind="stable")
        out = (routing[order], docids[order])
        self._join_cache[name] = out
        return out

    def has_child(
        self,
        child_query: "str | ParsedQuery",
        *,
        parent: str | None = None,
        child: str | None = None,
        score_mode: str = "none",
        min_children: int = 1,
        max_children: int | None = None,
        k: int | None = 10,
        score_field: str | None = None,
        _df: dict[str, int] | None = None,
    ) -> pa.Table:
        """ES ``has_child`` served FROM THE INDEX: parents (join field ==
        ``parent``) with ≥min_children (≤max_children) children matching
        ``child_query``, scored per ``score_mode`` over either the
        children's BM25 relevance (default, the ES behavior) or a stored
        numeric ``score_field`` (the function_score-style variant the
        integer-cents gates use for bit-determinism).

        Shard-local by construction: a routed index (routing = parent id,
        index/routing.py) co-locates each parent with ALL its children in
        one bucket range, so a bucket-range searcher computes its parents'
        results completely and the sharded gather is a plain top-k merge
        (reference: ES join-field routing contract; the reference repo
        delegates this entirely to ES).

        Output: (<routing col>, parent_doc_id, n_children, score), sorted
        by (score desc, routing asc), head(k) when k is not None."""
        if score_mode not in ("none", "sum", "max", "min", "avg"):
            raise ValueError(f"unknown score_mode {score_mode!r}")
        if min_children < 1:
            raise ValueError("min_children must be >= 1")
        parent, child = self._resolve_relation(parent, child)
        join_col, routing_col, _ = self._join_meta()
        need_bm25 = score_mode != "none" and score_field is None

        if _df is not None:
            q = child_query
            if need_bm25:
                st = self.all_scores_prepared(q, _df)
                ids = st["doc_id"].to_numpy(zero_copy_only=False)
                child_scores = st["score"].to_numpy(zero_copy_only=False)
            else:
                ids = self.match_ids_prepared(q, _df)
                child_scores = None
        else:
            if need_bm25:
                st = self.all_scores(child_query)
                ids = st["doc_id"].to_numpy(zero_copy_only=False)
                child_scores = st["score"].to_numpy(zero_copy_only=False)
            else:
                ids = self.match_ids(child_query)
                child_scores = None

        cols = ["doc_id", join_col, routing_col]
        if score_field is not None:
            cols.append(score_field)
        t = self.hydrate(np.sort(ids), columns=cols)
        mask = pc.equal(t[join_col], pa.scalar(child))
        t = t.filter(mask)
        routing = t[routing_col].to_numpy(zero_copy_only=False)
        if score_field is not None:
            col = t[score_field].combine_chunks()
            if pa.types.is_integer(col.type):
                # exact integer accumulation: float64 weights round past
                # 2^53 where the SQL twin's HUGEINT SUM stays exact — sum
                # in int64, cast to float ONCE at the end (both sides
                # then round identically, at the same single point)
                vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            else:
                vals = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
        elif child_scores is not None:
            # align scores to the hydrated (sorted, child-filtered) rows
            srt = np.argsort(ids, kind="stable")
            sid, ssc = ids[srt], child_scores[srt]
            rows = t["doc_id"].to_numpy(zero_copy_only=False)
            vals = ssc[np.searchsorted(sid, rows)]
        else:
            vals = np.zeros(len(routing), dtype=np.float64)

        uniq, inv = np.unique(routing, return_inverse=True)
        n = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(uniq.size))
        if uniq.size:
            # reduceat preserves dtype — int64 sums stay exact (bincount's
            # weights= path accumulates in float64 regardless of input)
            sums = np.add.reduceat(vals[order], starts)
            mx = np.maximum.reduceat(vals[order], starts)
            mn = np.minimum.reduceat(vals[order], starts)
        else:
            sums = np.empty(0, dtype=vals.dtype)
            mx = mn = np.empty(0, dtype=vals.dtype)

        pr, pd = self._join_map(parent)
        pos = np.searchsorted(pr, uniq)
        pos_c = np.clip(pos, 0, max(pr.size - 1, 0))
        found = (pr[pos_c] == uniq) if pr.size else np.zeros(uniq.size, dtype=bool)
        keep = found & (n >= min_children)
        if max_children is not None:
            keep &= n <= max_children
        uniq, n, sums, mx, mn, pos_c = (
            uniq[keep], n[keep], sums[keep], mx[keep], mn[keep], pos_c[keep]
        )
        if score_mode == "none":
            score = np.zeros(uniq.size, dtype=np.float64)
        elif score_mode == "sum":
            score = sums
        elif score_mode == "avg":
            score = sums / n
        elif score_mode == "max":
            score = mx
        else:
            score = mn
        out = pa.table(
            {
                routing_col: pa.array(uniq),
                "parent_doc_id": pa.array(pd[pos_c]),
                "n_children": pa.array(n),
                # single terminal cast: exact int64 partials become the
                # public float64 score here and nowhere earlier
                "score": pa.array(np.asarray(score, dtype=np.float64)),
            }
        )
        idx = pc.sort_indices(
            out,
            sort_keys=[("score", "descending"), (routing_col, "ascending")],
        )
        out = out.take(idx)
        return out.slice(0, k) if k is not None else out

    def has_parent(
        self,
        parent_query: "str | ParsedQuery",
        *,
        parent: str | None = None,
        child: str | None = None,
        score: bool = False,
        score_field: str | None = None,
        k: int | None = 10,
        _df: dict[str, int] | None = None,
    ) -> pa.Table:
        """ES ``has_parent`` served from the index: children whose parent
        matches ``parent_query``, each child carrying the parent's
        relevance when ``score=True`` (BM25 by default, or a stored
        numeric ``score_field``) and 0.0 otherwise — the ES contract.
        Shard-local under routing co-location, like :meth:`has_child`.

        Output: (<routing col>, child_doc_id, score), sorted by
        (score desc, child_doc_id asc), head(k) when k is not None."""
        parent, child = self._resolve_relation(parent, child)
        join_col, routing_col, _ = self._join_meta()
        need_bm25 = score and score_field is None

        if _df is not None:
            if need_bm25:
                st = self.all_scores_prepared(parent_query, _df)
                ids = st["doc_id"].to_numpy(zero_copy_only=False)
                pscores = st["score"].to_numpy(zero_copy_only=False)
            else:
                ids = self.match_ids_prepared(parent_query, _df)
                pscores = None
        else:
            if need_bm25:
                st = self.all_scores(parent_query)
                ids = st["doc_id"].to_numpy(zero_copy_only=False)
                pscores = st["score"].to_numpy(zero_copy_only=False)
            else:
                ids = self.match_ids(parent_query)
                pscores = None

        cols = ["doc_id", join_col, routing_col]
        if score and score_field is not None:
            cols.append(score_field)
        t = self.hydrate(np.sort(ids), columns=cols)
        t = t.filter(pc.equal(t[join_col], pa.scalar(parent)))
        m_routing = t[routing_col].to_numpy(zero_copy_only=False)
        if not score:
            m_scores = np.zeros(len(m_routing), dtype=np.float64)
        elif score_field is not None:
            m_scores = t[score_field].cast(pa.float64()).to_numpy(zero_copy_only=False)
        else:
            srt = np.argsort(ids, kind="stable")
            sid, ssc = ids[srt], pscores[srt]
            rows = t["doc_id"].to_numpy(zero_copy_only=False)
            m_scores = ssc[np.searchsorted(sid, rows)]

        ro = np.argsort(m_routing, kind="stable")
        m_routing, m_scores = m_routing[ro], m_scores[ro]

        cr, cd = self._join_map(child)
        pos = np.searchsorted(m_routing, cr)
        pos_c = np.clip(pos, 0, max(m_routing.size - 1, 0))
        hit = (
            (m_routing[pos_c] == cr)
            if m_routing.size
            else np.zeros(cr.size, dtype=bool)
        )
        out = pa.table(
            {
                routing_col: pa.array(cr[hit]),
                "child_doc_id": pa.array(cd[hit]),
                "score": pa.array(m_scores[pos_c[hit]]),
            }
        )
        idx = pc.sort_indices(
            out,
            sort_keys=[("score", "descending"), ("child_doc_id", "ascending")],
        )
        out = out.take(idx)
        return out.slice(0, k) if k is not None else out

    def search_collapse(
        self, query: str | ParsedQuery, k: int = 10, collapse: str = ""
    ) -> pa.Table:
        """ES field collapsing: top-k hits keeping only the BEST hit per
        distinct value of docstore column ``collapse`` →
        pa.Table(doc_id, score, <collapse>).  Winner-per-group and the
        final ranking both compare at round-9 score granularity with
        docid-asc tie-break (the oracle ranking contract).  Docs with a
        null collapse value each form their own group (ES keeps them
        as singletons)."""
        if not collapse:
            raise ValueError("collapse field is required")
        r = self.all_scores(query)
        return self.collapse_ids(
            r["doc_id"].to_numpy(zero_copy_only=False),
            r["score"].to_numpy(zero_copy_only=False),
            k,
            collapse,
        )

    def collapse_ids(
        self, ids: np.ndarray, sc: np.ndarray, k: int, collapse: str
    ) -> pa.Table:
        """Field collapsing over an explicit scored match set — the
        shard-side partial of distributed collapse.  Merging K shards'
        local collapsed top-k and re-collapsing is EXACT: a group's
        global winner is some shard's local winner, and if it missed that
        shard's top-k then ≥k groups outrank it globally too."""
        if ids.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    collapse: pa.array([], pa.string()),
                }
            )
        order = np.argsort(ids)
        ids, sc = ids[order], sc[order]
        vals = self.hydrate(ids, columns=[collapse])[collapse]
        vals = pc.cast(vals.combine_chunks(), pa.string())
        sel = collapse_winners(ids, sc, vals, k)
        return pa.table(
            {
                "doc_id": pa.array(ids[sel]),
                "score": pa.array(sc[sel]),
                collapse: vals.take(pa.array(sel, type=pa.int64())),
            }
        )

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        fetch_k: int | None = None,
    ) -> pa.Table:
        """ES more_like_this analog: select the source doc's
        ``max_query_terms`` highest tf×idf terms (tie: term asc), run
        them as a bag-of-words should query, and return the top-k hits
        excluding the source doc itself."""
        sel = self._mlt_terms(doc_id, max_query_terms)
        if not sel:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        q = ParsedQuery(should=sorted(sel))
        r = self.search(q, k=(fetch_k or k + 1))
        keep = r["doc_id"].to_numpy(zero_copy_only=False) != doc_id
        r = r.filter(pa.array(keep))
        return r.slice(0, k)

    def _mlt_terms(self, doc_id: int, max_query_terms: int) -> list[str]:
        """more_like_this term selection: the source doc's top
        ``max_query_terms`` tf×idf terms (tie: term asc).  Shared with
        the sharded coordinator (which runs it on its full-index view —
        term_dfs there is global df by construction)."""
        content_col = self.manifest.get("content_col")
        if not self.manifest.get("store_content") or not content_col:
            raise RuntimeError("more_like_this needs store_content=True")
        src = self.hydrate(np.array([doc_id], dtype=np.int64), columns=[content_col])
        if src.num_rows == 0:
            raise ValueError(f"doc_id {doc_id} not found")
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        toks = tokenize_text(src[content_col][0].as_py(), self.analyzer)
        if not toks:
            return []
        uniq, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        df = self.term_dfs([str(t) for t in uniq])
        w = np.array(
            [
                tf[i] * bm25.math_idf(df[str(t)], self.n_docs)
                if str(t) in df
                else -np.inf
                for i, t in enumerate(uniq)
            ]
        )
        order = np.lexsort((uniq.astype(str), -w))
        return [str(uniq[i]) for i in order[:max_query_terms] if np.isfinite(w[i])]

    def facet(
        self, query: str | ParsedQuery, by: str, size: int | None = None
    ) -> pa.Table:
        """ES ``terms`` aggregation analog: value counts of docstore
        column ``by`` over every doc matching ``query`` →
        pa.Table(value, count), count-desc / value-asc (the ES terms-agg
        bucket order), optionally truncated to the top ``size`` buckets.
        The match set is exhaustive (aggregations see all hits, not the
        fetch page); the column read is pid-pruned via :meth:`hydrate`."""
        ids = (
            self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        )
        return self.facet_ids(ids, by, size)

    def facet_ids(
        self, ids: np.ndarray, by: str, size: int | None = None
    ) -> pa.Table:
        """Value counts of docstore column ``by`` over an explicit match
        set — the shard-side partial of the distributed terms agg (a
        bucket-range searcher's match set is its local partial; the
        coordinator merges K small bucket tables, never doc ids)."""
        vals = self.hydrate(np.sort(ids), columns=[by])[by]
        # ES terms agg skips missing values
        vc = pc.value_counts(
            pc.drop_null(pc.cast(vals.combine_chunks(), pa.string()))
        )
        t = pa.table(
            {"value": vc.field("values"), "count": vc.field("counts")}
        )
        t = t.sort_by([("count", "descending"), ("value", "ascending")])
        return t.slice(0, size) if size is not None else t

    def histogram(
        self, query: str | ParsedQuery, field: str, interval: float
    ) -> pa.Table:
        """ES ``histogram`` aggregation analog over a numeric docstore
        column: buckets keyed by ``floor(value / interval) * interval``
        with hit counts → pa.Table(bucket, count), bucket-asc.  Empty
        buckets are omitted (ES ``min_doc_count=1``)."""
        if interval <= 0:
            raise ValueError("interval must be positive")
        ids = (
            self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        )
        return self.histogram_ids(ids, field, interval)

    def histogram_ids(
        self, ids: np.ndarray, field: str, interval: float
    ) -> pa.Table:
        """Histogram buckets over an explicit match set (the shard-side
        partial of the distributed histogram agg)."""
        vals = self.hydrate(np.sort(ids), columns=[field])[field]
        v = (
            pc.drop_null(vals.combine_chunks())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        bucket = np.floor(v / interval) * interval
        uniq, counts = np.unique(bucket, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uniq), "count": pa.array(counts.astype(np.int64))}
        )

    def value_counts_ids(self, ids: np.ndarray, field: str) -> pa.Table:
        """(value, count) of a NUMERIC docstore column over an explicit
        match set, value-ascending — the mergeable shard partial behind
        the exact distributed ``stats`` / ``percentiles`` aggregations.
        Partial size is bounded by the column's distinct cardinality,
        never the match size (the t-digest sketch is the documented swap
        for unbounded-cardinality fields)."""
        v = self.field_values_for(np.asarray(ids, dtype=np.int64), field)
        v = v[~np.isnan(v)]
        uniq, counts = np.unique(v, return_counts=True)
        return pa.table(
            {
                "value": pa.array(uniq.astype(np.float64)),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    def composite_ids(
        self,
        ids: np.ndarray,
        sources: tuple[tuple[str, float | None], ...],
        size: int | None = None,
        after: tuple | None = None,
    ) -> pa.Table:
        """ES ``composite`` aggregation over an explicit match set — the
        shard-side partial of the paginated bucket scan.  ``sources`` is
        a tuple of (field, interval): interval None means a ``terms``
        source (string key), a float means a ``histogram`` source
        (``floor(v/interval)·interval`` key).  Buckets are ordered
        ascending by the key tuple (ES's default source order); rows
        with ANY null source value are skipped (ES default
        ``missing_bucket: false``); ``after`` keeps only keys strictly
        greater in tuple-lexicographic order; ``size`` truncates AFTER
        the ordering, making the partial exactly "my first ``size``
        buckets after the cursor"."""
        names = [f for f, _ in sources]
        tab = self.hydrate(np.sort(ids), columns=names)
        keys: dict[str, pa.Array] = {}
        for f, interval in sources:
            arr = tab[f].combine_chunks()
            if interval is None:
                keys[f] = pc.cast(arr, pa.string())
            else:
                v = pc.cast(arr, pa.float64())
                keys[f] = pc.multiply(
                    pc.floor(pc.divide(v, pa.scalar(float(interval)))),
                    pa.scalar(float(interval)),
                )
        kt = pa.table(keys)
        valid = None
        for c in names:
            m = pc.is_valid(kt[c])
            valid = m if valid is None else pc.and_(valid, m)
        if valid is not None:
            kt = kt.filter(valid)
        g = kt.group_by(names).aggregate([([], "count_all")])
        g = pa.table(
            {**{c: g[c] for c in names}, "count": g["count_all"].cast(pa.int64())}
        ).sort_by([(c, "ascending") for c in names])
        if after is not None:
            g = g.filter(_after_mask(g, names, after))
        return g.slice(0, size) if size is not None else g

    def search_filtered_by(
        self,
        query: str | ParsedQuery,
        filter_query: str | ParsedQuery,
        k: int = 10,
    ) -> pa.Table:
        """FILTER-CONTEXT composition (ES bool.filter / filtered alias):
        rank ``query``'s matches restricted to ``filter_query``'s match
        set — the filter is evaluated score-free and hit scores are the
        raw query's, unchanged (filters never contribute to BM25)."""
        r = self.all_scores(query)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        fids = np.sort(self.match_ids(filter_query))
        if fids.size and ids.size:
            pos = np.searchsorted(fids, ids)
            pos[pos >= fids.size] = 0
            keep = fids[pos] == ids
            ids, sc = ids[keep], sc[keep]
        else:
            ids = np.empty(0, dtype=np.int64)
            sc = np.empty(0, dtype=np.float64)
        ids, sc = bm25.sort_topk(ids, sc, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})

    def count_filtered_by(
        self, query: str | ParsedQuery, filter_query: str | ParsedQuery
    ) -> int:
        """Score-free count of the filter-context intersection."""
        a = np.sort(self.match_ids(query))
        b = np.sort(self.match_ids(filter_query))
        return int(np.intersect1d(a, b, assume_unique=True).size)

    def explain(self, query: str | ParsedQuery, doc_id: int) -> pa.Table:
        """ES ``_explain`` analog: the per-term BM25 breakdown of one
        (query, doc) pair — (term, tf, df, idf, tf_norm, contribution)
        for every matching scoring term, in sorted term order.  The
        floats route through the SAME kernels as scoring (math_idf /
        tf_saturation), and sorted-term-order summation is the engine's
        accumulation order, so Σ contribution reproduces the search
        score BIT-exactly (pinned in tests).  Flat bag-of-words queries
        only — trees/phrases score through compound paths whose
        breakdown isn't a per-term sum."""
        q = self._q(query)
        q = self._rewrite_prefixes(q)
        if q.bool_tree is not None or q.has_phrases:
            raise ValueError("explain supports flat bag-of-words queries")
        terms = q.scoring_terms
        tv = self.term_vectors(doc_id)
        tf_by = dict(zip(tv["term"].to_pylist(), tv["tf"].to_pylist()))
        dfs = self.term_dfs(terms)
        if self._df_override is not None:
            dfs = {t: self._df_override.get(t, d) for t, d in dfs.items()}
        dl = self.doclens_for(np.array([doc_id], dtype=np.int64)).astype(np.float64)
        rows = []
        for t in terms:
            tf = int(tf_by.get(t, 0))
            df_t = int(dfs.get(t, 0))
            if tf == 0 or df_t == 0:
                continue  # ES explain lists only matching clauses
            w = bm25.math_idf(df_t, self.n_docs)
            sat = float(
                bm25.tf_saturation(np.array([tf], dtype=np.float64), dl, self.avgdl)[0]
            )
            rows.append((t, tf, df_t, w, sat, float(w * sat)))
        return pa.table(
            {
                "term": pa.array([r[0] for r in rows], pa.string()),
                "tf": pa.array([r[1] for r in rows], pa.int64()),
                "df": pa.array([r[2] for r in rows], pa.int64()),
                "idf": pa.array([r[3] for r in rows], pa.float64()),
                "tf_norm": pa.array([r[4] for r in rows], pa.float64()),
                "contribution": pa.array([r[5] for r in rows], pa.float64()),
            }
        )

    def rare_terms(
        self, query: str | ParsedQuery, by: str, max_doc_count: int = 1
    ) -> pa.Table:
        """ES ``rare_terms`` aggregation: the long tail — buckets whose
        TOTAL count is ≤ ``max_doc_count``, ordered count-ascending then
        value-ascending (rarest first).  Needs untruncated global counts
        (a term locally rare may be globally common), which is why the
        distributed path merges full per-shard facet partials before
        filtering — ES approximates this with a CuckooFilter; ours is
        exact."""
        ids = self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        return rare_from_facet(self.facet_ids(ids, by, size=None), max_doc_count)

    def multi_terms(
        self, query: str | ParsedQuery, fields: tuple[str, ...], size: int | None = None
    ) -> pa.Table:
        """ES ``multi_terms`` aggregation: buckets keyed by a tuple of
        fields, count-descending (then keys ascending), docs missing any
        key skipped — the composite key machinery reused with the terms
        agg's ordering."""
        ids = self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        part = self.composite_ids(ids, tuple((f, None) for f in fields))
        return multi_terms_from_parts([part], list(fields), size)

    def mad(self, query: str | ParsedQuery, field: str) -> float | None:
        """ES ``median_absolute_deviation`` aggregation — exact (ES
        itself computes it over t-digests): median of |x − median(x)|,
        both medians at the linear-interpolation convention shared with
        :meth:`percentiles` / SQL ``quantile_cont``."""
        return mad_from_value_counts(self.value_counts(query, field))

    def composite(
        self,
        query: str | ParsedQuery,
        sources: tuple[tuple[str, float | None], ...],
        size: int = 10,
        after: tuple | None = None,
    ) -> tuple[pa.Table, tuple | None]:
        """ES ``composite`` aggregation (single-process path): one page
        of ``size`` buckets after the ``after`` cursor, plus the
        ``after_key`` to resume from (None when the page is empty).
        Unlike ``terms``, composite never ranks by count — it scans the
        bucket space in key order, which is what makes it paginate a
        bucket space too large to materialize (the ES-blessed way to
        stream ALL buckets at 100 TB)."""
        ids = self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        page = self.composite_ids(ids, sources, size, after)
        return page, _composite_after_key(page, [f for f, _ in sources])

    def live_ids(self) -> np.ndarray:
        """Every live (non-tombstoned) docID this searcher serves,
        sorted — the ES ``global`` aggregation's bucket (all docs of the
        shard, IGNORING any query context).  Built from the docstore
        layout alone (docid = pid<<shift + row): no postings are
        touched, and a bucket-range shard enumerates only its own pids."""
        pids = self._knn_pids()  # bucket_range-restricted pid list
        parts = [
            (p << self._doc_shift)
            + np.arange(self._pid_n_docs(int(p)), dtype=np.int64)
            for p in pids
        ]
        ids = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        if self._tombstones.size and ids.size:
            pos = np.searchsorted(self._tombstones, ids)
            pos[pos >= self._tombstones.size] = 0
            ids = ids[self._tombstones[pos] != ids]
        return ids

    def global_facet(self, by: str, size: int | None = None) -> pa.Table:
        """ES ``global`` aggregation + ``terms`` sub-agg: buckets over
        ALL live docs — the global bucket deliberately escapes the query
        scope (its whole point in ES is comparing a query's slice
        against the full corpus)."""
        return self.facet_ids(self.live_ids(), by, size)

    def missing_value_counts(
        self, query: str | ParsedQuery, field: str
    ) -> tuple[int, int]:
        """ES ``missing`` + ``value_count`` aggregations in ONE pass:
        (docs whose ``field`` is null, non-null values) over the match
        set — score-free ids + one pid-pruned column read serves both."""
        return self.missing_value_counts_ids(self.match_ids(query), field)

    def missing_value_counts_ids(
        self, ids: np.ndarray, field: str
    ) -> tuple[int, int]:
        """Shard partial of :meth:`missing_value_counts` (two ints —
        the merge is a sum)."""
        vals = self.hydrate(
            np.sort(np.asarray(ids, dtype=np.int64)), columns=[field]
        )[field]
        return int(vals.null_count), int(len(vals) - vals.null_count)

    def value_counts(self, query: str | ParsedQuery, field: str) -> pa.Table:
        """(value, count) multiset of a numeric column over the query's
        match set — the one match-set pass behind stats_agg/percentiles;
        callers wanting both should compute this once and feed both
        finalizers."""
        ids = self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        return self.value_counts_ids(ids, field)

    def cardinality(self, query: str | ParsedQuery, field: str) -> int:
        """ES `cardinality` aggregation, EXACT: distinct non-null values
        of a docstore column over the match set (score-free ids + one
        pid-pruned column read).  ES itself serves this from an HLL++
        sketch; stages/sketch.py HLL is the documented swap when the
        distinct set no longer fits the exact merge."""
        return self.value_counts_ids(self.match_ids(query), field).num_rows

    def stats_agg(self, query: str | ParsedQuery, field: str) -> dict:
        """ES ``extended_stats`` aggregation analog over a numeric
        docstore column: count/min/max/sum/avg plus sum_of_squares,
        population variance and std_deviation of every matching doc's
        value (missing values skipped, ES semantics).  (Named ``_agg``
        because ``self.stats`` is the engine's counter dict.)"""
        return stats_from_value_counts(self.value_counts(query, field))

    def percentiles(
        self,
        query: str | ParsedQuery,
        field: str,
        percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
    ) -> pa.Table:
        """ES ``percentiles`` aggregation analog (linear interpolation on
        the exact sorted multiset — the rank convention of numpy
        ``method='linear'`` / SQL ``quantile_cont``; ES itself t-digests,
        which is approximate — ours is exact)."""
        return percentiles_from_value_counts(self.value_counts(query, field), percents)

    # ---------- compound queries (boosting / constant_score / dis_max) ----------

    def boosting(
        self,
        positive: str | ParsedQuery,
        negative: str | ParsedQuery,
        negative_boost: float = 0.5,
        k: int = 10,
    ) -> pa.Table:
        """ES ``boosting`` query: positive matches ranked by BM25, with
        docs ALSO matching ``negative`` demoted by ``negative_boost``
        (multiplied, never filtered — exactly ES semantics).  The
        negative side is evaluated score-free (match_ids)."""
        r = self.all_scores(positive)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False).copy()
        neg = np.sort(self.match_ids(negative))
        if neg.size and ids.size:
            pos = np.searchsorted(neg, ids)
            pos[pos >= neg.size] = 0
            sc[neg[pos] == ids] *= float(negative_boost)
        ids, sc = bm25.sort_topk(ids, sc, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})

    def constant_score(
        self, query: str | ParsedQuery, boost: float = 1.0, k: int = 10
    ) -> pa.Table:
        """ES ``constant_score``: every matching doc scores exactly
        ``boost`` (filter-context evaluation, no BM25 arithmetic), so
        top-k is the k smallest docIDs (the docID-asc tie-break)."""
        ids = np.sort(self.match_ids(query))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "score": pa.array(np.full(ids.size, float(boost))),
            }
        )

    def dis_max(
        self,
        queries: list[str | ParsedQuery],
        tie_breaker: float = 0.0,
        k: int = 10,
    ) -> pa.Table:
        """ES ``dis_max``: per doc, score = best subquery score +
        ``tie_breaker`` × (sum of the other matching subqueries' scores).
        Candidates = union of subquery matches.  Per-doc combination is
        computed over an index-ordered score matrix (one fixed float
        order — the sharded path reuses this method per shard, so both
        serving paths agree bit-for-bit)."""
        parts = [self.all_scores(q) for q in queries]
        if not parts:
            raise ValueError("dis_max needs at least one subquery")
        union = np.unique(
            np.concatenate(
                [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
            )
        )
        mat = np.zeros((len(parts), union.size), dtype=np.float64)
        for i, p in enumerate(parts):
            d = p["doc_id"].to_numpy(zero_copy_only=False)
            s = p["score"].to_numpy(zero_copy_only=False)
            mat[i, np.searchsorted(union, d)] = s
        best = mat.max(axis=0)
        total = mat.sum(axis=0)
        score = best + float(tie_breaker) * (total - best)
        ids, sc = bm25.sort_topk(union, score, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})

    def match_bool_prefix(
        self, text: str, k: int = 10
    ) -> pa.Table:
        """ES ``match_bool_prefix`` (the search-as-you-type staple,
        www.elastic.co/guide query-dsl-match-bool-prefix-query): the
        analyzed text becomes a bool query — every term but the LAST is
        a scoring ``should`` term clause, the last is a ``prefix`` query.
        Lucene rewrites a prefix inside bool to constant-score, so a doc
        containing ANY dictionary expansion of the stem adds exactly
        1.0 to its score (documented divergence: we pin the plain
        CONSTANT_SCORE rewrite, not blended).  Match = union of the
        clauses (pure-prefix matches rank by docID among themselves)."""
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        toks = tokenize_text(text)
        if not toks:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        complete, stem = toks[:-1], toks[-1]
        if self.analyzer is not None:
            # complete terms analyze like any text clause; the trailing
            # partial word stays RAW — it is a dictionary prefix, and
            # stemming/stopping a half-typed word would break
            # search-as-you-type ("the" may be the start of "theory")
            complete = self.analyzer.apply_tokens(complete)
        return self.match_bool_prefix_prepared(
            parse_query(" ".join(complete)) if complete else None,
            self.expand_prefix(stem),
            k,
            None,
        )

    def match_bool_prefix_prepared(
        self,
        q_complete: ParsedQuery | None,
        pterms: list[str],
        k: int,
        df_override: dict[str, int] | None,
    ) -> pa.Table:
        """Shard half of :meth:`match_bool_prefix`: the score is a
        per-doc function (BM25 of the complete terms + the constant
        prefix contribution), so doc-partitioned top-k merges are exact
        with coordinator df injection.  ``pterms`` is the stem's
        dictionary expansion, computed ONCE against the full dictionary
        (per-shard expansion could trip the max_expansions cap a full
        dictionary wouldn't — same policy as phrase_prefix)."""
        old = self._df_override
        if df_override is not None:
            self._df_override = df_override
        try:
            if q_complete is not None:
                r = self.all_scores(q_complete)
                ids = r["doc_id"].to_numpy(zero_copy_only=False)
                sc = r["score"].to_numpy(zero_copy_only=False).copy()
            else:
                ids = np.array([], dtype=np.int64)
                sc = np.array([], dtype=np.float64)
            pids = (
                np.sort(self.match_ids(parse_query(" ".join(pterms))))
                if pterms
                else np.array([], dtype=np.int64)
            )
        finally:
            self._df_override = old
        if pids.size:
            extra = pids[~np.isin(pids, ids)]
            ids = np.concatenate([ids, extra])
            sc = np.concatenate([sc, np.zeros(extra.size)])
            pos = np.searchsorted(pids, ids)
            pos[pos >= pids.size] = 0
            sc = sc + (pids[pos] == ids).astype(np.float64)
        ids, sc = bm25.sort_topk(ids, sc, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})

    def filters_agg(self, queries: dict[str, str | ParsedQuery]) -> pa.Table:
        """ES ``filters`` aggregation analog: doc count per NAMED query
        → pa.Table(value, count), name-ascending.  Score-free (the
        match_ids path) — an agg never needs BM25 arithmetic."""
        names = sorted(queries)
        return pa.table(
            {
                "value": pa.array(names, pa.string()),
                "count": pa.array(
                    [int(self.match_ids(queries[n]).size) for n in names],
                    pa.int64(),
                ),
            }
        )

    def adjacency_matrix(self, queries: dict[str, str | ParsedQuery]) -> pa.Table:
        """ES ``adjacency_matrix`` aggregation analog: doc counts for
        each named filter AND each pairwise intersection (keys
        ``a&b``, names sorted — the ES key format), empty buckets
        omitted (ES behavior) → pa.Table(value, count), name-asc.
        Score-free; see ShardedSearcher.adjacency_matrix for why the
        doc-partitioned merge is exact."""
        names = sorted(queries)
        ids = {n: np.sort(self.match_ids(queries[n])) for n in names}
        return adjacency_from_ids(ids)

    def tdigest_ids(self, ids: np.ndarray, field: str, delta: float = 200.0) -> bytes:
        """Fixed-size t-digest partial of a numeric column over an
        explicit match set — the documented swap for
        :meth:`value_counts_ids` when the column's distinct cardinality
        is unbounded (the exact partial's size bound no longer holds)."""
        from elasticsearch_assets_ray.stages.tdigest import TDigest

        vals = self.hydrate(np.sort(np.asarray(ids, dtype=np.int64)), columns=[field])[field]
        v = pc.drop_null(vals.combine_chunks()).to_numpy(zero_copy_only=False)
        d = TDigest(delta)
        d.add(v.astype(np.float64))
        return d.to_bytes()

    # ---------- terms agg + metric sub-agg / significant_terms /
    # ---------- range agg / top_hits ----------

    def group_value_counts_ids(
        self, ids: np.ndarray, by: str, metric: str
    ) -> pa.Table:
        """Distinct (bucket value, metric value) pairs with integer
        counts over an explicit match set — the mergeable shard partial
        behind :meth:`facet_metric` (ES ``terms`` agg with a metric
        sub-agg).  Rows missing EITHER column are skipped (ES sub-aggs
        skip missing).  Partial size is bounded by the product of the two
        columns' distinct cardinalities over the match set, never by the
        match size; integer-count merge keeps the sharded path
        bit-identical (all float math runs once, after the merge)."""
        t = self.hydrate(np.sort(np.asarray(ids, dtype=np.int64)), columns=[by, metric])
        vals = pc.cast(t[by].combine_chunks(), pa.string())
        mv = pc.cast(t[metric].combine_chunks(), pa.float64())
        keep = pc.and_(pc.is_valid(vals), pc.is_valid(mv))
        sub = pa.table({"value": vals.filter(keep), "metric": mv.filter(keep)})
        g = sub.group_by(["value", "metric"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "value": g["value"],
                "metric": g["metric"],
                "count": g["count_all"].combine_chunks().cast(pa.int64()),
            }
        )

    def facet_metric(
        self, query: str | ParsedQuery, by: str, metric: str, size: int | None = None
    ) -> pa.Table:
        """ES ``terms`` aggregation with an ``avg`` metric sub-agg:
        per-bucket doc count AND mean of a numeric column →
        pa.Table(value, count, avg), count-desc / value-asc bucket order.
        Single-searcher path = one-partial merge of the same shard
        partial the distributed path uses, so both are bit-identical."""
        ids = self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        pairs = merge_group_value_counts([self.group_value_counts_ids(ids, by, metric)])
        return facet_metric_from_pairs(pairs, size)

    def sig_terms_ids(self, ids: np.ndarray) -> pa.Table:
        """Per-term DISTINCT-doc counts over an explicit match set (the
        foreground half of ``significant_terms``) — shard-local: content
        hydrate + tokenize of only the matching docs, one row per
        (term), integer counts.  Cost ∝ matched content, the natural
        lower bound for a foreground term scan."""
        content_col = self.manifest.get("content_col")
        if not self.manifest.get("store_content") or not content_col:
            raise RuntimeError("significant_terms needs store_content=True")
        from elasticsearch_assets_ray.stages.tokenizer import doc_term_freqs

        h = self.hydrate(
            np.sort(np.asarray(ids, dtype=np.int64)), columns=[content_col]
        )
        tb = doc_term_freqs(h[content_col])
        # tb rows are unique (doc, term) pairs → occurrences per term are
        # exactly the distinct-doc counts
        if tb.terms.size == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "fg": pa.array([], pa.int64())}
            )
        terms, counts = np.unique(tb.terms.astype(str), return_counts=True)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "fg": pa.array(counts.astype(np.int64)),
            }
        )

    def significant_terms(
        self,
        query: str | ParsedQuery,
        size: int = 10,
        min_doc_count: int = 3,
    ) -> pa.Table:
        """ES ``significant_terms`` aggregation analog (JLH scoring):
        terms over-represented in the query's match set versus the whole
        index.  fgPct = fg/fg_total over the match set, bgPct = df/n_docs
        from the term dictionary; JLH = (fgPct − bgPct)·(fgPct/bgPct),
        keeping terms with fg ≥ ``min_doc_count`` and fgPct > bgPct →
        pa.Table(term, fg, bg, score), score-desc (round-9) / term-asc,
        top ``size``.  (ES scores shard-local by default and admits
        approximation; this implementation merges EXACT integer partials
        first, so single and sharded paths are bit-identical.)"""
        ids = self.all_scores(query)["doc_id"].to_numpy(zero_copy_only=False)
        fg = merge_sig_partials([self.sig_terms_ids(ids)])
        return significant_terms_from_partials(
            fg,
            int(ids.size),
            self.term_dfs,
            int(self.manifest["n_docs"]),
            size,
            min_doc_count,
        )

    def range_agg(
        self,
        query: str | ParsedQuery,
        field: str,
        ranges: list[tuple[float | None, float | None]],
    ) -> pa.Table:
        """ES ``range`` aggregation analog: doc counts per half-open
        [from, to) bucket of a numeric column (ES range semantics:
        ``from`` inclusive, ``to`` exclusive, ``None`` = open end;
        buckets may overlap — each is counted independently) →
        pa.Table(value, count) with ES-style ``lo-hi`` labels, in the
        caller's range order (empty ranges kept at count 0, ES keyed
        ranges).  Computed from the merged (value, count) partials, so
        the distributed cost is the same one value_counts scatter as
        stats/percentiles."""
        return range_agg_from_value_counts(self.value_counts(query, field), ranges)

    def top_hits(
        self, query: str | ParsedQuery, by: str, n: int = 3
    ) -> pa.Table:
        """ES ``terms`` agg with a ``top_hits`` sub-agg: per distinct
        value of docstore column ``by``, the top-``n`` matching docs at
        the (round-9 score desc, docID asc) ranking contract →
        pa.Table(value, rank, doc_id, score), value-asc / rank-asc.
        Docs with a null bucket value are skipped (ES terms agg skips
        missing)."""
        r = self.all_scores(query)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        return self.top_hits_ids(ids, sc, by, n)

    def top_hits_ids(
        self, ids: np.ndarray, sc: np.ndarray, by: str, n: int
    ) -> pa.Table:
        """Per-bucket top-n over an explicit scored match set — the
        shard-side partial AND the merge step of the distributed
        top_hits (selection commutes with union under a per-doc
        comparator: every bucket's global top-n is contained in the
        union of the shards' local top-n for that bucket)."""
        if n <= 0:
            raise ValueError("n must be positive")
        ids = np.asarray(ids, dtype=np.int64)
        sc = np.asarray(sc, dtype=np.float64)
        vals = self.hydrate(np.sort(ids), columns=["doc_id", by])
        # align hydrated bucket values back to the (ids, sc) order;
        # hydrate DROPS unknown ids (e.g. stale ids after a rebuild) so
        # membership must be checked — a blind searchsorted would shift
        # every later doc onto the wrong bucket value
        got = vals["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(got, ids)
        present = pos < got.size
        present[present] &= got[pos[present]] == ids[present]
        ids, sc, pos = ids[present], sc[present], pos[present]
        col = vals[by].combine_chunks().take(pa.array(pos))
        return tophits_select(ids, sc, col, n)

    def collapse_inner_hits(
        self,
        query: str | ParsedQuery,
        k: int = 10,
        collapse: str = "",
        inner_n: int = 3,
    ) -> pa.Table:
        """ES field collapsing WITH ``inner_hits``: the top-k collapsed
        groups (winner ranking = :meth:`search_collapse`) each expanded
        to their top-``inner_n`` hits under the SAME comparator — the
        group winner is inner rank 1 by construction.  Composes the two
        already-distributed primitives (collapse + top_hits), so the
        ShardedSearcher alias is exact with zero extra merge logic.
        Null collapse values are excluded (ES terms/top_hits skip
        missing).  Returns (value, group_rank, inner_rank, doc_id,
        score), group-rank-asc / inner-rank-asc."""
        win = self.search_collapse(query, k=k, collapse=collapse)
        vals = win[collapse].combine_chunks()
        nonnull = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        wvals = [v for v, ok in zip(vals.to_pylist(), nonnull) if ok]
        rank_of = {v: i + 1 for i, v in enumerate(wvals)}
        th = self.top_hits(query, collapse, inner_n)
        tvals = th["value"].to_pylist()
        keep = [i for i, v in enumerate(tvals) if v in rank_of]
        th = th.take(pa.array(keep, pa.int64()))
        grank = pa.array([rank_of[v] for v in th["value"].to_pylist()], pa.int64())
        out = pa.table(
            {
                "value": th["value"],
                "group_rank": grank,
                "inner_rank": th["rank"],
                "doc_id": th["doc_id"],
                "score": th["score"],
            }
        )
        return out.sort_by(
            [("group_rank", "ascending"), ("inner_rank", "ascending")]
        )

    def msearch(
        self, queries: list[str | ParsedQuery], k: int = 10
    ) -> list[pa.Table]:
        """ES ``_msearch`` analog (API parity with ShardedSearcher.msearch
        — the single-process engine has no RPC to amortize, so this is a
        plain loop)."""
        return [self.search(q, k=k) for q in queries]

    # ---------- Lucene SynonymQuery (ES synonym_graph at query time) ------
    def search_synonyms(
        self,
        query: str | ParsedQuery,
        synonyms: dict[str, list[str]],
        k: int = 10,
    ) -> pa.Table:
        """Query-time synonyms with Lucene ``SynonymQuery`` scoring: each
        query term and its synonyms score as ONE pseudo-term — per doc
        ``tf = Σ member tfs`` (summed BEFORE saturation), ``idf`` from
        ``df = max(member dfs)`` — so a doc mentioning any member is not
        double-counted the way a plain OR would.  v1 supports flat
        should-term queries (no phrases/trees/filters); raises otherwise."""
        q = self._q(query)
        if (
            q.has_phrases
            or q.bool_tree is not None
            or q.must
            or q.must_not
            or q.must_any
            or q.filters
            or q.not_filters
            or q.range_filters
            or q.not_range_filters
        ):
            raise ValueError(
                "search_synonyms supports flat should-term queries only"
            )
        groups = {
            t: tuple(sorted({t, *synonyms.get(t, ())}))
            for t in sorted(set(q.scoring_terms))
        }
        return self.synonyms_prepared(groups, k, None)

    def synonyms_prepared(
        self,
        groups: dict[str, tuple[str, ...]],
        k: int,
        df_override: dict[str, int] | None,
    ) -> pa.Table:
        """Shard-side synonym scoring for pre-built groups.  Per-doc
        scores are a pure function of (member postings, global member
        dfs), so doc-partitioned serving is exact with coordinator df
        injection (dfs_query_then_fetch), like search_prepared.
        Exhaustive over this searcher's buckets (no θ pruning — the
        summed-tf upper bound differs from the per-term block metadata;
        documented trade-off)."""
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
        need = sorted({m for g in groups.values() for m in g})
        seg = self._segment_rows(need)
        if seg is None or seg.num_rows == 0:
            return empty
        seg_term = seg["term"].to_pylist()
        seg_bucket = seg["bucket"].to_numpy(zero_copy_only=False)
        seg_df = seg["df"].to_numpy(zero_copy_only=False)
        df_by_term: dict[str, int] = {}
        for t, d in zip(seg_term, seg_df):
            df_by_term[t] = df_by_term.get(t, 0) + int(d)
        if df_override is not None:
            # the group idf is max over ALL members' GLOBAL dfs — a
            # member with no postings in this shard's doc range still
            # contributes its df (unlike plain BM25, where a locally
            # absent term can simply be skipped), so take the override
            # for every member it covers, not just locally-present ones
            merged = dict(df_by_term)
            for m in need:
                if m in df_override:
                    merged[m] = df_override[m]
            df_by_term = merged
        # Lucene SynonymQuery: docFreq = max over members (per group)
        gidf: dict[str, float] = {}
        for key, members in groups.items():
            dfs = [df_by_term[m] for m in members if m in df_by_term and df_by_term[m] > 0]
            if dfs:
                gidf[key] = bm25.math_idf(max(dfs), self.n_docs)
        if not gidf:
            return empty
        rows_of: dict[tuple[str, int], int] = {
            (t, int(b)): i for i, (t, b) in enumerate(zip(seg_term, seg_bucket))
        }
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        for b in np.unique(seg_bucket):
            b = int(b)
            d_parts: list[np.ndarray] = []
            w_parts: list[np.ndarray] = []
            for key in sorted(gidf):  # sorted-group addition order
                mem_d, mem_tf = [], []
                for m in groups[key]:
                    i = rows_of.get((m, b))
                    if i is None:
                        continue
                    d, tf = self._decode_postings(
                        seg["blob"][i].as_py(), int(seg["df"][i].as_py())
                    )
                    mem_d.append(d)
                    mem_tf.append(tf.astype(np.float64))
                if not mem_d:
                    continue
                cd = np.concatenate(mem_d)
                ctf = np.concatenate(mem_tf)
                uniq, inv = np.unique(cd, return_inverse=True)
                tf_sum = np.bincount(inv, weights=ctf, minlength=uniq.size)
                dl = self.doclens_for(uniq)
                sat = bm25.tf_saturation(tf_sum, dl, self.avgdl)
                d_parts.append(uniq)
                w_parts.append(gidf[key] * sat)
            if not d_parts:
                continue
            cd = np.concatenate(d_parts)
            cw = np.concatenate(w_parts)
            uniq, inv = np.unique(cd, return_inverse=True)
            sums = np.bincount(inv, weights=cw, minlength=uniq.size)
            if self._tombstones.size:
                pos = np.searchsorted(self._tombstones, uniq)
                pos[pos >= self._tombstones.size] = 0
                keep = self._tombstones[pos] != uniq
                uniq, sums = uniq[keep], sums[keep]
            all_ids.append(uniq.astype(np.int64))
            all_scores.append(sums.astype(np.float64))
        if not all_ids:
            return empty
        ids, scores = bm25.sort_topk(
            np.concatenate(all_ids), np.concatenate(all_scores), k
        )
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})

    # ---------- ES sort-by-field search (sort: [{field: order}]) ----------
    def sort_ids(
        self, ids: np.ndarray, field: str, k: int, desc: bool = True
    ) -> pa.Table:
        """Top-k of an explicit match set ordered by a docstore column —
        THE shared shard/single kernel (value, docID-asc tie-break in
        both directions, so shard merges are exact).  Null field values
        are dropped (ES `missing` docs sort last and never enter a
        top-k smaller than the match set).  Score-free by construction."""
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
        if ids.size == 0:
            return empty
        d = np.asarray(ids, dtype=np.int64)
        v = self.field_values_for(d, field)
        ok = ~np.isnan(v)
        v, d = v[ok], d[ok]
        order = np.lexsort((d, -v if desc else v))[:k]
        return pa.table({"doc_id": pa.array(d[order]), "value": pa.array(v[order])})

    def sort_by_field(
        self,
        query: str | ParsedQuery,
        field: str,
        k: int = 10,
        desc: bool = True,
        minimum_should_match: int = 0,
    ) -> pa.Table:
        """ES field-sorted search: the match set comes from the
        SCORE-FREE id walk (match_ids — ES skips scoring when the sort
        clause has no _score), values from one pid-pruned docstore read
        of just the matches."""
        return self.sort_ids(
            self.match_ids(query, minimum_should_match), field, k, desc
        )

    def top_metrics(
        self,
        query: str | ParsedQuery,
        sort_field: str,
        metrics: list[str],
        size: int = 1,
        desc: bool = True,
        minimum_should_match: int = 0,
    ) -> pa.Table:
        """ES ``top_metrics`` aggregation: the metric columns of the top
        ``size`` docs by a sort field (ES reports the metrics of the
        extremum doc(s), not an aggregate).  Built on the score-free
        sort kernel — the (value, docID) comparator is sort_by_field's,
        so the scatter-gather form is exact — plus ONE pid-pruned
        hydrate of just the winners.  Shared with ShardedSearcher via
        :func:`top_metrics_impl` (any object with sort_by_field +
        hydrate)."""
        return top_metrics_impl(
            self, query, sort_field, metrics, size, desc, minimum_should_match
        )

    # ---------- index-resident kNN (ES dense_vector / knn search) ----------
    def _vector_meta(self) -> dict | None:
        if self._vec_meta is False:
            from elasticsearch_assets_ray.index import vectors as vec_mod

            self._vec_meta = vec_mod.load_meta(self.index_dir)
        return self._vec_meta

    def _knn_pids(self) -> list[int]:
        """pids this searcher serves (bucket_range-restricted, like the
        postings) — the shard's resident vector set."""
        pids = sorted(self._pid_map())
        if self.bucket_range is not None:
            lo, hi = self.bucket_range
            pids = [p for p in pids if lo <= p // self._rpb < hi]
        return pids

    def _pid_vec_state(self, pid: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(vectors mmap (n, dim) float32, present mask bool, row norms
        float64) for one pid, LRU'd by the norms' bytes (the matrices are
        mmapped — resident memory is the OS page cache's problem)."""
        hit = self._vec_cache.get(pid)
        if hit is not None:
            self._vec_cache.move_to_end(pid)
            return hit
        from elasticsearch_assets_ray.index import vectors as vec_mod

        meta = self._vector_meta()
        vecs, mask = vec_mod.load_part(
            self.index_dir, pid, int(meta["dim"]), self._pid_n_docs(pid)
        )
        # chunked norm pass: the mmapped float32 matrix is never
        # materialized as a whole-part float64 copy (norms are the only
        # resident floats, as promised)
        n = vecs.shape[0]
        norms = np.empty(n, dtype=np.float64)
        step = 1 << 16
        for lo in range(0, n, step):
            blk = np.asarray(vecs[lo : lo + step], dtype=np.float64)
            norms[lo : lo + step] = np.linalg.norm(blk, axis=1)
        norms[norms == 0] = 1.0
        state = (vecs, mask, norms)
        self._vec_cache[pid] = state
        self._vec_cache_bytes += norms.nbytes + mask.nbytes
        while self._vec_cache_bytes > self.vec_cache_budget and len(self._vec_cache) > 1:
            _, (_, om, on) = self._vec_cache.popitem(last=False)
            self._vec_cache_bytes -= on.nbytes + om.nbytes
        return state

    def knn(
        self,
        query_ids: np.ndarray,
        query_vecs: np.ndarray,
        k: int = 10,
        filter_query: str | ParsedQuery | None = None,
        minimum_should_match: int = 0,
        similarity: float | None = None,
    ) -> pa.Table:
        """ES ``knn`` search served FROM the index (exact mode): cosine
        top-k per query over the sidecar vectors attached by
        index/vectors.py, restricted to this searcher's docID range.
        ``filter_query`` is ES kNN pre-filtering — the candidate set is
        the SCORE-FREE match set of the filter (Searcher.match_ids), so
        filtered kNN never runs BM25 arithmetic.  ``similarity`` is ES's
        minimum-cosine cutoff: hits below it are dropped (compared on
        round9(sim), the ranking contract, so the cutoff can't flip on
        engine-vs-oracle ulps).  Returns (query_id, doc_id, rank, sim)
        ranked by the engine-wide (round9 desc, docID asc) contract; raw
        cosine in ``sim``."""
        qf = None
        if filter_query is not None:
            qf = self._q(filter_query)
            qf = self._apply_msm(qf, minimum_should_match)
            qf = self._rewrite_prefixes(qf)
        res = self.knn_prepared(query_ids, query_vecs, k, qf, None)
        return knn_similarity_cut(res, similarity)

    def knn_prepared(
        self,
        query_ids: np.ndarray,
        query_vecs: np.ndarray,
        k: int,
        qf: "ParsedQuery | None" = None,
        df_override: dict[str, int] | None = None,
    ) -> pa.Table:
        """Shard-side kNN for an already-rewritten filter (mirrors
        match_ids_prepared: filter MEMBERSHIP is local, so no df is
        needed for correctness — accepted for signature symmetry)."""
        meta = self._vector_meta()
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if meta is None:
            raise RuntimeError(
                f"index {self.index_dir} has no vector sidecar — run "
                "index.vectors.attach_vectors first"
            )
        qmat = np.asarray(query_vecs, dtype=np.float64)
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qmat = qmat / qn
        qids = np.asarray(query_ids, dtype=np.int64)
        allowed: np.ndarray | None = None
        if qf is not None:
            allowed = np.sort(
                self.match_ids_prepared(qf, df_override)
                if df_override is not None
                else self._match_ids(qf)
            )
        cq, cd, cs = [], [], []
        step = 1 << 16  # score in row blocks: O(chunk × Q) scratch, not O(part)
        for pid in self._knn_pids():
            vecs, mask, norms = self._pid_vec_state(pid)
            n = mask.size
            base = pid << self._doc_shift
            if allowed is not None:
                lo = np.searchsorted(allowed, base)
                hi = np.searchsorted(allowed, base + n)
                rows = (allowed[lo:hi] - base).astype(np.int64)
                rows = rows[mask[rows]]
            else:
                rows = np.flatnonzero(mask)
                if self._tombstones.size:
                    # deleted docs never surface from kNN (Lucene
                    # deleted-doc semantics, same as every search path;
                    # the filtered branch inherits this via match_ids)
                    dead = np.searchsorted(self._tombstones, base + rows)
                    dead[dead >= self._tombstones.size] = 0
                    rows = rows[self._tombstones[dead] != base + rows]
            if rows.size == 0:
                continue
            for blo in range(0, rows.size, step):
                rsel = rows[blo : blo + step]
                sims = (
                    np.asarray(vecs[rsel], dtype=np.float64) @ qmat.T
                ) / norms[rsel][:, None]
                r9 = bm25.round_half_up(sims, 9)
                kk = min(k, rsel.size)
                for qi in range(qids.size):
                    col = r9[:, qi]
                    # keep the full round-9 tie group at the k boundary
                    # so the (round9 desc, docID asc) contract cannot
                    # drop the docID winner (same argument as
                    # bm25.sort_topk's tie extension)
                    thr = np.partition(col, col.size - kk)[col.size - kk]
                    sel = np.flatnonzero(col >= thr)
                    cq.append(np.full(sel.size, qids[qi], dtype=np.int64))
                    cd.append(base + rsel[sel])
                    cs.append(sims[sel, qi])
        if not cq:
            return empty
        q = np.concatenate(cq)
        d = np.concatenate(cd)
        s = np.concatenate(cs)
        return knn_rank(q, d, s, k)

    def hybrid(
        self,
        query: str | ParsedQuery,
        query_vec: np.ndarray,
        k: int = 10,
        *,
        window: int = 20,
        rank_constant: int = 60,
        filter_query: str | ParsedQuery | None = None,
    ) -> pa.Table:
        """ES 8.x `rrf` retriever: BM25 + index-resident kNN rankings
        fused by reciprocal-rank fusion.  Returns (doc_id, rank, rrf)."""
        from elasticsearch_assets_ray.query.hybrid import rrf_fuse

        bm = self.search(query, k=window)
        bm_ids = bm["doc_id"].to_numpy(zero_copy_only=False)
        bm_t = pa.table(
            {
                "query_id": pa.array(np.zeros(bm_ids.size, dtype=np.int64)),
                "doc_id": bm["doc_id"],
                "rank": pa.array(np.arange(1, bm_ids.size + 1, dtype=np.int64)),
            }
        )
        kn = self.knn(
            np.zeros(1, dtype=np.int64),
            np.asarray(query_vec, dtype=np.float64)[None, :],
            k=window,
            filter_query=filter_query,
        )
        fused = rrf_fuse([bm_t, kn], k=k, rank_constant=rank_constant)
        return fused.drop_columns(["query_id"])

    def all_scores(
        self, query: str | ParsedQuery, minimum_should_match: int = 0
    ) -> pa.Table:
        """Every matching doc's score (no pruning) — the oracle-comparable
        full result set."""
        q = self._q(query)
        q = self._apply_msm(q, minimum_should_match)
        q = self._rewrite_prefixes(q)
        if q.has_phrases:
            ids, scores = self._search_phrases(q, k=None)
        else:
            ids, scores = self._score(q, k=None)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})

    # ---------- phrase filtering ----------
    @staticmethod
    def contains_phrase(tokens: list[str], phrase: tuple[str, ...]) -> bool:
        """Consecutive-subsequence check over analyzed tokens."""
        n, m = len(tokens), len(phrase)
        first = phrase[0]
        for i in range(n - m + 1):
            if tokens[i] == first and tuple(tokens[i : i + m]) == phrase:
                return True
        return False

    @staticmethod
    def contains_spec(tokens: list[str], terms: tuple, slop: int) -> bool:
        """Generalized window check: each element of ``terms`` is a term
        string or a frozenset of alternatives (phrase-prefix expansions);
        slop 0 = strict adjacency, slop > 0 = ordered window, slop < 0 =
        UNORDERED proximity (``"a b"~uN`` encoded as -(N+1)): one distinct
        position per term instance, any order, span width ≤ len + N.  The
        single reference implementation of both window contracts — the
        positional kernels in ``freq_batch`` must stay equivalent."""

        def ok(tok, t):
            return tok in t if isinstance(t, frozenset) else tok == t

        if slop < 0:
            # unordered: slide a width-W window over candidate starts;
            # each distinct matcher group needs its multiplicity inside.
            # Exact because `~uN` slots are plain terms — matcher groups
            # are identical-or-disjoint, so no assignment problem arises.
            import bisect
            from collections import Counter

            width = parser_mod.unordered_window(len(terms), slop)
            need = Counter(terms)
            plists = {
                t: [i for i, tok in enumerate(tokens) if ok(tok, t)]
                for t in need
            }
            if any(len(plists[t]) < c for t, c in need.items()):
                return False
            for x in sorted({p for ps in plists.values() for p in ps}):
                hit = True
                for t, c in need.items():
                    ps = plists[t]
                    j = bisect.bisect_left(ps, x)
                    if j + c > len(ps) or ps[j + c - 1] > x + width - 1:
                        hit = False
                        break
                if hit:
                    return True
            return False

        limit = len(terms) - 1 + slop
        n = len(tokens)
        for i in range(n):
            if not ok(tokens[i], terms[0]):
                continue
            p = i
            good = True
            for t in terms[1:]:
                p += 1
                if slop == 0:
                    if p >= n or not ok(tokens[p], t):
                        good = False
                        break
                else:
                    while p < n and not ok(tokens[p], t):
                        p += 1
                    if p >= n:
                        good = False
                        break
            if good and p - i <= limit:
                return True
        return False

    def _search_phrases(
        self, q: ParsedQuery, k: int | None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Phrase-filtered search: score as bag-of-words (phrase terms are
        MUST, so candidates already contain every phrase word), then
        verify ADJACENCY against the docstore content, best-score-first in
        chunks until k docs survive.  The postings store no positions —
        verification re-analyzes only the candidate docs' content (one
        docstore read per chunk), which is exact for any phrase length;
        at index scale a positional postings variant would replace the
        content fetch, the filter semantics are identical.

        Lucene parity note: the candidate set and the adjacency filter
        match Lucene's phrase semantics; scoring differs (Lucene scores
        phrase frequency, we score the member terms' BM25)."""
        content_col = self.manifest.get("content_col")
        use_positions = bool(self.manifest.get("index_positions"))
        if not use_positions and (
            not self.manifest.get("store_content", False) or not content_col
        ):
            raise RuntimeError(
                "phrase queries need positional postings "
                "(index_positions=True) or the docstore content "
                "(store_content=True)"
            )
        if self.phrase_scoring == "phrase_freq":
            return self._search_phrases_pfreq(q, k)
        # resolve phrase specs ONCE per search — each deepening round
        # reuses them (expand_prefix per phrase-prefix stem is dictionary
        # I/O; recomputing it per round repeated identical work)
        specs = self._phrase_specs(q)
        if k is not None and self.prune:
            # iterative deepening: block-max-pruned top-k' with k' = 4k,
            # verify; only re-score exhaustively when adjacency filtering
            # ate past the pruned horizon.  Phrase words are MUST terms,
            # so the candidate stream is already the conjunction.
            kp = max(64, 4 * k)
            while True:
                ids, scores = self._score(q, k=kp)
                ids, scores = bm25.sort_topk(ids, scores, kp)
                exhausted = ids.size < kp  # fewer matches than the horizon
                out = self._verify_phrases(q, ids, scores, k, content_col, specs)
                if len(out[0]) >= k or exhausted:
                    return out
                kp *= 4
        ids, scores = self._score(q, k=None)
        ids, scores = bm25.sort_topk(ids, scores, ids.size)
        return self._verify_phrases(
            q, ids, scores, ids.size if k is None else k, content_col, specs
        )

    def _verify_phrases(
        self,
        q: ParsedQuery,
        ids: np.ndarray,
        scores: np.ndarray,
        want: int,
        content_col: str,
        specs: tuple | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Adjacency-verify ``ids`` (already score-ordered) until ``want``
        survivors — via positional postings when the index carries them
        (no content read at all), else via docstore content re-analysis."""
        if specs is None:
            specs = self._phrase_specs(q)
        if self.manifest.get("index_positions"):
            return self._verify_phrases_pos(q, ids, scores, want, specs)
        return self._verify_phrases_content(
            q, ids, scores, want, content_col, specs
        )

    def _phrase_specs(
        self, q: ParsedQuery
    ) -> tuple[list[tuple[tuple, int]], list[tuple[tuple, int]]]:
        """(positive, negative) verification specs ``(terms, slop)``:
        exact phrases at slop 0, sloppy phrases at their slop, and
        phrase-prefixes as an exact chain whose LAST element is the
        frozenset of the stem's dictionary expansion (an empty
        expansion makes the chain unmatchable)."""
        pos = [(p, 0) for p in q.phrases] + list(q.sloppy_phrases)
        neg = [(p, 0) for p in q.not_phrases] + list(q.not_sloppy_phrases)
        # a stem may arrive PRE-EXPANDED (a frozenset) from the sharded
        # coordinator — expanding against a bucket-filtered local term
        # dictionary could diverge on the max_expansions cap
        for p, stem in q.phrase_prefixes:
            exp = stem if isinstance(stem, frozenset) else frozenset(self.expand_prefix(stem))
            pos.append((tuple(p) + (exp,), 0))
        for p, stem in q.not_phrase_prefixes:
            exp = stem if isinstance(stem, frozenset) else frozenset(self.expand_prefix(stem))
            neg.append((tuple(p) + (exp,), 0))
        return pos, neg

    def _phrase_pos_ctx(self, q: ParsedQuery, specs: tuple | None = None):
        """Positional-postings batch context for the query's phrase
        terms: returns ``freq_batch(cand, phrases) ->
        int64[len(cand), len(phrases)]`` — per-candidate phrase
        occurrence counts, backed by a one-time decode of only the
        phrase terms' segment rows.  Fully vectorized: candidate docs
        map to compact indices, each member term's positions restricted
        to the candidates become sorted ``cidx << 32 | position`` keys
        (one ragged gather per term), and the adjacency chain ``∃ p ∈
        P(t₁,d): p+i ∈ P(tᵢ₊₁,d) ∀i`` is a searchsorted membership pass
        per member — no per-document Python loop."""
        pos_specs, neg_specs = specs if specs is not None else self._phrase_specs(q)
        term_set: set[str] = set()
        for p, _n in pos_specs + neg_specs:
            for t in p:
                if isinstance(t, frozenset):
                    term_set |= t
                else:
                    term_set.add(t)
        terms = sorted(term_set)
        seg = self._segment_rows(terms)
        rows_by_term: dict[str, list[int]] = {t: [] for t in terms}
        if seg is not None:
            seg_term = seg["term"].to_pylist()
            for i, t in enumerate(seg_term):
                rows_by_term[t].append(i)
        decoded: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

        pos_codec = self.manifest.get("positions_codec")

        def row_data(i: int):
            hit = decoded.get(i)
            if hit is None:
                d, tf = self._decode_postings(
                    seg["blob"][i].as_py(), int(seg["df"][i].as_py())
                )
                raw = seg["pos"][i].as_py()
                if pos_codec == "varint-delta":
                    from elasticsearch_assets_ray.index.codec import decode_positions

                    pos = decode_positions(raw, tf)
                else:  # raw little-endian int32 (pre-compression layout)
                    pos = np.frombuffer(raw, dtype=np.int32)
                off = np.concatenate(([0], np.cumsum(tf))).astype(np.int64)
                hit = (d, off, pos)
                decoded[i] = hit
            return hit

        def term_keys(t: str, cs: np.ndarray) -> np.ndarray:
            """Sorted ``cidx << 32 | position`` keys of term ``t``'s
            occurrences within the sorted candidate docs ``cs``.  A doc
            lives in exactly one pid (hence one row per term), so keys
            are unique."""
            parts: list[np.ndarray] = []
            for i in rows_by_term.get(t, ()):
                lo = int(seg["min_docid"][i].as_py())
                hi = int(seg["max_docid"][i].as_py())
                a = int(np.searchsorted(cs, lo))
                b = int(np.searchsorted(cs, hi, side="right"))
                if a == b:
                    continue
                d, off, pos = row_data(i)
                j = np.searchsorted(d, cs[a:b])
                ok = (j < d.size) & (d[np.minimum(j, d.size - 1)] == cs[a:b])
                if not ok.any():
                    continue
                jj = j[ok]
                cidx = (a + np.flatnonzero(ok)).astype(np.int64)
                starts = off[jj]
                lens = off[jj + 1] - starts
                tot = int(lens.sum())
                if tot == 0:
                    continue
                # ragged gather of pos[starts[g] : starts[g]+lens[g]]
                cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
                flat = np.repeat(starts - cum, lens) + np.arange(tot)
                parts.append(
                    (np.repeat(cidx, lens) << 32) | pos[flat].astype(np.int64)
                )
            if not parts:
                return np.empty(0, dtype=np.int64)
            out = parts[0] if len(parts) == 1 else np.concatenate(parts)
            out.sort()
            return out

        def freq_batch(
            cand: np.ndarray, specs: list[tuple[tuple[str, ...], int]]
        ) -> np.ndarray:
            """Per-candidate occurrence counts, one column per
            ``(terms, slop)`` spec.  slop=0 walks the strict-adjacency
            chain (`start + i ∈ P(tᵢ)`); slop>0 walks the GREEDY
            minimal chain — each step takes the smallest same-doc
            position strictly after the previous one, which minimizes
            the final span for a given start, so `span ≤ m-1+slop` is
            an exact existence test for the ordered-window contract."""
            m = np.zeros((cand.size, len(specs)), dtype=np.int64)
            if cand.size == 0 or not specs:
                return m
            order = np.argsort(cand, kind="stable")
            cs = cand[order].astype(np.int64)
            keys_cache: dict = {}

            def keys(t) -> np.ndarray:
                k = keys_cache.get(t)
                if k is None:
                    if isinstance(t, frozenset):
                        # phrase-prefix last element: union of the
                        # expansion terms' position keys
                        parts = [term_keys(x, cs) for x in sorted(t)]
                        parts = [p for p in parts if p.size]
                        k = (
                            np.sort(np.concatenate(parts))
                            if parts
                            else np.empty(0, dtype=np.int64)
                        )
                    else:
                        k = term_keys(t, cs)
                    keys_cache[t] = k
                return k

            for pi, (p, slop) in enumerate(specs):
                if slop < 0:
                    # UNORDERED proximity (slop = -(N+1)): a doc matches
                    # iff some start position x has, for every distinct
                    # matcher group, its full multiplicity within
                    # [x, x+W) in the same doc.  One searchsorted pass
                    # per group over the merged candidate starts —
                    # vectorized across all candidate docs at once.
                    from collections import Counter

                    width = parser_mod.unordered_window(len(p), slop)
                    need = Counter(p)
                    gkeys = {t: keys(t) for t in need}
                    if any(gkeys[t].size < c for t, c in need.items()):
                        continue
                    starts = np.unique(np.concatenate(list(gkeys.values())))
                    okm = np.ones(starts.size, dtype=bool)
                    for t, c in need.items():
                        tk = gkeys[t]
                        j = np.searchsorted(tk, starts)
                        valid = j + c <= tk.size
                        v = tk[np.minimum(j + c - 1, tk.size - 1)]
                        okm &= (
                            valid
                            & ((v >> 32) == (starts >> 32))
                            & ((v - starts) <= (width - 1))
                        )
                    if okm.any():
                        m[order, pi] = np.bincount(
                            (starts[okm] >> 32).astype(np.int64),
                            minlength=cs.size,
                        )
                    continue
                start = keys(p[0])
                cur = start
                for i, t in enumerate(p[1:], start=1):
                    if cur.size == 0:
                        break
                    tk = keys(t)
                    if tk.size == 0:
                        start = start[:0]
                        cur = cur[:0]
                        break
                    if slop == 0:
                        tgt = start + i
                        sel = np.searchsorted(tk, tgt)
                        hit = (sel < tk.size) & (
                            tk[np.minimum(sel, tk.size - 1)] == tgt
                        )
                        start = start[hit]
                        cur = start + i
                    else:
                        sel = np.searchsorted(tk, cur + 1)
                        ok = sel < tk.size
                        nxt = tk[np.minimum(sel, tk.size - 1)]
                        # same candidate doc (high 32 bits)
                        ok &= (nxt >> 32) == (cur >> 32)
                        start, cur = start[ok], nxt[ok]
                if cur.size and slop > 0:
                    within = (cur - start) <= (len(p) - 1 + slop)
                    start = start[within]
                if start.size:
                    m[order, pi] = np.bincount(start >> 32, minlength=cs.size)
            return m

        return freq_batch

    def _verify_phrases_pos(
        self,
        q: ParsedQuery,
        ids: np.ndarray,
        scores: np.ndarray,
        want: int,
        specs: tuple | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Index-native phrase verification: decodes only the phrase
        terms' rows, once; a doc survives iff every positive phrase
        occurs and no negative phrase does.  Vectorized in score-ordered
        chunks so the common case stops after one batch."""
        if specs is None:
            specs = self._phrase_specs(q)
        freq_batch = self._phrase_pos_ctx(q, specs)
        pos_specs, neg_specs = specs
        out_i: list[int] = []
        out_s: list[float] = []
        chunk = max(64, min(4 * want, 4096))
        pos = 0
        while pos < ids.size and len(out_i) < want:
            cids = ids[pos : pos + chunk].astype(np.int64)
            keep = np.ones(cids.size, dtype=bool)
            if pos_specs:
                keep &= np.all(freq_batch(cids, pos_specs) > 0, axis=1)
            if neg_specs:
                keep &= ~np.any(freq_batch(cids, neg_specs) > 0, axis=1)
            for j in np.flatnonzero(keep):
                out_i.append(int(cids[j]))
                out_s.append(float(scores[pos + j]))
                if len(out_i) >= want:
                    break
            pos += chunk
        return np.array(out_i, dtype=np.int64), np.array(out_s, dtype=np.float64)

    def _search_phrases_pfreq(
        self, q: ParsedQuery, k: int | None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene-parity phrase scoring (``phrase_scoring="phrase_freq"``):
        each positive phrase scores like one term — ``Σ member idf ×
        tf_saturation(phrase occurrence count, dl)`` — and its members do
        NOT also score individually (they remain the candidate filter).
        Exhaustive over the phrase conjunction (phrases are selective);
        standalone (non-member) terms keep their bag-of-words BM25,
        accumulated by the normal scorer so float order stays pinned."""
        if not self.manifest.get("index_positions"):
            raise RuntimeError(
                "phrase_scoring='phrase_freq' needs positional postings "
                "(index_positions=True)"
            )
        # candidates: the full conjunction (must includes phrase members)
        cand_ids, _ = self._score(q, k=None)
        if cand_ids.size == 0:
            return cand_ids, np.empty(0, dtype=np.float64)
        specs = self._phrase_specs(q)
        freq_batch = self._phrase_pos_ctx(q, specs)
        cand = cand_ids.astype(np.int64)
        pfreq = freq_batch(cand, [(p, 0) for p in q.phrases])
        keep = np.all(pfreq > 0, axis=1)
        pos_specs, neg_specs = specs
        extra = pos_specs[len(q.phrases) :]  # sloppy + phrase-prefix chains
        if extra:
            # these stay FILTER-only even under phrase_freq scoring
            # (their members keep bag-of-words scores) — Lucene weights
            # sloppy matches 1/(distance+1); documented
            keep &= np.all(freq_batch(cand, extra) > 0, axis=1)
        if neg_specs:
            keep &= ~np.any(freq_batch(cand, neg_specs) > 0, axis=1)
        ids = cand_ids[keep]
        if ids.size == 0:
            return ids, np.empty(0, dtype=np.float64)
        pfreq = pfreq[keep]
        # base: standalone terms.  The parser adds phrase members to MUST,
        # so must∩members are clause-members (filter only); should∩members
        # were queried standalone TOO and keep their own TermQuery score —
        # Lucene scores 'foo "foo bar"' as TermQuery(foo)+PhraseQuery.
        # ('+foo "foo bar"' still conflates — parser limitation.)
        members = {t for p in q.phrases for t in p}
        standalone = sorted(set(q.should) | (set(q.must) - members))
        # gather per-term contributions AT THE CANDIDATES ONLY — a
        # corpus-wide _score here would scatter-add every posting of
        # every standalone term per query (ids are bucket-ascending =
        # sorted, as _gather_term_scores requires)
        base = self._gather_term_scores(standalone, ids)
        # phrase clauses, in query order (pinned float addition order)
        dls = self.doclens_for(ids).astype(np.float64)
        score = base
        for pi, p in enumerate(q.phrases):
            idf_sum = sum(self._term_idf(t) for t in p)
            score = score + idf_sum * bm25.tf_saturation(
                pfreq[:, pi].astype(np.float64), dls, self.avgdl
            )
        if k is None:
            order = np.lexsort((ids, -score))
            return ids[order], score[order]
        return bm25.sort_topk(ids, score, k)

    def _term_idf(self, t: str) -> float:
        """Global idf of one term (0.0 when absent)."""
        seg = self._segment_rows([t])
        if seg is None or seg.num_rows == 0:
            return 0.0
        if self._df_override is not None and t in self._df_override:
            return float(bm25.math_idf(self._df_override[t], self.n_docs))
        df = int(pc.sum(seg["df"]).as_py())
        return float(bm25.math_idf(df, self.n_docs))

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Document frequency per term summed over THIS searcher's
        segment rows (global for an unrestricted searcher, local for a
        ``bucket_range`` shard).  The ShardedSearcher coordinator calls
        this on its full-index view to build the ``df_override`` it
        scatters with every query.  Cold mode reads only the (term, df)
        columns — no posting blobs."""
        out: dict[str, int] = {}
        missing: list[str] = []
        for t in terms:
            hit = self._df_cache.get(t)
            if hit is not None:
                out[t] = hit
            else:
                missing.append(t)
        if missing:
            if self.shard_resident or not self._seg.files:
                seg = self._segment_rows(missing)
                got: dict[str, int] = {}
                if seg is not None:
                    for t, d in zip(seg["term"].to_pylist(), seg["df"].to_pylist()):
                        got[t] = got.get(t, 0) + int(d)
            else:
                from elasticsearch_assets_ray.index.build import term_shard

                got = {}
                shards = term_shard(missing, self.num_shards)
                for t, sh in zip(missing, shards):
                    filt = (pc.field("shard") == int(sh)) & (pc.field("term") == t)
                    if self.bucket_range is not None:
                        lo, hi = self.bucket_range
                        filt = filt & (pc.field("bucket") >= lo) & (pc.field("bucket") < hi)
                    tb = self._seg.to_table(columns=["df"], filter=filt)
                    if tb.num_rows:
                        got[t] = int(pc.sum(tb["df"]).as_py())
            for t in missing:
                if t in got:
                    self._df_cache[t] = got[t]
                    out[t] = got[t]
        if len(self._df_cache) > 500_000:
            self._df_cache.clear()
        return out

    def search_prepared(
        self,
        q: ParsedQuery,
        k: int = 10,
        df_override: dict[str, int] | None = None,
    ) -> pa.Table:
        """Serve an ALREADY parsed+rewritten query with externally
        supplied global df — the shard-side half of the scatter-gather
        protocol.  The coordinator did parse / minimum_should_match /
        multi-term rewrite once; per-doc scoring here is bit-identical to
        an unrestricted searcher because tf, doclen, avgdl, n_docs and
        (via ``df_override``) idf are all partition-independent."""
        self._df_override = df_override
        try:
            if q.has_phrases:
                ids, scores = self._search_phrases(q, k)
            else:
                ids, scores = self._score(q, k=k if self.prune else None)
                ids, scores = bm25.sort_topk(ids, scores, k)
        finally:
            self._df_override = None
        self.queries_served += 1
        self.records_served += int(ids.size)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})

    def match_ids(
        self, query: str | ParsedQuery, minimum_should_match: int = 0
    ) -> np.ndarray:
        """Every matching docID — WITHOUT BM25 arithmetic for the common
        flat query shapes.  This is the F3 count path: an ES ``count``
        never scores, and scoring is the expensive half of a common-term
        probe (tf-saturation + idf scatter-add over every posting).
        Boolean-expression trees, phrase queries and cursors fall back to
        the scored path (their match semantics need per-doc evaluation
        the score-free walk doesn't replicate); ``stats`` records which
        path served each call."""
        q = self._q(query)
        q = self._apply_msm(q, minimum_should_match)
        q = self._rewrite_prefixes(q)
        return self._match_ids(q)

    def match_ids_prepared(
        self,
        q: ParsedQuery,
        df_override: dict[str, int] | None = None,
        up_to: int | None = None,
    ) -> np.ndarray:
        """Shard-side ``match_ids`` for an already-rewritten query (df
        only affects scores, which this path skips — accepted for
        interface symmetry with ``search_prepared``).  ``up_to`` is the
        track_total_hits early-exit threshold: counting stops once that
        many matches accumulate (bucket granularity — may overshoot
        within the last bucket, never undershoots ``min(true, up_to)``)."""
        self._df_override = df_override
        try:
            return self._match_ids(q, up_to=up_to)
        finally:
            self._df_override = None

    def term_postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Raw (internal docIDs, tf) postings of ONE analyzed term across
        this searcher's buckets — the per-field building block
        ``combined_fields`` needs (Lucene's CombinedFieldQuery reads
        per-field postings the same way).  Tombstoned docs are filtered
        like every other query path; ids come back sorted."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        seg = self._segment_rows([term])
        if seg is None or seg.num_rows == 0:
            return empty
        ids_p, tf_p = [], []
        for i in range(seg.num_rows):
            d, tf = self._decode_postings(
                seg["blob"][i].as_py(), int(seg["df"][i].as_py())
            )
            ids_p.append(d)
            tf_p.append(tf)
        ids = np.concatenate(ids_p).astype(np.int64)
        tf = np.concatenate(tf_p).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        ids, tf = ids[order], tf[order]
        keep = self._tombstone_keep(ids)
        if keep is not None:
            ids, tf = ids[keep], tf[keep]
        return ids, tf

    def _tombstone_keep(self, ids: np.ndarray) -> np.ndarray | None:
        """Boolean keep-mask over ``ids`` vs the sorted tombstone array,
        or None when there are no tombstones.  The pos>=size clamp-to-0
        is sound only because searchsorted-left guarantees a clamped id
        is greater than every tombstone (so != tombstones[0]) — this
        helper exists to carry that invariant in ONE place (several
        older inline copies of the idiom predate it)."""
        if not self._tombstones.size:
            return None
        pos = np.searchsorted(self._tombstones, ids)
        pos[pos >= self._tombstones.size] = 0
        return self._tombstones[pos] != ids

    def term_postings_many(
        self, terms: list[str]
    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """Batch form of :meth:`term_postings` (one call per query, not
        per term — the sharded duck-type turns this into ONE scatter)."""
        return {t: self.term_postings(t) for t in terms}

    def match_count(
        self,
        query: str | ParsedQuery,
        minimum_should_match: int = 0,
        track_total_hits: int | None = None,
    ) -> tuple[int, str]:
        """ES ``track_total_hits`` (Q7): exact hit count up to the
        threshold, then STOP — remaining buckets are never decoded.
        Returns ``(value, relation)`` with the ES ``total`` contract:
        ``(n, "eq")`` when the count is exact, ``(threshold, "gte")``
        when counting stopped at the threshold."""
        q = self._q(query)
        q = self._apply_msm(q, minimum_should_match)
        q = self._rewrite_prefixes(q)
        # count to threshold+1: a total EXACTLY equal to the threshold is
        # complete and must report "eq" (ES: relation gte only when the
        # count was truncated), so truncation needs a strict >
        up_to = None if track_total_hits is None else track_total_hits + 1
        n = self._match_ids(q, up_to=up_to).size
        if track_total_hits is not None and n > track_total_hits:
            return (track_total_hits, "gte")
        return (n, "eq")

    def _match_ids(self, q: ParsedQuery, up_to: int | None = None) -> np.ndarray:
        if q.has_phrases or q.bool_tree is not None or q.search_after is not None:
            self.stats["count_fallback_scored"] += 1
            if q.has_phrases:
                ids, _ = self._search_phrases(q, k=None)
            else:
                ids, _ = self._score(q, k=None)
            return ids
        self.stats["count_score_free"] += 1
        fctx = self._filter_ctx(q)
        terms = q.scoring_terms
        need = sorted(set(terms) | set(q.must_not))
        seg = self._segment_rows(need)
        if seg is None or seg.num_rows == 0:
            return np.empty(0, dtype=np.int64)
        seg_term = np.asarray(seg["term"].to_pylist(), dtype=object)
        seg_bucket = seg["bucket"].to_numpy(zero_copy_only=False)
        present = set(seg_term)
        must = [t for t in set(q.must)]
        for t in must:
            if t not in present:
                return np.empty(0, dtype=np.int64)
        for grp in q.must_any:
            if not any(t in present for t in grp):
                return np.empty(0, dtype=np.int64)
        out: list[np.ndarray] = []
        for b in np.unique(seg_bucket):
            rows = np.flatnonzero(seg_bucket == b)
            per_term: dict[str, np.ndarray] = {}
            for i in rows:
                t = seg_term[i]
                key = (t, int(b))
                hit = self._post_cache.get(key)
                if hit is not None:
                    per_term[t] = hit[0]
                    continue
                ids_hit = self._ids_cache.get(key)
                if ids_hit is not None:
                    self._ids_cache.move_to_end(key)
                    per_term[t] = ids_hit
                    continue
                d, _tf = self._decode_postings(
                    seg["blob"][int(i)].as_py(), int(seg["df"][int(i)].as_py())
                )
                per_term[t] = d
                # repeated count probes (one per slicer decision) must not
                # re-decode the same blobs — ids-only LRU, no float work
                self._ids_cache[key] = d
                self._ids_cache_bytes += d.nbytes
                while self._ids_cache_bytes > self.ids_cache_budget and self._ids_cache:
                    _, old = self._ids_cache.popitem(last=False)
                    self._ids_cache_bytes -= old.nbytes
            parts = [per_term[t] for t in terms if t in per_term]
            if not parts:
                continue
            ids_b = np.unique(np.concatenate(parts))
            mask = np.ones(ids_b.size, dtype=bool)
            for t in must:
                have = per_term.get(t, np.empty(0, dtype=np.int64))
                mask &= np.isin(ids_b, have)
            for grp in q.must_any:
                hp = [per_term[t] for t in grp if t in per_term]
                have = np.concatenate(hp) if hp else np.empty(0, dtype=np.int64)
                mask &= np.isin(ids_b, have)
            for t in set(q.must_not):
                if t in per_term:
                    mask &= ~np.isin(ids_b, per_term[t])
            if q.minimum_should_match > 0:
                cnt = np.zeros(ids_b.size, dtype=np.int32)
                for t in sorted(set(q.should)):
                    h = per_term.get(t)
                    if h is not None:
                        cnt += np.isin(ids_b, h)
                mask &= cnt >= q.minimum_should_match
            if self._tombstones.size:
                pos = np.searchsorted(self._tombstones, ids_b)
                pos[pos >= self._tombstones.size] = 0
                mask &= self._tombstones[pos] != ids_b
            if fctx is not None:
                mask &= fctx(ids_b)
            out.append(ids_b[mask])
            if up_to is not None and sum(a.size for a in out) >= up_to:
                # track_total_hits early exit: the caller only needs to
                # know the total reached the threshold — every remaining
                # bucket stays undecoded
                self.stats["count_early_exit"] = (
                    self.stats.get("count_early_exit", 0) + 1
                )
                break
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)

    def all_scores_prepared(
        self, q: ParsedQuery, df_override: dict[str, int] | None = None
    ) -> pa.Table:
        """``all_scores`` for an already-rewritten query with injected
        global df (shard-side exhaustive match set — feeds the per-shard
        partial aggregations)."""
        self._df_override = df_override
        try:
            if q.has_phrases:
                ids, scores = self._search_phrases(q, k=None)
            else:
                ids, scores = self._score(q, k=None)
        finally:
            self._df_override = None
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(scores)})

    def _verify_phrases_content(
        self,
        q: ParsedQuery,
        ids: np.ndarray,
        scores: np.ndarray,
        want: int,
        content_col: str,
        specs: tuple | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Adjacency-verify ``ids`` (already score-ordered) in chunks
        until ``want`` survivors."""
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        pos_specs, neg_specs = (
            specs if specs is not None else self._phrase_specs(q)
        )
        out_i: list[int] = []
        out_s: list[float] = []
        chunk = max(64, min(4 * want, 4096))
        pos = 0
        while pos < ids.size and len(out_i) < want:
            cids = ids[pos : pos + chunk]
            t = self.hydrate(cids, columns=["doc_id", content_col])
            texts = dict(
                zip(
                    t["doc_id"].to_numpy(zero_copy_only=False),
                    t[content_col].to_pylist(),
                )
            )
            for j, d in enumerate(cids):
                toks = tokenize_text(texts.get(int(d)) or "")
                if all(
                    self.contains_spec(toks, p, n) for p, n in pos_specs
                ) and not any(
                    self.contains_spec(toks, p, n) for p, n in neg_specs
                ):
                    out_i.append(int(d))
                    out_s.append(float(scores[pos + j]))
                    if len(out_i) >= want:
                        break
            pos += chunk
        return np.array(out_i, dtype=np.int64), np.array(out_s, dtype=np.float64)

    # ---------- fielded metadata filters ----------
    def _filter_bits(self, pred: tuple, pid: int) -> np.ndarray:
        """Bool bitmap (row-offset indexed) of the docstore part's rows
        satisfying ``pred`` — ``("eq", fld, value)`` or ``("range", fld,
        lo, lo_incl, hi, hi_incl)`` (None = open endpoint).  One
        column-pruned parquet read per (pred, pid), LRU-cached.  Range
        bounds compare in the COLUMN's type (numeric columns
        numerically, strings lexicographically — ES range semantics)."""
        key = (pred, pid)
        hit = self._filterbits_cache.get(key)
        if hit is not None:
            self._filterbits_cache.move_to_end(key)
            return hit
        fld = pred[1]
        t = pq.read_table(self._pid_map()[pid], columns=[fld])
        col = t[fld]

        def bound(value: str) -> pa.Scalar:
            try:
                return pa.scalar(value).cast(col.type)
            except pa.ArrowInvalid as e:
                raise ValueError(
                    f"filter value {value!r} does not cast to column "
                    f"{fld!r} type {col.type}"
                ) from e

        if pred[0] == "eq":
            cond = pc.equal(col, bound(pred[2]))
        elif pred[0] == "match":
            # analyzed match (`field.text:token`): token membership in
            # tokenize(column) — ES text-field match semantics over a
            # stored column, vectorized through the shared analyzer
            from elasticsearch_assets_ray.stages.tokenizer import tokenize_column

            toks = tokenize_column(col.combine_chunks()).fill_null([])
            offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            hit = pc.fill_null(pc.equal(toks.values, pa.scalar(pred[2])), False).to_numpy(
                zero_copy_only=False
            )
            doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offsets))
            bits = np.zeros(t.num_rows, dtype=bool)
            bits[doc_idx[hit]] = True
            cond = pa.array(bits)
        elif pred[0] == "exists":
            cond = pc.is_valid(col)
        else:
            _, _, lo, loi, hi, hii = pred
            cond = None
            if lo is not None:
                cmp_ = pc.greater_equal if loi else pc.greater
                cond = cmp_(col, bound(lo))
            if hi is not None:
                cmp_ = pc.less_equal if hii else pc.less
                hc = cmp_(col, bound(hi))
                cond = hc if cond is None else pc.and_(cond, hc)
            if cond is None:  # fully open range `f:[* TO *]`: existence
                cond = pc.is_valid(col)
        bits = pc.fill_null(cond, False).to_numpy(zero_copy_only=False)
        self._filterbits_cache[key] = bits
        self._filterbits_bytes += bits.nbytes
        while self._filterbits_bytes > self.filterbits_budget and len(
            self._filterbits_cache
        ) > 1:
            _, old = self._filterbits_cache.popitem(last=False)
            self._filterbits_bytes -= old.nbytes
        return bits

    def _filter_ctx(self, q: ParsedQuery):
        """Candidate mask for the query's fielded filter clauses, or
        ``None`` when it has none.  Filters are FILTER CONTEXT (ES
        bool.filter): conjunctive, non-scoring, and — like tombstones —
        they leave collection statistics untouched."""
        if not (
            q.filters
            or q.not_filters
            or q.match_filters
            or q.not_match_filters
            or q.range_filters
            or q.not_range_filters
            or q.exists_filters
            or q.not_exists_filters
        ):
            return None
        self._require_docstore_fields(
            [("eq", f, v) for f, v in q.filters + q.not_filters]
            + [("match", f, t) for f, t in q.match_filters + q.not_match_filters]
            + [("range", *r) for r in q.range_filters + q.not_range_filters]
            + [("exists", f) for f in q.exists_filters + q.not_exists_filters]
        )
        specs = (
            [(("eq", f, v), False) for f, v in q.filters]
            + [(("eq", f, v), True) for f, v in q.not_filters]
            + [(("match", f, t), False) for f, t in q.match_filters]
            + [(("match", f, t), True) for f, t in q.not_match_filters]
            + [(("range", *r), False) for r in q.range_filters]
            + [(("range", *r), True) for r in q.not_range_filters]
            + [(("exists", f), False) for f in q.exists_filters]
            + [(("exists", f), True) for f in q.not_exists_filters]
        )
        def mask(ids: np.ndarray) -> np.ndarray:
            m = np.ones(ids.size, dtype=bool)
            if ids.size == 0:
                return m
            pid = ids >> self._doc_shift
            off = ids - (pid << self._doc_shift)
            # contiguous pid runs (bucket candidates are docid-ascending)
            bounds = np.concatenate(
                ([0], np.flatnonzero(np.diff(pid)) + 1, [ids.size])
            )
            for a, b in zip(bounds[:-1], bounds[1:]):
                o = off[a:b]
                for pred, neg in specs:
                    bits = self._filter_bits(pred, int(pid[a]))
                    sel = bits[o]
                    m[a:b] &= ~sel if neg else sel
            return m

        return mask

    # ---------- internals ----------
    def _score(self, q: ParsedQuery, k: int | None) -> tuple[np.ndarray, np.ndarray]:
        fctx = self._filter_ctx(q)
        terms = q.scoring_terms
        if q.bool_tree is not None:
            parser_mod.check_tree_grounded(q.bool_tree)
            self._require_docstore_fields(self._tree_filter_preds(q.bool_tree))
            # NEGATIVE-polarity leaves need postings too (NOT evaluation)
            need = sorted(set(terms) | parser_mod.tree_terms(q.bool_tree))
            # score upper bounds must scale with boosts / duplicate
            # positive occurrences (Σ path-products per term)
            ub_mult = parser_mod.tree_boost_mults(q.bool_tree)
        else:
            need = sorted(set(terms) | set(q.must_not))
            ub_mult = None
        seg = self._segment_rows(need)
        if seg is None or seg.num_rows == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

        seg_term = np.asarray(seg["term"].to_pylist(), dtype=object)
        seg_bucket = seg["bucket"].to_numpy(zero_copy_only=False)
        seg_df = seg["df"].to_numpy(zero_copy_only=False)

        # global df per term = Σ bucket rows (SURVEY §2.6 global stats)
        df_by_term: dict[str, int] = {}
        for t, d in zip(seg_term, seg_df):
            df_by_term[t] = df_by_term.get(t, 0) + int(d)
        if self._df_override is not None:
            # doc-partitioned shard: the local row sum is partial — use
            # the coordinator's global df (dfs_query_then_fetch).  KEY
            # membership stays local: a term with no postings in this
            # shard's buckets matches no local doc regardless of df.
            df_by_term = {
                t: self._df_override.get(t, d) for t, d in df_by_term.items()
            }

        idf_by_term = {
            t: bm25.math_idf(df_by_term[t], self.n_docs)
            for t in terms
            if t in df_by_term
        }
        must = [t for t in set(q.must)]
        # a must term absent from the index ⇒ empty result
        for t in must:
            if t not in df_by_term:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        # a must_any group with no indexed member matches nothing
        for grp in q.must_any:
            if not any(t in df_by_term for t in grp):
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

        buckets = np.unique(seg_bucket)
        # rows grouped by bucket for scoring; per-bucket upper bounds
        row_idx_by_bucket: dict[int, list[int]] = {int(b): [] for b in buckets}
        for i in range(seg.num_rows):
            row_idx_by_bucket[int(seg_bucket[i])].append(i)

        bounds = {}
        if k is not None:
            for b, rows in row_idx_by_bucket.items():
                ub = 0.0
                for i in rows:
                    t = seg_term[i]
                    w = idf_by_term.get(t)
                    if w is None:
                        continue  # must_not-only term: no score contribution
                    if ub_mult is not None:
                        w = w * ub_mult.get(t, 0.0)
                    ub += self._block_ub(seg, i, t, int(b))[2] * w
                bounds[b] = ub
            order = sorted(bounds, key=lambda b: -bounds[b])
        else:
            order = [int(b) for b in buckets]

        blob_col = seg["blob"]
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        theta = -np.inf
        heap_ids = np.empty(0, dtype=np.int64)
        heap_scores = np.empty(0, dtype=np.float64)

        # θ seed (WAND-style): decode the rarest scoring term fully, take
        # the k-th best PARTIAL score — a valid lower bound on the k-th
        # best total score, so pruning can start before the heap fills.
        # Only filter-free queries: must/must_not could evict seed docs.
        theta_seed = -np.inf
        if (
            k is not None
            and not must
            and not q.must_not
            and not q.must_any
            and not q.filters
            and not q.not_filters
            and not q.match_filters
            and not q.not_match_filters
            and not q.range_filters
            and not q.not_range_filters
            and not q.exists_filters
            and not q.not_exists_filters
            and q.bool_tree is None
            and q.minimum_should_match == 0
            and q.search_after is None
            and len(terms) > 1
        ):
            theta_seed = self._seed_theta(seg, seg_term, seg_df, idf_by_term, k)

        for n_processed, b in enumerate(order):
            theta_eff = max(theta, theta_seed)
            can_break = heap_ids.size >= k if k is not None else False
            if k is not None and (can_break or theta_seed > -np.inf) and bounds[b] < theta_eff:
                self.stats["buckets_skipped"] += len(order) - n_processed
                break  # every remaining bucket bounded below θ — skip undecoded
            self.stats["buckets_considered"] += 1
            rows = row_idx_by_bucket[b]
            per_term = self._decode_bucket_rows(
                seg, rows, seg_term, seg_df, idf_by_term, int(b),
                theta_eff if k is not None else -np.inf,
                ub_mult=ub_mult,
            )
            if q.bool_tree is not None:
                # boolean-expression mode: candidates = union of the
                # positive-polarity terms' postings (complete for
                # grounded trees); match + Lucene clause-aware score in
                # one tree pass (a doc lives in exactly one bucket, so
                # per-bucket evaluation is global)
                parts = [per_term[t][0] for t in terms if t in per_term]
                ids_b = (
                    np.unique(np.concatenate(parts))
                    if parts
                    else np.empty(0, dtype=np.int64)
                )
                mask, scores_b = self._tree_eval(
                    q.bool_tree, ids_b, per_term, idf_by_term
                )
            else:
                # terms iterated in sorted order → per-doc addition order
                # is pinned (rank-identity with the oracle)
                items = [(t, per_term[t]) for t in terms if t in per_term]
                ids_b, scores_b = self._accumulate(items, idf_by_term, int(b))
                # must / must_not masks within the bucket
                mask = np.ones(ids_b.size, dtype=bool)
            for t in must:
                have = per_term.get(t, (np.empty(0, dtype=np.int64),))[0]
                mask &= np.isin(ids_b, have)
            for grp in q.must_any:
                # doc must contain ≥1 term of the group (a doc lives in
                # exactly one bucket, so per-bucket evaluation is global)
                parts = [
                    per_term[t][0] for t in grp if t in per_term
                ]
                have = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
                mask &= np.isin(ids_b, have)
            for t in set(q.must_not):
                if t in per_term:
                    mask &= ~np.isin(ids_b, per_term[t][0])
            if q.minimum_should_match > 0:
                # ES minimum_should_match: ≥ N DISTINCT should terms
                cnt = np.zeros(ids_b.size, dtype=np.int32)
                for t in sorted(set(q.should)):
                    h = per_term.get(t)
                    if h is not None:
                        cnt += np.isin(ids_b, h[0])
                mask &= cnt >= q.minimum_should_match
            if self._tombstones.size:
                # tombstones are sorted: membership via searchsorted
                pos = np.searchsorted(self._tombstones, ids_b)
                pos[pos >= self._tombstones.size] = 0
                mask &= self._tombstones[pos] != ids_b
            if fctx is not None:
                mask &= fctx(ids_b)
            ids_b, scores_b = ids_b[mask], scores_b[mask]
            if q.search_after is not None and ids_b.size:
                # cursor pagination: keep docs strictly AFTER the cursor
                # in (round9 score desc, docid asc) order
                a9, aid = q.search_after
                r9 = bm25.round_half_up(scores_b, 9)
                keep = (r9 < a9) | ((r9 == a9) & (ids_b > aid))
                ids_b, scores_b = ids_b[keep], scores_b[keep]
            if k is None:
                all_ids.append(ids_b)
                all_scores.append(scores_b)
            elif ids_b.size:
                heap_ids = np.concatenate([heap_ids, ids_b])
                heap_scores = np.concatenate([heap_scores, scores_b])
                heap_ids, heap_scores = bm25.sort_topk(heap_ids, heap_scores, k)
                if heap_ids.size >= k:
                    theta = float(heap_scores[-1])

        if k is None:
            if not all_ids:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
            return np.concatenate(all_ids), np.concatenate(all_scores)
        return heap_ids, heap_scores

    # ---------- decode helpers (block-max pruning) ----------
    def _decode_row_cached(self, seg: pa.Table, i: int, term: str, bucket: int, w=None):
        """Full decode of one segment row through the (term, bucket) LRU.
        Cached tuple is (docids, tfs, doclens, sat, wsat): ``sat`` is the
        tf-saturation factor and ``wsat = idf × sat`` the full per-posting
        contribution — BOTH query-independent for a fixed index, so a warm
        query is a bare scatter-add of ``wsat``."""
        key = (term, bucket)
        hit = self._post_cache.get(key)
        if hit is not None:
            self._post_cache.move_to_end(key)
            # wsat is only valid for the idf it was computed with: a
            # df_override (dfs_query_then_fetch, cross_fields blending)
            # changes w for the SAME (term, bucket) — recompute from the
            # cached sat instead of serving a stale product
            if w is not None and (
                hit[2] is None or self._post_cache_w.get(key) != w
            ):
                hit = (hit[0], hit[1], w * hit[1])
                self._post_cache[key] = hit
                self._post_cache_w[key] = w
            return hit
        d, tf = self._decode_postings(
            seg["blob"][i].as_py(), int(seg["df"][i].as_py())
        )
        dl = self.doclens_for(d)
        sat = bm25.tf_saturation(tf, dl, self.avgdl)
        hit = (d, sat, (w * sat) if w is not None else None)
        self._post_cache[key] = hit
        if w is not None:
            self._post_cache_w[key] = w
        self._post_cache_bytes += d.nbytes * 3
        while self._post_cache_bytes > self.post_cache_budget and self._post_cache:
            okey, (od, *_rest) = self._post_cache.popitem(last=False)
            self._post_cache_w.pop(okey, None)
            self._post_cache_bytes -= od.nbytes * 3
        return hit

    def _block_ub(self, seg, i: int, term: str, bucket: int):
        """(block_last int64[], block_sat float64[], sat_max float) for a
        segment row — the query-invariant factors of its block upper
        bounds, through a byte-budgeted LRU."""
        key = (term, bucket)
        hit = self._blockub_cache.get(key)
        if hit is not None:
            self._blockub_cache.move_to_end(key)
            return hit
        bl = np.frombuffer(seg["block_last"][i].as_py(), dtype=np.int64)
        mtf = np.frombuffer(seg["block_maxtf"][i].as_py(), dtype=np.int32)
        mdl = np.frombuffer(seg["block_mindl"][i].as_py(), dtype=np.int32)
        sat = bm25.tf_saturation(
            mtf.astype(np.float64), mdl.astype(np.float64), self.avgdl
        )
        hit = (bl, sat, float(sat.max()) if sat.size else 0.0)
        self._blockub_cache[key] = hit
        self._blockub_bytes += bl.nbytes + sat.nbytes
        while self._blockub_bytes > self.blockub_budget and len(self._blockub_cache) > 1:
            _, (obl, osat, _m) = self._blockub_cache.popitem(last=False)
            self._blockub_bytes -= obl.nbytes + osat.nbytes
        return hit

    def _seed_theta(self, seg, seg_term, seg_df, idf_by_term, k: int) -> float:
        """k-th best partial score of the rarest scoring term (θ seed)."""
        df_tot = {t: 0 for t in idf_by_term}
        for t, d in zip(seg_term, seg_df):
            if t in df_tot:
                df_tot[t] += int(d)
        if not df_tot:
            return -np.inf
        rare = min(df_tot, key=lambda t: (df_tot[t], t))
        if df_tot[rare] < k or df_tot[rare] > 250_000:
            return -np.inf  # not enough docs to seed / too expensive
        w = idf_by_term[rare]
        partials = []
        for i in np.flatnonzero(seg_term == rare):
            b = int(seg["bucket"][int(i)].as_py())
            hit = self._decode_row_cached(seg, int(i), rare, b, w=w)
            partials.append(hit[2])
        ps = np.concatenate(partials)
        if self._tombstones.size:
            # a tombstoned doc's partial must not seed θ — it can never
            # appear in the result, so its score is not a valid bound
            ids = np.concatenate(
                [
                    self._decode_row_cached(
                        seg,
                        int(i),
                        rare,
                        int(seg["bucket"][int(i)].as_py()),
                        w=w,
                    )[0]
                    for i in np.flatnonzero(seg_term == rare)
                ]
            )
            pos = np.searchsorted(self._tombstones, ids)
            pos[pos >= self._tombstones.size] = 0
            ps = ps[self._tombstones[pos] != ids]
        if ps.size < k:
            return -np.inf
        return float(np.partition(ps, ps.size - k)[ps.size - k])

    def _decode_bucket_rows(
        self, seg, rows, seg_term, seg_df, idf_by_term, bucket: int, theta: float,
        ub_mult: dict | None = None,
    ) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Decode one bucket's rows into per-term (docids, tfs, doclens).

        With a live threshold θ, applies BLOCK-MAX intersection pruning:
        the union of every term's 128-doc block boundaries forms a docID
        interval grid; an interval whose summed per-term block upper
        bounds stays below θ provably holds no top-k doc, so the blocks
        covering only such intervals are never decoded, and postings
        falling in pruned intervals are masked out of every term (keeping
        partial-score accounting consistent).  This is BMW's block-max
        skipping vectorized over the grid instead of a doc-at-a-time
        pivot walk (Ding & Suel's block-max metadata, public literature)."""
        per_term: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        use_prune = theta > -np.inf and len(rows) > 0
        if use_prune and all(
            (seg_term[i], bucket) in self._post_cache for i in rows
        ):
            # every term already decoded (warm query): skipping saves no
            # decode work, and the grid build + posting mask would be pure
            # overhead — serve the bare cached scatter-add instead
            use_prune = False
        meta = None
        if use_prune:
            # per-row block metadata + upper bounds
            meta = []
            total_blocks = 0
            for i in rows:
                bl, sat, _m = self._block_ub(seg, i, seg_term[i], bucket)
                w = idf_by_term.get(seg_term[i])
                if w is not None and ub_mult is not None:
                    # boosted / duplicated positive occurrences raise the
                    # term's possible contribution (Σ path-products)
                    w = w * ub_mult.get(seg_term[i], 0.0)
                ub = w * sat if w is not None else np.zeros(len(bl))
                meta.append((bl, ub))
                total_blocks += len(bl)
            if total_blocks < 8:
                use_prune = False  # not worth the grid

        if use_prune:
            grid = np.unique(np.concatenate([m[0] for m in meta]))
            total_ub = np.zeros(grid.size, dtype=np.float64)
            iv_block = []
            for bl, ub in meta:
                idx = np.searchsorted(bl, grid, side="left")
                valid = idx < len(bl)
                contrib = np.zeros(grid.size)
                contrib[valid] = ub[idx[valid]]
                total_ub += contrib
                iv_block.append((idx, valid))
            surviving = total_ub >= theta
            if surviving.all():
                use_prune = False  # nothing to skip — fall through to full decode

        for n_i, i in enumerate(rows):
            t = seg_term[i]
            w = idf_by_term.get(t)
            if not use_prune:
                self.stats["rows_full_decode"] += 1
                hit = self._decode_row_cached(seg, i, t, bucket, w=w)
            else:
                key = (t, bucket)
                cached = self._post_cache.get(key)
                if cached is not None:
                    self._post_cache.move_to_end(key)
                    hit = self._decode_row_cached(seg, i, t, bucket, w=w)
                else:
                    bl, _ub = meta[n_i]
                    idx, valid = iv_block[n_i]
                    need = np.unique(idx[surviving & valid])
                    if need.size >= max(1, len(bl) // 2):
                        self.stats["rows_full_decode"] += 1
                        hit = self._decode_row_cached(seg, i, t, bucket, w=w)
                    elif need.size == 0:
                        self.stats["rows_skipped"] += 1
                        continue  # no surviving interval touches this term
                    else:
                        blob = seg["blob"][i].as_py()
                        offs = np.frombuffer(seg["block_off"][i].as_py(), dtype=np.int64)
                        df_i = int(seg_df[i])
                        self.stats["rows_partial_decode"] += 1
                        dparts, tparts = [], []
                        for j in need:
                            prev_last = int(bl[j - 1]) if j > 0 else 0
                            dj, tj = self._decode_block(blob, offs, int(j), df_i, prev_last)
                            dparts.append(dj)
                            tparts.append(tj)
                        d = np.concatenate(dparts)
                        tf = np.concatenate(tparts)
                        dl = self.doclens_for(d)
                        sat = bm25.tf_saturation(tf, dl, self.avgdl)
                        hit = (d, sat, (w * sat) if w is not None else None)
                # mask postings to surviving intervals (ALL terms, so no
                # doc ever gets a partial-term score)
                d, sat, wsat = hit
                iv = np.searchsorted(grid, d, side="left")
                keepmask = surviving[np.minimum(iv, grid.size - 1)]
                hit = (
                    d[keepmask], sat[keepmask],
                    wsat[keepmask] if wsat is not None else None,
                )
                if hit[0].size == 0:
                    continue
            if t in per_term:  # same term twice in a bucket: concat (safety)
                hit = tuple(
                    None if (a is None or c is None) else np.concatenate([a, c])
                    for a, c in zip(per_term[t], hit)
                )
            per_term[t] = hit
        return per_term

    def _accumulate(
        self,
        items: list[tuple[str, tuple]],
        idf_by_term: dict[str, float],
        bucket: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Score accumulation bounded by ONE bucket's docID range.

        Dense path: scatter-add of ``idf × cached sat`` into an array
        sized to the bucket's doc count (buckets are contiguous
        ``pid // runs_per_bucket`` pid groups, so bucket-local rank =
        base_rank[pid] + row).  Sparse path when the candidate postings
        are far smaller than the bucket: term-major concat + bincount.
        Both add each doc's term contributions in sorted-term order —
        bit-identical to the oracle's term-major summation, and to each
        other (np.bincount accumulates weights in array order, which is
        term-major per doc here).  Per-query memory is O(bucket), never
        O(corpus)."""
        if not items:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        pids, base, contig = self._bucket_rank_state(bucket)
        total = int(base[-1])
        n_postings = sum(h[0].size for _, h in items)
        shift = self._doc_shift

        def wsat_of(t, h):
            d, sat, wsat = h
            return d, (idf_by_term[t] * sat if wsat is None else wsat)

        if total > 4 * n_postings:
            # sparse: candidate docids ≪ bucket size
            d_parts, w_parts = [], []
            for t, h in items:
                d, w = wsat_of(t, h)
                d_parts.append(d)
                w_parts.append(w)
            all_d = np.concatenate(d_parts)
            all_w = np.concatenate(w_parts)
            uniq, inv = np.unique(all_d, return_inverse=True)
            sums = np.bincount(inv, weights=all_w, minlength=uniq.size)
            return uniq.astype(np.int64), sums.astype(np.float64)

        scratch = self._scratch.get(bucket)
        if scratch is not None and scratch[0].size == total:
            self._scratch.move_to_end(bucket)
        else:
            scratch = (np.zeros(total, dtype=np.float64), np.zeros(total, dtype=bool))
            self._scratch[bucket] = scratch
            self._scratch_bytes += scratch[0].nbytes + scratch[1].nbytes
            while self._scratch_bytes > self.scratch_budget and len(self._scratch) > 1:
                _, (osc, ohit) = self._scratch.popitem(last=False)
                self._scratch_bytes -= osc.nbytes + ohit.nbytes
        scores, hit = scratch
        pid0 = int(pids[0])
        for t, h in items:
            d, w = wsat_of(t, h)
            p_idx = (
                (d >> shift) - pid0 if contig else np.searchsorted(pids, d >> shift)
            )
            idx = base[p_idx] + (d - (pids[p_idx] << shift))
            scores[idx] += w
            hit[idx] = True
        hidx = np.flatnonzero(hit)
        p_idx = np.searchsorted(base, hidx, side="right") - 1
        docids = (pids[p_idx] << shift) + (hidx - base[p_idx])
        out_scores = scores[hidx].copy()
        # reset only the touched entries — reuse stays O(candidates)
        scores[hidx] = 0.0
        hit[hidx] = False
        return docids.astype(np.int64), out_scores

    # ---------- doc hydration ----------
    def hydrate(self, docids: np.ndarray, columns: list[str] | None = None) -> pa.Table:
        """Fetch docstore rows for internal docIDs (the mget analog,
        reference elasticsearch_state_storage/api.ts).

        Pid-pruned: docids encode their partition (``docid >> doc_shift``)
        and docstore part file ``part-<pid>.parquet`` holds pid's rows in
        row order (docid = pid<<shift + row), so only the part files the
        requested ids actually touch are opened — a scan of the whole
        docstore dataset per hydrate call (the round-2 shape) re-reads
        every part's footer under every phrase verify chunk.  Opens are
        counted in ``hydrate_files_opened`` so tests can assert pruning.
        Unknown ids (pid absent or row out of range) are dropped, matching
        the old isin-filter semantics."""
        import pyarrow.parquet as pq

        docids = np.asarray(docids, dtype=np.int64)
        pmap = self._pid_map()
        if docids.size == 0:
            any_file = next(iter(pmap.values()))
            schema = pq.read_schema(any_file)
            t = schema.empty_table()
            return t.select(columns) if columns is not None else t
        pids = docids >> self._doc_shift
        parts: list[pa.Table] = []
        sels: list[np.ndarray] = []
        for p in np.unique(pids):
            f = pmap.get(int(p))
            if f is None:
                continue
            sel = np.flatnonzero(pids == p)
            rows = docids[sel] - (int(p) << self._doc_shift)
            ok = rows < self._pid_n_docs(int(p))
            sel, rows = sel[ok], rows[ok]
            if sel.size == 0:
                continue
            t = pq.read_table(f, columns=columns)
            self.hydrate_files_opened += 1
            parts.append(t.take(pa.array(rows, type=pa.int64())))
            sels.append(sel)
        if not parts:
            any_file = next(iter(pmap.values()))
            t = pq.read_schema(any_file).empty_table()
            return t.select(columns) if columns is not None else t
        combined = pa.concat_tables(parts)
        cat = np.concatenate(sels)
        # out[i] = combined row j with cat[j] == i (requested order,
        # minus dropped ids)
        order = np.argsort(cat, kind="stable")
        return combined.take(pa.array(order, type=pa.int64()))


class QueryEngineActor:
    """Actor-pool batch query serving: pass to
    ``ds.map_batches(QueryEngineActor, fn_constructor_kwargs=dict(index_dir=...),
    concurrency=N, batch_format="pyarrow")`` over a table with columns
    (query_id, query).  Index shards are loaded once per actor
    (``__init__``), never per batch."""

    def __init__(self, index_dir: str, k: int = 10, prune: bool = True):
        self.searcher = Searcher(index_dir, prune=prune)
        self.searcher._pid_map()  # warm the docstore layout once per actor
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: list[int] = []
        docids: list[np.ndarray] = []
        scores: list[np.ndarray] = []
        ranks: list[np.ndarray] = []
        for qid, qtext in zip(batch["query_id"].to_pylist(), batch["query"].to_pylist()):
            res = self.searcher.search(qtext, k=self.k)
            n = res.num_rows
            qids.extend([qid] * n)
            docids.append(res["doc_id"].to_numpy(zero_copy_only=False))
            scores.append(res["score"].to_numpy(zero_copy_only=False))
            ranks.append(np.arange(1, n + 1, dtype=np.int64))
        if not docids:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(np.concatenate(docids)),
                "rank": pa.array(np.concatenate(ranks)),
                "score": pa.array(np.concatenate(scores)),
            }
        )


# ---------------------------------------------------------------------------
# mergeable numeric-agg kernels (stats / percentiles over value-count
# partials) — shared by Searcher and the ShardedSearcher coordinator so
# the single-process and distributed paths are BIT-IDENTICAL: per-shard
# counts merge as exact integers, and the final float math runs once on
# the merged table in both cases.
# ---------------------------------------------------------------------------


def _after_mask(g: pa.Table, names: list[str], after: tuple) -> pa.Array:
    """Tuple-lexicographic ``key > after`` over bucket-key columns (the
    composite agg cursor filter)."""
    if len(after) != len(names):
        raise ValueError("after key arity != number of sources")
    cond = np.zeros(g.num_rows, dtype=bool)
    eq = np.ones(g.num_rows, dtype=bool)
    for c, a in zip(names, after):
        v = g[c].to_numpy(zero_copy_only=False)
        cond |= eq & (v > a)
        eq &= v == a
    return pa.array(cond)


def _composite_after_key(page: pa.Table, names: list[str]) -> tuple | None:
    if page.num_rows == 0:
        return None
    return tuple(page[c][page.num_rows - 1].as_py() for c in names)


def merge_composite_parts(
    parts: list[pa.Table], names: list[str], size: int
) -> pa.Table:
    """Coordinator half of the distributed composite agg: sum the
    per-shard partial counts by key tuple, re-sort, keep the first
    ``size``.  Exact by the standard ES composite argument: if a bucket
    is among the global first ``size`` in key order, then on every shard
    holding it fewer than ``size`` local buckets precede it (key order
    is global), so each such shard reported its full local count — the
    merged count is complete."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {**{c: pa.array([], pa.string()) for c in names}, "count": pa.array([], pa.int64())}
        )
    g = pa.concat_tables(parts).group_by(names).aggregate([("count", "sum")])
    g = pa.table(
        {**{c: g[c] for c in names}, "count": g["count_sum"].cast(pa.int64())}
    ).sort_by([(c, "ascending") for c in names])
    return g.slice(0, size)


def rare_from_facet(merged: pa.Table, max_doc_count: int) -> pa.Table:
    """rare_terms finalizer over merged (value, count) buckets: keep
    count ≤ max_doc_count, rarest first."""
    keep = pc.less_equal(merged["count"], pa.scalar(max_doc_count, pa.int64()))
    return merged.filter(keep).sort_by(
        [("count", "ascending"), ("value", "ascending")]
    )


def multi_terms_from_parts(
    parts: list[pa.Table], names: list[str], size: int | None
) -> pa.Table:
    """multi_terms finalizer: sum untruncated per-shard tuple-key
    partials (exact — no shard truncation happened), order by count
    desc then keys asc, truncate."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {**{c: pa.array([], pa.string()) for c in names}, "count": pa.array([], pa.int64())}
        )
    g = pa.concat_tables(parts).group_by(names).aggregate([("count", "sum")])
    g = pa.table(
        {**{c: g[c] for c in names}, "count": g["count_sum"].cast(pa.int64())}
    ).sort_by([("count", "descending"), *[(c, "ascending") for c in names]])
    return g.slice(0, size) if size is not None else g


def mad_from_value_counts(vc: pa.Table) -> float | None:
    """median_absolute_deviation from an exact (value, count) multiset:
    median via the shared linear-interpolation percentile, then the
    median of the |x − med| multiset (unique abs-deviations re-counted —
    never expanding the data)."""
    if vc.num_rows == 0:
        return None
    med = percentiles_from_value_counts(vc, (50.0,))["value"][0].as_py()
    v = np.abs(vc["value"].to_numpy(zero_copy_only=False).astype(np.float64) - med)
    c = vc["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    # collapse equal abs-deviations (argsort groups them adjacently)
    uniq, start = np.unique(v, return_index=True)
    sums = np.add.reduceat(c, start)
    dev = pa.table({"value": pa.array(uniq), "count": pa.array(sums)})
    return percentiles_from_value_counts(dev, (50.0,))["value"][0].as_py()


def merge_value_counts(parts: list[pa.Table]) -> pa.Table:
    """Sum (value, count) partials by value — exact (integer counts)."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {"value": pa.array([], pa.float64()), "count": pa.array([], pa.int64())}
        )
    allp = pa.concat_tables(parts)
    merged = allp.group_by("value").aggregate([("count", "sum")])
    return pa.table(
        {
            "value": merged["value"],
            "count": merged["count_sum"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by([("value", "ascending")])


def stats_from_value_counts(vc: pa.Table) -> dict:
    """ES extended_stats from a (value, count) table.  Sums are exact for
    integer-valued fields (products stay below 2^53); variance uses the
    textbook ``E[x²] − E[x]²`` form so a SQL oracle can replicate the
    float operations structurally."""
    v = vc["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    c = vc["count"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = int(c.sum())
    if n == 0:
        return {
            "count": 0,
            "min": None,
            "max": None,
            "sum": 0.0,
            "avg": None,
            "sum_of_squares": 0.0,
            "variance": None,
            "std_deviation": None,
        }
    s = float(np.dot(v, c))
    ss = float(np.dot(v * v, c))
    avg = s / n
    var = ss / n - avg * avg
    return {
        "count": n,
        "min": float(v[0]),
        "max": float(v[-1]),
        "sum": s,
        "avg": avg,
        "sum_of_squares": ss,
        "variance": var,
        "std_deviation": float(np.sqrt(var)) if var >= 0 else 0.0,
    }


def percentiles_from_value_counts(
    vc: pa.Table, percents: tuple[float, ...]
) -> pa.Table:
    """Exact percentiles (linear interpolation, numpy ``method='linear'``
    / SQL ``quantile_cont`` convention) from a value-ascending
    (value, count) table: rank r = (n−1)·p/100, result = x⌊r⌋ +
    (x⌈r⌉ − x⌊r⌋)·frac, positions resolved through cumulative counts —
    never expanding the multiset."""
    v = vc["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    c = vc["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(c)
    n = int(cum[-1]) if c.size else 0
    ps, out = [], []
    for p in percents:
        ps.append(float(p))
        if n == 0:
            out.append(None)
            continue
        r = (n - 1) * (float(p) / 100.0)
        lo = int(np.floor(r))
        frac = r - lo
        x_lo = float(v[np.searchsorted(cum, lo, side="right")])
        if frac == 0.0:
            out.append(x_lo)
            continue
        x_hi = float(v[np.searchsorted(cum, lo + 1, side="right")])
        out.append(x_lo + (x_hi - x_lo) * frac)
    return pa.table(
        {"percent": pa.array(ps, pa.float64()), "value": pa.array(out, pa.float64())}
    )


def boxplot_from_value_counts(vc: pa.Table) -> dict:
    """ES ``boxplot`` aggregation from a (value, count) table: exact
    q1/q2/q3 (the linear-interpolation convention of
    :func:`percentiles_from_value_counts`, = SQL ``quantile_cont``) plus
    ES's IQR whiskers — ``lower`` = smallest value ≥ q1 − 1.5·IQR,
    ``upper`` = largest value ≤ q3 + 1.5·IQR.  (ES computes these on a
    t-digest; this repo's serving path has the exact value histogram, so
    the pinned contract is the exact boxplot.)"""
    v = vc["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    if v.size == 0:
        return {}
    q = percentiles_from_value_counts(vc, (25.0, 50.0, 75.0))
    q1, q2, q3 = q["value"].to_pylist()
    iqr = q3 - q1
    lo_fence, hi_fence = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    lower = float(v[np.searchsorted(v, lo_fence, side="left")])
    upper = float(v[np.searchsorted(v, hi_fence, side="right") - 1])
    return {
        "min": float(v[0]),
        "max": float(v[-1]),
        "q1": q1,
        "q2": q2,
        "q3": q3,
        "lower": lower,
        "upper": upper,
    }


def percentile_ranks_from_value_counts(
    vc: pa.Table, values: tuple[float, ...]
) -> pa.Table:
    """ES ``percentile_ranks`` from a (value, count) table with the
    midpoint convention (pinned, SQL-replicable):
    ``rank(x) = 100 · (#{v < x} + 0.5 · #{v = x}) / n``."""
    v = vc["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    c = vc["count"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = float(c.sum())
    xs, out = [], []
    for x in values:
        xs.append(float(x))
        if n == 0:
            out.append(None)
            continue
        lt = float(c[v < x].sum())
        eq = float(c[v == x].sum())
        out.append(100.0 * (lt + 0.5 * eq) / n)
    return pa.table(
        {"value": pa.array(xs, pa.float64()), "rank": pa.array(out, pa.float64())}
    )


def adjacency_from_ids(ids: dict[str, np.ndarray]) -> pa.Table:
    """Singles + pairwise-intersection counts from per-name SORTED match
    id arrays (the shard-local half of adjacency_matrix; also the whole
    computation on a single searcher).  Empty buckets omitted."""
    names = sorted(ids)
    vals, counts = [], []
    for i, a in enumerate(names):
        if ids[a].size:
            vals.append(a)
            counts.append(int(ids[a].size))
        for b in names[i + 1 :]:
            inter = np.intersect1d(ids[a], ids[b], assume_unique=True)
            if inter.size:
                vals.append(f"{a}&{b}")
                counts.append(int(inter.size))
    order = np.argsort(np.array(vals, dtype=object))
    return pa.table(
        {
            "value": pa.array(np.array(vals, dtype=object)[order].astype(str), pa.string()),
            "count": pa.array(np.array(counts, dtype=np.int64)[order]),
        }
    )


def merge_group_value_counts(parts: list[pa.Table]) -> pa.Table:
    """Sum (value, metric, count) shard partials by (value, metric) —
    exact integer merge; output sorted (value asc, metric asc) so every
    later float reduction runs in ONE fixed order regardless of shard
    count."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "value": pa.array([], pa.string()),
                "metric": pa.array([], pa.float64()),
                "count": pa.array([], pa.int64()),
            }
        )
    allp = pa.concat_tables(parts)
    merged = allp.group_by(["value", "metric"]).aggregate([("count", "sum")])
    return pa.table(
        {
            "value": merged["value"],
            "metric": merged["metric"],
            "count": merged["count_sum"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by([("value", "ascending"), ("metric", "ascending")])


def facet_metric_from_pairs(pairs: pa.Table, size: int | None = None) -> pa.Table:
    """Finalize a merged (value, metric, count) table into the terms-agg
    bucket table (value, count, avg): per-bucket count = Σcount and
    avg = Σ(metric·count)/Σcount, reduced in the merge's (value, metric)
    sort order via ``np.add.reduceat`` — one deterministic left-to-right
    float summation, identical for 1 or K shards."""
    if pairs.num_rows == 0:
        return pa.table(
            {
                "value": pa.array([], pa.string()),
                "count": pa.array([], pa.int64()),
                "avg": pa.array([], pa.float64()),
            }
        )
    v = pairs["value"].to_numpy(zero_copy_only=False)
    m = pairs["metric"].to_numpy(zero_copy_only=False).astype(np.float64)
    c = pairs["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    first = np.ones(v.size, dtype=bool)
    first[1:] = v[1:] != v[:-1]
    starts = np.flatnonzero(first)
    cnt = np.add.reduceat(c, starts)
    wsum = np.add.reduceat(m * c, starts)
    t = pa.table(
        {
            "value": pa.array(v[starts].astype(str), pa.string()),
            "count": pa.array(cnt.astype(np.int64)),
            "avg": pa.array(wsum / cnt, pa.float64()),
        }
    ).sort_by([("count", "descending"), ("value", "ascending")])
    return t.slice(0, size) if size is not None else t


def merge_sig_partials(parts: list[pa.Table]) -> pa.Table:
    """Sum (term, fg) foreground partials by term — exact integers."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {"term": pa.array([], pa.string()), "fg": pa.array([], pa.int64())}
        )
    allp = pa.concat_tables(parts)
    merged = allp.group_by("term").aggregate([("fg", "sum")])
    return pa.table(
        {
            "term": merged["term"],
            "fg": merged["fg_sum"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by([("term", "ascending")])


def significant_terms_from_partials(
    fg: pa.Table,
    fg_total: int,
    df_fn,
    n_docs: int,
    size: int,
    min_doc_count: int,
    chunk: int = 512,
) -> pa.Table:
    """JLH finalizer over the merged foreground counts: score =
    (fgPct − bgPct)·(fgPct/bgPct), terms kept when fg ≥ min_doc_count and
    fgPct > bgPct; top-``size`` at (round-9 score desc, term asc).

    ``df_fn(terms) -> {term: df}`` fetches background df LAZILY in
    fg-descending chunks with an EXACT early stop: bg ≥ fg always, so a
    candidate's best possible score is ub(fg) = (fg/fgt − fg/n)·(n/fgt)
    (attained at bg = fg), which is increasing in fg — once the running
    top-``size``'s worst round-9 score beats ub(next chunk's max fg) the
    remaining candidates are provably out.  A common-term query over a
    large match set surfaces ~vocabulary-many candidates; without the
    bound every one needs a dictionary df read."""
    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "fg": pa.array([], pa.int64()),
            "bg": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if fg.num_rows == 0 or fg_total == 0:
        return empty
    terms = np.array(fg["term"].to_pylist(), dtype=object)
    fgc = fg["fg"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = fgc >= min_doc_count
    terms, fgc = terms[m], fgc[m]
    if terms.size == 0:
        return empty
    # fg desc (term asc within ties, for determinism of the scan order —
    # the RESULT is order-independent, the stop bound only needs fg-desc)
    order = np.lexsort((terms, -fgc))
    terms, fgc = terms[order], fgc[order]
    fgt, n = float(fg_total), float(n_docs)
    kept_t: list = []
    kept_fg: list = []
    kept_bg: list = []
    kept_sc: list = []
    for lo in range(0, terms.size, chunk):
        if len(kept_sc) >= size:
            kth = np.sort(round_half_up_np(np.array(kept_sc), 9))[-size]
            ub = (fgc[lo] / fgt - fgc[lo] / n) * (n / fgt)
            if round_half_up_np(np.array([ub]), 9)[0] < kth:
                break
        tchunk = terms[lo : lo + chunk]
        fchunk = fgc[lo : lo + chunk]
        dfs = df_fn([str(t) for t in tchunk])
        bgc = np.maximum(
            np.array([int(dfs.get(str(t), 0)) for t in tchunk], dtype=np.int64), 1
        )
        fg_pct = fchunk / fgt
        bg_pct = bgc / n
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        keep = fg_pct > bg_pct
        kept_t.extend(tchunk[keep])
        kept_fg.extend(fchunk[keep])
        kept_bg.extend(bgc[keep])
        kept_sc.extend(score[keep])
    if not kept_t:
        return empty
    ta = np.array(kept_t, dtype=object)
    fa = np.array(kept_fg, dtype=np.int64)
    ba = np.array(kept_bg, dtype=np.int64)
    sa = np.array(kept_sc, dtype=np.float64)
    top = np.lexsort((ta, -round_half_up_np(sa, 9)))[:size]
    return pa.table(
        {
            "term": pa.array(ta[top].astype(str), pa.string()),
            "fg": pa.array(fa[top]),
            "bg": pa.array(ba[top]),
            "score": pa.array(sa[top], pa.float64()),
        }
    )


def round_half_up_np(x: np.ndarray, digits: int) -> np.ndarray:
    """Shared round-half-up (the ranking-granularity convention)."""
    return bm25.round_half_up(np.asarray(x, dtype=np.float64), digits)


def range_agg_from_value_counts(
    vc: pa.Table, ranges: list[tuple[float | None, float | None]]
) -> pa.Table:
    """ES range-agg finalizer over a merged (value, count) table: each
    half-open [from, to) bucket counts independently (ES allows
    overlaps); labels are the ES ``from-to`` keys with ``*`` for open
    ends, formatted from the CALLER's literals so an SQL oracle can emit
    the identical strings."""
    v = vc["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    c = vc["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    labels, counts = [], []
    for lo, hi in ranges:
        labels.append(range_label(lo, hi))
        mask = np.ones(v.size, dtype=bool)
        if lo is not None:
            mask &= v >= float(lo)
        if hi is not None:
            mask &= v < float(hi)
        counts.append(int(c[mask].sum()))
    return pa.table(
        {
            "value": pa.array(labels, pa.string()),
            "count": pa.array(counts, pa.int64()),
        }
    )


def range_label(lo: float | None, hi: float | None) -> str:
    """ES range-bucket key: ``lo-hi`` with ``*`` for an open end, bounds
    printed with one decimal (the ES float key format, e.g. ``*-100.0``)."""
    fmt = lambda x: "*" if x is None else f"{float(x):.1f}"  # noqa: E731
    return f"{fmt(lo)}-{fmt(hi)}"


def tophits_select(
    ids: np.ndarray, sc: np.ndarray, vals: pa.Array | pa.ChunkedArray, n: int
) -> pa.Table:
    """THE per-bucket top-n comparator, shared by the single searcher and
    the sharded merge (same pattern as :func:`collapse_winners`): within
    each distinct bucket value, rank hits by (round-9 score desc, docID
    asc) and keep the first n; null bucket values are skipped (ES terms
    agg skips missing) → (value, rank, doc_id, score), value-asc/rank-asc."""
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
    sel0 = np.flatnonzero(valid)
    if sel0.size == 0:
        return pa.table(
            {
                "value": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
    svals = pc.cast(vals.take(pa.array(sel0)), pa.string())
    ids2, sc2 = ids[sel0], sc[sel0]
    varr = np.asarray(svals.to_numpy(zero_copy_only=False), dtype=object)
    r9 = bm25.round_half_up(sc2, 9)
    order = np.lexsort((ids2, -r9, varr))
    g = varr[order]
    first = np.ones(g.size, dtype=bool)
    first[1:] = g[1:] != g[:-1]
    grp_id = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    rank = np.arange(g.size, dtype=np.int64) - starts[grp_id] + 1
    keep = rank <= n
    kept = order[keep]
    return pa.table(
        {
            "value": pa.array(varr[order][keep].astype(str), pa.string()),
            "rank": pa.array(rank[keep]),
            "doc_id": pa.array(ids2[kept].astype(np.int64)),
            "score": pa.array(sc2[kept], pa.float64()),
        }
    )
