"""Doc-partitioned scatter-gather serving (the distributed search path).

The reference delegates search to an N-shard Elasticsearch cluster
(packages/elasticsearch-asset-apis/src/elasticsearch-reader-api/
ElasticsearchReaderClient.ts:53-86 — every ``search``/``count`` fans out to
doc shards and the coordinating node merges).  This module is the native
Ray analog over our own index layout:

- The index's phase-2 layout already buckets postings by disjoint ordered
  docID ranges (``bucket = pid // runs_per_bucket``, index/build.py), so a
  serving shard is simply a CONTIGUOUS BUCKET RANGE: ``Searcher(
  bucket_range=(lo, hi))`` loads only its range's postings (memory and
  decode work ∝ 1/K of the corpus) and its queries only ever hydrate its
  own docstore partitions (pid-pruned).
- BM25 global statistics: ``n_docs``/``avgdl`` come from the manifest
  (partition-independent); per-term df is collected ONCE per query by the
  coordinator from its full-index view (column-pruned ``(term, df)`` reads,
  no posting blobs) and scattered as ``df_override`` — exactly ES
  ``dfs_query_then_fetch``.  Shard-local scoring is then bit-identical to
  a single-process searcher: tf, doclen and idf are all the same floats,
  and per-doc accumulation order is bucket-local in both paths.
- Query rewrite (prefix / wildcard / fuzzy / regexp expansion against the
  term dictionary) happens once on the coordinator, so every shard serves
  the SAME rewritten query (per-shard expansion could differ only in
  ``max_expansions`` edge behavior; centralizing removes the edge).
- Merging: top-k is a k-way merge under the engine's (score desc, docID
  asc) comparator over bit-identical floats, so sharded top-k is
  RANK-IDENTICAL to single-searcher top-k (tests/test_sharded.py pins
  this).  Aggregations merge per-shard PARTIAL bucket tables — the match
  set itself never leaves the shard actors (the scale fix for the
  driver-side facet/histogram/collapse flagged in round 3).

Actors: ``use_actors=True`` wraps each shard in a Ray actor
(``num_cpus=1`` by default) — one scatter per query, ``ray.get`` gather.
``use_actors=False`` runs the same shard objects in-process (tests /
latency experiments without actor overhead).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elasticsearch_assets_ray.query import bm25
from elasticsearch_assets_ray.query import parser as parser_mod
from elasticsearch_assets_ray.query.engine import Searcher, collapse_winners, knn_rank
from elasticsearch_assets_ray.query.parser import ParsedQuery, parse_query


def _empty_hits() -> pa.Table:
    """The empty top-k hits table — ONE definition of the (doc_id int64,
    score float64) schema shared by every all-pruned / no-match early
    return, so it can never drift from _merge_topk_parts output."""
    return pa.table(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )


class ShardWorker:
    """One doc-partition serving shard: a bucket-range Searcher plus the
    shard-side halves of search / count / aggregations.  Used directly
    (in-process) or as the body of a Ray actor."""

    def __init__(
        self,
        index_dir: str,
        bucket_range: tuple[int, int],
        prune: bool = True,
        phrase_scoring: str = "terms",
        shard_resident: bool = True,
        runtime_fields: dict | None = None,
        pit: str | None = None,
    ):
        if runtime_fields:
            # runtime fields are registered in the COORDINATOR process;
            # an actor is a fresh interpreter, so the definitions ship
            # with construction (cloudpickle carries the script fns) and
            # land in this process's module registry
            from elasticsearch_assets_ray.query import engine as _eng

            _eng.RUNTIME_FIELDS.update(runtime_fields)
        self.s = Searcher(
            index_dir,
            prune=prune,
            shard_resident=shard_resident,
            phrase_scoring=phrase_scoring,
            bucket_range=bucket_range,
            pit=pit,
        )

    def search(self, q: ParsedQuery, k: int, df: dict[str, int]) -> pa.Table:
        return self.s.search_prepared(q, k, df)

    def msearch(
        self,
        qs: list[ParsedQuery],
        k: int,
        dfs: list[dict[str, int]],
        sel: list[int] | None = None,
    ) -> list[pa.Table]:
        """ES ``_msearch`` shard half: serve a BATCH of prepared queries
        in one actor call — same per-query results as :meth:`search`,
        but one RPC per shard per batch instead of one per query (the
        actor round-trip dominates warm point-query latency).  ``sel``
        restricts execution to the listed batch indices (the
        coordinator's can_match survivors for THIS shard) — the full
        ``qs``/``dfs`` lists ship as shared ObjectRefs either way, so
        selection costs no extra serialization."""
        if sel is not None:
            return [self.s.search_prepared(qs[i], k, dfs[i]) for i in sel]
        return [self.s.search_prepared(q, k, df) for q, df in zip(qs, dfs)]

    def count(self, q: ParsedQuery, df: dict[str, int]) -> int:
        return self.s.match_ids_prepared(q, df).size

    def count_up_to(self, q: ParsedQuery, df: dict[str, int], up_to: int) -> int:
        """Shard half of distributed ``track_total_hits`` (Q7): count
        matches, stopping once ``up_to`` is reached — remaining buckets
        stay undecoded (the early-exit semantics live in
        ``Searcher.match_ids_prepared(up_to=...)``)."""
        return int(self.s.match_ids_prepared(q, df, up_to=up_to).size)

    def match_ids(self, q: ParsedQuery, df: dict[str, int]) -> np.ndarray:
        return self.s.match_ids_prepared(q, df)

    def has_child(
        self,
        q: ParsedQuery,
        df: dict[str, int],
        parent: str | None,
        child: str | None,
        score_mode: str,
        min_children: int,
        max_children: int | None,
        k: int | None,
        score_field: str | None,
    ) -> pa.Table:
        """Shard-local ES ``has_child``: complete for this shard's parents
        because a routed index co-locates each parent with ALL its
        children (index/routing.py)."""
        return self.s.has_child(
            q,
            parent=parent,
            child=child,
            score_mode=score_mode,
            min_children=min_children,
            max_children=max_children,
            k=k,
            score_field=score_field,
            _df=df,
        )

    def has_parent(
        self,
        q: ParsedQuery,
        df: dict[str, int],
        parent: str | None,
        child: str | None,
        score: bool,
        score_field: str | None,
        k: int | None,
    ) -> pa.Table:
        return self.s.has_parent(
            q,
            parent=parent,
            child=child,
            score=score,
            score_field=score_field,
            k=k,
            _df=df,
        )

    def facet(self, q: ParsedQuery, by: str, df: dict[str, int]) -> pa.Table:
        """Local partial terms-agg: UNTRUNCATED value counts over the
        shard's match set (truncation is only valid after the merge)."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.facet_ids(ids, by, size=None)

    def histogram(
        self, q: ParsedQuery, field: str, interval: float, df: dict[str, int]
    ) -> pa.Table:
        ids = self.s.match_ids_prepared(q, df)
        return self.s.histogram_ids(ids, field, interval)

    def value_counts(
        self, q: ParsedQuery, field: str, df: dict[str, int]
    ) -> pa.Table:
        """Local (value, count) partial of a numeric column over the
        shard's match set — the exact mergeable unit behind distributed
        stats/percentiles (size ∝ distinct values, not matches)."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.value_counts_ids(ids, field)

    def missing_value_counts(
        self, q: ParsedQuery, field: str, df: dict[str, int]
    ) -> tuple[int, int]:
        """Local (missing, value_count) pair over the shard's match set
        — one column read serves BOTH aggs; the merge is a sum."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.missing_value_counts_ids(ids, field)

    def global_facet(self, by: str) -> pa.Table:
        """Local partial of the ES `global` + terms agg: value counts
        over ALL the shard's live docs (no query context at all)."""
        return self.s.global_facet(by, size=None)

    def group_value_counts(
        self, q: ParsedQuery, by: str, metric: str, df: dict[str, int]
    ) -> pa.Table:
        """Local (value, metric, count) partial of the terms-agg-with-
        metric sub-agg (size ∝ distinct pairs, never matches)."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.group_value_counts_ids(ids, by, metric)

    def sig_terms(self, q: ParsedQuery, df: dict[str, int]) -> tuple[pa.Table, int]:
        """Local (term, fg) foreground partial + local match count for
        significant_terms (content tokenization stays on the shard)."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.sig_terms_ids(ids), int(ids.size)

    def compound(
        self, kind: str, args: tuple, k: int, df: dict[str, int]
    ) -> pa.Table:
        """Local half of the compound queries (boosting / dis_max): the
        score is a PER-DOC function of subquery scores, so shard-local
        top-k union contains the global top-k (same merge argument as
        search).  ``df`` is the union of every subquery's global df."""
        self.s._df_override = df
        try:
            if kind == "boosting":
                qpos, qneg, nb = args
                return self.s.boosting(qpos, qneg, negative_boost=nb, k=k)
            if kind == "dis_max":
                qs, tb = args
                return self.s.dis_max(list(qs), tie_breaker=tb, k=k)
            if kind == "match_bool_prefix":
                qc, pterms = args
                # df is already the coordinator's global override for the
                # complete terms; the prefix set is score-free local
                return self.s.match_bool_prefix_prepared(qc, list(pterms), k, df)
            raise ValueError(kind)
        finally:
            self.s._df_override = None

    def intervals(self, spec: dict, k: int, df: dict[str, int]) -> pa.Table:
        """Local half of the ES intervals query: translation + span
        evaluation over this shard's doc range with the coordinator's
        global dfs (per-doc filter + per-doc score ⇒ exact merge)."""
        from elasticsearch_assets_ray.query.intervals import intervals_search

        self.s._df_override = df
        try:
            return intervals_search(self.s, spec, k)
        finally:
            self.s._df_override = None

    def filters_counts(
        self,
        qs: list[ParsedQuery],
        dfs: list[dict[str, int]],
        sel: list[int] | None = None,
    ) -> list[int]:
        """Local score-free match counts for a BATCH of named filters
        (one actor call for the whole filters agg).  ``sel`` restricts
        execution to the listed batch indices (can_match survivors for
        this shard), as in :meth:`msearch`."""
        if sel is not None:
            return [int(self.s.match_ids_prepared(qs[i], dfs[i]).size) for i in sel]
        return [int(self.s.match_ids_prepared(q, df).size) for q, df in zip(qs, dfs)]

    def adjacency(
        self, names: list[str], qs: list[ParsedQuery], dfs: list[dict[str, int]]
    ) -> pa.Table:
        """Local singles + pairwise-intersection counts (the
        adjacency_matrix shard half) — ids never leave the shard."""
        from elasticsearch_assets_ray.query.engine import adjacency_from_ids

        ids = {
            n: np.sort(self.s.match_ids_prepared(q, df))
            for n, q, df in zip(names, qs, dfs)
        }
        return adjacency_from_ids(ids)

    def composite(
        self,
        q: ParsedQuery,
        sources: tuple,
        size: int,
        after: tuple | None,
        df: dict[str, int],
    ) -> pa.Table:
        """Local composite-agg page: my first ``size`` buckets (key
        order) after the cursor, with full local counts."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.composite_ids(ids, sources, size, after)

    def alias_search(
        self, q: ParsedQuery, qf: ParsedQuery, k: int, df: dict[str, int]
    ) -> pa.Table:
        """Local filter-context top-k (filtered alias / bool.filter):
        membership is a per-doc predicate, so shard-local top-k union
        contains the global top-k (same merge argument as search)."""
        self.s._df_override = df
        try:
            return self.s.search_filtered_by(q, qf, k=k)
        finally:
            self.s._df_override = None

    def alias_count(self, q: ParsedQuery, qf: ParsedQuery) -> int:
        return int(self.s.count_filtered_by(q, qf))

    def multi_facet(
        self, q: ParsedQuery, fields: tuple, df: dict[str, int]
    ) -> pa.Table:
        """Untruncated tuple-key value counts (the multi_terms shard
        partial — truncation is only valid after the merge, same rule as
        :meth:`facet`)."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.composite_ids(ids, tuple((f, None) for f in fields))

    def tdigest(self, q: ParsedQuery, field: str, delta: float, df: dict[str, int]) -> bytes:
        """Fixed-size quantile-sketch partial (unbounded-cardinality swap
        for the exact value_counts partial)."""
        ids = self.s.match_ids_prepared(q, df)
        return self.s.tdigest_ids(ids, field, delta)

    def top_hits(
        self, q: ParsedQuery, by: str, n: int, df: dict[str, int]
    ) -> pa.Table:
        """Local per-bucket top-n (the global per-bucket top-n is inside
        the union of these — same comparator both levels)."""
        r = self.s.all_scores_prepared(q, df)
        return self.s.top_hits_ids(
            r["doc_id"].to_numpy(zero_copy_only=False),
            r["score"].to_numpy(zero_copy_only=False),
            by,
            n,
        )

    def collapse(
        self, q: ParsedQuery, k: int, collapse: str, df: dict[str, int]
    ) -> pa.Table:
        r = self.s.all_scores_prepared(q, df)
        return self.s.collapse_ids(
            r["doc_id"].to_numpy(zero_copy_only=False),
            r["score"].to_numpy(zero_copy_only=False),
            k,
            collapse,
        )

    def synonyms(
        self, groups: dict[str, tuple[str, ...]], k: int, df: dict[str, int]
    ) -> pa.Table:
        """Local SynonymQuery top-k with coordinator-injected member dfs
        (scores are per-doc functions of global df ⇒ exact merge)."""
        return self.s.synonyms_prepared(groups, k, df)

    def sort_by(
        self, q: ParsedQuery, field: str, k: int, desc: bool, df: dict[str, int]
    ) -> pa.Table:
        """Local field-sorted top-k over the shard's score-free match
        set (exact merge: shards partition the doc space)."""
        return self.s.sort_ids(self.s.match_ids_prepared(q, df), field, k, desc)

    def knn(
        self,
        qids: np.ndarray,
        qmat: np.ndarray,
        k: int,
        qf: "ParsedQuery | None",
        df: dict[str, int] | None,
    ) -> pa.Table:
        """Local kNN top-k over the shard's resident vector parts (ES
        knn: each shard scores its own vectors; the merge is exact)."""
        return self.s.knn_prepared(qids, qmat, k, qf, df)

    def hydrate(self, docids: np.ndarray, columns: list[str] | None = None) -> pa.Table:
        return self.s.hydrate(np.asarray(docids, dtype=np.int64), columns=columns)

    def term_postings(self, term: str):
        """Raw (ids, tf) of ONE term within this shard's range — the
        fetch leg of distributed combined_fields."""
        return self.s.term_postings(term)

    def all_scores(self, q: ParsedQuery, df: dict[str, int]) -> pa.Table:
        """Local FULL match-set scores (the retriever-tree rescorer's
        secondary gather leg)."""
        self.s._df_override = df
        try:
            return self.s.all_scores_prepared(q, df)
        finally:
            self.s._df_override = None

    def terms_postings(self, terms: list[str]):
        """Batch fetch leg: every query term in one actor call."""
        return [self.s.term_postings(t) for t in terms]

    def doclens(self, docids: np.ndarray) -> np.ndarray:
        return self.s.doclens_for(np.asarray(docids, dtype=np.int64))

    def function_score(
        self,
        q: ParsedQuery,
        field: str,
        k: int,
        factor: float,
        modifier: str,
        missing: float,
        df: dict[str, int],
    ) -> pa.Table:
        """Local function_score top-k: the field multiplier is per-doc,
        so shard-local top-k merge is exact (same argument as search)."""
        self.s._df_override = df
        try:
            return self.s.function_score(
                q, field, k=k, factor=factor, modifier=modifier, missing=missing
            )
        finally:
            self.s._df_override = None

    def decay(
        self,
        q: ParsedQuery,
        field: str,
        kind: str,
        origin: float,
        scale: float,
        offset: float,
        decay_v: float,
        k: int,
        missing: float,
        df: dict[str, int],
    ) -> pa.Table:
        """Local decay-function top-k (per-doc multiplier ⇒ exact merge)."""
        self.s._df_override = df
        try:
            return self.s.decay_score(
                q, field, kind, origin, scale,
                offset=offset, decay=decay_v, k=k, missing=missing,
            )
        finally:
            self.s._df_override = None

    def random_score(
        self, q: ParsedQuery, seed: str, k: int, id_field: str | None, df: dict[str, int]
    ) -> pa.Table:
        """Local random_score top-k (per-doc multiplier ⇒ exact merge)."""
        self.s._df_override = df
        try:
            return self.s.random_score(q, seed=seed, k=k, id_field=id_field)
        finally:
            self.s._df_override = None

    def distance_feature(
        self,
        q: ParsedQuery,
        field: str,
        origin: float,
        pivot: float,
        boost: float,
        k: int,
        missing: float,
        df: dict[str, int],
    ) -> pa.Table:
        """Local distance_feature top-k (per-doc addend ⇒ exact merge)."""
        self.s._df_override = df
        try:
            return self.s.distance_feature(
                q, field, origin, pivot, k=k, boost=boost, missing=missing
            )
        finally:
            self.s._df_override = None

    def script_score(
        self,
        q: ParsedQuery,
        field: str,
        fn,
        params: dict | None,
        k: int,
        missing: float,
        df: dict[str, int],
    ) -> pa.Table:
        """Local script_score top-k — the script callable arrives by
        VALUE from the coordinator (per-doc replacement ⇒ exact merge)."""
        self.s._df_override = df
        try:
            return self.s.script_score(
                q, field, fn, k=k, params=params, missing=missing
            )
        finally:
            self.s._df_override = None

    def rank_feature(
        self,
        q: ParsedQuery,
        field: str,
        k: int,
        boost: float,
        function: str,
        pivot: float,
        scaling: float,
        exponent: float,
        missing: float,
        df: dict[str, int],
    ) -> pa.Table:
        """Local rank_feature top-k (per-doc addend ⇒ exact merge)."""
        self.s._df_override = df
        try:
            return self.s.rank_feature(
                q, field, k=k, boost=boost, function=function,
                pivot=pivot, scaling=scaling, exponent=exponent, missing=missing,
            )
        finally:
            self.s._df_override = None

    def terms_set(
        self,
        terms: list[str],
        min_field: str,
        k: int,
        min_offset: int,
        min_mod: int,
        df: dict[str, int],
    ) -> pa.Table:
        """Local terms_set top-k: membership counting and the per-doc
        requirement are both doc-local, and BM25 uses the coordinator's
        global dfs, so shard-local results merge exactly."""
        self.s._df_override = df
        try:
            return self.s.terms_set(
                terms, min_field, k=k, min_offset=min_offset, min_mod=min_mod
            )
        finally:
            self.s._df_override = None

    def search_window(self, q: ParsedQuery, w: int, df: dict[str, int]) -> pa.Table:
        """Local rescore-window half: top-w by the engine rescore's
        (round-9 score desc, docID asc) comparator — NOT raw-score
        ``sort_topk`` — with RAW scores preserved in the output.  Using
        the same total order locally and at the merge makes the global
        window selection exact (k-way-merge property); raw ordering
        here could pick different members inside a round-9 tie group."""
        r = self.s.all_scores_prepared(q, df)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        sc = r["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -bm25.round_half_up(sc, 9)))[:w]
        return pa.table(
            {"doc_id": pa.array(ids[order]), "score": pa.array(sc[order])}
        )

    def score_ids(
        self, terms: list[str], ids: np.ndarray, df: dict[str, int]
    ) -> np.ndarray:
        """Bag-of-words BM25 contributions of ``terms`` at this shard's
        ``ids`` (sorted) — the rescore-window gather, shard-local."""
        self.s._df_override = df
        try:
            return self.s._gather_term_scores(terms, np.asarray(ids, dtype=np.int64))
        finally:
            self.s._df_override = None

    def highlight_ids(self, q: ParsedQuery, docids: np.ndarray, window: int) -> pa.Table:
        return self.s.highlight(q, np.asarray(docids, dtype=np.int64), window=window)

    def stats(self) -> dict:
        return dict(self.s.stats)

    def metrics(self) -> dict:
        return self.s.metrics()


class ShardedSearcher:
    """Scatter-gather coordinator over K bucket-range shards.

    Public surface mirrors :class:`Searcher` for the operations that
    distribute: ``search`` / ``count`` / ``facet`` / ``histogram`` /
    ``search_collapse`` / ``hydrate``.  Results are rank-identical to a
    single :class:`Searcher` over the same index (pinned by tests)."""

    def __init__(
        self,
        index_dir: str,
        n_shards: int = 4,
        use_actors: bool = False,
        prune: bool = True,
        phrase_scoring: str = "terms",
        num_cpus: float = 1.0,
        max_restarts: int = 2,
        max_task_retries: int = 2,
        pit: str | None = None,
        fuzzy_transpositions: bool = False,
        can_match: bool = True,
    ):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            man = json.load(f)
        rpb = int(man.get("runs_per_bucket", 32))
        n_buckets = int(man["max_pid"]) // rpb + 1
        n_shards = max(1, min(n_shards, n_buckets))
        routing = man.get("routing") or {}
        route_ranges = [tuple(r) for r in routing.get("route_bucket_ranges", [])]
        if route_ranges:
            # ROUTED index (index/routing.py): carve shards on ROUTE
            # boundaries so a routing value never straddles shards — the
            # ES join-field co-location invariant that makes has_child /
            # has_parent shard-local.  Routes are contiguous in bucket
            # space (aligned pid_base), so grouping consecutive routes
            # yields contiguous bucket ranges.
            n_shards = max(1, min(n_shards, len(route_ranges)))
            groups = np.array_split(np.arange(len(route_ranges)), n_shards)
            self.ranges = [
                (route_ranges[g[0]][0], route_ranges[g[-1]][1]) for g in groups
            ]
            # cover trailing buckets (the last route's hi == n_buckets by
            # construction; defensive for hand-built manifests)
            lo0 = self.ranges[0]
            self.ranges[0] = (0, lo0[1])
            last = self.ranges[-1]
            self.ranges[-1] = (last[0], max(last[1], n_buckets))
        else:
            # contiguous even split of the bucket space: bucket docID
            # ranges are ordered, so ranges are ordered doc partitions
            edges = np.linspace(0, n_buckets, n_shards + 1).astype(int)
            self.ranges = [
                (int(edges[i]), int(edges[i + 1])) for i in range(n_shards)
            ]
        self.routed = bool(route_ranges)
        self.n_shards = n_shards
        self.use_actors = use_actors
        # coordinator: COLD full-index view — parse/rewrite (term-dict
        # reads) and global df (term+df column reads); never postings.
        # Multi-term expansion (incl. fuzzy) happens HERE, once, so the
        # fuzzy metric flag only needs to reach the coordinator.
        self.coord = Searcher(
            index_dir,
            shard_resident=False,
            pit=pit,
            fuzzy_transpositions=fuzzy_transpositions,
        )
        # prepared-query handle LRU for the sequential point-query path:
        # (query str, msm, cursor) -> (q-or-ref, df-or-ref).  In actor
        # mode the prepared ParsedQuery + global df are ray.put ONCE and
        # the per-call scatter ships 4 tiny ObjectRefs instead of
        # re-serializing the query per shard per call — measured as the
        # dominant per-query overhead of the scatter path (the shard
        # compute itself is sub-millisecond).
        from collections import OrderedDict as _OD

        self._prep_cache: "_OD[tuple, tuple]" = _OD()
        self._prep_cache_max = 512
        # can_match pre-filter (ES's can_match phase / _search_shards):
        # the coordinator's term dictionary knows which BUCKETS hold each
        # query term, buckets map to serving shards, so shards whose
        # dictionary intersects no required term group are skipped before
        # the scatter — at 4 shards this trims point-query RPCs for
        # selective terms; at hundreds of shards it is what makes point
        # queries cheap (ES skips unmatchable shards the same way).
        self.can_match = bool(can_match)
        self._route_ranges = route_ranges
        self._n_routes = int(routing.get("n_routes", len(route_ranges)) or 0)
        self._range_los = np.array([r[0] for r in self.ranges], dtype=np.int64)
        self._range_his = np.array([r[1] for r in self.ranges], dtype=np.int64)
        self._term_shard_cache: "_OD[str, frozenset]" = _OD()
        self._term_shard_cache_max = 65536
        self._cm_stats = {
            "queries": 0,          # point queries that consulted can_match
            "pruned_queries": 0,   # queries that skipped >=1 shard
            "shards_skipped": 0,   # total shard RPCs avoided
            "empty_queries": 0,    # answered empty with ZERO shard RPCs
        }
        if use_actors:
            import ray

            # shard workers are stateless beyond caches (the index lives
            # on disk/shared storage), so a crashed actor can restart and
            # transparently re-serve the failed call: max_restarts
            # re-creates the process, max_task_retries re-submits the
            # in-flight calls — on a 256-node cluster worker loss is
            # routine, not exceptional
            Actor = ray.remote(
                num_cpus=num_cpus,
                max_restarts=max_restarts,
                max_task_retries=max_task_retries,
            )(ShardWorker)
            from elasticsearch_assets_ray.query.engine import RUNTIME_FIELDS

            self.shards = [
                Actor.remote(
                    index_dir,
                    r,
                    prune=prune,
                    phrase_scoring=phrase_scoring,
                    pit=pit,
                    # actors are fresh interpreters: ship the runtime-
                    # field registry (register before pool construction)
                    runtime_fields=dict(RUNTIME_FIELDS),
                )
                for r in self.ranges
            ]
        else:
            self.shards = [
                ShardWorker(
                    index_dir, r, prune=prune,
                    phrase_scoring=phrase_scoring, pit=pit,
                )
                for r in self.ranges
            ]

    def shutdown(self) -> None:
        """Deterministically release the shard actors (actor mode).

        Ray reclaims actors when every handle goes out of scope, but GC
        timing is lazy — a gate/test that builds a searcher per call can
        leave the previous pool's CPU reservation alive long enough to
        starve the next Ray Data stage on a small session.  Call this
        when the searcher's lifetime is a single pipeline invocation."""
        if self.use_actors:
            import ray

            for a in self.shards:
                ray.kill(a, no_restart=True)
        self.shards = []
        self._prep_cache.clear()

    # ---------- coordinator-side query preparation ----------
    def prepare(
        self,
        query: str | ParsedQuery,
        minimum_should_match: int = 0,
        search_after: tuple[float, int] | None = None,
    ) -> tuple[ParsedQuery, dict[str, int]]:
        """Parse + msm + cursor + multi-term rewrite + global df — the
        dfs phase.  Mirrors Searcher.search's pre-processing exactly."""
        q = self.coord._q(query)
        q = Searcher._apply_msm(q, minimum_should_match)
        if search_after is not None:
            s_raw, aid = search_after
            q = dataclasses.replace(
                q,
                search_after=(float(bm25.round_half_up(s_raw, 9)), int(aid)),
            )
        q = self.coord._rewrite_prefixes(q)
        if q.phrase_prefixes or q.not_phrase_prefixes:
            # expand phrase-prefix stems ONCE against the full term
            # dictionary — per-shard expansion over a bucket-filtered
            # dictionary could pass a max_expansions cap the full
            # dictionary would trip (behavioral divergence between the
            # serving paths)
            q = dataclasses.replace(
                q,
                phrase_prefixes=[
                    (p, frozenset(self.coord.expand_prefix(st)) if not isinstance(st, frozenset) else st)
                    for p, st in q.phrase_prefixes
                ],
                not_phrase_prefixes=[
                    (p, frozenset(self.coord.expand_prefix(st)) if not isinstance(st, frozenset) else st)
                    for p, st in q.not_phrase_prefixes
                ],
            )
        need = set(q.scoring_terms) | set(q.must_not)
        if q.bool_tree is not None:
            need |= parser_mod.tree_terms(q.bool_tree)
        for grp in q.must_any:
            need |= set(grp)
        df = self.coord.term_dfs(sorted(need))
        return q, df

    def _gather(self, method: str, *args) -> list:
        if not self.shards:
            # after shutdown() an empty gather would silently report
            # count()==0 / match_ids()==[] — wrong answers, not errors
            raise RuntimeError(
                "ShardedSearcher has been shut down; create a new instance"
            )
        if self.use_actors:
            import ray

            return ray.get([getattr(a, method).remote(*args) for a in self.shards])
        return [getattr(s, method)(*args) for s in self.shards]

    def _gather_sub(self, shard_ids: list[int], method: str, *args) -> list:
        """Scatter to a SUBSET of shards (the can_match survivors)."""
        if not self.shards:
            raise RuntimeError(
                "ShardedSearcher has been shut down; create a new instance"
            )
        if len(shard_ids) == self.n_shards:
            return self._gather(method, *args)
        if self.use_actors:
            import ray

            return ray.get(
                [getattr(self.shards[i], method).remote(*args) for i in shard_ids]
            )
        return [getattr(self.shards[i], method)(*args) for i in shard_ids]

    def _gather_q(self, q: ParsedQuery, method: str, *args) -> list:
        """Scatter a single-query verb with the can_match pre-filter: a
        shard whose dictionary cannot match ``q`` contributes an empty /
        zero partial by soundness, so skipping it leaves every merge
        bit-identical; one shard is kept when everything prunes so
        schema-carrying merges still get a well-formed empty part.
        ONLY for match-scoped results — verbs whose partials carry
        corpus-wide state from non-matching shards (global_facet) must
        keep the full scatter."""
        if not self.can_match:
            return self._gather(method, *args)
        cand = self.can_match_shards(q) or [0]
        self._note_plan(len(cand))
        return self._gather_sub(cand, method, *args)

    # ---------- can_match phase (ES _search_shards / can_match) ----------
    def _shards_for_terms(self, terms: list[str]) -> dict[str, frozenset]:
        """Which serving shards hold postings for each term — ONE
        coordinator term-dictionary read for the misses (the same
        (term, bucket) metadata rows the dfs phase reads; never posting
        blobs), LRU-cached per term (the index is immutable)."""
        out: dict[str, frozenset] = {}
        missing: list[str] = []
        for t in terms:
            hit = self._term_shard_cache.get(t)
            if hit is not None:
                self._term_shard_cache.move_to_end(t)
                out[t] = hit
            else:
                missing.append(t)
        if missing:
            seg = self.coord._segment_rows(missing)
            by_term: dict[str, set] = {t: set() for t in missing}
            if seg is not None and seg.num_rows:
                tcol = seg["term"].to_pylist()
                bcol = seg["bucket"].to_numpy(zero_copy_only=False)
                # shard owning bucket b: ranges are contiguous ascending
                sh = np.searchsorted(self._range_los, bcol, side="right") - 1
                ok = (sh >= 0) & (bcol < self._range_his[np.clip(sh, 0, None)])
                for t, s, good in zip(tcol, sh, ok):
                    if good:
                        by_term[t].add(int(s))
            for t in missing:
                fs = frozenset(by_term[t])
                self._term_shard_cache[t] = fs
                out[t] = fs
            while len(self._term_shard_cache) > self._term_shard_cache_max:
                self._term_shard_cache.popitem(last=False)
        return out

    def can_match_shards(self, q: ParsedQuery) -> list[int]:
        """Shards that COULD hold a match for a prepared query: for each
        required term group (parser.required_term_groups) the shard's
        dictionary must intersect the group; with ``minimum_should_match``
        the shard must hold ≥ msm distinct should terms (a doc's postings
        all live in its shard).  Sound pruning only — skipped shards are
        proven matchless, so results are bit-identical."""
        groups = parser_mod.required_term_groups(q)
        if not groups:
            return list(range(self.n_shards))
        all_terms = sorted(set().union(*groups))
        tmap = self._shards_for_terms(all_terms)
        cand = set(range(self.n_shards))
        for g in groups:
            hit: set = set()
            for t in g:
                hit |= tmap.get(t, frozenset())
            cand &= hit
            if not cand:
                return []
        if q.bool_tree is None and q.minimum_should_match > 0 and q.should:
            sh_should = sorted(set(q.should))
            smap = self._shards_for_terms(sh_should)
            need = q.minimum_should_match
            cand = {
                s
                for s in cand
                if sum(1 for t in sh_should if s in smap[t]) >= need
            }
        return sorted(cand)

    def _route_shard(self, routing: str) -> int:
        """ES ``?routing=`` — the single serving shard that owns the
        routing value's route (routed indexes carve shards on route
        boundaries, so a route never straddles shards)."""
        if not self.routed:
            raise ValueError(
                "routing= needs a ROUTED index (build_routed_index); this "
                "index was built without a routing column"
            )
        from elasticsearch_assets_ray.index.routing import route_of

        r = int(route_of(pa.array([routing]), self._n_routes)[0])
        lo, _hi = self._route_ranges[r]
        s = int(np.searchsorted(self._range_los, lo, side="right") - 1)
        return s

    def _point_shards(
        self, q: ParsedQuery, routing: str | None
    ) -> list[int]:
        """Candidate shard ids for one point query: routing restriction
        ∩ can_match survivors; bookkeeping for metrics()."""
        cand = (
            self.can_match_shards(q)
            if self.can_match
            else list(range(self.n_shards))
        )
        if routing is not None:
            rs = self._route_shard(routing)
            cand = [s for s in cand if s == rs]
        self._note_plan(len(cand))
        return cand

    def _note_plan(self, n_executed: int) -> None:
        """One point query's can_match bookkeeping: how many shard RPCs
        the plan actually issues vs the full scatter.  Shared by every
        counting site so the three paths (prepared-handle miss,
        prepared-handle cache hit, per-verb _gather_q) can never drift."""
        self._cm_stats["queries"] += 1
        skipped = self.n_shards - n_executed
        if skipped > 0:
            self._cm_stats["pruned_queries"] += 1
            self._cm_stats["shards_skipped"] += skipped

    def search_shards(
        self, query: str | ParsedQuery | None = None, routing: str | None = None
    ) -> list[dict]:
        """ES ``_search_shards`` introspection: the serving-shard plan,
        with per-shard ``can_match`` verdicts when a query / routing
        value is given."""
        cand = set(range(self.n_shards))
        if query is not None:
            q, _df = self.prepare(query)
            if self.can_match:
                cand = set(self.can_match_shards(q))
        if routing is not None:
            cand &= {self._route_shard(routing)}
        return [
            {
                "shard": i,
                "bucket_range": list(self.ranges[i]),
                "can_match": i in cand,
            }
            for i in range(self.n_shards)
        ]

    # ---------- per-field building blocks (combined_fields duck-type) ----------
    # A ShardedSearcher quacks like a Searcher for the raw per-field
    # surface combined_fields consumes (term_postings / term_dfs /
    # doclens_for / n_docs / avgdl / hydrate), so
    # multi_match.combined_fields runs UNCHANGED over per-field
    # ShardedSearchers: global stats come from the coordinator (the dfs
    # phase), per-term candidate postings + their doclens come from the
    # range shards (the fetch phase) — the wire carries df-bounded
    # candidate rows, never corpus columns.

    @property
    def n_docs(self) -> int:
        return self.coord.n_docs

    @property
    def avgdl(self) -> float:
        return self.coord.avgdl

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        return self.coord.term_dfs(terms)

    def all_scores(self, query: str | ParsedQuery) -> pa.Table:
        """Scatter-gathered FULL match-set scores: doc spaces are
        disjoint, so the concat is the exact global match set (used by
        the retriever-tree rescorer; bit-identical to a single Searcher
        under the scattered global df)."""
        q, df = self.prepare(query)
        parts = [p for p in self._gather_q(q, "all_scores", q, df) if p.num_rows]
        if not parts:
            return _empty_hits()
        return pa.concat_tables(parts)

    def term_postings(self, term: str):
        """Scatter-gathered raw postings: ranges are ordered disjoint doc
        partitions, so the range-ordered concat is globally sorted."""
        return self.term_postings_many([term])[term]

    def term_postings_many(
        self, terms: list[str]
    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """ALL query terms in ONE scatter (one actor call per shard)."""
        per_shard = self._gather("terms_postings", terms)
        out = {}
        for i, t in enumerate(terms):
            ids = np.concatenate([p[i][0] for p in per_shard])
            tf = np.concatenate([p[i][1] for p in per_shard])
            out[t] = (ids.astype(np.int64), tf.astype(np.float64))
        return out

    def doclens_for(self, docids: np.ndarray) -> np.ndarray:
        """Routed doclens: each id's owning range shard answers (the
        fetch-phase analog of the routed hydrate).  All shard calls are
        submitted before any result is awaited — one round-trip, not
        n_shards sequential ones."""
        docids = np.asarray(docids, dtype=np.int64)
        out = np.empty(docids.size, dtype=np.int64)
        owner = self._owners(docids)
        sels = [np.flatnonzero(owner == i) for i in range(self.n_shards)]
        if self.use_actors:
            import ray

            futs = [
                self.shards[i].doclens.remote(docids[sel])
                for i, sel in enumerate(sels)
                if sel.size
            ]
            parts = ray.get(futs)
        else:
            parts = [
                self.shards[i].doclens(docids[sel])
                for i, sel in enumerate(sels)
                if sel.size
            ]
        for sel, part in zip((s for s in sels if s.size), parts):
            out[sel] = part
        return out

    # ---------- distributed operations ----------
    def search(
        self,
        query: str | ParsedQuery,
        k: int = 10,
        minimum_should_match: int = 0,
        search_after: tuple[float, int] | None = None,
        from_: int = 0,
        routing: str | None = None,
    ) -> pa.Table:
        if from_ < 0:
            raise ValueError("from_ must be >= 0")
        qh, dfh, cand = self._prepared_handles(
            query, minimum_should_match, search_after
        )
        if routing is not None:
            rs = self._route_shard(routing)
            cand = [s for s in cand if s == rs]
        if not cand:
            self._cm_stats["empty_queries"] += 1
            return _empty_hits()
        # ES offset: each shard must return from_+k (any of them could
        # own every one of the first from_+k global hits)
        parts = self._gather_sub(cand, "search", qh, from_ + k, dfh)
        return self._merge_topk_parts(parts, from_ + k).slice(from_)

    def _prepared_handles(
        self,
        query: str | ParsedQuery,
        minimum_should_match: int = 0,
        search_after: tuple[float, int] | None = None,
    ) -> tuple:
        """(q, df) ready to scatter: prepared once, ``ray.put`` once (actor
        mode), LRU-cached by (query, msm, cursor) so a repeated point
        query pays neither prepare nor argument re-serialization.  Actor
        method args that are ObjectRefs resolve shard-side from shared
        memory — the wire carries refs, not the query tree × n_shards."""
        key = (
            (query, minimum_should_match, search_after)
            if isinstance(query, str)
            else None
        )
        if key is not None:
            hit = self._prep_cache.get(key)
            if hit is not None:
                self._prep_cache.move_to_end(key)
                self._note_plan(len(hit[2]))
                return hit
        q, df = self.prepare(query, minimum_should_match, search_after)
        cand = self._point_shards(q, None)
        if self.use_actors:
            import ray

            out = (ray.put(q), ray.put(df), cand)
        else:
            out = (q, df, cand)
        if key is not None:
            self._prep_cache[key] = out
            while len(self._prep_cache) > self._prep_cache_max:
                self._prep_cache.popitem(last=False)
        return out

    def scan(
        self,
        query: str | ParsedQuery,
        page_size: int = 1000,
        slice_id: int | None = None,
    ):
        """ES scroll with SLICING: ``slice_id`` restricts the scroll to
        one serving shard's doc range — the disjoint-cover parallel
        scroll ES recommends pinning to shards (``slice.max == number of
        shards``).  Each slice pages independently (shard-local
        search_after cursors with coordinator-injected global df, so
        scores match the unsliced scroll); the union of all slices is
        exactly the full match set.  ``slice_id=None`` scrolls the
        merged global order (the plain distributed scroll)."""
        if page_size <= 0:
            raise ValueError("page_size must be positive")
        if slice_id is None:
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
            return
        if not 0 <= slice_id < self.n_shards:
            raise ValueError(f"slice_id must be in [0, {self.n_shards})")
        cursor = None
        while True:
            q, df = self.prepare(query, search_after=cursor)
            page = self._gather_one(slice_id, "search", q, page_size, df)
            if page.num_rows == 0:
                return
            yield page
            if page.num_rows < page_size:
                return
            cursor = (
                float(page["score"][-1].as_py()),
                int(page["doc_id"][-1].as_py()),
            )

    def _gather_one(self, i: int, method: str, *args):
        if not self.shards:
            raise RuntimeError(
                "ShardedSearcher has been shut down; create a new instance"
            )
        if self.use_actors:
            import ray

            return ray.get(getattr(self.shards[i], method).remote(*args))
        return getattr(self.shards[i], method)(*args)

    def msearch(
        self, queries: list[str | ParsedQuery], k: int = 10
    ) -> list[pa.Table]:
        """ES ``_msearch``: serve a batch of queries with ONE scatter —
        each shard receives the whole prepared batch in a single actor
        call and returns all its local top-k tables; the coordinator
        merges per query.  Per-query results are identical to
        :meth:`search` (same prepare, same shard half, same merge);
        throughput wins come purely from amortizing the actor RPC.
        can_match applies PER ITEM (as in ES): each shard executes only
        the batch indices that could match it, and a shard every item
        prunes away gets no RPC at all."""
        if not self.shards:
            raise RuntimeError(
                "ShardedSearcher has been shut down; create a new instance"
            )
        prepared = [self.prepare(q) for q in queries]
        qs = [p[0] for p in prepared]
        dfs = [p[1] for p in prepared]
        if self.can_match:
            cands = [frozenset(self.can_match_shards(q)) for q in qs]
        else:
            cands = [frozenset(range(self.n_shards))] * len(qs)
        for c in cands:
            self._note_plan(len(c))
            if not c:
                self._cm_stats["empty_queries"] += 1
        sels = [
            [qi for qi, c in enumerate(cands) if si in c]
            for si in range(self.n_shards)
        ]
        live = [si for si in range(self.n_shards) if sels[si]]
        nothing_pruned = all(len(s) == len(qs) for s in sels)
        if self.use_actors:
            # one serialization of the whole batch instead of one per shard
            import ray

            qs_h, dfs_h = ray.put(qs), ray.put(dfs)
            futs = [
                self.shards[si].msearch.remote(
                    qs_h, k, dfs_h, None if nothing_pruned else sels[si]
                )
                for si in live
            ]
            res = ray.get(futs)
        else:
            res = [
                self.shards[si].msearch(
                    qs, k, dfs, None if nothing_pruned else sels[si]
                )
                for si in live
            ]
        # res[idx][j] = shard live[idx]'s table for its j-th selected query
        pos = {si: {qi: j for j, qi in enumerate(sels[si])} for si in live}
        empty = _empty_hits()
        out: list[pa.Table] = []
        for qi in range(len(qs)):
            qparts = [
                res[idx][pos[si][qi]]
                for idx, si in enumerate(live)
                if qi in pos[si]
            ]
            out.append(self._merge_topk_parts(qparts, k) if qparts else empty)
        return out

    def count(
        self,
        query: str | ParsedQuery,
        minimum_should_match: int = 0,
        routing: str | None = None,
    ) -> int:
        qh, dfh, cand = self._prepared_handles(query, minimum_should_match)
        if routing is not None:
            rs = self._route_shard(routing)
            cand = [s for s in cand if s == rs]
        if not cand:
            self._cm_stats["empty_queries"] += 1
            return 0
        return int(sum(self._gather_sub(cand, "count", qh, dfh)))

    def match_count(
        self,
        query: str | ParsedQuery,
        minimum_should_match: int = 0,
        track_total_hits: int | None = None,
        routing: str | None = None,
    ) -> tuple[int, str]:
        """Distributed ES ``track_total_hits`` (Q7): every shard counts
        its own matches and STOPS at the threshold (+1, so an exactly-
        threshold total still reports "eq" — the single-searcher
        contract), undecoded buckets stay undecoded shard-side.  The
        capped sum preserves the ES ``total`` contract exactly: any
        shard truncating forces the sum past the threshold ("gte");
        a sum within the threshold implies no shard truncated, so it is
        the exact global count ("eq").  ``routing=`` restricts the count
        to the routing value's shard like :meth:`count`."""
        qh, dfh, cand = self._prepared_handles(query, minimum_should_match)
        if routing is not None:
            rs = self._route_shard(routing)
            cand = [s for s in cand if s == rs]
        if not cand:
            self._cm_stats["empty_queries"] += 1
            return (0, "eq")
        if track_total_hits is None:
            return (int(sum(self._gather_sub(cand, "count", qh, dfh))), "eq")
        up_to = track_total_hits + 1
        n = int(sum(self._gather_sub(cand, "count_up_to", qh, dfh, up_to)))
        if n > track_total_hits:
            return (track_total_hits, "gte")
        return (n, "eq")

    def match_ids(
        self,
        query: str | ParsedQuery,
        minimum_should_match: int = 0,
        routing: str | None = None,
    ) -> np.ndarray:
        """Every matching docID, gathered score-free from the shards
        (ReaderAPI's filtered-count path needs the ids, not just the
        cardinality)."""
        qh, dfh, cand = self._prepared_handles(query, minimum_should_match)
        if routing is not None:
            rs = self._route_shard(routing)
            cand = [s for s in cand if s == rs]
        if not cand:
            self._cm_stats["empty_queries"] += 1
            return np.empty(0, dtype=np.int64)
        parts = self._gather_sub(cand, "match_ids", qh, dfh)
        return (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )

    # ---------- join field (ES parent/child) ----------
    def _require_routing(self) -> None:
        if not self.routed:
            raise ValueError(
                "sharded has_child/has_parent needs a ROUTED index "
                "(build_routed_index) — without routing co-location a "
                "parent's children straddle shards and shard-local joins "
                "are wrong (the ES join-field routing contract)"
            )
        if not self.coord.manifest.get("join_field"):
            raise ValueError("index has no join_field mapping")

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
    ) -> pa.Table:
        """ES ``has_child`` over the doc-partitioned serving pool: each
        shard answers COMPLETELY for its own parents (routing co-location
        puts every parent with all its children in one shard), so the
        gather is concat + global re-sort + head(k) — no cross-shard
        join traffic, exactly ES's execution shape."""
        self._require_routing()
        qh, dfh, cand = self._prepared_handles(child_query)
        # a shard whose dictionary can't match the child query holds no
        # matching children, hence no qualifying parents (min_children
        # >= 1); keep one shard for the result schema
        parts = self._gather_sub(
            cand or [0], "has_child", qh, dfh, parent, child, score_mode,
            min_children, max_children, k, score_field,
        )
        routing_col = self.coord.manifest["routing"]["col"]
        out = pa.concat_tables([p for p in parts if p.num_rows] or parts[:1])
        idx = pc.sort_indices(
            out, sort_keys=[("score", "descending"), (routing_col, "ascending")]
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
    ) -> pa.Table:
        """ES ``has_parent`` over the serving pool — shard-local under
        routing co-location, merged by plain top-k."""
        self._require_routing()
        qh, dfh, cand = self._prepared_handles(parent_query)
        # no parent match in a shard => none of its children qualify
        parts = self._gather_sub(
            cand or [0], "has_parent", qh, dfh, parent, child, score,
            score_field, k,
        )
        out = pa.concat_tables([p for p in parts if p.num_rows] or parts[:1])
        idx = pc.sort_indices(
            out, sort_keys=[("score", "descending"), ("child_doc_id", "ascending")]
        )
        out = out.take(idx)
        return out.slice(0, k) if k is not None else out

    @staticmethod
    def _sum_counts(
        parts: list[pa.Table], key: str, key_type: pa.DataType
    ) -> pa.Table:
        """Integer-exact count merge shared by every bucket-table
        aggregation (facet / histogram / adjacency_matrix): concat the
        non-empty shard partials and sum counts per key, key-ascending."""
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pa.table(
                {key: pa.array([], key_type), "count": pa.array([], pa.int64())}
            )
        merged = pa.concat_tables(parts).group_by(key).aggregate([("count", "sum")])
        return pa.table(
            {
                key: merged[key],
                "count": merged["count_sum"].combine_chunks().cast(pa.int64()),
            }
        ).sort_by([(key, "ascending")])

    def facet(
        self, query: str | ParsedQuery, by: str, size: int | None = None
    ) -> pa.Table:
        """Distributed terms agg: shard-side partial value counts, merged
        by summing — only K small bucket tables reach the coordinator."""
        q, df = self.prepare(query)
        t = self._sum_counts(
            self._gather_q(q, "facet", q, by, df), "value", pa.string()
        ).sort_by([("count", "descending"), ("value", "ascending")])
        return t.slice(0, size) if size is not None else t

    def histogram(
        self, query: str | ParsedQuery, field: str, interval: float
    ) -> pa.Table:
        q, df = self.prepare(query)
        return self._sum_counts(
            self._gather_q(q, "histogram", q, field, interval, df), "bucket", pa.float64()
        )

    def value_counts(self, query: str | ParsedQuery, field: str) -> pa.Table:
        """Merged (value, count) multiset of a numeric column over the
        match set: each shard returns its partial (size ∝ distinct
        values, never match size); integer-count merge is order-free.
        This is the ONE distributed pass behind stats_agg/percentiles —
        callers wanting both should gather it once and feed both
        finalizers."""
        from elasticsearch_assets_ray.query.engine import merge_value_counts

        q, df = self.prepare(query)
        return merge_value_counts(self._gather_q(q, "value_counts", q, field, df))

    def cardinality(self, query: str | ParsedQuery, field: str) -> int:
        """Distributed EXACT ES `cardinality`: distinct count from the
        merged value_counts partials (the wire carries distinct values
        per shard, never matches)."""
        return self.value_counts(query, field).num_rows

    def missing_value_counts(
        self, query: str | ParsedQuery, field: str
    ) -> tuple[int, int]:
        """Distributed ES ``missing`` + ``value_count`` aggregations:
        each shard ships two ints over its own match set; the
        coordinator sums — nothing per-doc crosses the wire."""
        q, df = self.prepare(query)
        pairs = self._gather_q(q, "missing_value_counts", q, field, df)
        return sum(p[0] for p in pairs), sum(p[1] for p in pairs)

    def global_facet(self, by: str, size: int | None = None) -> pa.Table:
        """Distributed ES `global` + terms sub-agg: per-shard value
        counts over ALL live docs (doc-partitioned shards make the
        partials disjoint), merged by summing, ES bucket order."""
        t = self._sum_counts(
            self._gather("global_facet", by), "value", pa.string()
        ).sort_by([("count", "descending"), ("value", "ascending")])
        return t.slice(0, size) if size is not None else t

    def stats_agg(self, query: str | ParsedQuery, field: str) -> dict:
        """Distributed ES extended_stats: the final float math runs once
        on the merged table — BIT-identical to the single-searcher path."""
        from elasticsearch_assets_ray.query.engine import stats_from_value_counts

        return stats_from_value_counts(self.value_counts(query, field))

    def percentiles(
        self,
        query: str | ParsedQuery,
        field: str,
        percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
    ) -> pa.Table:
        """Distributed exact percentiles over the merged value-count
        partials (same bit-identity argument as :meth:`stats_agg`)."""
        from elasticsearch_assets_ray.query.engine import (
            percentiles_from_value_counts,
        )

        return percentiles_from_value_counts(self.value_counts(query, field), percents)

    def boosting(
        self,
        positive: str | ParsedQuery,
        negative: str | ParsedQuery,
        negative_boost: float = 0.5,
        k: int = 10,
    ) -> pa.Table:
        """Distributed ES boosting query: per-doc demotion is shard-local
        (a doc and its negative-match status live on one shard), so the
        local top-k merge is exact."""
        qp, dfp = self.prepare(positive)
        qn, dfn = self.prepare(negative)
        df = {**dfp, **dfn}
        parts = self._gather("compound", "boosting", (qp, qn, float(negative_boost)), k, df)
        return self._merge_topk_parts(parts, k)

    def constant_score(
        self, query: str | ParsedQuery, boost: float = 1.0, k: int = 10
    ) -> pa.Table:
        """Distributed constant_score: score-free match ids gathered,
        k smallest docIDs win (all scores equal → docID-asc tie-break)."""
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
        """Distributed dis_max (same per-doc-function merge argument)."""
        prepared = [self.prepare(q) for q in queries]
        df: dict[str, int] = {}
        for _q, d in prepared:
            df.update(d)
        qs = tuple(p[0] for p in prepared)
        parts = self._gather("compound", "dis_max", (qs, float(tie_breaker)), k, df)
        return self._merge_topk_parts(parts, k)

    def intervals(self, spec: dict, k: int = 10) -> pa.Table:
        """Distributed ES intervals query: the spec ships verbatim to
        every shard with the coordinator's global dfs for ALL the
        spec's terms (dfs_query_then_fetch); shard-local top-k merges
        are exact because both the interval filter and the bag-of-words
        score are per-doc functions."""
        from elasticsearch_assets_ray.query import intervals as iv
        from elasticsearch_assets_ray.query import spans as span_mod

        sspec = iv.intervals_to_spans(spec)  # validate on the coordinator
        terms = span_mod.all_terms(sspec)
        df = self.coord.term_dfs(sorted(set(terms)))
        parts = self._gather("intervals", spec, k, df)
        return self._merge_topk_parts(parts, k)

    def match_bool_prefix(self, text: str, k: int = 10) -> pa.Table:
        """Distributed ES ``match_bool_prefix``: complete-term global dfs
        from the coordinator (dfs_query_then_fetch), the prefix clause
        expands against each shard's own dictionary (complete for its doc
        range), and the per-doc score function makes shard-local top-k
        merges exact — bit-identical to the single searcher."""
        from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

        toks = tokenize_text(text)
        if not toks:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        complete, stem = toks[:-1], toks[-1]
        if complete:
            qc, df = self.prepare(" ".join(complete))
        else:
            qc, df = None, {}
        # expand ONCE against the full coordinator dictionary (cap
        # consistency with the single path — same policy as prepare's
        # phrase_prefix expansion)
        pterms = tuple(self.coord.expand_prefix(stem))
        parts = self._gather("compound", "match_bool_prefix", (qc, pterms), k, df)
        return self._merge_topk_parts(parts, k)

    def _merge_topk_parts(self, parts: list[pa.Table], k: int) -> pa.Table:
        ids = np.concatenate(
            [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
        )
        sc = np.concatenate(
            [p["score"].to_numpy(zero_copy_only=False) for p in parts]
        )
        ids, sc = bm25.sort_topk(ids, sc, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})

    def filters_agg(self, queries: dict[str, str | ParsedQuery]) -> pa.Table:
        """Distributed ES filters agg: ONE scatter carries every named
        query; per-shard score-free counts sum exactly (each doc lives
        in exactly one bucket-range shard).  can_match applies per named
        filter, as in :meth:`msearch` — shards count only the filters
        that could match them, fully-pruned shards get no RPC, and a
        nowhere-matching filter reports 0 without any shard work."""
        names = sorted(queries)
        prepared = [self.prepare(queries[n]) for n in names]
        qs = [p[0] for p in prepared]
        dfs = [p[1] for p in prepared]
        if self.can_match:
            cands = [frozenset(self.can_match_shards(q)) for q in qs]
        else:
            cands = [frozenset(range(self.n_shards))] * len(qs)
        for c in cands:
            self._note_plan(len(c))
            if not c:
                self._cm_stats["empty_queries"] += 1
        sels = [
            [qi for qi, c in enumerate(cands) if si in c]
            for si in range(self.n_shards)
        ]
        live = [si for si in range(self.n_shards) if sels[si]]
        nothing_pruned = all(len(s) == len(qs) for s in sels)
        if self.use_actors:
            import ray

            if not self.shards:
                raise RuntimeError(
                    "ShardedSearcher has been shut down; create a new instance"
                )
            qs_h, dfs_h = ray.put(qs), ray.put(dfs)
            res = ray.get(
                [
                    self.shards[si].filters_counts.remote(
                        qs_h, dfs_h, None if nothing_pruned else sels[si]
                    )
                    for si in live
                ]
            )
        else:
            res = [
                self.shards[si].filters_counts(
                    qs, dfs, None if nothing_pruned else sels[si]
                )
                for si in live
            ]
        pos = {si: {qi: j for j, qi in enumerate(sels[si])} for si in live}
        totals = [
            int(
                sum(
                    res[idx][pos[si][qi]]
                    for idx, si in enumerate(live)
                    if qi in pos[si]
                )
            )
            for qi in range(len(names))
        ]
        return pa.table(
            {"value": pa.array(names, pa.string()), "count": pa.array(totals, pa.int64())}
        )

    def adjacency_matrix(self, queries: dict[str, str | ParsedQuery]) -> pa.Table:
        """Distributed ES adjacency_matrix: shards compute their local
        singles + pairwise-intersection counts and the coordinator SUMS
        by key — exact because shards partition the doc space (a doc
        contributes to an intersection on exactly one shard), so ids
        never cross the wire."""
        names = sorted(queries)
        prepared = [self.prepare(queries[n]) for n in names]
        qs = [p[0] for p in prepared]
        dfs = [p[1] for p in prepared]
        return self._sum_counts(
            self._gather("adjacency", names, qs, dfs), "value", pa.string()
        )

    def search_synonyms(
        self,
        query: str | ParsedQuery,
        synonyms: dict[str, list[str]],
        k: int = 10,
    ) -> pa.Table:
        """Distributed Lucene SynonymQuery: groups built once on the
        coordinator, GLOBAL member dfs injected (dfs_query_then_fetch),
        shard-local scoring is bit-identical to the single searcher, and
        the top-k merge uses the shared score comparator."""
        q = self.coord._q(query)
        groups = {
            t: tuple(sorted({t, *synonyms.get(t, ())}))
            for t in sorted(set(q.scoring_terms))
        }
        # validate the same flat-query contract as the single searcher
        if (
            q.has_phrases or q.bool_tree is not None or q.must or q.must_not
            or q.must_any or q.filters or q.not_filters
            or q.range_filters or q.not_range_filters
        ):
            raise ValueError(
                "search_synonyms supports flat should-term queries only"
            )
        need = sorted({m for g in groups.values() for m in g})
        df = self.coord.term_dfs(need)
        parts = [p for p in self._gather("synonyms", groups, k, df) if p.num_rows]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

    def sort_by_field(
        self,
        query: str | ParsedQuery,
        field: str,
        k: int = 10,
        desc: bool = True,
        minimum_should_match: int = 0,
    ) -> pa.Table:
        """ES field-sorted search, scatter-gathered score-free: each
        shard returns its local (value, docID) top-k via the shared
        Searcher.sort_ids kernel; the coordinator re-sorts the ≤ K·k
        candidate rows with the SAME comparator — exact."""
        q, df = self.prepare(query, minimum_should_match)
        parts = [
            p for p in self._gather_q(q, "sort_by", q, field, k, desc, df) if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
            )
        t = pa.concat_tables(parts)
        v = t["value"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -v if desc else v))[:k]
        return pa.table({"doc_id": pa.array(d[order]), "value": pa.array(v[order])})

    def top_metrics(
        self,
        query: str | ParsedQuery,
        sort_field: str,
        metrics: list[str],
        size: int = 1,
        desc: bool = True,
        minimum_should_match: int = 0,
    ) -> pa.Table:
        """ES top_metrics, scatter-gathered: exact sort merge (the
        sort_by_field comparator) + the routed hydrate for the winners'
        metric columns (shared body: engine.top_metrics_impl)."""
        from elasticsearch_assets_ray.query.engine import top_metrics_impl

        return top_metrics_impl(
            self, query, sort_field, metrics, size, desc, minimum_should_match
        )

    def knn(
        self,
        query_ids: np.ndarray,
        query_vecs: np.ndarray,
        k: int = 10,
        filter_query: str | ParsedQuery | None = None,
        minimum_should_match: int = 0,
        similarity: float | None = None,
    ) -> pa.Table:
        """ES knn search, scatter-gathered: each shard runs exact cosine
        over ITS resident vector parts (index/vectors.py sidecar) and
        returns a local top-k; the coordinator re-ranks with the SAME
        comparator (knn_rank) — exact because the shards partition the
        doc space.  ``filter_query`` is prepared ONCE on the coordinator
        (rewrites + expansion caps), membership stays shard-local; the
        ``similarity`` cutoff is a per-row predicate, applied once after
        the merge (same result as per-shard)."""
        from elasticsearch_assets_ray.query.engine import knn_similarity_cut

        qf, df = None, None
        if filter_query is not None:
            qf, df = self.prepare(filter_query, minimum_should_match)
        qids = np.asarray(query_ids, dtype=np.int64)
        qmat = np.asarray(query_vecs, dtype=np.float64)
        parts = [
            p for p in self._gather("knn", qids, qmat, k, qf, df) if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        t = pa.concat_tables(parts)
        return knn_similarity_cut(
            knn_rank(
                t["query_id"].to_numpy(zero_copy_only=False),
                t["doc_id"].to_numpy(zero_copy_only=False),
                t["sim"].to_numpy(zero_copy_only=False),
                k,
            ),
            similarity,
        )

    # ES 8.x rrf retriever over the distributed serving path: reuses the
    # single-searcher implementation verbatim — it only composes
    # self.search and self.knn, both of which distribute here
    hybrid = Searcher.hybrid
    # collapse + inner_hits composes search_collapse and top_hits, both
    # distributed here, so the single-searcher body is exact verbatim
    collapse_inner_hits = Searcher.collapse_inner_hits

    def search_filtered_by(
        self,
        query: str | ParsedQuery,
        filter_query: str | ParsedQuery,
        k: int = 10,
    ) -> pa.Table:
        """Distributed filter-context search (ES filtered alias /
        bool.filter): both queries prepared once on the coordinator, the
        filter evaluated score-free INSIDE each shard (ids never cross
        the wire), scores are the raw query's — exact merge because
        filtered membership is per-doc."""
        q, df = self.prepare(query)
        qf, _dff = self.prepare(filter_query)  # filter never scores
        parts = self._gather("alias_search", q, qf, k, df)
        return self._merge_topk_parts(parts, k)

    def count_filtered_by(
        self, query: str | ParsedQuery, filter_query: str | ParsedQuery
    ) -> int:
        q, _ = self.prepare(query)
        qf, _ = self.prepare(filter_query)
        return int(sum(self._gather("alias_count", q, qf)))

    def mget(self, doc_ids, columns: list[str] | None = None) -> pa.Table:
        """ES ``_mget`` through the sharded service (the coordinator's
        pid-pruned docstore view serves the whole batch)."""
        return self.coord.mget(doc_ids, columns=columns)

    def field_caps(self) -> pa.Table:
        return self.coord.field_caps()

    def analyze(self, text: str) -> pa.Table:
        return self.coord.analyze(text)

    def explain(self, query: str | ParsedQuery, doc_id: int) -> pa.Table:
        """ES ``_explain`` through the sharded service: the breakdown is
        a pure function of (tf, dl, global df, n_docs, avgdl), all of
        which the coordinator's full-index view owns — identical to the
        owning shard's answer under the scattered df, with no scatter
        needed."""
        return self.coord.explain(query, doc_id)

    def rare_terms(
        self, query: str | ParsedQuery, by: str, max_doc_count: int = 1
    ) -> pa.Table:
        """Distributed ES rare_terms: merge UNTRUNCATED per-shard facet
        partials, then filter to the long tail — exact (a locally-rare
        term's other occurrences live on other shards, so the ≤ filter
        can only run after the global sum; ES approximates this with a
        per-shard CuckooFilter)."""
        q, df = self.prepare(query)
        merged = self._sum_counts(self._gather_q(q, "facet", q, by, df), "value", pa.string())
        from elasticsearch_assets_ray.query.engine import rare_from_facet

        return rare_from_facet(merged, max_doc_count)

    def multi_terms(
        self, query: str | ParsedQuery, fields: tuple[str, ...], size: int | None = None
    ) -> pa.Table:
        """Distributed ES multi_terms: untruncated tuple-key partials,
        summed exactly, ordered count-desc at the merge."""
        from elasticsearch_assets_ray.query.engine import multi_terms_from_parts

        q, df = self.prepare(query)
        parts = self._gather_q(q, "multi_facet", q, tuple(fields), df)
        return multi_terms_from_parts(parts, list(fields), size)

    def mad(self, query: str | ParsedQuery, field: str) -> float | None:
        """Distributed median_absolute_deviation — same one value_counts
        scatter as stats/percentiles, both medians on the coordinator."""
        from elasticsearch_assets_ray.query.engine import mad_from_value_counts

        return mad_from_value_counts(self.value_counts(query, field))

    def composite(
        self,
        query: str | ParsedQuery,
        sources: tuple[tuple[str, float | None], ...],
        size: int = 10,
        after: tuple | None = None,
    ) -> tuple[pa.Table, tuple | None]:
        """Distributed ES ``composite`` aggregation — the paginated
        bucket scan that streams an unbounded bucket space in key order
        (ES's answer to deep terms-agg pagination, and the shape that
        scales: each page is ONE scatter of ``size``-bounded partials,
        never the whole bucket space).  Each shard returns its first
        ``size`` local buckets after the cursor; the merged first
        ``size`` have exact counts (see merge_composite_parts), and the
        returned ``after_key`` resumes the scan."""
        from elasticsearch_assets_ray.query.engine import (
            _composite_after_key,
            merge_composite_parts,
        )

        q, df = self.prepare(query)
        names = [f for f, _ in sources]
        parts = self._gather_q(q, "composite", q, tuple(sources), size, after, df)
        page = merge_composite_parts(parts, names, size)
        return page, _composite_after_key(page, names)

    def percentiles_approx(
        self,
        query: str | ParsedQuery,
        field: str,
        percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
        delta: float = 200.0,
    ) -> pa.Table:
        """t-digest percentiles over the match set — the ES-semantics
        (ES's percentiles agg IS t-digest backed) swap for
        :meth:`percentiles` when the field's distinct cardinality is too
        high for the exact (value, count) partial: each shard ships a
        fixed ~δ-centroid blob regardless of match size or cardinality;
        the merged digest is independent of shard arrival order."""
        from elasticsearch_assets_ray.stages.tdigest import TDigest

        q, df = self.prepare(query)
        out = TDigest(delta)
        for blob in self._gather_q(q, "tdigest", q, field, delta, df):
            out.merge(TDigest.from_bytes(blob))
        vals = out.quantiles([p / 100.0 for p in percents])
        return pa.table(
            {
                "percent": pa.array([float(p) for p in percents], pa.float64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    def facet_metric(
        self, query: str | ParsedQuery, by: str, metric: str, size: int | None = None
    ) -> pa.Table:
        """Distributed terms agg + avg metric sub-agg: shard-side
        (value, metric, count) partials, exact integer merge, then the
        float math ONCE on the merged table (bit-identical to the
        single-searcher path by construction)."""
        from elasticsearch_assets_ray.query.engine import (
            facet_metric_from_pairs,
            merge_group_value_counts,
        )

        q, df = self.prepare(query)
        pairs = merge_group_value_counts(
            self._gather_q(q, "group_value_counts", q, by, metric, df)
        )
        return facet_metric_from_pairs(pairs, size)

    def significant_terms(
        self, query: str | ParsedQuery, size: int = 10, min_doc_count: int = 3
    ) -> pa.Table:
        """Distributed significant_terms: each shard tokenizes ITS
        matching docs into a (term, fg) partial; the coordinator merges
        integer counts, reads background df from its full-index term
        dictionary, and runs the JLH math once — exact, unlike ES's
        default shard-local approximation."""
        from elasticsearch_assets_ray.query.engine import (
            merge_sig_partials,
            significant_terms_from_partials,
        )

        q, df = self.prepare(query)
        got = self._gather_q(q, "sig_terms", q, df)
        fg = merge_sig_partials([t for t, _n in got])
        fg_total = int(sum(n for _t, n in got))
        return significant_terms_from_partials(
            fg,
            fg_total,
            self.coord.term_dfs,
            int(self.coord.manifest["n_docs"]),
            size,
            min_doc_count,
        )

    def range_agg(
        self,
        query: str | ParsedQuery,
        field: str,
        ranges: list[tuple[float | None, float | None]],
    ) -> pa.Table:
        """Distributed ES range agg — same one value_counts scatter as
        stats/percentiles, binned once on the coordinator."""
        from elasticsearch_assets_ray.query.engine import range_agg_from_value_counts

        return range_agg_from_value_counts(self.value_counts(query, field), ranges)

    def top_hits(
        self, query: str | ParsedQuery, by: str, n: int = 3
    ) -> pa.Table:
        """Distributed per-bucket top_hits: shard-local per-bucket top-n
        partials re-selected with the SAME comparator (tophits_select) —
        exact because a bucket's global top-n is inside the union of the
        shards' local top-n for that bucket."""
        from elasticsearch_assets_ray.query.engine import tophits_select

        q, df = self.prepare(query)
        parts = [p for p in self._gather_q(q, "top_hits", q, by, n, df) if p.num_rows]
        if not parts:
            return pa.table(
                {
                    "value": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        allp = pa.concat_tables(parts)
        return tophits_select(
            allp["doc_id"].to_numpy(zero_copy_only=False),
            allp["score"].to_numpy(zero_copy_only=False),
            allp["value"].combine_chunks(),
            n,
        )

    def _sample_values(
        self, ids: np.ndarray, columns: list[str]
    ) -> dict[str, pa.Array]:
        """Hydrate ``columns`` for sample ids, RANK-ALIGNED: hydrate
        wants/returns sorted unique ids, so gather back by searchsorted
        (every sample id came from search, so all are present)."""
        uniq = np.unique(ids)
        need = list(dict.fromkeys(columns))  # dedupe, order-preserving
        h = self.hydrate(uniq, columns=["doc_id"] + need)
        got = h["doc_id"].to_numpy(zero_copy_only=False)
        pos = pa.array(np.searchsorted(got, ids), type=pa.int64())
        return {c: h[c].combine_chunks().take(pos) for c in need}

    @staticmethod
    def _terms_table(vals: pa.Array) -> pa.Table:
        vc = pc.value_counts(vals)
        return pa.table(
            {
                "value": vc.field("values").cast(pa.string()),
                "count": vc.field("counts").cast(pa.int64()),
            }
        )

    def scripted_metric(self, query: str | ParsedQuery, field: str, map_fn, reduce_fn):
        """ES ``scripted_metric`` aggregation: the map+combine halves run
        data-side — each shard contributes (value, count) partials over
        ITS match set (the same one-pass value_counts scatter that
        feeds stats/percentiles; the match set never crosses the wire)
        — and ``reduce_fn`` folds the merged partials once on the
        coordinator.  ``map_fn(values, counts) -> state`` and
        ``reduce_fn(state) -> result`` are registered *vectorized*
        callables: the engine-side analog of the painless
        init/map/combine/reduce quadruple (init is the callables'
        closure; combine is the exact integer merge of the scatter)."""
        vc = self.value_counts(query, field)
        v = vc["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = vc["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        return reduce_fn(map_fn(v, c))

    def sampler_terms(
        self, query: str | ParsedQuery, by: str, sample_size: int = 100
    ) -> pa.Table:
        """ES ``sampler`` aggregation: the sub-agg (terms over ``by``)
        sees only the ``sample_size`` best-scoring matches.  ES samples
        per shard (``shard_size``), which makes results depend on the
        shard count; here the sample is the GLOBAL top ``sample_size``
        under the engine's total order (round-9 score desc, docID asc)
        — deterministic, shard-count independent, and hash-checkable.
        The sample gathers via the exact distributed search; the terms
        agg runs over the bounded sample (id-routed hydrate, never a
        corpus read)."""
        if sample_size <= 0:
            raise ValueError("sample_size must be positive")
        r = self.search(query, k=sample_size)
        ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size == 0:
            return self._terms_table(pa.array([], pa.string()))
        return self._terms_table(self._sample_values(ids, [by])[by])

    def diversified_sampler_terms(
        self,
        query: str | ParsedQuery,
        dedup_field: str,
        by: str,
        sample_size: int = 30,
        max_per_value: int = 1,
        scan_cap: int | None = None,
    ) -> pa.Table:
        """ES ``diversified_sampler``: walk hits best-first keeping at
        most ``max_per_value`` docs per ``dedup_field`` value until
        ``sample_size`` are kept, then run the sub-agg over the kept
        sample.  The candidate window is the top ``scan_cap`` (default
        10 × sample_size) under the engine's total order — the
        documented, oracle-replicable analog of ES's shard_size knob."""
        if sample_size <= 0 or max_per_value <= 0:
            raise ValueError("sample_size and max_per_value must be positive")
        cap = scan_cap if scan_cap is not None else sample_size * 10
        r = self.search(query, k=cap)
        ids = r["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size == 0:
            return self._terms_table(pa.array([], pa.string()))
        cols = self._sample_values(ids, [dedup_field, by])
        dv = cols[dedup_field].cast(pa.string()).to_numpy(zero_copy_only=False)
        # within-value occurrence index in rank order, vectorized
        _, inv = np.unique(dv, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        starts = np.flatnonzero(
            np.concatenate(([True], sorted_inv[1:] != sorted_inv[:-1]))
        )
        group_start = np.repeat(
            starts, np.diff(np.concatenate((starts, [inv.size])))
        )
        occ = np.empty(inv.size, dtype=np.int64)
        occ[order] = np.arange(inv.size) - group_start
        kept = np.flatnonzero(occ < max_per_value)[:sample_size]
        return self._terms_table(
            cols[by].take(pa.array(kept, type=pa.int64()))
        )

    def search_collapse(
        self, query: str | ParsedQuery, k: int = 10, collapse: str = ""
    ) -> pa.Table:
        """Distributed field collapsing: shards return local collapsed
        top-k; re-collapsing the union is exact (see
        Searcher.collapse_ids)."""
        if not collapse:
            raise ValueError("collapse field is required")
        q, df = self.prepare(query)
        parts = [p for p in self._gather_q(q, "collapse", q, k, collapse, df)]
        allp = pa.concat_tables(parts)
        ids = allp["doc_id"].to_numpy(zero_copy_only=False)
        sc = allp["score"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return allp.slice(0, 0)
        vals = pc.cast(allp[collapse].combine_chunks(), pa.string())
        # re-collapse the union of local winners with the SAME comparator
        # as the single searcher (shared helper — cannot diverge); null
        # values stay singleton groups across shards (doc_id-keyed)
        sel = collapse_winners(ids, sc, vals, k)
        return pa.table(
            {
                "doc_id": pa.array(ids[sel]),
                "score": pa.array(sc[sel]),
                collapse: vals.take(pa.array(sel, type=pa.int64())),
            }
        )

    def function_score(
        self,
        query: str | ParsedQuery,
        field: str,
        k: int = 10,
        factor: float = 1.0,
        modifier: str = "log1p",
        missing: float = 0.0,
    ) -> pa.Table:
        """Distributed function_score: the field multiplier is per-doc,
        so per-shard top-k + merge is exact (same shape as search)."""
        q, df = self.prepare(query)
        parts = self._gather_q(q, "function_score", q, field, k, factor, modifier, missing, df)
        ids = np.concatenate([p["doc_id"].to_numpy(zero_copy_only=False) for p in parts])
        sc = np.concatenate([p["score"].to_numpy(zero_copy_only=False) for p in parts])
        ids, sc = bm25.sort_topk(ids, sc, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(sc)})

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
        """Distributed ES decay functions (gauss | exp | linear): the
        decay multiplier is a per-doc function of one stored column, so
        per-shard top-k + merge is exact."""
        q, df = self.prepare(query)
        parts = [
            p
            for p in self._gather_q(
                q, "decay", q, field, kind, origin, scale, offset, decay, k, missing, df
            )
            if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

    def random_score(
        self,
        query: str | ParsedQuery,
        seed: str = "0",
        k: int = 10,
        id_field: str | None = None,
    ) -> pa.Table:
        """Distributed seeded random_score: the variate is a pure per-doc
        hash, so per-shard top-k + merge is exact."""
        q, df = self.prepare(query)
        parts = [
            p
            for p in self._gather_q(q, "random_score", q, seed, k, id_field, df)
            if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

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
        """Distributed ES distance_feature: proximity addend is per-doc,
        so per-shard top-k + merge is exact."""
        q, df = self.prepare(query)
        parts = [
            p
            for p in self._gather_q(
                q, "distance_feature", q, field, origin, pivot, boost, k, missing, df
            )
            if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

    def script_score(
        self,
        query: str | ParsedQuery,
        field: str,
        script,
        k: int = 10,
        params: dict | None = None,
        missing: float = 0.0,
    ) -> pa.Table:
        """Distributed ES script_score: the script is resolved to a
        callable ON THE COORDINATOR (driver-side registry) and shipped
        by value to each shard, like ES ships script source with the
        request; per-doc replacement ⇒ exact merge."""
        from elasticsearch_assets_ray.query.engine import _SCORE_SCRIPTS

        fn = _SCORE_SCRIPTS[script] if isinstance(script, str) else script
        q, df = self.prepare(query)
        parts = [
            p
            for p in self._gather_q(q, "script_score", q, field, fn, params, k, missing, df)
            if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

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
        """Distributed rank_feature: the feature addend is a pure per-doc
        function of one stored column, so per-shard top-k + merge is
        exact (the function_score argument)."""
        q, df = self.prepare(query)
        parts = [
            p
            for p in self._gather_q(
                q, "rank_feature", q, field, k, boost, function,
                pivot, scaling, exponent, missing, df,
            )
            if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

    def terms_set(
        self,
        terms: list[str],
        min_field: str,
        k: int = 10,
        min_offset: int = 0,
        min_mod: int = 0,
    ) -> pa.Table:
        """Distributed terms_set: each doc lives in exactly one shard, so
        its distinct-matching-term count and its per-doc requirement are
        both shard-local facts; with the coordinator's global dfs the
        local BM25 is bit-identical and the top-k merge is exact."""
        uniq = sorted(set(terms))
        if not uniq:
            raise ValueError("terms_set needs at least one term")
        _q, df = self.prepare(" ".join(uniq))
        parts = [
            p
            for p in self._gather(
                "terms_set", uniq, min_field, k, min_offset, min_mod, df
            )
            if p.num_rows
        ]
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return self._merge_topk_parts(parts, k)

    def pinned(
        self, pin_ids: list[int], query: str | ParsedQuery, k: int = 10
    ) -> pa.Table:
        """Distributed pinned query: pins are a coordinator concern —
        shards serve the ORGANIC top-k (fetching k each is enough: a doc
        in the global organic top-(k−|pins|) after pin removal is within
        its own shard's top-k even if every pin landed in that shard),
        the coordinator drops pinned ids, fills k−|pins| organic slots,
        and prepends the pins with the engine's artificial descending
        scores."""
        from elasticsearch_assets_ray.query.engine import Searcher

        pins = list(dict.fromkeys(int(i) for i in pin_ids))
        present = self.hydrate(
            np.array(pins, dtype=np.int64), columns=["doc_id"]
        )["doc_id"].to_numpy(zero_copy_only=False)
        pset = set(present.tolist())
        pins = [i for i in pins if i in pset][:k]
        organic = self.search(query, k=k + len(pins))
        ids = organic["doc_id"].to_numpy(zero_copy_only=False)
        sc = organic["score"].to_numpy(zero_copy_only=False)
        if pins:
            mask = ~np.isin(ids, np.array(pins, dtype=np.int64))
            ids, sc = ids[mask], sc[mask]
        n_org = max(0, k - len(pins))
        ids, sc = ids[:n_org], sc[:n_org]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([np.array(pins, dtype=np.int64), ids.astype(np.int64)])
                ),
                "score": pa.array(
                    np.concatenate(
                        [
                            Searcher.PINNED_BASE
                            - np.arange(len(pins), dtype=np.float64),
                            sc,
                        ]
                    )
                ),
            }
        )

    def rescore(
        self,
        query: str | ParsedQuery,
        rescore_query: str | ParsedQuery,
        k: int = 10,
        window_size: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
    ) -> pa.Table:
        """Distributed rescore: the GLOBAL top-window (exact via sharded
        search), then the secondary gather routed to each doc's owning
        shard — window-sized work, never a second full query."""
        if window_size <= 0 or k <= 0:
            raise ValueError("k and window_size must be positive")
        if k > window_size:
            raise ValueError(
                f"k ({k}) must not exceed window_size ({window_size}) — "
                "hits below the window are not rescored; widen the window"
            )
        q2, df2 = self.prepare(rescore_query)
        # the same bag-of-SHOULD contract the single-searcher API enforces
        if (
            q2.has_phrases or q2.bool_tree is not None or q2.must
            or q2.must_not or q2.must_any or q2.filters or q2.not_filters
            or q2.match_filters or q2.not_match_filters
            or q2.range_filters or q2.not_range_filters
            or q2.exists_filters or q2.not_exists_filters
        ):
            raise ValueError(
                "rescore queries are bag-of-SHOULD-words (plain terms, "
                "prefixes, wildcards, fuzzies); +must/-not/phrases/"
                "filters/boolean expressions belong in the primary query"
            )
        # window selection must use the SAME (round-9 desc, docID asc)
        # comparator as Searcher.rescore (engine.py:985) — self.search's
        # raw-score ordering could pick different members inside a
        # round-9 tie group, breaking sharded-vs-single rank identity
        q1, df1 = self.prepare(query)
        parts = self._gather_q(q1, "search_window", q1, window_size, df1)
        w_ids = np.concatenate(
            [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
        )
        w_sc = np.concatenate(
            [p["score"].to_numpy(zero_copy_only=False) for p in parts]
        )
        order = np.lexsort((w_ids, -bm25.round_half_up(w_sc, 9)))[:window_size]
        w_ids, w_sc = w_ids[order], w_sc[order]
        if w_ids.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        sec = np.zeros(w_ids.size, dtype=np.float64)
        owner = self._owners(w_ids)
        args, sels = [], []
        for i in range(self.n_shards):
            sel = np.flatnonzero(owner == i)
            if sel.size:
                srt = sel[np.argsort(w_ids[sel], kind="stable")]
                args.append((i, q2.scoring_terms, w_ids[srt], df2))
                sels.append(srt)
        if self.use_actors:
            import ray

            got = ray.get(
                [self.shards[i].score_ids.remote(t, ids, df) for i, t, ids, df in args]
            )
        else:
            got = [self.shards[i].score_ids(t, ids, df) for i, t, ids, df in args]
        for srt, g in zip(sels, got):
            sec[srt] = g
        total = w_sc * query_weight + sec * rescore_weight
        top_i, top_s = bm25.sort_topk(w_ids, total, k)
        return pa.table({"doc_id": pa.array(top_i), "score": pa.array(top_s)})

    def more_like_this(
        self, doc_id: int, k: int = 10, max_query_terms: int = 25
    ) -> pa.Table:
        """Distributed MLT: term selection on the coordinator (source-doc
        hydrate + global df), bag-of-words scatter like any search."""
        sel = self.coord._mlt_terms(doc_id, max_query_terms)
        if not sel:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        r = self.search(ParsedQuery(should=sorted(sel)), k=k + 1)
        keep = r["doc_id"].to_numpy(zero_copy_only=False) != doc_id
        return r.filter(pa.array(keep)).slice(0, k)

    def suggest_terms(self, text: str, size: int = 5, max_edits: int = 2) -> pa.Table:
        """Term suggester on the coordinator's full-index view: the term
        dictionary and df are global there, so ranking is exact (a
        dictionary/df read, no posting scatter needed)."""
        return self.coord.suggest_terms(text, size=size, max_edits=max_edits)

    def suggest_completion(self, prefix: str, size: int = 5) -> pa.Table:
        """Completion suggester on the coordinator's full-index view
        (same global-dictionary argument as :meth:`suggest_terms`)."""
        return self.coord.suggest_completion(prefix, size=size)

    def highlight(
        self, query: str | ParsedQuery, docids: np.ndarray, window: int = 10
    ) -> pa.Table:
        """Distributed highlighting: each requested doc's snippet is
        computed by its OWNING shard (content hydrate stays local)."""
        docids = np.asarray(docids, dtype=np.int64)
        q, _df = self.prepare(query)
        if docids.size == 0 or not self.use_actors:
            return self.coord.highlight(q, docids, window=window)
        import ray

        owner = self._owners(docids)
        futs = []
        for i in range(self.n_shards):
            sel = np.flatnonzero(owner == i)
            if sel.size:
                futs.append(self.shards[i].highlight_ids.remote(q, docids[sel], window))
        parts = ray.get(futs)
        out = pa.concat_tables(parts)
        # restore the CALLER's docids order (the single-searcher contract:
        # one row per input docid in input order, content-less ids dropped)
        # — the raw concat comes back grouped by owning shard
        got = out["doc_id"].to_numpy(zero_copy_only=False)
        sort_in = np.argsort(docids, kind="stable")
        pos = sort_in[np.searchsorted(docids[sort_in], got)]
        return out.take(pa.array(np.argsort(pos, kind="stable")))

    def _owners(self, docids: np.ndarray) -> np.ndarray:
        """Owning shard per docID (bucket-range lookup)."""
        rpb = int(self.coord.manifest.get("runs_per_bucket", 32))
        bucket = (docids >> self.coord._doc_shift) // rpb
        lows = np.array([r[0] for r in self.ranges])
        return np.clip(
            np.searchsorted(lows, bucket, side="right") - 1, 0, self.n_shards - 1
        )

    def hydrate(
        self, docids: np.ndarray, columns: list[str] | None = None
    ) -> pa.Table:
        """Route each docID to its owning shard (docids are bucket-range
        partitioned, so this is a range lookup, not a broadcast)."""
        docids = np.asarray(docids, dtype=np.int64)
        if not self.use_actors or docids.size == 0:
            return self.coord.hydrate(docids, columns=columns)
        import ray

        # a shard may DROP unknown ids (the Searcher.hydrate contract),
        # so alignment must come from the returned doc_id column, not
        # from assuming every requested row came back
        need_doc = columns is not None and "doc_id" not in columns
        cols2 = (["doc_id"] + list(columns)) if need_doc else columns
        owner = self._owners(docids)
        futs, sels = [], []
        for i in range(self.n_shards):
            sel = np.flatnonzero(owner == i)
            if sel.size:
                futs.append(self.shards[i].hydrate.remote(docids[sel], cols2))
                sels.append(sel)
        parts = ray.get(futs)
        kept: list[np.ndarray] = []
        for part, sel in zip(parts, sels):
            got = part["doc_id"].to_numpy(zero_copy_only=False)
            # a shard returns its requested ids in order minus drops —
            # a two-pointer walk recovers the surviving positions (and
            # stays correct under duplicate requested ids)
            req = docids[sel]
            keep = np.empty(len(got), dtype=np.int64)
            j = 0
            for n_, g in enumerate(got):
                while req[j] != g:
                    j += 1
                keep[n_] = sel[j]
                j += 1
            kept.append(keep)
        combined = pa.concat_tables(parts)
        order = np.argsort(np.concatenate(kept), kind="stable")
        out = combined.take(pa.array(order, type=pa.int64()))
        return out.drop_columns(["doc_id"]) if need_doc else out

    def stats(self) -> list[dict]:
        return self._gather("stats")

    def metrics(self) -> dict:
        """Per-shard serving gauges (T5 export, distributed form)."""
        return {
            "n_shards": self.n_shards,
            "can_match": dict(self._cm_stats),
            "shards": self._gather("metrics"),
        }
