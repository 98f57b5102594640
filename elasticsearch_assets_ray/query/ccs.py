"""Cross-cluster search (CCS) — federating INDEPENDENT indexes.

ES cross-cluster search queries several remote clusters in one request
(`POST cluster_a:index,cluster_b:index/_search`); with
``ccs_minimize_roundtrips=false`` the coordinating node runs a dfs
phase across every remote so BM25 statistics are GLOBAL and scores are
comparable across clusters.  That is the contract here, strengthened to
a provable one:

- **Corpus stats**: combined ``n_docs`` / ``avgdl`` are computed from
  the member manifests' integer totals (Σ total_tokens / Σ n_docs, one
  float64 division) — the same expression a single index built over the
  union corpus records, so they are bit-equal, not approximately equal.
- **dfs phase**: per-term document frequencies are summed across
  clusters and injected into every member via ``search_prepared``'s
  ``df_override`` (the same mechanism ShardedSearcher uses for its
  bucket-range shards).
- **Merge**: per-cluster top-k parts merge on (round-9 score DESC,
  cluster ordinal ASC, docID ASC).  Cluster ordinal precedes docID
  because docID spaces of independent indexes overlap — within one
  cluster the tie-break degrades to the engine-wide round-9/docID rule.

Rank identity: against a single index built over the union corpus, CCS
returns the same round-9 scores for the same documents (pinned by
tests/test_ccs.py through the content sha — docIDs differ between
builds, content does not).

**Union-dictionary rewrite**: multi-term clauses (prefix / wildcard /
regexp / fuzzy / phrase-prefix) expand against the UNION of the member
term dictionaries — a term matches the union dictionary iff it matches
some member's, so the union of member expansions IS the combined
index's expansion set.  The ``max_expansions`` cap RAISES rather than
truncates engine-wide, which makes the federation exact here too: the
union raises iff the combined index would (the re-check after unioning
covers the case where every member is under the cap but the union is
not).  Plain terms, +/- clauses, boolean trees, phrases,
sloppy/unordered phrases, minimum_should_match and search_after all
federate as well.

Each member is a :class:`Searcher` here; a member could equally be a
:class:`ShardedSearcher` (it duck-types ``term_dfs`` and the prepared
surface) — cluster-of-clusters composition with the identical stats/df
contract.

Reference: the reference delegates multi-cluster topology entirely to
ES (connection config at asset/src/elasticsearch_reader_api/schema.ts);
this module is the native analog of that delegated capability.
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
from elasticsearch_assets_ray.query.engine import Searcher


class _UnionExpander:
    """Quacks like a Searcher for the multi-term rewrite: each expand_*
    unions the member expansions (sorted), re-checking the cap on the
    union.  Borrows the rewrite drivers from Searcher unchanged."""

    _rewrite_prefixes = Searcher._rewrite_prefixes
    _rewrite_tree = Searcher._rewrite_tree

    def __init__(self, members: list[Searcher]):
        self.members = members

    def _union_expand(self, fn: str, args: tuple, max_expansions: int, label: str):
        found: set[str] = set()
        for m in self.members:
            found.update(getattr(m, fn)(*args, max_expansions))
        if len(found) > max_expansions:
            raise ValueError(
                f"{label} expands to more than {max_expansions} terms "
                "across clusters"
            )
        return sorted(found)

    def expand_prefix(self, prefix: str, max_expansions: int = 1024):
        return self._union_expand(
            "expand_prefix", (prefix,), max_expansions, f"prefix {prefix!r}*"
        )

    def expand_wildcard(self, pattern: str, max_expansions: int = 1024):
        return self._union_expand(
            "expand_wildcard", (pattern,), max_expansions, f"wildcard {pattern!r}"
        )

    def expand_regexp(self, pattern: str, max_expansions: int = 1024):
        return self._union_expand(
            "expand_regexp", (pattern,), max_expansions, f"regexp /{pattern}/"
        )

    def expand_fuzzy(self, term: str, max_edits: int, max_expansions: int = 1024):
        return self._union_expand(
            "expand_fuzzy", (term, max_edits), max_expansions, f"fuzzy {term!r}~{max_edits}"
        )


class CrossClusterSearcher:
    def __init__(self, clusters: dict[str, str], phrase_scoring: str = "terms"):
        """``clusters``: alias → index dir (the ES remote-cluster
        registry analog).  Aliases sort to fix the merge ordinal."""
        if not clusters:
            raise ValueError("need at least one cluster")
        self.names = sorted(clusters)
        self.members: list[Searcher] = []
        total_tokens = 0
        total_docs = 0
        for name in self.names:
            d = clusters[name]
            with open(os.path.join(d, "manifest.json")) as f:
                man = json.load(f)
            total_tokens += int(man["total_tokens"])
            total_docs += int(man["n_docs"])
            self.members.append(Searcher(d, phrase_scoring=phrase_scoring))
        # analyzer chains must agree or query analysis diverges per
        # cluster (same validation MultiSearcher applies to its children)
        specs = {
            json.dumps(m.manifest.get("analyzer"), sort_keys=True)
            for m in self.members
        }
        if len(specs) > 1:
            raise ValueError("clusters were built with different analyzers")
        self.n_docs = total_docs
        #: one float64 division over the integer totals — the expression
        #: a union-corpus build writes into its own manifest
        self.avgdl = float(total_tokens) / float(total_docs)
        # override member corpus stats BEFORE any query: wsat caches are
        # keyed lazily per (term, idf) and tf-saturation bakes avgdl in,
        # so the override must precede the first scored query (it does —
        # members are constructed above and used nowhere else)
        for m in self.members:
            m.n_docs = self.n_docs
            m.avgdl = self.avgdl
        self._expander = _UnionExpander(self.members)

    # ---------- dfs phase ----------
    def prepare(
        self,
        query,
        minimum_should_match: int = 0,
        search_after: tuple[float, int] | None = None,
    ):
        s0 = self.members[0]
        q = s0._q(query)
        q = Searcher._apply_msm(q, minimum_should_match)
        if search_after is not None:
            s_raw, aid = search_after
            q = dataclasses.replace(
                q,
                search_after=(float(bm25.round_half_up(s_raw, 9)), int(aid)),
            )
        # union-dictionary rewrite (see module docstring): expansions and
        # phrase-prefix stems resolve against ALL member dictionaries
        q = self._expander._rewrite_prefixes(q)
        if q.phrase_prefixes or q.not_phrase_prefixes:
            q = dataclasses.replace(
                q,
                phrase_prefixes=[
                    (p, frozenset(self._expander.expand_prefix(st)) if not isinstance(st, frozenset) else st)
                    for p, st in q.phrase_prefixes
                ],
                not_phrase_prefixes=[
                    (p, frozenset(self._expander.expand_prefix(st)) if not isinstance(st, frozenset) else st)
                    for p, st in q.not_phrase_prefixes
                ],
            )
        need = set(q.scoring_terms) | set(q.must_not)
        if q.bool_tree is not None:
            need |= parser_mod.tree_terms(q.bool_tree)
        for grp in q.must_any:
            need |= set(grp)
        df: dict[str, int] = {}
        for m in self.members:
            for t, d in m.term_dfs(sorted(need)).items():
                df[t] = df.get(t, 0) + int(d)
        return q, df

    # ---------- query phase ----------
    _MAX_DOCID = (1 << 62)  # sentinel cursor docids (see search_after)

    def search(
        self,
        query,
        k: int = 10,
        minimum_should_match: int = 0,
        search_after: tuple[float, str, int] | None = None,
    ) -> pa.Table:
        """Global top-k across clusters → (cluster, doc_id, score).

        ``search_after`` is the CCS cursor ``(score, cluster, doc_id)``
        of the previous page's last row — the cluster must be part of
        the cursor because the merge order is (score, cluster ordinal,
        docID) and independent docID spaces overlap.  Each member gets
        an equivalent (score, docid) cursor for the engine's
        ``(r9 < s) | (r9 == s & id > aid)`` filter: the cursor cluster
        passes its own docid, earlier-ordinal clusters pass +inf (their
        score ties were all emitted before the cursor), later-ordinal
        clusters pass −1 (none were)."""
        cur_ord = None
        cur_doc = None
        sa_member: tuple[float, int] | None = None
        if search_after is not None:
            s_raw, cl, cur_doc = search_after
            cur_ord = self.names.index(cl)
            sa_member = (float(s_raw), int(cur_doc))
        q, df = self.prepare(query, minimum_should_match, None)
        ids_all: list[np.ndarray] = []
        scores_all: list[np.ndarray] = []
        ords: list[np.ndarray] = []
        for ci, m in enumerate(self.members):
            qi = q
            if sa_member is not None:
                if ci < cur_ord:
                    aid = self._MAX_DOCID
                elif ci == cur_ord:
                    aid = int(cur_doc)
                else:
                    aid = -1
                qi = dataclasses.replace(
                    q,
                    search_after=(
                        float(bm25.round_half_up(sa_member[0], 9)),
                        aid,
                    ),
                )
            t = m.search_prepared(qi, k, df_override=df)
            ids_all.append(t["doc_id"].to_numpy(zero_copy_only=False))
            scores_all.append(t["score"].to_numpy(zero_copy_only=False))
            ords.append(np.full(t.num_rows, ci, dtype=np.int64))
        ids = np.concatenate(ids_all) if ids_all else np.empty(0, np.int64)
        scores = (
            np.concatenate(scores_all) if scores_all else np.empty(0, np.float64)
        )
        co = np.concatenate(ords) if ords else np.empty(0, np.int64)
        r9 = bm25.round_half_up(scores, 9)
        order = np.lexsort((ids, co, -r9))[:k]
        return pa.table(
            {
                "cluster": pa.array([self.names[int(co[i])] for i in order], pa.string()),
                "doc_id": pa.array(ids[order]),
                "score": pa.array(scores[order]),
            }
        )

    def count(self, query) -> int:
        """Score-free federated count (doc spaces are disjoint by
        construction — independent corpora — so the sum is exact)."""
        q, _ = self.prepare(query)
        return sum(int(m.match_ids(q).size) for m in self.members)

    def facet(self, query, by: str, size: int | None = None) -> pa.Table:
        """Federated terms agg: per-cluster partial buckets summed —
        the match set never leaves its cluster."""
        q, df = self.prepare(query)
        parts = []
        for m in self.members:
            ids = m.all_scores_prepared(q, df_override=df)["doc_id"].to_numpy(
                zero_copy_only=False
            )
            parts.append(m.facet_ids(ids, by))
        t = pa.concat_tables(parts)
        g = t.group_by(["value"], use_threads=False).aggregate([("count", "sum")])
        merged = pa.table(
            {
                "value": g["value"],
                "count": pc.cast(g["count_sum"], pa.int64()),
            }
        )
        merged = merged.take(
            pc.sort_indices(
                merged,
                sort_keys=[("count", "descending"), ("value", "ascending")],
            )
        )
        return merged.slice(0, size) if size is not None else merged

    def hydrate(self, cluster: str, docids: np.ndarray, columns=None) -> pa.Table:
        return self.members[self.names.index(cluster)].hydrate(docids, columns)
