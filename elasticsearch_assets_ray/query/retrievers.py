"""ES 8.x ``retriever`` tree API: declarative composed retrieval.

ES's modern search surface expresses a search as a TREE of retrievers —
``standard`` (a query), ``knn``, and compound nodes ``rrf`` / ``linear``
/ ``rescorer`` / ``text_similarity_reranker`` that combine or transform
child retrievers.  This module is the dispatch glue over this repo's
already-verified primitives (search / knn / rrf_fuse / linear_fuse /
rescore arithmetic); it works against a Searcher OR a ShardedSearcher
(both expose the same surface), so a retriever tree runs distributed
for free.

Spec shape (one key per node, mirroring the ES JSON):

    {"rrf": {"retrievers": [
        {"standard": {"query": "fast scan"}},
        {"knn": {"query_vector": [...], "k": 20}}],
        "rank_constant": 60, "rank_window_size": 50}}

``text_similarity_reranker`` needs a scoring model; the model itself is
out of scope for this environment, so the node requires a REGISTERED
vectorized scorer (``register_reranker``) — fn(texts: list[str],
query: str) -> np.ndarray — and raises with a clear message otherwise
(the plumbing — window fetch, hydrate, rerank — is real and tested with
a deterministic scorer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: registered text_similarity_reranker scorers (the model seam)
_RERANKERS: dict[str, "callable"] = {}


def register_reranker(name: str):
    def deco(fn):
        _RERANKERS[name] = fn
        return fn

    return deco


def _ranked(t: pa.Table) -> pa.Table:
    """Normalize a (doc_id, score|sim) table to (query_id=0, doc_id,
    rank, score_r) for the fusion kernels — rows arrive already ranked
    by the engine comparator."""
    n = t.num_rows
    score = t["sim"] if "sim" in t.column_names else t["score"]
    return pa.table(
        {
            "query_id": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_id": t["doc_id"],
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "score_r": score.cast(pa.float64()),
        }
    )


def execute(s, spec: dict, k: int = 10) -> pa.Table:
    """Run a retriever tree against searcher ``s`` → (doc_id, score),
    ranked by the node's own semantics."""
    if len(spec) != 1:
        raise ValueError("a retriever node has exactly one type key")
    kind, body = next(iter(spec.items()))
    if kind == "standard":
        return s.search(body["query"], k=k, **body.get("opts", {}))
    if kind == "knn":
        res = s.knn(
            np.array([0], dtype=np.int64),
            np.asarray([body["query_vector"]], dtype=np.float64),
            k=body.get("k", k),
            filter_query=body.get("filter"),
            similarity=body.get("similarity"),
        )
        return pa.table({"doc_id": res["doc_id"], "score": res["sim"]})
    if kind == "rrf":
        from elasticsearch_assets_ray.query.hybrid import rrf_fuse

        w = body.get("rank_window_size", max(k, 10))
        kids = [_ranked(execute(s, child, k=w)) for child in body["retrievers"]]
        fused = rrf_fuse(kids, k=k, rank_constant=body.get("rank_constant", 60))
        return pa.table({"doc_id": fused["doc_id"], "score": fused["rrf"]})
    if kind == "linear":
        from elasticsearch_assets_ray.query.hybrid import linear_fuse

        w = body.get("rank_window_size", max(k, 10))
        kids, weights = [], []
        for child in body["retrievers"]:
            node = child.get("retriever", child)
            node = {kk: vv for kk, vv in node.items() if kk not in ("weight",)}
            kids.append(_ranked(execute(s, node, k=w)))
            weights.append(float(child.get("weight", 1.0)))
        fused = linear_fuse(kids, weights=weights, k=k)
        return pa.table({"doc_id": fused["doc_id"], "score": fused["fused"]})
    if kind == "rescorer":
        from elasticsearch_assets_ray.query import bm25

        window = body.get("window_size", max(k, 10))
        prim = execute(s, body["retriever"], k=window)
        ids = prim["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        psc = prim["score"].to_numpy(zero_copy_only=False)
        sec = s.all_scores(body["rescore_query"])
        smap = dict(
            zip(
                sec["doc_id"].to_numpy(zero_copy_only=False).tolist(),
                sec["score"].to_numpy(zero_copy_only=False).tolist(),
            )
        )
        ssc = np.array([smap.get(int(i), 0.0) for i in ids])
        total = body.get("query_weight", 1.0) * psc + body.get(
            "rescore_weight", 1.0
        ) * ssc
        ids, total = bm25.sort_topk(ids, total, k)
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(total)})
    if kind == "text_similarity_reranker":
        scorer = body.get("scorer")
        fn = _RERANKERS.get(scorer)
        if fn is None:
            raise NotImplementedError(
                "text_similarity_reranker needs a registered scorer "
                "(no inference model is available in this environment); "
                "register one with retrievers.register_reranker"
            )
        from elasticsearch_assets_ray.query import bm25

        window = body.get("rank_window_size", max(k, 10))
        child = execute(s, body["retriever"], k=window)
        ids = child["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        man = getattr(s, "manifest", None) or s.coord.manifest
        ccol = man["content_col"]
        h = s.hydrate(ids, columns=["doc_id", ccol])
        texts = h[ccol].to_pylist()
        sc = np.asarray(fn(texts, body.get("inference_text", "")), dtype=np.float64)
        if sc.shape != (ids.size,):
            raise ValueError("reranker must return one score per hit")
        ids2, sc2 = bm25.sort_topk(ids, sc, k)
        return pa.table({"doc_id": pa.array(ids2), "score": pa.array(sc2)})
    raise ValueError(f"unknown retriever type {kind!r}")
