"""Routing co-location: the ES ``join``-field index layout on Ray Data.

Elasticsearch parent/child relations live inside ONE index: documents
carry a join field (``{"name": "order"}`` for parents, ``{"name":
"line", "parent": <id>}`` for children) and children are ROUTED to the
parent's shard — the bulk path sets ``routing = parent id`` (reference
asset/src/elasticsearch_bulk/ElasticsearchBulkSender routing,
createRoute) and ES places the doc by ``hash(routing) % num_shards``.
Every parent plus ALL its children are therefore co-resident in one
shard, which is what makes ``has_child`` / ``has_parent`` shard-local
queries instead of cross-shard joins.

This module reproduces that layout for the native index:

- :func:`route_corpus` hash-partitions the corpus by the routing column
  into N route groups (ONE Ray Data shuffle-free pass: add route id →
  partitioned Parquet write).
- :func:`build_routed_index` builds each route group into its own
  bucket-ALIGNED pid range (``pid_base`` aligned up to
  ``runs_per_bucket``, the same alignment trick the incremental deltas
  use — index/incremental.py), hardlinks the per-route docstores/runs
  into one index dir (pure union: pid spaces are disjoint), re-runs
  phase 2 ONCE over the union, and records ``routing`` +
  ``join_field`` metadata in the manifest.
- :class:`~elasticsearch_assets_ray.query.sharded.ShardedSearcher`
  reads ``routing.route_bucket_ranges`` and carves its serving shards
  on ROUTE boundaries, so a routing value never straddles shards and
  the join-field queries (engine.py ``Searcher.has_child`` /
  ``has_parent``) run shard-local, gathered by plain top-k merge.

At 100 TB this is the load-bearing design: the alternative (two-Dataset
hash join per query — stages/parentchild.py) re-shuffles child partials
on EVERY query, while the routed layout pays one corpus re-partition at
build time and serves joins with zero cross-shard traffic, exactly like
Elasticsearch.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data


def route_of(col: pa.Array | pa.ChunkedArray, n_routes: int) -> np.ndarray:
    """Stable route id per row: splitmix64-finalized polynomial hash of
    the routing value (deterministic across processes — Python ``hash``
    is salted per process and would scatter a rebuilt index)."""
    from elasticsearch_assets_ray.stages.sampling import id_hash

    return (id_hash(col, "route") % np.uint64(n_routes)).astype(np.int64)


def route_corpus(
    paths: str | list[str],
    out_dir: str,
    routing_col: str,
    n_routes: int,
) -> list[str]:
    """Hash-partition the corpus by ``routing_col`` into ``n_routes``
    route directories under ``out_dir`` (ES's ``hash(routing) %
    num_shards`` placement).  One streaming pass: rows gain a route id
    in ``map_batches`` and the partitioned Parquet write splits them —
    route files stay resumable per-route.  Returns the route dirs in
    route order."""
    if n_routes < 1:
        raise ValueError("n_routes must be >= 1")
    ds = ray.data.read_parquet(paths)

    def add_route(b: pa.Table) -> pa.Table:
        r = route_of(b[routing_col], n_routes)
        return b.append_column("__route", pa.array(r))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(add_route, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["__route"]
    )
    dirs = []
    for r in range(n_routes):
        d = os.path.join(out_dir, f"__route={r}")
        # a route with zero rows writes no directory; keep an empty dir so
        # route index r still exists (its bucket range is empty)
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
    return dirs


def _align_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_routed_index(
    paths: str | list[str],
    out_dir: str,
    *,
    routing_col: str,
    n_routes: int = 4,
    join_field: dict | None = None,
    config=None,
    **cfg_kwargs,
) -> dict:
    """Build a routing-co-located index: corpus → N route groups →
    per-route bucket-aligned partial builds → ONE merged index whose
    manifest carries ``routing`` (+ optional ``join_field``) metadata.

    ``join_field`` declares the ES join mapping this index serves, e.g.
    ``{"col": "join_name", "relations": {"order": ["line"]}}`` — the
    routing column doubles as the parent key (children route by parent
    id; parents route by their own id), which is exactly the ES
    contract.

    Build mechanics reuse the delta-compaction path: each route builds
    like an incremental delta (aligned ``pid_base``), then docstore/run
    part files are HARDLINKED into the union dir and phase 2 runs once
    (index/incremental.py compact) — no data is rewritten."""
    from elasticsearch_assets_ray.index.build import (
        MANIFEST_VERSION,
        IndexConfig,
        _atomic_write_json,
        build_index,
        run_phase2,
    )

    cfg = config or IndexConfig(**cfg_kwargs)
    rpb = cfg.runs_per_bucket
    os.makedirs(out_dir, exist_ok=True)

    gm_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(gm_path):
        with open(gm_path) as f:
            gm = json.load(f)
        if gm.get("complete"):
            # the resume fast-path must enforce the same settings guard
            # as the incomplete path — silently returning an index routed
            # by a DIFFERENT column/route-count would serve wrong joins
            saved_r = gm.get("routing") or {}
            saved_key = {
                "routing_col": saved_r.get("col"),
                "n_routes": saved_r.get("n_routes"),
                "join_field": gm.get("join_field"),
            }
            want_key = {
                "routing_col": routing_col,
                "n_routes": n_routes,
                "join_field": dict(join_field) if join_field is not None else None,
            }
            if saved_key != want_key:
                raise ValueError(
                    f"completed routed index at {out_dir} was built with "
                    f"{saved_key}; requested {want_key} — pass the same "
                    "routing settings or remove the directory"
                )
            return gm

    route_root = os.path.join(out_dir, "routed")
    marker = os.path.join(route_root, "_routed.json")
    if not os.path.exists(marker):
        shutil.rmtree(route_root, ignore_errors=True)
        route_dirs = route_corpus(paths, route_root, routing_col, n_routes)
        _atomic_write_json(
            {"routing_col": routing_col, "n_routes": n_routes}, marker
        )
    else:
        with open(marker) as f:
            saved = json.load(f)
        if saved != {"routing_col": routing_col, "n_routes": n_routes}:
            raise ValueError(
                f"routed corpus at {route_root} was built with {saved}; "
                "pass the same routing settings or remove the directory"
            )
        route_dirs = [
            os.path.join(route_root, f"__route={r}") for r in range(n_routes)
        ]

    next_pid = 0
    route_bucket_ranges: list[list[int]] = []
    manifests = []
    for r, rdir in enumerate(route_dirs):
        has_files = bool(glob.glob(os.path.join(rdir, "**", "*.parquet"), recursive=True))
        pid_base = _align_up(next_pid, rpb)
        if not has_files:
            route_bucket_ranges.append([pid_base // rpb, pid_base // rpb])
            continue
        m = build_index(
            rdir,
            os.path.join(out_dir, "routes", f"route-{r:03d}"),
            config=cfg,
            resume=True,
            pid_base=pid_base,
        )
        manifests.append(m)
        max_pid = int(m["max_pid"])
        route_bucket_ranges.append([pid_base // rpb, max_pid // rpb + 1])
        next_pid = max_pid + 1

    if not manifests:
        raise ValueError(f"no parquet input found at {paths!r}")

    # ---- union (the compact pattern): hardlink + one phase 2 ----
    for sub in ("docstore", "runs"):
        d = os.path.join(out_dir, sub)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        for r in range(n_routes):
            src = os.path.join(out_dir, "routes", f"route-{r:03d}", sub)
            for f in glob.glob(os.path.join(src, "part-*.parquet")):
                os.link(f, os.path.join(d, os.path.basename(f)))
    run_phase2(out_dir, cfg)

    n_docs = sum(m["n_docs"] for m in manifests)
    total_tokens = sum(m["total_tokens"] for m in manifests)
    base = manifests[0]
    gm = {
        "version": MANIFEST_VERSION,
        "complete": True,
        "n_partitions": sum(m["n_partitions"] for m in manifests),
        "max_pid": max(int(m["max_pid"]) for m in manifests),
        "n_docs": n_docs,
        "n_raw_rows": sum(m.get("n_raw_rows", 0) for m in manifests),
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "doc_shift": base["doc_shift"],
        "term_hash": base["term_hash"],
        "codec": cfg.codec,
        "num_shards": cfg.num_shards,
        "runs_per_bucket": rpb,
        "content_col": cfg.content_col,
        "id_cols": list(cfg.id_cols),
        "store_content": cfg.store_content,
        "index_positions": cfg.index_positions,
        "positions_codec": "varint-delta" if cfg.index_positions else None,
        "analyzer": base.get("analyzer"),
        "routing": {
            "col": routing_col,
            "n_routes": n_routes,
            "route_bucket_ranges": route_bucket_ranges,
        },
    }
    if join_field is not None:
        gm["join_field"] = dict(join_field)
    _atomic_write_json(gm, gm_path)
    return gm
