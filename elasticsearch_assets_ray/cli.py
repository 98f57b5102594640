"""CLI entry points — the ``ray job submit`` surface of the engine.

On a cluster::

    ray job submit --working-dir . -- python -m elasticsearch_assets_ray.cli \
        build --input s3://bucket/corpus --out /shared/idx --partition-rows 262144

    ray job submit --working-dir . -- python -m elasticsearch_assets_ray.cli \
        query --index /shared/idx --q "def load index" -k 10

Locally the same commands run against ``RAY_ADDRESS=local``.  This is the
only module (besides bench.py and the test fixture) that may own a Ray
session; it guards with ``ray.is_initialized()`` so a driver-managed
session is respected.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ensure_ray()
    from elasticsearch_assets_ray.index.build import build_index

    manifest = build_index(
        args.input,
        args.out,
        target_partition_rows=args.partition_rows,
        num_shards=args.num_shards,
        runs_per_bucket=args.runs_per_bucket,
        content_col=args.content_col,
        resume=not args.no_resume,
    )
    print(json.dumps(manifest))
    return 0


def cmd_query(args) -> int:
    _ensure_ray()
    if args.shards > 1:
        # doc-partitioned scatter-gather serving (one actor per shard) —
        # the multi-node layout; rank-identical to the single searcher
        from elasticsearch_assets_ray.query.sharded import ShardedSearcher

        s = ShardedSearcher(args.index, n_shards=args.shards, use_actors=True)
    else:
        from elasticsearch_assets_ray.query.engine import Searcher

        s = Searcher(args.index)
    if args.agg:
        kind, _, field = args.agg.partition(":")
        if kind == "facet":
            res = s.facet(args.q, by=field or "lang")
        elif kind == "sig_terms":
            res = s.significant_terms(args.q, size=args.k)
        elif kind == "top_hits":
            res = s.top_hits(args.q, by=field or "lang", n=min(args.k, 10))
        elif kind == "stats":
            import pyarrow as pa

            if not field:
                raise SystemExit("--agg stats:<col> needs a column name")
            st = s.stats_agg(args.q, field)
            res = pa.table(
                {"metric": pa.array(list(st)), "value": pa.array([float(v) for v in st.values()])}
            )
        elif kind == "percentiles":
            if not field:
                raise SystemExit("--agg percentiles:<col> needs a column name")
            res = s.percentiles(args.q, field)
        else:
            raise SystemExit(f"unknown agg '{kind}' (facet|sig_terms|top_hits|stats|percentiles)")
    else:
        res = s.search(args.q, k=args.k)
    print(json.dumps(res.to_pydict()))
    return 0


def cmd_tick(args) -> int:
    """One persistent-mode window tick (delta build)."""
    _ensure_ray()
    from datetime import datetime

    from elasticsearch_assets_ray.index.build import IndexConfig
    from elasticsearch_assets_ray.index.incremental import IncrementalIndex

    inc = IncrementalIndex(
        args.root,
        config=IndexConfig(content_col=args.content_col, id_cols=tuple(args.id_cols.split(","))),
    )
    window = (datetime.fromisoformat(args.start), datetime.fromisoformat(args.end))
    print(json.dumps(inc.tick(args.input, window, args.date_col)))
    return 0


def cmd_compact(args) -> int:
    """Merge all completed deltas into one index (force-merge analog)."""
    _ensure_ray()
    from elasticsearch_assets_ray.index.incremental import IncrementalIndex

    inc = IncrementalIndex(args.root)
    print(json.dumps(inc.compact()))
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py", *args.rest])


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="elasticsearch_assets_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--input", required=True, help="parquet file/dir/glob")
    b.add_argument("--out", required=True)
    b.add_argument("--partition-rows", type=int, default=256 * 1024)
    b.add_argument("--num-shards", type=int, default=32)
    b.add_argument("--runs-per-bucket", type=int, default=32)
    b.add_argument("--content-col", default="content")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument(
        "--shards", type=int, default=1,
        help="serve doc-partitioned over N shard actors (scatter-gather)",
    )
    q.add_argument(
        "--agg", default="",
        help="aggregation instead of hits: facet:<col> | sig_terms | "
        "top_hits:<col> | stats:<col> | percentiles:<col>",
    )
    q.set_defaults(fn=cmd_query)

    t = sub.add_parser("tick", help="persistent-mode delta build for one window")
    t.add_argument("--root", required=True)
    t.add_argument("--input", required=True)
    t.add_argument("--date-col", required=True)
    t.add_argument("--start", required=True, help="ISO datetime, inclusive")
    t.add_argument("--end", required=True, help="ISO datetime, exclusive")
    t.add_argument("--content-col", default="content")
    t.add_argument("--id-cols", default="repo,path,commit")
    t.set_defaults(fn=cmd_tick)

    c = sub.add_parser("compact", help="merge all deltas into one index")
    c.add_argument("--root", required=True)
    c.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
