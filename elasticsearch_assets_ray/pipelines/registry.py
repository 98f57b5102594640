"""Named pipeline registry — the driver-facing `queries()` / `oracle_sql()`
surface (one entry per implemented operator, SURVEY.md §2 parity) plus the
flagship search pipeline.

This mirrors the reference's APIFactory registry of named reader/sender
instances (reference asset/src/elasticsearch_reader_api/api.ts:1-63): a
plain dict of named, configured pipelines.

Every SQL-expressible pipeline has a DuckDB oracle with IDENTICAL column
names; money aggregates go through integer cents so Ray's combine order
can never produce a different float than the SQL engine.  Scores/sims are
ranked by ``round(x, 9)`` with id tie-break and reported as
``round(x, 6)`` so ulp-level float differences between numpy and DuckDB
cannot flip a rank or a hash.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from elasticsearch_assets_ray.index.build import IndexConfig, build_index
from elasticsearch_assets_ray.query import hybrid
from elasticsearch_assets_ray.query.engine import (
    Searcher,
    register_runtime_field,
    register_score_script,
)
from elasticsearch_assets_ray.sources.reader import (
    date_range_read,
    key_charclass_read,
    key_prefix_read,
    min_max_probe,
    predicate_count,
    projected_read,
)
from elasticsearch_assets_ray.stages import bulk as bulk_ops
from elasticsearch_assets_ray.stages import dedup as dedup_ops
from elasticsearch_assets_ray.stages import similarity as sim_ops
from elasticsearch_assets_ray.stages import textstats
from elasticsearch_assets_ray.stages.relational import AggSpec, broadcast_join, partial_agg, topk
from elasticsearch_assets_ray.state.storage import DocstoreCache

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _rd(sf_dir: str, table: str, **kw) -> ray.data.Dataset:
    return ray.data.read_parquet(_p(sf_dir, table), **kw)


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))


_INDEX_CACHE: dict[str, str] = {}
_SHARDED_CACHE: dict[str, object] = {}


def sharded_searcher(idx: str, n_shards: int = 4):
    """Process-wide ShardedSearcher cache (the T2 APIFactory instance
    cache, serving side): the distributed gates each need the SAME
    4-actor pool over the same index — re-creating actors (and a cold
    coordinator) per gate call multiplies actor spin-up across the gate
    sweep and the bench for no isolation benefit."""
    key = f"{idx}|{n_shards}"
    if key not in _SHARDED_CACHE:
        from elasticsearch_assets_ray.query.sharded import ShardedSearcher

        # fractional CPU per serving actor: shard workers are
        # mostly-idle RPC servers, and pools at num_cpus=1 pin whole
        # cores — with several pools up (text + source field indexes)
        # they reserve EVERY core of a small session and Ray Data
        # pipelines in the same process starve (observed deadlock:
        # 4/4 CPU held by idle actors, map_batches tasks pending
        # forever).  0.125 keeps even THREE cached pools (text + source
        # + parent/child) at 1.5 CPUs total on a 4-CPU test session —
        # hash-shuffle aggregator actors need the rest (second observed
        # starvation: 3 pools at 0.25 pinned 3.0 and partial_agg's
        # shuffle never scheduled)
        _SHARDED_CACHE[key] = ShardedSearcher(
            idx, n_shards=n_shards, use_actors=True, num_cpus=0.125
        )
    return _SHARDED_CACHE[key]


def documents_index(sf_dir: str) -> str:
    """Build (once, cached+resumable) the fulltext index over the sf_dir's
    ``documents`` table; returns the index directory."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # v4: +n_chars metadata column (fielded range-filter gates)
    out = os.path.join("/tmp", "esr_index_cache", f"{tag}-documents-v4")
    build_index(
        _p(sf_dir, "documents"),
        out,
        config=IndexConfig(
            content_col="text",
            id_cols=("doc_id",),
            keep_cols=("lang", "source", "n_chars"),
            store_content=True,
            index_positions=True,
        ),
    )
    _INDEX_CACHE[sf_dir] = out
    return out


# ---------------------------------------------------------------------------
# analyzed index (ES analyzer contract: stop + S-stemmer token filters)
# ---------------------------------------------------------------------------

# the (stop, s_stem) chain — stages/analysis.py; SQL-replicable
ANALYZER_DICT = {"filters": ["stop", "s_stem"]}
# the synthetic corpus has no plural surface forms, so the analyzed
# corpus pluralizes three hot words on ODD doc_ids — an unanalyzed
# index would split each pair into two unrelated terms, making the
# conflation observable (and oracle-checkable) end-to-end
_ANA_PLURALS = [("table", "tables"), ("query", "queries"), ("batch", "batches")]
_ANA_INDEX_CACHE: dict[str, str] = {}


def _pluralize_sql(col: str) -> str:
    rep = col
    for a, b in _ANA_PLURALS:
        rep = f"regexp_replace({rep}, '\\b{a}\\b', '{b}', 'g')"
    return f"(CASE WHEN doc_id % 2 = 1 THEN {rep} ELSE {col} END)"


def analyzed_documents_index(sf_dir: str) -> str:
    """Build (once, cached) the ANALYZED fulltext index: documents with
    deterministic plural surface forms on odd doc_ids, tokenized through
    the (stop, s_stem) filter chain (index/build.py ``analyzer=``).
    The augmented corpus is itself written with a streaming Ray
    map_batches (vectorized RE2 replace + if_else on the doc_id parity
    mask) — no driver-side materialization."""
    if sf_dir in _ANA_INDEX_CACHE:
        return _ANA_INDEX_CACHE[sf_dir]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join("/tmp", "esr_index_cache")
    aug = os.path.join(root, f"{tag}-documents-ana-src-v1")
    out = os.path.join(root, f"{tag}-documents-ana-v1")
    if not os.path.exists(os.path.join(aug, "_DONE")):
        import shutil

        tmp = aug + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(aug, ignore_errors=True)

        def _plural(t: pa.Table) -> pa.Table:
            text = t["text"]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            rep = text
            for a, b in _ANA_PLURALS:
                rep = pc.replace_substring_regex(rep, rf"\b{a}\b", b)
            odd = pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())), 1)
            return t.set_column(
                t.schema.get_field_index("text"), "text", pc.if_else(odd, rep, text)
            )

        ray.data.read_parquet(_p(sf_dir, "documents")).map_batches(
            _plural, batch_format="pyarrow"
        ).write_parquet(tmp)
        os.rename(tmp, aug)
        with open(os.path.join(aug, "_DONE"), "w") as f:
            f.write("ok")
    build_index(
        aug,
        out,
        config=IndexConfig(
            content_col="text",
            id_cols=("doc_id",),
            keep_cols=("lang", "source", "n_chars"),
            store_content=True,
            index_positions=True,
            analyzer=ANALYZER_DICT,
        ),
    )
    _ANA_INDEX_CACHE[sf_dir] = out
    return out


# ---------------------------------------------------------------------------
# pinned query sets (vocabulary of the synthetic documents table)
# ---------------------------------------------------------------------------

DOC_QUERIES: list[str] = [
    "spark table merge join",
    "fast scan filter",
    "window agg group by",
    "key value row column",
    "slow query big data",
    "stream batch dup",
    "customer line order",
    "sort part hash",
    "vector data table",
    "the a small value",
]

BOOLEAN_QUERIES: list[str] = [
    "+spark table merge",
    "spark -window table",
    "+key +value row",
    '"table scan" merge',
    "-the -a spark query",
    'scan -"table scan"',
    '+"row column" filter',
]

PREFIX_QUERIES: list[str] = [
    "s* table",           # multi-term expansion (spark, scan, sort, slow, ...)
    "filter fa*",
    "-b* value row",      # negative prefix excludes docs with any b-term
    "qu* zz*",            # zz* matches nothing → contributes nothing
    'wind* "table scan"',
    "+sp* merge",         # conjunctive: doc must contain ≥1 sp-term
]

FUZZY_QUERIES: list[str] = [
    "tabel~2 merge",      # transposed 'table' (plain-Levenshtein 2)
    "spark~1 filter",
    "scann~1 sort",
    "+valeu~2 row",       # conjunctive: doc must contain a 2-edit match
    "-quer~1 data",       # excludes docs with 'query'
    "daat~2 window",      # multi-match: data(2) AND fast(2)
    "zzzz~1 merge",       # fuzzy matching nothing contributes nothing
]

WILDCARD_QUERIES: list[str] = [
    "t?ble scan",
    "*ow key",            # leading wildcard: row, slow, window
    "b?g filter",
    "gr*up sort",
    "+s?a* merge",        # conjunctive group: scan, small, spark, ...
    "-*am* value",        # excludes docs with 'stream'
    "c?stomer col?mn",
]

FILTERED_QUERIES: list[str] = [
    "spark table merge lang:en",
    "fast scan filter source:src3",
    "key value row -lang:de",
    "window agg lang:fr -source:src1",
    '+merge "table scan" lang:en',
    "sort part hash lang:xx",      # no such lang → matches nothing
    "s* value lang:zh",            # prefix expansion + filter
    "spark table _exists_:lang",   # ES existence query (filter context)
    # analyzed multi-field match (`field.text:token`): non-scoring token
    # membership under the shared analyzer — scoring stays "spark table"
    "spark table text.text:vector",
    "merge join -text.text:vector lang:en",
]

RANGE_QUERIES: list[str] = [
    "spark table merge n_chars:>=400",
    "fast scan filter n_chars:[150 TO 300}",
    "key value row -n_chars:{100 TO 450]",
    "window agg lang:[de TO es] n_chars:<350",  # string range + comparator
    '+merge "table scan" n_chars:[250 TO *]',   # phrase + open-ended range
    "sort part hash n_chars:>600",              # beyond max → matches nothing
]

BOOLOP_QUERIES: list[str] = [
    "(spark OR merge) AND table",
    "scan AND NOT (window OR agg)",
    "(key AND value) OR (row AND column)",   # DNF — flat +/- can't say this
    "table AND (lang:en OR lang:fr)",        # filters inside the tree
    "merge AND NOT lang:de AND n_chars:[200 TO 500]",
    "sp* AND (filter OR scan)",              # expansion leaf in the tree
    "((spark OR merge) AND (fast OR slow)) OR (key AND value AND row)",
    "scan AND NOT (big AND data)",           # negated conjunction
    "(spark OR merge)^2 AND table",          # group boost reranks
    "scan^3 OR window OR agg^0.5",           # leaf boosts
    "table AND (merge OR scan)^1.5 AND _exists_:lang",  # boost + exists
]

PHRASE_PREFIX_QUERIES: list[str] = [
    '"spark ta*" merge',          # autocomplete-style phrase prefix
    '"key va*" row',
    'scan -"table sc*"',          # negated phrase prefix
    '"window ag*" filter',
    '"spark zz*" table',          # no expansion → clause matches nothing
]

SLOPPY_QUERIES: list[str] = [
    '"spark table"~2 merge',       # up to 2 interleaved tokens
    '"key value"~1 row',
    'scan -"table scan"~3',        # negated window
    '"window agg group"~2',        # 3-term sloppy chain
    '"spark merge"~0 table',       # ~0 ≡ exact adjacency
    '"value key"~4',               # reversed order must NOT match as "key value"
]

UNORDERED_QUERIES: list[str] = [
    '"table spark"~u0 merge',      # reversed pair, adjacent (anagram window)
    '"value key"~u1 row',          # reversed pair the ordered gate rejects
    'scan -"scan table"~u2',       # negated unordered window
    '"group window agg"~u1',       # 3 terms, any order, one extra slot
    '"key key"~u4',                # duplicate term → two distinct positions
]

REGEXP_QUERIES: list[str] = [
    "/s[pt]ark?/ table",          # character classes + optional char
    "-/m.rge/ scan value",        # negated regexp
    "+/k.y/ value row",           # conjunctive regexp
    "/colum(n|ns)/ filter",       # alternation
    "/zz+q/ window",              # matches nothing → contributes nothing
    "window AND (/t.ble/ OR scan)",  # regexp leaf inside a boolean tree
]

# (query, minimum_should_match) pairs — the ES request parameter
MSM_QUERIES: list[str] = [
    "spark table merge join",
    "key value row column part",
    "fast scan filter",
    "slow query big data dup",
    "+merge spark table scan",   # must term + msm over the should set
]
MSM_NS: list[int] = [2, 3, 2, 4, 2]

SEARCH_K = 10
_STOPWORD_SQL = ", ".join(f"'{w}'" for w in textstats._STOPWORDS)


# ---------------------------------------------------------------------------
# reference reader surface (S1/S2/Q1/Q2/Q6/F3/date probe)
# ---------------------------------------------------------------------------


def q_date_range_scan(sf_dir: str):
    return date_range_read(
        _p(sf_dir, "events"),
        "ts",
        datetime(2024, 1, 10),
        datetime(2024, 1, 20),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )


def q_key_prefix_scan(sf_dir: str):
    return key_prefix_read(
        _p(sf_dir, "documents"), "source", ["src1"], columns=["doc_id", "source", "lang"]
    )


def q_key_charclass_scan(sf_dir: str):
    """Q3: reference-style regexp char-class key predicate ``src[0-3].*``
    (utils.ts:72-81) as a starts_with OR-list pushdown."""
    return key_charclass_read(
        _p(sf_dir, "documents"), "source", "src[0-3].*",
        columns=["doc_id", "source", "lang"],
    )


def q_projection(sf_dir: str):
    return projected_read(_p(sf_dir, "documents"), ["doc_id", "lang", "n_chars"])


def q_predicate_count(sf_dir: str):
    n = predicate_count(
        _p(sf_dir, "events"),
        (pc.field("event_type") == "purchase") & (pc.field("value") > 50.0),
    )
    return pa.table({"cnt": pa.array([n], pa.int64())})


def q_min_max_probe(sf_dir: str):
    lo, hi = min_max_probe(_p(sf_dir, "events"), "ts")
    return pa.table(
        {"min_ts": pa.array([lo], pa.timestamp("us")), "max_ts": pa.array([hi], pa.timestamp("us"))}
    )


# ---------------------------------------------------------------------------
# geo surface (Q5): lat/lon derived deterministically from event ids so
# the same construction is expressible in the SQL oracle
# ---------------------------------------------------------------------------

_GEO_BOX = dict(top=30.0, left=-60.0, bottom=-10.0, right=40.0)
_GEO_POINT = (12.3, 45.6)


def _derive_latlon(b: pa.Table) -> pa.Table:
    uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lat = (uid % 1800) / 10.0 - 90.0
    lon = (eid % 3600) / 10.0 - 180.0
    return pa.table(
        {"event_id": b["event_id"], "lat": pa.array(lat), "lon": pa.array(lon)}
    )


_GEO_LATLON_SQL = (
    "(user_id % 1800) / 10.0 - 90.0", "(event_id % 3600) / 10.0 - 180.0"
)


def _auto_histo_oracle() -> str:
    from elasticsearch_assets_ray.sources.dates import auto_interval_sql

    case = auto_interval_sql(AUTO_HISTO_TARGET)
    return (
        "WITH e AS (SELECT epoch_us(ts) AS us FROM events), "
        "r AS (SELECT min(us) AS mn, max(us) AS mx FROM e), "
        f"iv AS (SELECT CAST({case} AS BIGINT) AS i FROM r) "
        "SELECT make_timestamp((e.us // iv.i) * iv.i) AS bucket, "
        "count(*)::BIGINT AS count, iv.i AS interval_us "
        "FROM e CROSS JOIN iv GROUP BY bucket, iv.i"
    )


def _geohash_grid_oracle() -> str:
    from elasticsearch_assets_ray.sources.geo import geohash_grid_sql

    cell = geohash_grid_sql("lat", "lon", GEOHASH_PRECISION)
    return (
        "WITH g AS (SELECT event_id, "
        f"{_GEO_LATLON_SQL[0]} AS lat, {_GEO_LATLON_SQL[1]} AS lon FROM events), "
        f"c AS (SELECT {cell} AS geohash FROM g) "
        "SELECT geohash, count(*)::BIGINT AS count FROM c GROUP BY geohash"
    )


_GEO_DIST_RANGES: list[tuple[float | None, float | None]] = [
    (None, 5000.0),
    (5000.0, 10000.0),
    (8000.0, 15000.0),  # overlapping on purpose (ES counts independently)
    (10000.0, None),
]
_GEO_ORIGIN = (37.77, -122.42)


def q_geo_distance_agg(sf_dir: str):
    """ES geo_distance aggregation: counts per distance range from an
    origin (overlapping ranges counted independently); per-batch partial
    counts, driver sums a vector — no shuffle."""
    from elasticsearch_assets_ray.sources.geo import geo_distance_agg

    ds = _rd(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        _derive_latlon, batch_format="pyarrow"
    )
    return geo_distance_agg(
        ds, "lat", "lon", point=_GEO_ORIGIN, ranges=_GEO_DIST_RANGES
    )


def _geo_distance_agg_sql() -> str:
    lat0, lon0 = _GEO_ORIGIN
    km = (
        "round(2 * 6371.0088 * asin(sqrt("
        f" pow(sin(radians({lat0} - lat) / 2), 2) + "
        f" cos(radians(lat)) * cos(radians({lat0})) * "
        f" pow(sin(radians({lon0} - lon) / 2), 2))), 6)"
    )
    arms = []
    for lo, hi in _GEO_DIST_RANGES:
        a = "*" if lo is None else f"{lo:.1f}"
        b = "*" if hi is None else f"{hi:.1f}"
        conds = []
        if lo is not None:
            conds.append(f"km >= {lo}")
        if hi is not None:
            conds.append(f"km < {hi}")
        where = " AND ".join(conds) or "TRUE"
        arms.append(
            f"SELECT '{a}-{b}' AS value, count(*) FILTER (WHERE {where}) AS count FROM d"
        )
    return (
        "WITH g AS (SELECT event_id, "
        f"{_GEO_LATLON_SQL[0]} AS lat, {_GEO_LATLON_SQL[1]} AS lon FROM events), "
        f"d AS (SELECT {km} AS km FROM g) " + " UNION ALL ".join(arms)
    )


def q_geo_box_count(sf_dir: str):
    """Q5 geo bounding box as a plain range predicate over float lat/lon
    columns (reference geoBoundingBox, utils.ts:102-107)."""
    from elasticsearch_assets_ray.sources.geo import geo_box_filter

    ds = _rd(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        _derive_latlon, batch_format="pyarrow"
    )
    filt = geo_box_filter("lat", "lon", **_GEO_BOX)
    n = ds.map_batches(lambda t: t.filter(filt), batch_format="pyarrow").count()
    return pa.table({"cnt": pa.array([n], pa.int64())})


# ES geo_polygon query: (lat, lon) vertices, implicitly closed, no
# horizontal edges (see sources.geo.point_in_polygon)
# vertices sit inside the derived grid's populated region (lat starts
# at -90 and grows with user-id range, lon with event-id range — the
# sf0.001 corpus only covers lat ≤ -88.6)
_GEO_POLYGON: list[tuple[float, float]] = [
    (-89.95, -170.0),
    (-88.73, -150.07),
    (-89.1, -100.3),
    (-89.62, -90.2),
    (-89.87, -140.1),
]


def q_geo_polygon_count(sf_dir: str):
    """ES ``geo_polygon`` query analog: crossing-number membership over
    the derived lat/lon grid, one stateless vectorized filter pass (the
    polygon is a handful of floats — it ships in the task closure)."""
    from elasticsearch_assets_ray.sources.geo import point_in_polygon

    ds = _rd(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        _derive_latlon, batch_format="pyarrow"
    )

    def filt(t: pa.Table) -> pa.Table:
        m = point_in_polygon(
            t["lat"].to_numpy(zero_copy_only=False),
            t["lon"].to_numpy(zero_copy_only=False),
            _GEO_POLYGON,
        )
        return t.filter(pa.array(m))

    n = ds.map_batches(filt, batch_format="pyarrow").count()
    return pa.table({"cnt": pa.array([n], pa.int64())})


def _geo_polygon_sql() -> str:
    """Twin of q_geo_polygon_count: the identical crossing-number
    expression per edge (same float64 ops, same order), odd parity =
    inside — so boundary-adjacent grid points classify identically."""
    terms = []
    n = len(_GEO_POLYGON)
    for i in range(n):
        yi, xi = _GEO_POLYGON[i]
        yj, xj = _GEO_POLYGON[(i + 1) % n]
        terms.append(
            f"CASE WHEN (({yi!r} > lat) <> ({yj!r} > lat)) AND "
            f"(lon < ({xj!r} - {xi!r}) * (lat - {yi!r}) / ({yj!r} - {yi!r}) "
            f"+ {xi!r}) THEN 1 ELSE 0 END"
        )
    parity = " + ".join(terms)
    return (
        f"WITH g AS (SELECT {_GEO_LATLON_SQL[0]} AS lat, "
        f"{_GEO_LATLON_SQL[1]} AS lon FROM events) "
        f"SELECT count(*)::BIGINT AS cnt FROM g WHERE ({parity}) % 2 = 1"
    )


_GEO_LINE_SIZE = 20


def q_geo_line(sf_dir: str):
    """ES ``geo_line`` aggregation: per event_type, the track of the
    first 20 points in (ts, event_id) order.  Coordinates are INTEGER
    deci-degrees derived without float arithmetic, so the track strings
    are exact on both sides."""
    from elasticsearch_assets_ray.sources.geo import geo_line

    def derive(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "lat10": pa.array(uid % 1800 - 900),
                "lon10": pa.array(eid % 3600 - 1800),
                "ts": b["ts"],
                "event_id": b["event_id"],
            }
        )

    ds = _rd(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"]
    ).map_batches(derive, batch_format="pyarrow")
    return geo_line(
        ds, "event_type", "lat10", "lon10", ["ts", "event_id"],
        size=_GEO_LINE_SIZE,
    )


def _geo_line_sql() -> str:
    return (
        "WITH p AS (SELECT event_type, user_id % 1800 - 900 AS lat10, "
        "event_id % 3600 - 1800 AS lon10, ts, event_id FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY event_type "
        "ORDER BY ts, event_id) AS rk FROM p), "
        f"k AS (SELECT * FROM r WHERE rk <= {_GEO_LINE_SIZE}) "
        "SELECT event_type || '#' || string_agg("
        "CAST(lat10 AS VARCHAR) || ':' || CAST(lon10 AS VARCHAR), ';' "
        "ORDER BY rk) AS value, count(*)::BIGINT AS count "
        "FROM k GROUP BY event_type ORDER BY value"
    )


def q_geo_distance_topk(sf_dir: str):
    """Q5 ``_geo_distance`` ascending sort (reference geoSearch/
    geoDistance sort, utils.ts:167-250) as streaming top-k.

    The top-k SELECTION runs on round(km, 6) with event_id tie-break —
    the synthetic lat/lon grid produces huge exact-distance tie groups,
    and raw-float selection would pick a different ulp-level subset than
    the SQL engine (the rounded value is the cross-engine contract)."""
    from elasticsearch_assets_ray.sources.geo import haversine_km
    from elasticsearch_assets_ray.stages.relational import topk

    lat0, lon0 = _GEO_POINT

    def derive(b: pa.Table) -> pa.Table:
        g = _derive_latlon(b)
        d = haversine_km(
            g["lat"].to_numpy(zero_copy_only=False),
            g["lon"].to_numpy(zero_copy_only=False),
            lat0,
            lon0,
        )
        return pa.table(
            {"event_id": g["event_id"], "km_r6": pa.array(np.round(d, 6))}
        )

    ds = _rd(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        derive, batch_format="pyarrow"
    )
    t = topk(ds, [("km_r6", "ascending"), ("event_id", "ascending")], 10)
    return pa.table(
        {
            "event_id": t["event_id"],
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
            "dist_r": pc.round(t["km_r6"], ndigits=3),
        }
    )


# ---------------------------------------------------------------------------
# bulk action semantics (K3/K4)
# ---------------------------------------------------------------------------

_EV_COLS = ["user_id", "event_id", "event_type", "value", "ts"]


def q_bulk_index_lww(sf_dir: str):
    ds = _rd(sf_dir, "events")
    out = bulk_ops.last_writer_wins(ds, "user_id", "ts", tie_break="event_id")
    return out.select_columns(_EV_COLS)


def q_bulk_create_first(sf_dir: str):
    ds = _rd(sf_dir, "events")
    out = bulk_ops.keep_first(ds, "user_id", "ts", tie_break="event_id")
    return out.select_columns(_EV_COLS)


@bulk_ops.register_script("value_x3")
def _script_value_x3(t: pa.Table) -> dict:
    return {"value": pc.multiply(t["value"], pa.scalar(3.0, pa.float64()))}


def q_ingest_events(sf_dir: str):
    """ES ingest pipeline (`_ingest/pipeline` processor chain): uppercase
    → gsub → stored-script → convert, compiled once and applied with
    map_batches (every processor a vectorized Arrow kernel).  The same
    callable plugs into reindex's transform seam and the bulk sender —
    the reference's processor slot in reader→processor→sender jobs."""
    from elasticsearch_assets_ray.pipelines.ingest import IngestPipeline

    pipe = IngestPipeline(
        [
            {"type": "uppercase", "field": "event_type"},
            {"type": "gsub", "field": "event_type", "pattern": "O", "replacement": "0"},
            {"type": "script", "name": "value_x3"},
            {"type": "convert", "field": "user_id", "to": "long"},
        ]
    )
    ds = _rd(sf_dir, "events", columns=_EV_COLS)
    out = pipe.run(ds).select_columns(_EV_COLS)
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))


def q_reindex_events(sf_dir: str):
    """The reference's flagship reader→processor→sender composition as
    one resumable pipeline (pipelines/reindex.py): even date slices
    planned driver-side, one checkpointed Ray task per slice, a
    vectorized transform (value × 2) in flight.  The gate re-reads the
    partitioned output — so it verifies the WRITTEN files, not an
    in-memory table."""
    import glob as _glob
    import shutil
    import tempfile

    from elasticsearch_assets_ray.pipelines.reindex import reindex

    # a UNIQUE output dir per invocation: a fixed /tmp path keyed on the
    # sf basename races concurrent gate/bench runs (one rmtree's while
    # the other's slice tasks are writing)
    out_dir = tempfile.mkdtemp(prefix="esr_reindex_gate_")

    def x2(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("value"), "value", pc.multiply(t["value"], 2.0)
        )

    try:
        reindex(_p(sf_dir, "events"), out_dir, date_col="ts", n_slices=6, transform=x2)
        t = pa.concat_tables(
            pq.read_table(f)
            for f in sorted(_glob.glob(os.path.join(out_dir, "part-*.parquet")))
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return t.select(_EV_COLS).sort_by([("event_id", "ascending")])


def q_bulk_delete(sf_dir: str):
    ds = _rd(sf_dir, "documents", columns=["doc_id", "source", "lang"])
    dels = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "source"])
    dels = dels.filter(pc.equal(dels["source"], "src0")).select(["doc_id"])
    return bulk_ops.delete_keys(ds, dels, "doc_id")


def q_bulk_rekey(sf_dir: str):
    """One-pass _delete_id re-key (reference createBulkMetadata
    ElasticsearchBulkSender.ts:49-63): every src1 document moves to
    doc_id + 1_000_000 with its source rewritten, deleting the old id and
    indexing the new one in the same bulk pass."""
    ds = _rd(sf_dir, "documents", columns=["doc_id", "source", "lang"])
    mv = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "source", "lang"])
    mv = mv.filter(pc.equal(mv["source"], "src1"))
    moves = pa.table(
        {
            "_delete_id": mv["doc_id"],
            "doc_id": pc.add(mv["doc_id"], pa.scalar(1_000_000, pa.int64())),
            "source": pa.array(["src1-moved"] * mv.num_rows, pa.string()),
            "lang": mv["lang"],
        }
    )
    return bulk_ops.rekey(ds, moves, "doc_id")


_UBQ_QUERY = "+spark +table"


@bulk_ops.register_script("ubq_tag_source")
def _script_ubq_tag(t: pa.Table) -> dict:
    return {
        "source": pc.binary_join_element_wise(
            t["source"], pa.scalar("ubq", pa.string()), "-"
        )
    }


def q_update_by_query(sf_dir: str):
    """ES ``_update_by_query``: the fulltext query selects docs on the
    SHARDED engine (score-free match_ids — no BM25 arithmetic), and the
    matched id set drives a broadcast scripted update over the source
    table.  Output is the full post-update docstore state."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    ids = sh.match_ids(_UBQ_QUERY)
    orig = (
        _orig_ids(sh.coord, np.sort(ids.astype(np.int64)))
        if ids.size
        else np.array([], dtype=np.int64)
    )
    ds = _rd(sf_dir, "documents", columns=["doc_id", "source", "lang"])
    return bulk_ops.update_by_query(ds, "doc_id", orig, "ubq_tag_source")


def _update_by_query_sql() -> str:
    toks = sorted(set(t.lstrip("+") for t in _UBQ_QUERY.split()))
    pred = " AND ".join(f"list_contains({_TOK}, '{t}')" for t in toks)
    return (
        "SELECT doc_id, "
        f"CASE WHEN {pred} THEN source || '-ubq' ELSE source END AS source, "
        "lang FROM documents"
    )


def _order_balance_updates(sf_dir: str, key_shift: int = 0) -> pa.Table:
    ds = _rd(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = _collect(
        partial_agg(
            ds,
            ["o_custkey"],
            [AggSpec("cents", "o_totalprice", "sum_cents")],
            # hint = the REAL key-cardinality bound (customer row count,
            # free from the parquet footer).  Above the driver-combine
            # cap partial_agg automatically takes the shuffle path — a
            # fixed hint would trip the lying-hint guard at large SF
            distinct_hint=pq.ParquetFile(_p(sf_dir, "customer")).metadata.num_rows,
        )
    )
    key = pc.add(agg["o_custkey"], pa.scalar(key_shift, pa.int64()))
    newbal = pc.divide(pc.cast(agg["cents"], pa.float64()), pa.scalar(100.0))
    return pa.table({"c_custkey": pc.cast(key, pa.int64()), "c_acctbal": newbal})


def q_bulk_update_fields(sf_dir: str):
    cust = _rd(sf_dir, "customer")
    upd = _order_balance_updates(sf_dir)
    out = bulk_ops.update_fields(cust, upd, "c_custkey", ["c_acctbal"])
    return out.select_columns(["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])


def q_bulk_update_script(sf_dir: str):
    """K4 scripted update: a registered vectorized UDF adds each
    customer's order-total delta to their balance (the painless-script
    analog, reference applyScript ElasticsearchBulkSender.ts:139-151)."""
    cust = _rd(sf_dir, "customer")
    u = _order_balance_updates(sf_dir)
    upd = pa.table({"c_custkey": u["c_custkey"], "delta": u["c_acctbal"]})

    def add_delta(j: pa.Table) -> dict:
        return {"c_acctbal": pc.add(j["c_acctbal"], j["__u_delta"])}

    out = bulk_ops.scripted_update(cust, upd, "c_custkey", add_delta, ["delta"])
    return out.select_columns(["c_custkey", "c_name", "c_acctbal"])


def q_bulk_upsert(sf_dir: str):
    cust = _rd(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    upd = _order_balance_updates(sf_dir, key_shift=100)
    out = bulk_ops.upsert(cust, upd, "c_custkey", ["c_acctbal"])
    return out.select_columns(["c_custkey", "c_name", "c_acctbal"])


# ---------------------------------------------------------------------------
# wide relational operators (the ES-delegated surface made native)
# ---------------------------------------------------------------------------


def q_tpch_q1(sf_dir: str):
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= datetime(1998, 9, 2)),
    )
    agg = partial_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            AggSpec("sum_qty_c", "l_quantity", "sum_cents"),
            AggSpec("sum_base_c", "l_extendedprice", "sum_cents"),
            AggSpec("avg_qty", "l_quantity", "mean_cents"),
            AggSpec("avg_price", "l_extendedprice", "mean_cents"),
            AggSpec("count_order", "l_quantity", "count"),
        ],
        distinct_hint=16,  # returnflag × linestatus
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(b["sum_qty_c"], pa.float64()), pa.scalar(100.0)),
                "sum_base": pc.divide(pc.cast(b["sum_base_c"], pa.float64()), pa.scalar(100.0)),
                "avg_qty": b["avg_qty"],
                "avg_price": b["avg_price"],
                "count_order": b["count_order"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_revenue_by_segment(sf_dir: str):
    orders = _rd(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, ["o_custkey"], right_keys=["c_custkey"])
    agg = partial_agg(
        joined,
        ["c_mktsegment"],
        [AggSpec("rev_c", "o_totalprice", "sum_cents"), AggSpec("n_orders", "o_totalprice", "count")],
        distinct_hint=8,  # market segments
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "revenue": pc.divide(pc.cast(b["rev_c"], pa.float64()), pa.scalar(100.0)),
                "n_orders": b["n_orders"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape (forecasting revenue change): filtered product-sum
    over lineitem.  Exactness: revenue = Σ cents(price) ×
    myriad(discount) — both factors integer-rounded half-away first, so
    the int64 partial sums are association-order independent and the SQL
    twin is bit-identical; one map_batches, one tiny partial row per
    batch, no shuffle."""
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(
            (pc.field("l_shipdate") >= datetime(1996, 1, 1))
            & (pc.field("l_shipdate") < datetime(1997, 1, 1))
        ),
    )

    def part(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(b["l_discount"], pa.scalar(0.05)),
                pc.less_equal(b["l_discount"], pa.scalar(0.07)),
            ),
            pc.less(b["l_quantity"], pa.scalar(24.0)),
        )
        f = b.filter(m)
        cents = pc.cast(
            pc.round(pc.multiply(f["l_extendedprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        myr = pc.cast(
            pc.round(pc.multiply(f["l_discount"], pa.scalar(10000.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        s = pc.sum(pc.multiply_checked(cents, myr))
        return pa.table(
            {
                "s": pa.array([s.as_py() or 0], pa.int64()),
                "n": pa.array([f.num_rows], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(ds.map_batches(part, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    total = int(pc.sum(parts["s"]).as_py() or 0)
    n = int(pc.sum(parts["n"]).as_py() or 0)
    return pa.table(
        {
            "revenue": pa.array([total / 1_000_000.0], pa.float64()),
            "n": pa.array([n], pa.int64()),
        }
    )


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): customer⋈orders⋈lineitem with
    date filters, revenue per order, top 10.  Scale shape: the BUILDING
    custkey set broadcasts (small side); lineitem pre-aggregates
    per-BATCH (order, revenue-cents) partials — the hash-partitioned
    Dataset.join therefore moves order-sized partials, never line items —
    and the per-order combine runs AFTER the join (associative int sums;
    a groupby output never feeds the join, and empty filtered batches
    emit NULL-key sentinels — the two Ray Data join hazards)."""
    from elasticsearch_assets_ray.stages.relational import _partial_batch

    cust = pq.read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    keyset = ray.put(keys)

    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < datetime(1998, 1, 1)),
    )

    def ofilter(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b["o_custkey"], value_set=ray.get(keyset)))
        out = pa.table(
            {"o_orderkey": f["o_orderkey"], "o_orderdate": f["o_orderdate"]}
        )
        if out.num_rows == 0:  # NULL-key sentinel (never inner-joins)
            return pa.table(
                {
                    "o_orderkey": pa.array([None], pa.int64()),
                    "o_orderdate": pa.array([None], pa.timestamp("us")),
                }
            )
        return out

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow")

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > datetime(1996, 6, 30)),
    )
    rev_aggs = [AggSpec("rev", "rc", "sum")]

    def lpart(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        myr = pc.cast(
            pc.round(pc.multiply(b["l_discount"], pa.scalar(10000.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        rc = pc.multiply_checked(cents, pc.subtract(pa.scalar(10000, pa.int64()), myr))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rc": rc})
        p = _partial_batch(t, ["l_orderkey"], rev_aggs)
        if p.num_rows == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([None], pa.int64()),
                    "p_rev": pa.array([0], pa.int64()),
                }
            )
        return p

    li_parts = li.map_batches(lpart, batch_format="pyarrow")
    joined = orders_f.join(
        li_parts,
        join_type="inner",
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        num_partitions=8,
    )
    combined = partial_agg(
        joined, ["o_orderkey", "o_orderdate"], [AggSpec("rev_c", "p_rev", "sum")]
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_orderdate": b["o_orderdate"],
                "revenue": pc.divide(
                    pc.cast(b["rev_c"], pa.float64()), pa.scalar(1_000_000.0)
                ),
            }
        )

    return topk(
        combined.map_batches(fin, batch_format="pyarrow"),
        [("revenue", "descending"), ("o_orderkey", "ascending")],
        10,
    )


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape over the full dimension chain: revenue per
    (region, supplier nation) for one order-date year.  Scale shape:
    supplier→nation→region collapses to ONE broadcast int map
    (suppkey → nation ordinal; dimensions are small by definition);
    lineitem pre-aggregates per-BATCH (orderkey, nation) revenue-cents
    partials; the ONLY big-big exchange is the hash-partitioned join of
    those partials against the date-filtered orders keys (combine AFTER
    the join, NULL-key sentinels — the q3 contract); the final
    per-nation combine is a bounded partial_agg."""
    from elasticsearch_assets_ray.stages.relational import _partial_batch

    sup = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(_p(sf_dir, "nation"))
    reg = pq.read_table(_p(sf_dir, "region"))
    nmap = dict(
        zip(nat["n_nationkey"].to_pylist(), zip(nat["n_name"].to_pylist(), nat["n_regionkey"].to_pylist()))
    )
    rmap = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    skey = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False)
    order_ = np.argsort(skey)
    skey_sorted, snat_sorted = skey[order_], snat[order_]
    supref = ray.put((skey_sorted, snat_sorted))

    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= datetime(1996, 1, 1))
            & (pc.field("o_orderdate") < datetime(1997, 1, 1))
        ),
    )

    def okeys(b: pa.Table) -> pa.Table:
        out = pa.table({"o_orderkey": b["o_orderkey"]})
        if out.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([None], pa.int64())})
        return out

    orders_k = orders.map_batches(okeys, batch_format="pyarrow")

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    aggs = [AggSpec("rev", "rc", "sum"), AggSpec("n", "rc", "count")]

    def lpart(b: pa.Table) -> pa.Table:
        sk, sn = ray.get(supref)
        pos = np.searchsorted(sk, b["l_suppkey"].to_numpy(zero_copy_only=False))
        pos = np.clip(pos, 0, sk.size - 1)
        nkey = sn[pos]
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        myr = pc.cast(
            pc.round(pc.multiply(b["l_discount"], pa.scalar(10000.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        rc = pc.multiply_checked(cents, pc.subtract(pa.scalar(10000, pa.int64()), myr))
        t = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "nkey": pa.array(nkey, pa.int64()),
                "rc": rc,
            }
        )
        p = _partial_batch(t, ["l_orderkey", "nkey"], aggs)
        if p.num_rows == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([None], pa.int64()),
                    "nkey": pa.array([0], pa.int64()),
                    "p_rev": pa.array([0], pa.int64()),
                    "p_n": pa.array([0], pa.int64()),
                }
            )
        return p

    li_parts = li.map_batches(lpart, batch_format="pyarrow")
    joined = orders_k.join(
        li_parts,
        join_type="inner",
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        num_partitions=8,
    )
    combined = _collect(
        partial_agg(
            joined,
            ["nkey"],
            [AggSpec("rev_c", "p_rev", "sum"), AggSpec("n_orders", "p_n", "sum")],
            distinct_hint=64,  # nations
        )
    )
    nk = combined["nkey"].to_pylist()
    labels = [f"{rmap[nmap[k][1]]}:{nmap[k][0]}" for k in nk]
    out = pa.table(
        {
            "c_mktsegment": pa.array(labels, pa.string()),
            "revenue": pc.divide(
                pc.cast(combined["rev_c"], pa.float64()), pa.scalar(1_000_000.0)
            ),
            "n_orders": combined["n_orders"].combine_chunks().cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("c_mktsegment", "ascending")]))


def q_top_orders(sf_dir: str):
    ds = _rd(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return topk(ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 10)


# ---------------------------------------------------------------------------
# ES join field (parent/child) over orders (parents) / lineitem (children)
# ---------------------------------------------------------------------------


def _parentchild_index(sf_dir: str) -> str:
    """Build (once, resumable) the ES join-field index for the TPC-H
    parent/child family: orders (join=order) and lineitems (join=line)
    UNIONED into one corpus, ROUTED by the parent key — children land in
    the parent's shard exactly like ES's ``routing = parent id`` (the
    reference's bulk path sets this, ElasticsearchBulkSender createRoute).
    Corpus assembly is a streaming Ray Data union (no driver tables);
    the routed build + serving layout is index/routing.py."""
    import hashlib

    from elasticsearch_assets_ray.index.routing import build_routed_index

    tag = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    corpus_dir = f"/tmp/esr_pc_corpus_{tag}"
    idx_dir = f"/tmp/esr_pc_idx_{tag}"
    man = os.path.join(idx_dir, "manifest.json")
    if os.path.exists(man):
        import json as _json

        with open(man) as f:
            if _json.load(f).get("complete"):
                return idx_dir
    if not os.path.exists(os.path.join(corpus_dir, "_done")):
        import shutil

        shutil.rmtree(corpus_dir, ignore_errors=True)

        def parent_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "uid": pc.binary_join_element_wise(
                        pa.array(["o"] * b.num_rows),
                        pc.cast(b["o_orderkey"], pa.string()),
                        "",
                    ),
                    "join_name": pa.array(["order"] * b.num_rows),
                    "routing": b["o_orderkey"].combine_chunks(),
                    "content": b["o_orderpriority"].combine_chunks(),
                    "score_cents": pc.cast(
                        pc.round(
                            pc.multiply(b["o_totalprice"], pa.scalar(100.0)),
                            round_mode="half_towards_infinity",
                        ),
                        pa.int64(),
                    ),
                }
            )

        def child_rows(b: pa.Table) -> pa.Table:
            rev = pc.multiply(
                pc.multiply(
                    b["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), b["l_discount"]),
                ),
                pa.scalar(100.0),
            )
            return pa.table(
                {
                    "uid": pc.binary_join_element_wise(
                        pc.cast(b["l_orderkey"], pa.string()),
                        pc.cast(b["l_linenumber"], pa.string()),
                        "#",
                    ),
                    "join_name": pa.array(["line"] * b.num_rows),
                    "routing": b["l_orderkey"].combine_chunks(),
                    "content": b["l_returnflag"].combine_chunks(),
                    # price*.75 × (1-d) × 100 CAN be an exact .5 double —
                    # mirror DuckDB round() (half away from zero)
                    "score_cents": pc.cast(
                        pc.round(rev, round_mode="half_towards_infinity"),
                        pa.int64(),
                    ),
                }
            )

        po = _rd(
            sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
        ).map_batches(parent_rows, batch_format="pyarrow")
        co = _rd(
            sf_dir,
            "lineitem",
            columns=[
                "l_orderkey",
                "l_linenumber",
                "l_returnflag",
                "l_extendedprice",
                "l_discount",
            ],
        ).map_batches(child_rows, batch_format="pyarrow")
        po.union(co).write_parquet(corpus_dir)
        open(os.path.join(corpus_dir, "_done"), "w").close()
    build_routed_index(
        corpus_dir,
        idx_dir,
        routing_col="routing",
        n_routes=4,
        join_field={"col": "join_name", "relations": {"order": ["line"]}},
        # id_cols=() → NO create-dedup: (l_orderkey, l_linenumber) is not
        # unique in the synthetic lineitem table and the SQL oracle keeps
        # every raw row, so the index must too; uid rides as a stored
        # column for the has_parent identity join
        id_cols=(),
        keep_cols=("uid", "join_name", "routing", "score_cents"),
        target_partition_rows=8192,
        store_content=False,
    )
    return idx_dir


def q_has_child_orders(sf_dir: str):
    """ES ``has_child``: orders with ≥2 returned ('R') lineitems,
    score_mode=sum over the child's discounted revenue (integer cents ⇒
    combine-order independent), top 50 by (score desc, orderkey).

    Served FROM THE INDEX (round-4 verdict item 5): the orders+lineitem
    union corpus is routed by parent key (index/routing.py), and
    ``ShardedSearcher.has_child`` answers shard-locally — children are
    co-resident with their parents, so no per-query join shuffle (the ES
    join-field execution shape; the two-Dataset variant remains at
    stages/parentchild.py for un-indexed corpora)."""
    # the process-wide pool cache (0.25 CPU/actor) amortizes actor
    # spin-up + the cold coordinator across the gate sweep and the bench
    sh = sharded_searcher(_parentchild_index(sf_dir), n_shards=4)
    t = sh.has_child(
        "r", score_mode="sum", min_children=2, k=50, score_field="score_cents"
    )
    return pa.table(
        {
            "o_orderkey": t["routing"],
            "n_children": t["n_children"],
            "score": pc.divide(t["score"], pa.scalar(100.0)),
        }
    )


def q_has_parent_lines(sf_dir: str):
    """ES ``has_parent`` with score=true: lineitems of 1-URGENT orders,
    each child carrying the parent's o_totalprice as its relevance;
    top 50 by (score desc, orderkey, linenumber).

    Served FROM THE INDEX like :func:`q_has_child_orders`: the parent
    query runs as a fulltext match over the routed join-field index and
    each shard emits its own children complete (routing co-location).
    The (orderkey, linenumber) identity rides the docstore ``uid``
    column; the final deterministic tiebreak sort happens on the gathered
    (query-bounded) child set — the two-Dataset variant stays at
    stages/parentchild.py for un-indexed corpora."""
    idx = _parentchild_index(sf_dir)
    sh = sharded_searcher(idx, n_shards=4)
    t = sh.has_parent("urgent", score=True, score_field="score_cents", k=None)
    ids = t["child_doc_id"].to_numpy(zero_copy_only=False)
    # hydrate through the warm shard pool (ids route to their owning
    # shard) — a fresh Searcher(idx) here would re-open the whole index
    # cold on the driver for one uid fetch
    uid = sh.hydrate(np.sort(ids), columns=["doc_id", "uid"])
    key = pc.split_pattern(uid["uid"], "#")
    out = pa.table(
        {
            "doc_id": uid["doc_id"],
            "l_orderkey": pc.list_element(key, 0).cast(pa.int64()),
            "l_linenumber": pc.list_element(key, 1).cast(pa.int64()),
        }
    )
    order = np.argsort(ids, kind="stable")
    sid = ids[order]
    ssc = t["score"].to_numpy(zero_copy_only=False)[order] / 100.0
    rows = uid["doc_id"].to_numpy(zero_copy_only=False)
    score = ssc[np.searchsorted(sid, rows)]
    full = out.append_column("score", pa.array(score, pa.float64()))
    idxs = pc.sort_indices(
        full,
        sort_keys=[
            ("score", "descending"),
            ("l_orderkey", "ascending"),
            ("l_linenumber", "ascending"),
        ],
    )
    return full.take(idxs).slice(0, 50).select(["l_orderkey", "l_linenumber", "score"])


def q_children_by_priority(sf_dir: str):
    """ES terms agg on a parent field (o_orderpriority) with a nested
    ``children`` aggregation: lineitem count + revenue (cents) + avg
    extendedprice per parent bucket."""
    from elasticsearch_assets_ray.stages.parentchild import children_terms_agg

    parents = _rd(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    children = _rd(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    out = children_terms_agg(
        parents,
        children,
        parent_key="o_orderkey",
        child_key="l_orderkey",
        bucket_col="o_orderpriority",
        child_aggs=[
            AggSpec("n_children", "l_extendedprice", "count"),
            AggSpec("revenue_cents", "l_extendedprice", "sum_cents"),
            AggSpec("avg_price", "l_extendedprice", "mean_cents"),
        ],
        bucket_hint=5,
    )
    return _collect(out).sort_by([("o_orderpriority", "ascending")])


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def _nrows(sf_dir: str, table: str) -> int:
    """Free row count from the Parquet footer (group-count sizing hint)."""
    return pq.ParquetFile(_p(sf_dir, table)).metadata.num_rows


def q_exact_dedup(sf_dir: str):
    ds = _rd(sf_dir, "events", columns=["event_id", "props"])
    out = dedup_ops.exact_dedup(
        ds, "props", "event_id", n_rows_hint=_nrows(sf_dir, "events")
    )
    return out.select_columns(["event_id", "props"])


#: near-dup demo workload shape, shared by the pair pipelines, the cluster
#: pipeline's id universe, and the SQL oracles
_NEARDUP_N = 20
_NEARDUP_ID_OFFSET = 100000


def _docs_with_near_dups(sf_dir: str, n_dups: int = _NEARDUP_N) -> ray.data.Dataset:
    """documents ∪ deterministic mutated copies of the first ``n_dups``
    docs (id+offset, last ~10% of words dropped) — the near-dup workload
    for the LSH/simhash demos (the base corpus itself has no dups)."""
    t = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    head = t.slice(0, n_dups)
    texts = head["text"].to_pylist()
    mutated = []
    for s in texts:
        words = s.split(" ")
        mutated.append(" ".join(words[: max(1, int(len(words) * 0.9))]))
    dup = pa.table(
        {
            "doc_id": pc.add(head["doc_id"], pa.scalar(_NEARDUP_ID_OFFSET, pa.int64())),
            "text": pa.array(mutated, pa.string()),
        }
    )
    return ray.data.from_arrow(pa.concat_tables([t, dup]))


def q_minhash_pairs(sf_dir: str):
    ds = _docs_with_near_dups(sf_dir)
    return dedup_ops.minhash_lsh_dedup(
        ds, "text", "doc_id", num_perm=64, bands=16, shingle_k=3, threshold=0.5,
        n_rows_hint=_nrows(sf_dir, "documents") + _NEARDUP_N,
    )


def q_ngram_pairs(sf_dir: str):
    """Exact n-gram Jaccard self-join (prefix filtering — complete, no
    LSH approximation); same corpus/threshold as the minhash gate so the
    two operators' result sets are directly comparable."""
    ds = _docs_with_near_dups(sf_dir)
    return dedup_ops.ngram_jaccard_pairs(
        ds, "text", "doc_id", shingle_k=3, threshold=0.5,
        n_rows_hint=_nrows(sf_dir, "documents") + _NEARDUP_N,
    )


def q_neardup_clusters(sf_dir: str):
    """Keep-one-per-cluster: connected components over the MinHash pair
    graph, canonical = min doc_id (vectorized min-label propagation).
    The post-pair step an LLM training-data dedup actually applies."""
    pairs = q_minhash_pairs(sf_dir)
    head = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id"])
    dup_ids = pc.add(
        head.sort_by("doc_id").slice(0, _NEARDUP_N)["doc_id"],
        pa.scalar(_NEARDUP_ID_OFFSET, pa.int64()),
    )
    universe = pa.concat_arrays(
        [head["doc_id"].combine_chunks(), dup_ids.combine_chunks()]
    )
    return dedup_ops.neardup_components(pairs, universe)


#: shingle width for the ExactSubstr gate (token granularity; Lee et al.
#: use 50 BPE tokens at production scale — 8 keeps the synthetic corpus's
#: planted duplicated passages detectable without wiping natural text)
_EXACT_SUBSTR_K = 8


def q_exact_substr(sf_dir: str):
    """ExactSubstr dedup (Lee et al. 2107.06499): duplicated ≥k-token
    substrings REMOVED from every doc of the planted-duplicate corpus
    (documents ∪ mutated head copies share long prefixes — real spans to
    cut).  Output = per-doc cleaned token stream + removal counts."""
    out = dedup_ops.exact_substr_dedup(
        _docs_with_near_dups(sf_dir),
        text_col="text",
        id_col="doc_id",
        k=_EXACT_SUBSTR_K,
        n_rows_hint=_nrows(sf_dir, "documents") + _NEARDUP_N,
    )
    return _collect(out).sort_by([("doc_id", "ascending")])


def _exact_substr_sql() -> str:
    """Twin of q_exact_substr over the shared near-dup base CTE: same
    Horner shingles (HUGEINT mod 2^64), same coverage semantics, kept
    tokens re-joined with ' ' in position order."""
    from elasticsearch_assets_ray.pipelines import oracles_hard as _oh

    k = _EXACT_SUBSTR_K
    expr = "TH[i]"
    for p in range(1, k):
        expr = f"({expr} * {_oh.FNV} + TH[i+{p}]) % {_oh.M64}"
    return (
        f"WITH {_oh._near_dup_base_cte(_NEARDUP_N)}, "
        "tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS L "
        "FROM base), "
        f"thl AS (SELECT doc_id, L, list_transform(L, t -> {_oh._horner('t')}) AS TH "
        "FROM tl), "
        "sp AS (SELECT doc_id, unnest(ps) AS p, unnest(shs) AS sh FROM ("
        f"  SELECT doc_id, CASE WHEN len(TH) >= {k} THEN range(1, len(TH) - {k} + 2) "
        "   ELSE CAST([] AS BIGINT[]) END AS ps, "
        f"  CASE WHEN len(TH) >= {k} THEN list_transform(range(1, len(TH) - {k} + 2), "
        f"   i -> {expr}) ELSE CAST([] AS HUGEINT[]) END AS shs FROM thl)), "
        "cnt AS (SELECT sh, count(*) AS c FROM sp GROUP BY sh), "
        "dup AS (SELECT sp.doc_id, sp.p FROM sp JOIN cnt USING (sh) WHERE c >= 2), "
        "tok AS (SELECT doc_id, unnest(L) AS tok, "
        "  unnest(range(1, len(L) + 1)) AS i FROM tl), "
        "rem AS (SELECT DISTINCT t.doc_id, t.i FROM tok t JOIN dup d "
        f"  ON d.doc_id = t.doc_id AND t.i BETWEEN d.p AND d.p + {k} - 1), "
        "kept AS (SELECT t.doc_id, t.i, t.tok FROM tok t LEFT JOIN rem r "
        "  ON r.doc_id = t.doc_id AND r.i = t.i WHERE r.i IS NULL), "
        "ka AS (SELECT doc_id, count(*) AS kc, "
        "  string_agg(tok, ' ' ORDER BY i) AS txt FROM kept GROUP BY doc_id) "
        "SELECT th.doc_id, len(th.TH) AS n_tokens, "
        "len(th.TH) - coalesce(ka.kc, 0) AS n_removed, "
        "coalesce(ka.txt, '') AS clean_text "
        "FROM thl th LEFT JOIN ka ON ka.doc_id = th.doc_id ORDER BY th.doc_id"
    )


_LINE_SEG = 6  # fixed-window segment size for the line-dedup gate


def q_line_dedup(sf_dir: str):
    """RefinedWeb/C4-style line-level dedup (stages/linededup.py) over
    the planted-duplicate corpus, fixed 6-token segments (the synthetic
    docs have no newlines): any segment occurring in ≥2 distinct docs is
    boilerplate and is removed; each doc is rebuilt from its surviving
    segments in order.  One (segment, count) shuffle + a broadcast
    frequent set — text never crosses the wire twice."""
    from elasticsearch_assets_ray.stages.linededup import line_dedup

    out = line_dedup(
        _docs_with_near_dups(sf_dir),
        "text",
        "doc_id",
        min_docs=2,
        seg_tokens=_LINE_SEG,
    )
    return _collect(out).sort_by([("doc_id", "ascending")])


def _line_dedup_sql() -> str:
    """Twin of q_line_dedup: same fixed-window chunking via token
    ordinality, distinct-doc counts per chunk string, survivors
    re-joined in window order."""
    from elasticsearch_assets_ray.pipelines import oracles_hard as _oh

    s = _LINE_SEG
    return (
        f"WITH {_oh._near_dup_base_cte(_NEARDUP_N)}, "
        "tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS L "
        "FROM base), "
        "tok AS (SELECT doc_id, unnest(L) AS tok, "
        "unnest(range(1, len(L) + 1)) AS i FROM tl), "
        f"ch AS (SELECT doc_id, (i - 1) // {s} AS c, "
        "string_agg(tok, ' ' ORDER BY i) AS seg FROM tok GROUP BY doc_id, c), "
        "cnt AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM ch GROUP BY seg), "
        "keepc AS (SELECT ch.doc_id, ch.c, ch.seg FROM ch "
        "JOIN cnt USING (seg) WHERE nd < 2), "
        "tot AS (SELECT doc_id, count(*) AS nl FROM ch GROUP BY doc_id), "
        "ka AS (SELECT doc_id, count(*) AS kc, "
        "string_agg(seg, ' ' ORDER BY c) AS txt FROM keepc GROUP BY doc_id) "
        "SELECT b.doc_id, coalesce(t.nl, 0) AS n_lines, "
        "coalesce(t.nl, 0) - coalesce(ka.kc, 0) AS n_removed, "
        "coalesce(ka.txt, '') AS clean_text "
        "FROM (SELECT doc_id FROM base) b "
        "LEFT JOIN tot t USING (doc_id) LEFT JOIN ka USING (doc_id) "
        "ORDER BY b.doc_id"
    )


def q_simhash_pairs(sf_dir: str):
    ds = _docs_with_near_dups(sf_dir)
    return dedup_ops.simhash_near_dups(
        ds, "text", "doc_id", max_hamming=3,
        n_rows_hint=_nrows(sf_dir, "documents") + 20,
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_transform_pivot(sf_dir: str):
    """ES _transform API (pivot, CONTINUOUS mode): events pivoted to
    per-event_type (n, revenue, avg) through TWO checkpointed ticks —
    first the rows before the date midpoint, then the full table (only
    rows past the checkpoint fold) — proving the associative-partials
    dest gives bit-identical results to one batch run (the SQL twin is
    the plain full GROUP BY)."""
    import shutil

    from elasticsearch_assets_ray.stages.transform import PivotTransform

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    dest = os.path.join("/tmp", "esr_transform_cache", f"{tag}-events-pivot")
    shutil.rmtree(dest, ignore_errors=True)
    tr = PivotTransform(
        dest,
        ["event_type"],
        [
            AggSpec("n", "value", "count"),
            AggSpec("revenue_cents", "value", "sum_cents"),
            AggSpec("avg_value", "value", "mean_cents"),
        ],
        "ts",
        distinct_hint=16,
    )
    ds = _rd(sf_dir, "events", columns=["event_type", "value", "ts"])
    mid = pa.scalar(datetime(2024, 1, 15), pa.timestamp("us"))
    first = ds.map_batches(
        lambda b: b.filter(pc.less(b["ts"], mid)), batch_format="pyarrow"
    )
    tr.tick(first)
    assert tr.checkpoint() is not None
    tr.tick(ds)  # continuous: folds ONLY rows past the checkpoint
    return tr.result().sort_by([("event_type", "ascending")])


_TRANSFORM_PIVOT_SQL = (
    "SELECT event_type, count(*)::BIGINT AS n, "
    "sum(CAST(round(value * 100) AS BIGINT)) AS revenue_cents, "
    "(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0) "
    " / CAST(count(*) AS DOUBLE) AS avg_value "
    "FROM events GROUP BY event_type ORDER BY event_type"
)


#: EQL funnel: view -> click -> purchase within 7 days, per user
_EQL_STEPS = ("view", "click", "purchase")
_EQL_MAXSPAN_US = 7 * 86_400 * 1_000_000


def q_eql_funnel(sf_dir: str):
    """ES EQL ``sequence by user_id with maxspan=7d [view][click]
    [purchase]``: earliest span-bounded ordered chain per user (greedy
    earliest-next is optimal per start — stages/eql.py)."""
    from elasticsearch_assets_ray.stages.eql import eql_sequence

    ds = _rd(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def step(name: str):
        return lambda b: pc.equal(b["event_type"], pa.scalar(name))

    t = eql_sequence(
        ds,
        [step(n) for n in _EQL_STEPS],
        key_col="user_id",
        ts_col="ts",
        maxspan_us=_EQL_MAXSPAN_US,
    )
    return pa.table(
        {
            "user_id": t["k"],
            "t_start_us": t["t_start"],
            "t_end_us": t["t_end"],
            "span_us": pc.cast(
                pc.subtract(t["t_end"], t["t_start"]), pa.float64()
            ),
        }
    )


def _eql_funnel_sql() -> str:
    a, b, c = _EQL_STEPS
    return (
        f"WITH s1 AS (SELECT user_id AS k, epoch_us(ts) AS t FROM events "
        f"  WHERE event_type = '{a}'), "
        f"s2 AS (SELECT user_id AS k, epoch_us(ts) AS t FROM events "
        f"  WHERE event_type = '{b}'), "
        f"s3 AS (SELECT user_id AS k, epoch_us(ts) AS t FROM events "
        f"  WHERE event_type = '{c}'), "
        "c2 AS (SELECT s1.k, s1.t AS t1, min(s2.t) AS t2 FROM s1 "
        "  JOIN s2 ON s2.k = s1.k AND s2.t > s1.t GROUP BY s1.k, s1.t), "
        "c3 AS (SELECT c2.k, c2.t1, min(s3.t) AS t_end FROM c2 "
        "  JOIN s3 ON s3.k = c2.k AND s3.t > c2.t2 GROUP BY c2.k, c2.t1), "
        f"v AS (SELECT k, t1, t_end FROM c3 WHERE t_end - t1 <= {_EQL_MAXSPAN_US}), "
        "r AS (SELECT k, t1, t_end, "
        "  row_number() OVER (PARTITION BY k ORDER BY t1) AS rn FROM v) "
        "SELECT k AS user_id, t1 AS t_start_us, t_end AS t_end_us, "
        "CAST(t_end - t1 AS DOUBLE) AS span_us FROM r WHERE rn = 1 ORDER BY k"
    )


def q_downsample(sf_dir: str):
    """ES ``_downsample`` (TSDB rollup): events rolled up to fixed UTC-day
    buckets per event_type with the ES downsample metric set
    (count/min/max/sum) — the PivotTransform machinery with a derived
    time-bucket group key (a rollup IS a pivot whose key includes the
    truncated timestamp)."""
    import shutil

    from elasticsearch_assets_ray.stages.transform import PivotTransform

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    dest = os.path.join("/tmp", "esr_transform_cache", f"{tag}-events-downsample")
    shutil.rmtree(dest, ignore_errors=True)
    tr = PivotTransform(
        dest,
        ["event_type", "day"],
        [
            AggSpec("n", "value", "count"),
            AggSpec("vmin", "value", "min"),
            AggSpec("vmax", "value", "max"),
            AggSpec("sum_cents", "value", "sum_cents"),
        ],
        "ts",
        distinct_hint=5000,
    )
    ds = _rd(sf_dir, "events", columns=["event_type", "value", "ts"])

    def bucketed(b: pa.Table) -> pa.Table:
        return b.append_column(
            "day", pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))
        )

    tr.tick(ds.map_batches(bucketed, batch_format="pyarrow"))
    return tr.result().sort_by(
        [("event_type", "ascending"), ("day", "ascending")]
    )


_DOWNSAMPLE_SQL = (
    "SELECT event_type, date_trunc('day', ts) AS day, count(*)::BIGINT AS n, "
    "min(value) AS vmin, max(value) AS vmax, "
    "sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents "
    "FROM events GROUP BY event_type, day ORDER BY event_type, day"
)


_RANDOM_SAMPLER_P = 0.2
_RANDOM_SAMPLER_SALT = "rnds"


def q_random_sampler(sf_dir: str):
    """ES ``random_sampler`` aggregation: deterministic probability-p
    hash sample (splitmix64(horner(id:salt)) < p·2^64, the engine-wide
    sampling primitive) with metrics over the sample — a map_batches
    filter + combiner-first aggregation; sampled rows never leave the
    workers."""
    from elasticsearch_assets_ray.stages.sampling import _threshold, id_hash

    thr = _threshold(_RANDOM_SAMPLER_P)
    ds = _rd(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def samp(b: pa.Table) -> pa.Table:
        h = id_hash(b["doc_id"], _RANDOM_SAMPLER_SALT)
        t = b.filter(pa.array(h < thr))
        return pa.table(
            {
                "k": pa.nulls(t.num_rows, pa.int64()).fill_null(0),
                "n_chars": t["n_chars"],
            }
        )

    agg = partial_agg(
        ds.map_batches(samp, batch_format="pyarrow"),
        ["k"],
        [
            AggSpec("n_sampled", "n_chars", "count"),
            AggSpec("sum_nchars", "n_chars", "sum"),
        ],
        distinct_hint=1,
    )
    t = _collect(agg)
    return t.drop_columns(["k"])


def _random_sampler_sql() -> str:
    from elasticsearch_assets_ray.pipelines import oracles_hard as _oh
    from elasticsearch_assets_ray.stages.sampling import _threshold

    thr = int(_threshold(_RANDOM_SAMPLER_P))
    return (
        f"WITH {_oh._id_hash_ctes(_RANDOM_SAMPLER_SALT, ', n_chars')} "
        "SELECT count(*)::BIGINT AS n_sampled, sum(n_chars)::BIGINT AS sum_nchars "
        f"FROM hh WHERE h < CAST('{thr}' AS HUGEINT)"
    )


def q_token_stats(sf_dir: str):
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(lambda b: textstats.token_stats(b, "text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "token_count", "uniq_token_count", "char_count"])


def q_quality_stats(sf_dir: str):
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(lambda b: textstats.quality_stats(b, "text"), batch_format="pyarrow")
    return out.select_columns(
        ["doc_id", "n_words", "n_punct", "stopword_ratio", "punct_ratio", "mean_word_len"]
    )


def q_lang_stats(sf_dir: str):
    ds = _rd(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    stats = ds.map_batches(lambda b: textstats.token_stats(b, "text"), batch_format="pyarrow")
    agg = partial_agg(
        stats,
        ["lang"],
        [AggSpec("n_docs", "doc_id", "count"), AggSpec("avg_tokens", "token_count", "mean")],
        distinct_hint=64,  # languages
    )
    return agg


def q_lang_id(sf_dir: str):
    ds = _rd(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = ds.map_batches(
        textstats.LanguageID,
        fn_constructor_kwargs=dict(text_col="text"),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["doc_id", "lang", "pred_lang"])


def q_fingerprint(sf_dir: str):
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(lambda b: textstats.fingerprint(b, "text"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"])


# seed blocklist: the content fingerprints of every doc with
# doc_id % _BLOCK_MOD == _BLOCK_RESIDUE (a stand-in for an external
# contamination / opt-out list — small by construction)
_BLOCK_MOD, _BLOCK_RESIDUE = 37, 5


def q_blocklist_stats(sf_dir: str):
    """Bloom-filter blocklist membership by CONTENT fingerprint: a doc is
    blocked iff its rolling-hash fingerprint matches any seed doc's —
    exact-duplicate content of a blocked doc is blocked too.  The 100-TB
    shape: fingerprints are a 2-int-column byproduct of the scan, the
    seed set is tiny and becomes a broadcast Bloom filter probed inside
    ``map_batches``; no shuffle join anywhere."""
    from elasticsearch_assets_ray.stages.bloom import blocklist_flag

    fps = (
        _rd(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(lambda b: textstats.fingerprint(b, "text"), batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint"])
        .materialize()  # 2 int64 cols — tiny relative to the corpus
    )
    seeds = fps.map_batches(
        lambda b: b.filter(
            pa.array(
                b["doc_id"].to_numpy(zero_copy_only=False) % _BLOCK_MOD
                == _BLOCK_RESIDUE
            )
        ),
        batch_format="pyarrow",
    )
    seeds = _collect(seeds)  # the seed list is small by construction
    block = seeds["fingerprint"].to_numpy(zero_copy_only=False)
    out = blocklist_flag(fps, "fingerprint", block)
    return out.select_columns(["doc_id", "blocked"])


def _blocklist_sql() -> str:
    from elasticsearch_assets_ray.pipelines import oracles_hard

    return (
        f"WITH fps AS ({oracles_hard.fingerprint_sql()}) "
        "SELECT f.doc_id, CAST(f.fingerprint IN "
        f"(SELECT fingerprint FROM fps WHERE doc_id % {_BLOCK_MOD} = {_BLOCK_RESIDUE})"
        " AS BIGINT) AS blocked FROM fps f"
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_ANN_QUERY_IDS = [0, 1, 2]
_ANN_K = 5


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    mask = pc.is_in(t["vec_id"], value_set=pa.array(_ANN_QUERY_IDS, pa.int64()))
    qt = t.filter(mask)
    ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = sim_ops._matrix(qt["embedding"])
    order = np.argsort(ids)
    return ids[order], mat[order]


from elasticsearch_assets_ray.query.bm25 import (  # noqa: E402
    round_half_up as _round_half_up,
)


def _rerank_rounded(res: pa.Table, k: int) -> pa.Table:
    """Re-rank by (round(sim,9) desc, vec_id asc) and report round(sim,6)
    — the float-robust ranking contract shared with the SQL oracle.  The
    reported value is half-up round6 of the RAW sim (DuckDB ROUND parity;
    rounding the 9-rounded value would double-round)."""
    qid = res["query_id"].to_numpy(zero_copy_only=False)
    vid = res["vec_id"].to_numpy(zero_copy_only=False)
    sim_raw = res["sim"].to_numpy(zero_copy_only=False)
    sim = np.round(sim_raw, 9)
    order = np.lexsort((vid, -sim, qid))
    qid, vid, sim_raw = qid[order], vid[order], sim_raw[order]
    starts = np.concatenate(([True], qid[1:] != qid[:-1]))
    first_idx = np.flatnonzero(starts)
    grp = np.cumsum(starts) - 1
    rank = np.arange(len(qid)) - first_idx[grp] + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": pa.array(qid[keep].astype(np.int64)),
            "vec_id": pa.array(vid[keep].astype(np.int64)),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "sim_r": pa.array(_round_half_up(sim_raw[keep], 6)),
        }
    )


def q_embedding_topk(sf_dir: str):
    qids, qvecs = _query_vectors(sf_dir)
    ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    res = sim_ops.brute_force_topk(ds, qids, qvecs, k=_ANN_K + 45)
    return _rerank_rounded(res, _ANN_K)


def _probe_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Planted ANN probes: the embeddings of vec_id 0..2 shifted by +0.01
    per component.  Each probe's exact nearest neighbour is its source
    vector (cosine ≈ 1 vs ~0.3 background), which an LSH/IVF index finds
    with near-certainty — making the approximate paths exactly checkable
    against a brute-force SQL oracle (the same construction is expressible
    in SQL as ``list_transform(embedding, x -> x + 0.01)``)."""
    qids, qvecs = _query_vectors(sf_dir)
    return qids, qvecs + 0.01


def q_embedding_lsh_topk(sf_dir: str):
    """LSH ANN, oracle-checked via planted probes (top-1 retrieval)."""
    qids, qvecs = _probe_vectors(sf_dir)
    ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    res = sim_ops.lsh_topk(
        ds, qids, qvecs, dim=qvecs.shape[1], k=1, n_tables=8, n_planes=12
    )
    res = pa.table(
        {"query_id": res["query_id"], "vec_id": res["vec_id"], "sim": res["sim"]}
    )
    return _rerank_rounded(res, 1)


_IVF_CACHE: dict[str, str] = {}


def embeddings_ivf_index(sf_dir: str) -> str:
    """Cluster-partitioned IVF layout over the embeddings table (cached
    per sf_dir) — write once, prune every query."""
    if sf_dir in _IVF_CACHE:
        return _IVF_CACHE[sf_dir]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join("/tmp", "esr_ivf_cache", f"{tag}-embeddings")
    if not os.path.exists(os.path.join(out, "ivf.json")):
        ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        sim_ops.ivf_build(ds, out, n_centroids=16)
    _IVF_CACHE[sf_dir] = out
    return out


def q_embedding_ivf_topk(sf_dir: str):
    """IVF ANN over the PARTITIONED layout: only nprobe clusters' Parquet
    partitions are read (source pruning), oracle-checked via planted
    probes (top-1 retrieval)."""
    qids, qvecs = _probe_vectors(sf_dir)
    idx = embeddings_ivf_index(sf_dir)
    res = sim_ops.ivf_search(idx, qids, qvecs, k=1, nprobe=4)
    res = pa.table(
        {"query_id": res["query_id"], "vec_id": res["vec_id"], "sim": res["sim"]}
    )
    return _rerank_rounded(res, 1)


def q_embedding_pq_topk(sf_dir: str):
    """Product-quantization ANN: ADC candidate generation over uint8 codes
    (m=8 subspaces × 16 centroids → 8 bytes/vector instead of 256) then
    exact-cosine rerank of only the candidates — oracle-checked via
    planted probes (top-1 retrieval, same brute-force SQL as LSH/IVF)."""
    qids, qvecs = _probe_vectors(sf_dir)
    ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cands = sim_ops.pq_topk(ds, qids, qvecs, k=10, m=8, ksub=16)
    res = sim_ops.exact_rerank(
        _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        cands, qids, qvecs, k=1,
    )
    res = pa.table(
        {"query_id": res["query_id"], "vec_id": res["vec_id"], "sim": res["sim"]}
    )
    return _rerank_rounded(res, 1)


def _vectors_attached_index(sf_dir: str) -> str:
    """documents_index with the embeddings table attached as the ES
    dense_vector sidecar (index/vectors.py) — idempotent per cache dir."""
    idx = documents_index(sf_dir)
    from elasticsearch_assets_ray.index.vectors import attach_vectors

    ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    attach_vectors(ds, idx)
    return idx


def q_embedding_knn(sf_dir: str):
    """ES `knn` search served FROM the index through the doc-partitioned
    scatter-gather path: each shard actor scores only ITS resident
    vector parts (exact cosine), coordinator merge is exact.  Planted
    probes, top-1, same brute-force SQL oracle as the ANN family."""
    qids, qvecs = _probe_vectors(sf_dir)
    idx = _vectors_attached_index(sf_dir)
    sh = sharded_searcher(idx)
    res = sh.knn(qids, qvecs, k=1)
    ids = res["doc_id"].to_numpy(zero_copy_only=False)
    res = pa.table(
        {
            "query_id": res["query_id"],
            "vec_id": pa.array(_orig_ids(sh.coord, ids)),
            "sim": res["sim"],
        }
    )
    return _rerank_rounded(res, 1)


#: ES knn `similarity` cutoff for the gate (cuts inside the probes' top-10)
_KNN_SIM_THRESHOLD = 0.29


def q_embedding_knn_sim(sf_dir: str):
    """ES kNN with the ``similarity`` cutoff: top-10 per planted probe,
    hits below round9(sim) ≥ threshold dropped (a per-row predicate —
    identical through the scatter-gather merge)."""
    qids, qvecs = _probe_vectors(sf_dir)
    idx = _vectors_attached_index(sf_dir)
    sh = sharded_searcher(idx)
    res = sh.knn(qids, qvecs, k=10, similarity=_KNN_SIM_THRESHOLD)
    ids = res["doc_id"].to_numpy(zero_copy_only=False)
    res = pa.table(
        {
            "query_id": res["query_id"],
            "vec_id": pa.array(_orig_ids(sh.coord, ids)),
            "sim": res["sim"],
        }
    )
    return _rerank_rounded(res, 10)


def q_embedding_knn_filtered(sf_dir: str):
    """ES FILTERED kNN (the `knn.filter` clause): candidates restricted
    to the score-free match set of a fulltext filter, per shard, before
    any cosine — docs without the term never touch the vector math."""
    qids, qvecs = _probe_vectors(sf_dir)
    idx = _vectors_attached_index(sf_dir)
    sh = sharded_searcher(idx)
    res = sh.knn(qids, qvecs, k=3, filter_query="data")
    ids = res["doc_id"].to_numpy(zero_copy_only=False)
    res = pa.table(
        {
            "query_id": res["query_id"],
            "vec_id": pa.array(_orig_ids(sh.coord, ids)),
            "sim": res["sim"],
        }
    )
    return _rerank_rounded(res, 3)


def q_embedding_dedup(sf_dir: str):
    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    head = t.slice(0, 10)
    dup = pa.table(
        {
            "vec_id": pc.add(head["vec_id"], pa.scalar(100000, pa.int64())),
            "embedding": head["embedding"],
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup]))
    dim = len(t["embedding"][0])
    pairs = sim_ops.embedding_cosine_dedup(
        ds, dim=dim, threshold=0.99, n_rows_hint=t.num_rows + 10
    )
    if pairs.num_rows == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "sim_r": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "id_a": pairs["id_a"],
            "id_b": pairs["id_b"],
            "sim_r": pa.array(
                _round_half_up(pairs["sim"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


# ---------------------------------------------------------------------------
# fulltext search (the flagship)
# ---------------------------------------------------------------------------


def _orig_ids(s: Searcher, ids: np.ndarray) -> np.ndarray:
    """Internal docIDs → the documents table's orig_doc_id (pid-pruned
    hydrate of just the id pair)."""
    orig = s.hydrate(ids, columns=["doc_id", "orig_doc_id"])
    m = dict(
        zip(
            orig["doc_id"].to_numpy(zero_copy_only=False),
            orig["orig_doc_id"].to_numpy(zero_copy_only=False),
        )
    )
    return np.array([m[i] for i in ids], dtype=np.int64)


def _search_many(
    sf_dir: str,
    queries: list[str],
    k: int,
    fetch_k: int,
    index_dir: str | None = None,
    msm: list[int] | None = None,
    searcher=None,
) -> pa.Table:
    idx = index_dir or documents_index(sf_dir)
    s = searcher if searcher is not None else Searcher(idx)
    parts = []
    for qid, q in enumerate(queries):
        res = s.search(
            q, k=fetch_k, minimum_should_match=msm[qid] if msm else 0
        )
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(s, ids)),
                    "sim": res["score"],
                }
            )
        )
    if not parts:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "score_r": pa.array([], pa.float64())}
        )
    res = _rerank_rounded(pa.concat_tables(parts), k)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def q_search_topk(sf_dir: str):
    return _search_many(sf_dir, DOC_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_sharded(sf_dir: str):
    """DOC_QUERIES through the doc-partitioned scatter-gather serving
    path (query/sharded.py): 4 bucket-range shard ACTORS each holding
    1/4 of the postings, dfs_query_then_fetch global df, coordinator
    top-k merge — the native analog of the reference's N-shard ES search
    (ElasticsearchReaderClient.ts:53-86).  Rank/score-identical to
    q_search_topk by construction; the oracle is the same BM25 SQL."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    return _search_many(
        sf_dir, DOC_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90, searcher=sh
    )


_CCS_CACHE: dict[str, tuple[str, str]] = {}


def ccs_documents_indexes(sf_dir: str) -> tuple[str, str]:
    """Two INDEPENDENT indexes over an orig-doc_id parity split of the
    documents table (cached+resumable like documents_index) — the
    two-remote-cluster topology for the CCS gate."""
    if sf_dir in _CCS_CACHE:
        return _CCS_CACHE[sf_dir]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out: list[str] = []
    full = pq.read_table(_p(sf_dir, "documents"))
    for half in (0, 1):
        src = os.path.join("/tmp", "esr_index_cache", f"{tag}-ccs{half}-src")
        idx = os.path.join("/tmp", "esr_index_cache", f"{tag}-ccs{half}-v1")
        os.makedirs(src, exist_ok=True)
        part_file = os.path.join(src, "documents.parquet")
        if not os.path.exists(part_file):
            mask = pc.equal(
                pc.bit_wise_and(full["doc_id"], pa.scalar(1, pa.int64())),
                pa.scalar(half, pa.int64()),
            )
            pq.write_table(full.filter(mask), part_file)
        build_index(
            part_file,
            idx,
            config=IndexConfig(
                content_col="text",
                id_cols=("doc_id",),
                keep_cols=("lang", "source", "n_chars"),
                store_content=True,
                index_positions=True,
            ),
        )
        out.append(idx)
    _CCS_CACHE[sf_dir] = (out[0], out[1])
    return _CCS_CACHE[sf_dir]


def _search_many_ccs(sf_dir: str, queries: list[str]) -> pa.Table:
    """_search_many through the cross-cluster federation (shared by the
    plain and wildcard-expansion CCS gates)."""
    from elasticsearch_assets_ray.query.ccs import CrossClusterSearcher

    a, b = ccs_documents_indexes(sf_dir)
    ccs = CrossClusterSearcher({"east": a, "west": b})
    members = {"east": ccs.members[0], "west": ccs.members[1]}
    parts = []
    fetch_k = SEARCH_K + 90
    for qid, q in enumerate(queries):
        res = ccs.search(q, k=fetch_k)
        if res.num_rows == 0:
            continue
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        cl = res["cluster"].to_pylist()
        orig = np.empty(ids.size, dtype=np.int64)
        for name, s in members.items():
            sel = np.flatnonzero(np.array([c == name for c in cl]))
            if sel.size:
                orig[sel] = _orig_ids(s, ids[sel])
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(orig),
                    "sim": res["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def q_search_ccs(sf_dir: str):
    """DOC_QUERIES federated across TWO independent half-corpus indexes
    via cross-cluster search (query/ccs.py): combined n_docs/avgdl from
    the member manifests' integer totals, per-term df summed across
    clusters (the minimize_roundtrips=false dfs contract), per-cluster
    top-k merged on the round-9 rule.  The oracle is the SAME full-table
    BM25 SQL as search_topk — rank identity across the cluster boundary
    is the assertion."""
    return _search_many_ccs(sf_dir, DOC_QUERIES)


def q_search_ccs_wild(sf_dir: str):
    """WILDCARD_QUERIES through the federation: multi-term clauses
    expand against the UNION of the member term dictionaries
    (query/ccs._UnionExpander) — the oracle is the same full-table
    wildcard BM25 SQL as search_wildcard."""
    return _search_many_ccs(sf_dir, WILDCARD_QUERIES)


_RESHARD_CACHE: dict[str, str] = {}


def resharded_documents_index(sf_dir: str) -> str:
    """documents index re-sharded (index/reshard.py — the ES _split
    analog): runs_per_bucket 32→8 and num_shards 32→16, postings decoded
    and re-bucketed WITHOUT re-tokenization.  Cached like the base
    index."""
    if sf_dir in _RESHARD_CACHE:
        return _RESHARD_CACHE[sf_dir]
    from elasticsearch_assets_ray.index.reshard import reshard_index

    src = documents_index(sf_dir)
    out = src + "-resharded-v1"
    if not os.path.exists(os.path.join(out, "manifest.json")):
        reshard_index(src, out, num_shards=16, runs_per_bucket=8)
    _RESHARD_CACHE[sf_dir] = out
    return out


def q_search_resharded(sf_dir: str):
    """DOC_QUERIES[:4] served from the RESHARDED index through the
    scatter-gather path — the driver-checked proof that a _split/_shrink
    layout change is invisible to results (same BM25 oracle)."""
    idx = resharded_documents_index(sf_dir)
    sh = sharded_searcher(idx)
    return _search_many(
        sf_dir, DOC_QUERIES[:4], SEARCH_K, fetch_k=SEARCH_K + 90, searcher=sh
    )


ANALYZED_QUERIES: list[str] = [
    # stopwords drop; "tables" conflates with "table" across the corpus
    "the tables merge scan",
    # query-side stem "queries"→"query" matches both surface forms
    "queries batch stream",
    # "batches"→"batche" matches ONLY the pluralized (odd) docs
    "a batches key value",
    # "windows"→"window" conflates against the raw corpus token
    "windows data join",
]


def q_search_analyzed(sf_dir: str):
    """BM25 over the ANALYZED index (stop + S-stemmer token filters,
    stages/analysis.py), served through the doc-partitioned
    scatter-gather path — the coordinator analyzes each query string
    through the index's own chain (Searcher._q), so plural queries and
    plural documents conflate to one stem.  The oracle replicates the
    exact filter chain in SQL (AnalyzerSpec.sql_term_expr /
    sql_keep_expr) over the same deterministically-pluralized corpus."""
    idx = analyzed_documents_index(sf_dir)
    sh = sharded_searcher(idx)
    return _search_many(
        sf_dir, ANALYZED_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90, searcher=sh
    )


_HYBRID_W = 20  # per-list rank window for RRF
_HYBRID_K = 10


def q_semdedup(sf_dir: str):
    """SemDeDup (arXiv:2303.09540): k-means partitions the embedding
    space, within-cluster blocked cosine sweep.  Planted EXACT copies
    (identical vectors ⇒ identical cluster assignment, so recall on the
    gate set is provably complete) against the same brute-force SQL
    oracle as the LSH-bucketed dedup."""
    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    head = t.slice(0, 10)
    dup = pa.table(
        {
            "vec_id": pc.add(head["vec_id"], pa.scalar(100000, pa.int64())),
            "embedding": head["embedding"],
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup]))
    pairs = sim_ops.semdedup(ds, threshold=0.99, n_centroids=8, n_iters=4)
    if pairs.num_rows == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "sim_r": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "id_a": pairs["id_a"],
            "id_b": pairs["id_b"],
            "sim_r": pa.array(
                _round_half_up(pairs["sim"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


def q_collapse_inner(sf_dir: str):
    """ES collapse + inner_hits: top-5 collapsed `source` groups each
    expanded to their top-3 hits, served distributed (composes the two
    distributed primitives — collapse winners + per-bucket top_hits)."""
    sh = sharded_searcher(documents_index(sf_dir))
    r = sh.collapse_inner_hits("spark table merge", k=5, collapse="source", inner_n=3)
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "value": r["value"],
            "group_rank": r["group_rank"],
            "inner_rank": r["inner_rank"],
            "doc_id": pa.array(
                _orig_ids(sh.coord, ids) if ids.size else np.array([], dtype=np.int64)
            ),
            "score_r": pa.array(
                _round_half_up(r["score"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


def _collapse_inner_sql(k: int, n: int) -> str:
    return (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q(term) AS (VALUES ('merge'), ('spark'), ('table')), "
        "scored AS (SELECT tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY tf.doc_id), "
        "g AS (SELECT sc.doc_id, sc.score, d.source AS value FROM scored sc "
        " JOIN documents d ON d.doc_id = sc.doc_id WHERE d.source IS NOT NULL), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY value "
        " ORDER BY round(score, 9) DESC, doc_id) AS inner_rank FROM g), "
        "w AS (SELECT value, doc_id AS wdoc, score AS wscore FROM r WHERE inner_rank = 1), "
        "gr AS (SELECT value, row_number() OVER (ORDER BY round(wscore, 9) DESC, wdoc) "
        " AS group_rank FROM w) "
        "SELECT r.value, gr.group_rank, r.inner_rank, r.doc_id, "
        "round(r.score, 6) AS score_r "
        "FROM r JOIN gr ON gr.value = r.value "
        f"WHERE gr.group_rank <= {k} AND r.inner_rank <= {n}"
    )


def q_hybrid_rrf(sf_dir: str):
    """ES 8.x hybrid search (`rrf` retriever): BM25 top-W for the first 3
    DOC_QUERIES + exact-cosine top-W for the planted probe vectors, fused
    by reciprocal-rank fusion (query/hybrid.py).  Both input rankings are
    the round-9-contract rankings already pinned by the search_topk and
    embedding ANN gates, so the fused ranking is exactly SQL-checkable."""
    from elasticsearch_assets_ray.query.hybrid import rrf_fuse

    queries = DOC_QUERIES[:3]
    bm = _search_many(sf_dir, queries, _HYBRID_W, fetch_k=_HYBRID_W + 90)
    qids, qvecs = _probe_vectors(sf_dir)
    ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    co = _rerank_rounded(
        sim_ops.brute_force_topk(ds, qids, qvecs, k=_HYBRID_W + 45), _HYBRID_W
    )
    fused = rrf_fuse([bm, co], k=_HYBRID_K, id_cols=["doc_id", "vec_id"])
    return pa.table(
        {
            "query_id": fused["query_id"],
            "doc_id": fused["doc_id"],
            "rank": fused["rank"],
            "score_r": pa.array(
                _round_half_up(fused["rrf"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


#: linear-retriever weights (bm25, knn)
_LINEAR_W = (0.7, 0.3)


def q_hybrid_linear(sf_dir: str):
    """ES 8.18 `linear` retriever: BM25 + kNN rankings min-max
    normalized per query over their rank windows and combined as
    0.7·bm25 + 0.3·knn (query/hybrid.linear_fuse); normalization runs
    over the ROUND-6 reported scores so the SQL twin is exact."""
    from elasticsearch_assets_ray.query.hybrid import linear_fuse

    queries = DOC_QUERIES[:3]
    bm = _search_many(sf_dir, queries, _HYBRID_W, fetch_k=_HYBRID_W + 90)
    qids, qvecs = _probe_vectors(sf_dir)
    ds = _rd(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    co = _rerank_rounded(
        sim_ops.brute_force_topk(ds, qids, qvecs, k=_HYBRID_W + 45), _HYBRID_W
    )
    fused = linear_fuse(
        [bm, co],
        weights=list(_LINEAR_W),
        k=_HYBRID_K,
        id_cols=["doc_id", "vec_id"],
        score_cols=["score_r", "sim_r"],
    )
    return pa.table(
        {
            "query_id": fused["query_id"],
            "doc_id": fused["doc_id"],
            "rank": fused["rank"],
            "score_r": pa.array(
                _round_half_up(fused["fused"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    )


_SYN_QUERIES: list[tuple[str, dict[str, list[str]]]] = [
    ("fast scan", {"fast": ["slow"], "scan": ["filter"]}),
    ("merge join", {"merge": ["join"]}),
    ("window agg", {"agg": ["group", "sort"]}),
]


def q_search_synonyms(sf_dir: str):
    """Lucene SynonymQuery (ES query-time synonym_graph): each query
    term + synonyms scores as ONE pseudo-term (tf = Σ member tfs BEFORE
    saturation, idf from max member df) — NOT a plain OR.  Served
    distributed: coordinator injects global member dfs, shard scores are
    bit-identical, merge via the shared comparator."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    parts = []
    for qid, (q, syn) in enumerate(_SYN_QUERIES):
        res = sh.search_synonyms(q, syn, k=SEARCH_K + 90)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh.coord, ids)),
                    "sim": res["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _synonym_sql(k: int) -> str:
    """SynonymQuery oracle: the _bm25_sql stats CTEs with group-level
    (max df, summed tf) scoring."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    values = []
    for qid, (q, syn) in enumerate(_SYN_QUERIES):
        for base in sorted(set(tokenize_text(q))):
            for m in sorted({base, *syn.get(base, ())}):
                values.append(f"({qid}, '{base}', '{m}')")
    vals = ", ".join(values)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), q(query_id, grp, term) AS (VALUES {vals}),
gdf AS (
  SELECT q.query_id, q.grp, max(df.df) AS df
  FROM q JOIN df USING (term) GROUP BY q.query_id, q.grp
), gtf AS (
  SELECT q.query_id, q.grp, tf.doc_id, sum(tf.tf) AS tf
  FROM q JOIN tf ON tf.term = q.term GROUP BY q.query_id, q.grp, tf.doc_id
), scored AS (
  SELECT g.query_id, g.doc_id,
         sum( ln(1 + (s.n - gd.df + 0.5) / (gd.df + 0.5))
              * (g.tf * 2.2) / (g.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score
  FROM gtf g
  JOIN gdf gd ON gd.query_id = g.query_id AND gd.grp = g.grp
  JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN stats s
  GROUP BY g.query_id, g.doc_id
)
SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id) AS rank,
       round(score, 6) AS score_r
FROM scored
QUALIFY rank <= {k}
"""


_DECAY_SPECS = [
    # (kind, query, origin, scale, offset, decay) over n_chars
    ("gauss", DOC_QUERIES[0], 300.0, 100.0, 0.0, 0.5),
    ("exp", DOC_QUERIES[1], 200.0, 150.0, 20.0, 0.5),
    ("linear", DOC_QUERIES[2], 400.0, 200.0, 0.0, 0.5),
]


def q_decay_score(sf_dir: str):
    """ES function_score DECAY functions (gauss/exp/linear over a stored
    numeric column), served distributed: the multiplier is per-doc, so
    shard-local top-k merges are exact."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    parts = []
    for qid, (kind, q, origin, scale, offset, dec) in enumerate(_DECAY_SPECS):
        r = sh.decay_score(
            q, "n_chars", kind, origin, scale,
            offset=offset, decay=dec, k=SEARCH_K + 90,
        )
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh.coord, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _decay_sql(k: int) -> str:
    from elasticsearch_assets_ray.query.engine import decay_sql_expr

    values = ", ".join(
        f"({qid}, '{t}')"
        for qid, (_, q, *_r) in enumerate(_DECAY_SPECS)
        for t in sorted(set(q.split()))
    )
    cases = " ".join(
        f"WHEN sc.query_id = {qid} THEN "
        + decay_sql_expr(kind, "COALESCE(d.n_chars, 0)", origin, scale, offset, dec)
        for qid, (kind, _q, origin, scale, offset, dec) in enumerate(_DECAY_SPECS)
    )
    return (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {values}), "
        "scored AS (SELECT q.query_id, tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        f"fs AS (SELECT sc.query_id, sc.doc_id, sc.score * (CASE {cases} END) AS total "
        " FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id) "
        "SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY round(total, 9) DESC, doc_id) AS rank, "
        "round(total, 6) AS score_r "
        f"FROM fs QUALIFY rank <= {k}"
    )


_RANDOM_SEED = "rs4"
_RANDOM_QUERIES = [DOC_QUERIES[0], DOC_QUERIES[4], DOC_QUERIES[5]]


def q_random_score(sf_dir: str):
    """ES function_score ``random_score`` (seeded): BM25 × a per-doc
    uniform variate derived from splitmix64(horner(f"{id}:{seed}")),
    served distributed (per-doc multiplier ⇒ exact shard merges).  The
    SQL twin REBUILDS the variate with the HUGEINT uint64 emulation, so
    the hash itself is value-checked, not just the ranking."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    parts = []
    for qid, q in enumerate(_RANDOM_QUERIES):
        r = sh.random_score(q, seed=_RANDOM_SEED, k=SEARCH_K + 90, id_field="orig_doc_id")
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh.coord, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _random_sql(k: int) -> str:
    """BM25 skeleton (shared with _decay_sql) × the splitmix64 variate:
    u = CAST(h // 2^11 AS DOUBLE) / 2^53 — both divisions exact."""
    from elasticsearch_assets_ray.pipelines.oracles_hard import _id_hash_ctes

    values = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in enumerate(_RANDOM_QUERIES)
        for t in sorted(set(q.split()))
    )
    return (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        f"q(query_id, term) AS (VALUES {values}), "
        "scored AS (SELECT q.query_id, tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        + _id_hash_ctes(_RANDOM_SEED)
        + ", fs AS (SELECT sc.query_id, sc.doc_id, "
        "sc.score * (CAST(hh.h // 2048 AS DOUBLE) / 9007199254740992.0) AS total "
        " FROM scored sc JOIN hh ON hh.doc_id = sc.doc_id) "
        "SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id ORDER BY round(total, 9) DESC, doc_id) AS rank, "
        "round(total, 6) AS score_r "
        f"FROM fs QUALIFY rank <= {k}"
    )


_SORT_QUERIES = [
    ("data", "n_chars", True),
    ("spark", "n_chars", False),
    ("join value", "n_chars", True),
]

# ES runtime field (runtime_mappings): ln(1 + n_chars), registered once
# at import — queryable with NO reindex anywhere a stored numeric field
# is.  np.log(1.0 + v) and DuckDB ln(1 + n_chars) hit the same libm log
# on the same exact double (n_chars ints < 2^53), so values hash-match.
register_runtime_field("log_chars", "n_chars", lambda v: np.log(1.0 + v))

_RUNTIME_SORT_QUERIES = [("merge", True), ("fast data", False)]


def q_runtime_sort(sf_dir: str):
    """ES runtime-field sort: sort_by_field over the query-time
    ``log_chars`` runtime field (distributed, score-free — the script
    runs shard-side on the gathered base column)."""
    sh = sharded_searcher(documents_index(sf_dir))
    parts = []
    for qid, (q, desc) in enumerate(_RUNTIME_SORT_QUERIES):
        res = sh.sort_by_field(q, "log_chars", k=SEARCH_K, desc=desc)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "doc_id": pa.array(_orig_ids(sh.coord, ids)),
                    "rank": pa.array(np.arange(1, ids.size + 1, dtype=np.int64)),
                    "score_r": pa.array(
                        _round_half_up(res["value"].to_numpy(zero_copy_only=False), 6)
                    ),
                }
            )
        )
    return pa.concat_tables(parts)


def _runtime_sort_sql() -> str:
    arms = []
    for qid, (q, desc) in enumerate(_RUNTIME_SORT_QUERIES):
        match = " OR ".join(
            f"list_contains({_TOK}, '{t}')" for t in sorted(set(q.split()))
        )
        order = "DESC" if desc else "ASC"
        arms.append(
            f"SELECT {qid} AS query_id, doc_id, "
            f"row_number() OVER (ORDER BY ln(1 + n_chars) {order}, doc_id) AS rank, "
            f"round(ln(1 + n_chars), 6) AS score_r "
            f"FROM documents WHERE {match} QUALIFY rank <= {SEARCH_K}"
        )
    return " UNION ALL ".join(arms)


def q_sort_search(sf_dir: str):
    """ES field-sorted search (sort: [{field: order}]), distributed AND
    score-free: each shard walks its match ids without BM25 arithmetic,
    reads the sort column for just those docs (pid-pruned), returns a
    local (value, docID) top-k; the coordinator merge is exact."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    parts = []
    for qid, (q, field, desc) in enumerate(_SORT_QUERIES):
        res = sh.sort_by_field(q, field, k=SEARCH_K, desc=desc)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "doc_id": pa.array(_orig_ids(sh.coord, ids)),
                    "rank": pa.array(np.arange(1, ids.size + 1, dtype=np.int64)),
                    "score_r": pa.array(
                        _round_half_up(res["value"].to_numpy(zero_copy_only=False), 6)
                    ),
                }
            )
        )
    return pa.concat_tables(parts)


def _sort_search_sql() -> str:
    arms = []
    for qid, (q, field, desc) in enumerate(_SORT_QUERIES):
        toks = sorted(set(q.split()))
        match = " OR ".join(
            f"list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), '{t}')"
            for t in toks
        )
        order = "DESC" if desc else "ASC"
        arms.append(
            f"SELECT {qid} AS query_id, doc_id, "
            f"row_number() OVER (ORDER BY {field} {order}, doc_id) AS rank, "
            f"round(CAST({field} AS DOUBLE), 6) AS score_r "
            f"FROM documents WHERE {match} QUALIFY rank <= {SEARCH_K}"
        )
    return " UNION ALL ".join(arms)


#: (query, desc) per query_id for the top_metrics gate
_TOP_METRICS_QUERIES = [("data", True), ("spark join", False)]


def q_top_metrics(sf_dir: str):
    """ES ``top_metrics`` aggregation: the metric columns (lang, source)
    of the top-3 docs by n_chars over each query's match set, served
    DISTRIBUTED (exact score-free sort merge + routed hydrate of just
    the winners)."""
    sh = sharded_searcher(documents_index(sf_dir))
    parts = []
    for qid, (q, desc) in enumerate(_TOP_METRICS_QUERIES):
        t = sh.top_metrics(
            q, "n_chars", ["orig_doc_id", "lang", "source"], size=3, desc=desc
        )
        n = t.num_rows
        if n == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(n, qid, dtype=np.int64)),
                    "doc_id": t["orig_doc_id"].cast(pa.int64()),
                    "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                    "lang": t["lang"],
                    "source": t["source"],
                    "sort_r": pa.array(
                        _round_half_up(
                            t["sort_value"].to_numpy(zero_copy_only=False), 6
                        )
                    ),
                }
            )
        )
    return pa.concat_tables(parts)


def _top_metrics_sql() -> str:
    arms = []
    for qid, (q, desc) in enumerate(_TOP_METRICS_QUERIES):
        match = " OR ".join(
            f"list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), '{t}')"
            for t in sorted(set(q.split()))
        )
        order = "DESC" if desc else "ASC"
        arms.append(
            f"SELECT {qid} AS query_id, doc_id, "
            f"row_number() OVER (ORDER BY n_chars {order}, doc_id) AS rank, "
            "lang, source, round(CAST(n_chars AS DOUBLE), 6) AS sort_r "
            f"FROM documents WHERE {match} QUALIFY rank <= 3"
        )
    return " UNION ALL ".join(arms)


_CARD_QUERIES = ["data", "spark join", "merge"]


def q_cardinality_agg(sf_dir: str):
    """ES `cardinality` aggregation, distributed and EXACT: per shard
    the wire carries the distinct values of the field over ITS match
    set (the value_counts partial), never the matches; the merged
    distinct count is exact.  ES itself returns an HLL++ approximation
    — stages/sketch.py is our sketch swap at unbounded cardinality."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    return pa.table(
        {
            "value": pa.array(_CARD_QUERIES, pa.string()),
            "count": pa.array(
                [sh.cardinality(q, "n_chars") for q in _CARD_QUERIES], pa.int64()
            ),
        }
    )


def q_missing_global_agg(sf_dir: str):
    """ES `missing` + `value_count` + `global` aggregations, distributed:
    missing/value_count ship TWO INTS per shard over its match set (one
    column read serves both); the global bucket (terms sub-agg over ALL
    docs, deliberately escaping the query scope) merges per-shard value
    counts — doc-partitioned shards make the partials disjoint.  The
    documents table has no nulls, so the driver gate pins missing == 0
    and value_count == match cardinality end-to-end; the genuine null
    path is pinned by tests/test_aggs.py over the half-null corpus."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    miss, vc = sh.missing_value_counts("spark table", "lang")
    gf = sh.global_facet("lang")
    vals = ["missing:lang", "value_count:lang"] + [
        f"global:{v}" for v in gf["value"].to_pylist()
    ]
    cnts = [miss, vc] + gf["count"].to_pylist()
    return pa.table(
        {"value": pa.array(vals, pa.string()), "count": pa.array(cnts, pa.int64())}
    )


def _missing_global_sql() -> str:
    match = " OR ".join(
        f"list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), '{t}')"
        for t in ("spark", "table")
    )
    return (
        f"WITH m AS (SELECT sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT"
        f" AS miss, count(lang)::BIGINT AS vc FROM documents WHERE {match}) "
        "SELECT 'missing:lang' AS value, miss AS count FROM m "
        "UNION ALL SELECT 'value_count:lang', vc FROM m "
        "UNION ALL SELECT 'global:' || lang, count(*)::BIGINT FROM documents "
        "WHERE lang IS NOT NULL GROUP BY lang"
    )


def _cardinality_sql() -> str:
    arms = []
    for q in _CARD_QUERIES:
        match = " OR ".join(
            f"list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), '{t}')"
            for t in sorted(set(q.split()))
        )
        arms.append(
            f"SELECT '{q}' AS value, count(DISTINCT n_chars) AS count "
            f"FROM documents WHERE {match}"
        )
    return " UNION ALL ".join(arms)


def q_fulltext_count(sf_dir: str):
    """ES `count` analog, distributed AND score-free: each shard counts
    its local match set from decoded postings + filter masks without any
    BM25 arithmetic (Searcher.match_ids), coordinator sums K integers."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    qids = np.arange(len(DOC_QUERIES), dtype=np.int64)
    cnts = np.array([sh.count(q) for q in DOC_QUERIES], dtype=np.int64)
    return pa.table({"query_id": pa.array(qids), "cnt": pa.array(cnts)})


def q_search_boolean(sf_dir: str):
    return _search_many(sf_dir, BOOLEAN_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_prefix(sf_dir: str):
    """Trailing-star prefix queries expanded against the term dictionary
    (the Lucene query_string wildcard surface)."""
    return _search_many(sf_dir, PREFIX_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_fuzzy(sf_dir: str):
    """Fuzzy `term~N` queries: length-banded vectorized Levenshtein over
    the term dictionary, expansion terms scored individually (Lucene's
    scoring rewrite; plain-Levenshtein divergence documented in
    query/expand.py — matches DuckDB's levenshtein())."""
    return _search_many(sf_dir, FUZZY_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


FUZZY_OSA_QUERIES: list[str] = [
    # each typo is ONE adjacent transposition (Damerau distance 1,
    # plain Levenshtein 2) — invisible to the plain-fuzzy path at ~1
    "sprak~1 scan",
    "tabel~1 key",
    "megre~1 +row",
]


def q_search_fuzzy_osa(sf_dir: str):
    """ES ``fuzzy_transpositions`` (the ES DEFAULT fuzzy metric): fuzzy
    clauses expand by Damerau-Levenshtein — vectorized plain-Levenshtein
    prefilter at 2n (complete superset: DL ≤ plain ≤ 2·DL), exact DL on
    the survivors (query/expand.py damerau_levenshtein, pinned equal to
    DuckDB's damerau_levenshtein so the oracle is
    equality-by-construction)."""
    s = Searcher(documents_index(sf_dir), fuzzy_transpositions=True)
    return _search_many(
        sf_dir, FUZZY_OSA_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90, searcher=s
    )


def q_search_wildcard(sf_dir: str):
    """General `?`/`*` wildcard queries: literal-prefix range narrowing +
    one vectorized RE2 pass over the term dictionary."""
    return _search_many(sf_dir, WILDCARD_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_filtered(sf_dir: str):
    """Fielded metadata filters (`lang:en`, `-source:src1`) — ES
    bool.filter context over docstore columns: conjunctive, non-scoring,
    stats untouched; evaluated as pid-local bitmap lookups inside the
    candidate funnel (one column-pruned parquet read per touched pid)."""
    return _search_many(sf_dir, FILTERED_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


MLT_SOURCES = [3, 57, 101]
HIGHLIGHT_QUERIES = ["spark table merge", "key value row"]
HIGHLIGHT_DOCS = [2, 47, 88, 301]
HIGHLIGHT_WINDOW = 10


def q_highlight(sf_dir: str):
    """Deterministic highlighter: the 10-token window with the most
    query terms (earliest on ties) per (query, doc) — the exact
    span-selection contract, value-checked down to the snippet text."""
    s = Searcher(documents_index(sf_dir))
    internal = s.lookup_docids(HIGHLIGHT_DOCS)
    ids = np.array([internal[d] for d in HIGHLIGHT_DOCS], dtype=np.int64)
    parts = []
    for qid, qtext in enumerate(HIGHLIGHT_QUERIES):
        r = s.highlight(qtext, ids, window=HIGHLIGHT_WINDOW)
        rids = r["doc_id"].to_numpy(zero_copy_only=False)
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(
                        np.full(r.num_rows, qid, dtype=np.int64)
                    ),
                    "doc_id": pa.array(_orig_ids(s, rids)),
                    "start": r["start"],
                    "n_matched": r["n_matched"],
                    "snippet": r["snippet"],
                }
            )
        )
    return pa.concat_tables(parts)
SUGGEST_TEXT = "spork tabel merg windoq"  # misspellings of corpus vocabulary


def q_suggest_terms(sf_dir: str):
    """ES term-suggester analog: per misspelled token, index terms
    within 2 edits ranked (distance asc, df desc, term asc), top-5."""
    s = Searcher(documents_index(sf_dir))
    return s.suggest_terms(SUGGEST_TEXT, size=5, max_edits=2)


def q_term_vectors(sf_dir: str):
    """ES _termvectors analog for one doc: (term, tf, position) rows
    (the positions flattened so the oracle hash covers them)."""
    s = Searcher(documents_index(sf_dir))
    tv = s.term_vectors(7)
    terms, tfs, poss = [], [], []
    for t, tf, ps in zip(
        tv["term"].to_pylist(), tv["tf"].to_pylist(), tv["positions"].to_pylist()
    ):
        for p in ps:
            terms.append(t)
            tfs.append(tf)
            poss.append(int(p))
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
        }
    )


def q_search_compound(sf_dir: str):
    """ES compound queries through the DISTRIBUTED path: boosting
    (negative matches demoted ×0.25, never filtered), constant_score
    (every match scores the boost; docID-asc tie-break), dis_max
    (best subquery + 0.5 × the rest).  All three are per-doc score
    functions, so shard-local top-k merges are exact."""
    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    fetch_k = SEARCH_K + 90
    runs = [
        sh.boosting("spark table", "dup", negative_boost=0.25, k=fetch_k),
        sh.constant_score("spark table", boost=1.5, k=fetch_k),
        sh.dis_max(["spark table", "merge join"], tie_breaker=0.5, k=fetch_k),
    ]
    parts = []
    for qid, res in enumerate(runs):
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    # the cached sharded searcher's hydrate serves the id
                    # map — no second full-index Searcher needed
                    "vec_id": pa.array(_orig_ids(sh, ids)),
                    "sim": res["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _compound_sql() -> str:
    """Oracle for q_search_compound: the shared BM25 CTE skeleton, then
    one arm per compound kind (the dis_max sum has two addends, so
    max + tb·(sum − max) is float-order free and mirrors the engine's
    expression exactly)."""
    base = (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
    )
    score = (
        "sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        "* (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) )"
    )

    def scored(cte: str, terms: list[str]) -> str:
        vals = ", ".join(f"('{t}')" for t in sorted(set(terms)))
        return (
            f"{cte}(doc_id, score) AS (SELECT tf.doc_id, {score} "
            f"FROM (VALUES {vals}) q(term) "
            "JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
            "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
            "GROUP BY tf.doc_id)"
        )

    return (
        base
        + scored("s_pos", ["spark", "table"]) + ", "
        + scored("s_mj", ["merge", "join"]) + ", "
        "neg AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'), "
        "boosted AS (SELECT doc_id, CASE WHEN doc_id IN (SELECT doc_id FROM neg) "
        " THEN score * 0.25 ELSE score END AS score FROM s_pos), "
        "dm AS (SELECT doc_id, max(score) + 0.5 * (sum(score) - max(score)) AS score "
        " FROM (SELECT doc_id, score FROM s_pos UNION ALL SELECT doc_id, score FROM s_mj) "
        " GROUP BY doc_id), "
        "allq AS ("
        " SELECT 0 AS query_id, doc_id, score FROM boosted "
        " UNION ALL SELECT 1, doc_id, 1.5 FROM s_pos "
        " UNION ALL SELECT 2, doc_id, score FROM dm) "
        "SELECT query_id, doc_id, "
        " row_number() OVER (PARTITION BY query_id "
        "  ORDER BY round(score, 9) DESC, doc_id) AS rank, "
        " round(score, 6) AS score_r FROM allq "
        f"QUALIFY rank <= {SEARCH_K}"
    )


# ES match_bool_prefix (search-as-you-type): (complete terms..., stem)
MBP_QUERIES: list[str] = ["spark table s", "merge join qu", "gr"]


def q_match_bool_prefix(sf_dir: str):
    """ES ``match_bool_prefix`` through the DISTRIBUTED path: every term
    but the last is a scoring should clause, the last is a prefix query
    rewritten constant-score (each match adds exactly 1.0 — the pinned
    Lucene CONSTANT_SCORE rewrite).  Stem expansion happens ONCE on the
    coordinator; the per-doc score function makes shard merges exact."""
    sh = sharded_searcher(documents_index(sf_dir))
    parts = []
    for qid, q in enumerate(MBP_QUERIES):
        r = sh.match_bool_prefix(q, k=SEARCH_K + 90)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _match_bool_prefix_sql() -> str:
    """Twin of q_match_bool_prefix: per query, BM25 over the complete
    terms FULL-OUTER-JOINed with the DISTINCT prefix-match set (term
    LIKE 'stem%'), score = coalesce(bm25, 0) + 1.0·[prefix match] —
    the same addend order as the engine."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    base = (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
    )
    score = (
        "sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        "* (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) )"
    )
    ctes, arms = [], []
    for qid, q in enumerate(MBP_QUERIES):
        toks = tokenize_text(q)
        complete, stem = toks[:-1], toks[-1]
        ctes.append(
            f"p_q{qid} AS (SELECT DISTINCT doc_id FROM tok "
            f"WHERE term LIKE '{stem}%')"
        )
        if complete:
            vals = ", ".join(f"('{t}')" for t in sorted(set(complete)))
            ctes.append(
                f"s_q{qid}(doc_id, score) AS (SELECT tf.doc_id, {score} "
                f"FROM (VALUES {vals}) q(term) "
                "JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
                "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
                "GROUP BY tf.doc_id)"
            )
            arms.append(
                f"SELECT {qid} AS query_id, "
                "coalesce(s.doc_id, p.doc_id) AS doc_id, "
                "coalesce(s.score, 0) + CASE WHEN p.doc_id IS NOT NULL "
                "THEN 1.0 ELSE 0.0 END AS sc "
                f"FROM s_q{qid} s FULL JOIN p_q{qid} p ON s.doc_id = p.doc_id"
            )
        else:
            arms.append(
                f"SELECT {qid} AS query_id, doc_id, 1.0 AS sc FROM p_q{qid}"
            )
    return (
        base
        + ", ".join(ctes)
        + ", allq AS (" + " UNION ALL ".join(arms) + ") "
        "SELECT query_id, doc_id, "
        "row_number() OVER (PARTITION BY query_id "
        " ORDER BY round(sc, 9) DESC, doc_id) AS rank, "
        "round(sc, 6) AS score_r FROM allq "
        f"QUALIFY rank <= {SEARCH_K}"
    )


# ES weighted_tokens (text_expansion): (tokens, freq_ratio_threshold,
# weight_threshold) per query_id; 0.25-step weights keep every product
# and sum bit-exact in float64 (order-free — SQL sum matches exactly)
WTOKENS_SPECS: list[tuple[dict, float | None, float]] = [
    ({"spark": 2.0, "table": 1.0, "merge": 0.5, "the": 0.25}, None, 0.0),
    ({"spark": 2.0, "table": 1.0, "merge": 0.5, "the": 0.25}, 1.0, 1.0),
]


def q_weighted_tokens(sf_dir: str):
    """ES weighted_tokens / text_expansion (query/sparse.py) through the
    DISTRIBUTED raw-postings surface: sparse dot-product over the
    inverted index, with the ES pruning_config rule in the second
    query (the high-df low-weight token drops out)."""
    from elasticsearch_assets_ray.query import sparse as sparse_mod

    sh = sharded_searcher(documents_index(sf_dir))
    parts = []
    for qid, (tokens, ratio, wt) in enumerate(WTOKENS_SPECS):
        r = sparse_mod.weighted_tokens(
            sh,
            tokens,
            k=SEARCH_K + 90,
            freq_ratio_threshold=ratio,
            weight_threshold=wt,
        )
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _weighted_tokens_sql() -> str:
    """Twin of q_weighted_tokens: Σ w·tf per doc, with the pruning arm
    computing the same df-vs-query-average rule in SQL."""
    ctes, arms = [], []
    for qid, (tokens, ratio, wt) in enumerate(WTOKENS_SPECS):
        vals = ", ".join(
            f"('{t}', {w!r})" for t, w in sorted(tokens.items())
        )
        if ratio is None:
            ctes.append(f"k{qid}(term, w) AS (VALUES {vals})")
        else:
            ctes.append(
                f"q{qid}df AS (SELECT q.term, q.w, coalesce(df.df, 0) AS d "
                f"FROM (VALUES {vals}) q(term, w) "
                "LEFT JOIN df ON df.term = q.term), "
                f"a{qid} AS (SELECT avg(d) AS a FROM q{qid}df), "
                f"k{qid} AS (SELECT term, w FROM q{qid}df CROSS JOIN a{qid} "
                f"WHERE NOT (d > {ratio!r} * a AND w < {wt!r}))"
            )
        arms.append(
            f"SELECT {qid} AS query_id, tf.doc_id, sum(k{qid}.w * tf.tf) AS score "
            f"FROM k{qid} JOIN tf ON tf.term = k{qid}.term GROUP BY tf.doc_id"
        )
    return (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        + ", ".join(ctes)
        + ", scored AS (" + " UNION ALL ".join(arms) + ") "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        f"FROM scored QUALIFY rank <= {SEARCH_K}"
    )


# ES rank_feature: one (query, function, params) shape per query_id so
# all three ES feature curves are oracle-checked
RANK_FEATURE_SPECS: list[tuple[str, str, dict]] = [
    ("spark table merge", "saturation", {"boost": 2.0, "pivot": 500.0}),
    ("fast scan filter", "log", {"boost": 0.7, "scaling": 1.0}),
    ("key value row", "sigmoid", {"boost": 1.5, "pivot": 400.0, "exponent": 2.0}),
]


def q_rank_feature(sf_dir: str):
    """ES rank_feature query (saturation / log / sigmoid over a stored
    numeric feature column, ADDED to BM25 — ES's bool-should contract),
    served through the DISTRIBUTED path (per-doc addend ⇒ exact shard
    merges)."""
    sh = sharded_searcher(documents_index(sf_dir))
    parts = []
    for qid, (q, fn, kw) in enumerate(RANK_FEATURE_SPECS):
        r = sh.rank_feature(q, "n_chars", k=SEARCH_K + 90, function=fn, **kw)
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


_BM25_BASE_CTES = (
    f"WITH tok AS (SELECT doc_id, unnest({{tok}}) AS term FROM documents), "
    "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
    "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
    "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
    " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
    "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
)
_BM25_TERM_EXPR = (
    "sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
    "* (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) )"
)


def _rank_feature_sql() -> str:
    """Twin of q_rank_feature: per query_id, total = BM25 + boost·f(v)
    with the engine's exact double constants embedded."""
    curves = []
    for qid, (_q, fn, kw) in enumerate(RANK_FEATURE_SPECS):
        x = "CAST(d.n_chars AS DOUBLE)"
        if fn == "saturation":
            expr = f"{kw['boost']!r} * ({x} / ({x} + {kw['pivot']!r}))"
        elif fn == "log":
            expr = f"{kw['boost']!r} * ln({kw['scaling']!r} + {x})"
        else:  # sigmoid
            e, p = kw["exponent"], kw["pivot"]
            expr = (
                f"{kw['boost']!r} * (power({x}, {e!r}) / "
                f"(power({x}, {e!r}) + power({p!r}, {e!r})))"
            )
        curves.append(f"WHEN sc.query_id = {qid} THEN {expr}")
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, (q, _fn, _kw) in enumerate(RANK_FEATURE_SPECS)
        for t in sorted(set(q.split()))
    )
    return (
        _BM25_BASE_CTES.format(tok=_TOK)
        + f"q(query_id, term) AS (VALUES {vals}), "
        f"scored AS (SELECT q.query_id, tf.doc_id, {_BM25_TERM_EXPR} AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
        " GROUP BY q.query_id, tf.doc_id), "
        "fs AS (SELECT sc.query_id, sc.doc_id, sc.score + (CASE "
        + " ".join(curves)
        + " END) AS total FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id) "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(total, 9) DESC, doc_id) AS rank, round(total, 6) AS score_r "
        f"FROM fs QUALIFY rank <= {SEARCH_K}"
    )


def _score_runs_table(sh, runs) -> pa.Table:
    """Assemble (query_id, doc_id, rank, score_r) from per-query result
    tables — the shared tail of the score-function pipelines."""
    parts = []
    for qid, r in runs:
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


# ES distance_feature: proximity-to-origin boosting over a stored numeric
# column (recency/geo/price analog), one (query, params) shape per query_id
DISTANCE_FEATURE_SPECS: list[tuple[str, dict]] = [
    ("spark table merge", {"origin": 300.0, "pivot": 50.0, "boost": 2.5}),
    ("fast scan filter", {"origin": 150.0, "pivot": 200.0, "boost": 1.0}),
    ("key value row", {"origin": 420.0, "pivot": 25.0, "boost": 3.0}),
]


def q_distance_feature(sf_dir: str):
    """ES distance_feature query (boost·pivot/(pivot+|v−origin|) ADDED
    to BM25), served through the DISTRIBUTED path (per-doc addend ⇒
    exact shard merges)."""
    sh = sharded_searcher(documents_index(sf_dir))
    return _score_runs_table(
        sh,
        [
            (qid, sh.distance_feature(q, "n_chars", k=SEARCH_K + 90, **kw))
            for qid, (q, kw) in enumerate(DISTANCE_FEATURE_SPECS)
        ],
    )


def _distance_feature_sql() -> str:
    """Twin of q_distance_feature with the exact double constants."""
    x = "CAST(d.n_chars AS DOUBLE)"
    arms = []
    for qid, (_q, kw) in enumerate(DISTANCE_FEATURE_SPECS):
        o, p, b = kw["origin"], kw["pivot"], kw["boost"]
        arms.append(
            f"WHEN sc.query_id = {qid} THEN "
            f"{b!r} * ({p!r} / ({p!r} + abs({x} - {o!r})))"
        )
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, (q, _kw) in enumerate(DISTANCE_FEATURE_SPECS)
        for t in sorted(set(q.split()))
    )
    return (
        _BM25_BASE_CTES.format(tok=_TOK)
        + f"q(query_id, term) AS (VALUES {vals}), "
        f"scored AS (SELECT q.query_id, tf.doc_id, {_BM25_TERM_EXPR} AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
        " GROUP BY q.query_id, tf.doc_id), "
        "fs AS (SELECT sc.query_id, sc.doc_id, sc.score + (CASE "
        + " ".join(arms)
        + " END) AS total FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id) "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(total, 9) DESC, doc_id) AS rank, round(total, 6) AS score_r "
        f"FROM fs QUALIFY rank <= {SEARCH_K}"
    )


@register_score_script("length_weighted")
def _script_length_weighted(sc: np.ndarray, v: np.ndarray, params: dict) -> np.ndarray:
    """Demo score script: _score·0.5 + ln(1+len)·w (always ≥ 0)."""
    return sc * 0.5 + np.log1p(v) * params["w"]


#: (query, w) per query_id for the script_score gate
SCRIPT_SCORE_SPECS: list[tuple[str, float]] = [
    ("spark table merge", 0.3),
    ("window agg", 1.0),
    ("fast scan filter", 0.05),
]


def q_script_score(sf_dir: str):
    """ES script_score query: the registered script REPLACES the score
    (computed from _score + one doc-values column); the coordinator
    resolves the script and ships the callable to each shard by value
    (ES ships script source with the request)."""
    sh = sharded_searcher(documents_index(sf_dir))
    return _score_runs_table(
        sh,
        [
            (
                qid,
                sh.script_score(
                    q, "n_chars", "length_weighted",
                    k=SEARCH_K + 90, params={"w": w},
                ),
            )
            for qid, (q, w) in enumerate(SCRIPT_SCORE_SPECS)
        ],
    )


def _script_score_sql() -> str:
    """Twin of q_script_score: total = score·0.5 + ln(1+n_chars)·w."""
    x = "CAST(d.n_chars AS DOUBLE)"
    arms = [
        f"WHEN sc.query_id = {qid} THEN (sc.score * 0.5) + (ln(1 + {x}) * {w!r})"
        for qid, (_q, w) in enumerate(SCRIPT_SCORE_SPECS)
    ]
    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, (q, _w) in enumerate(SCRIPT_SCORE_SPECS)
        for t in sorted(set(q.split()))
    )
    return (
        _BM25_BASE_CTES.format(tok=_TOK)
        + f"q(query_id, term) AS (VALUES {vals}), "
        f"scored AS (SELECT q.query_id, tf.doc_id, {_BM25_TERM_EXPR} AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
        " GROUP BY q.query_id, tf.doc_id), "
        "fs AS (SELECT sc.query_id, sc.doc_id, (CASE "
        + " ".join(arms)
        + " END) AS total FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id) "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(total, 9) DESC, doc_id) AS rank, round(total, 6) AS score_r "
        f"FROM fs QUALIFY rank <= {SEARCH_K}"
    )


TERMS_SET_TERMS = ["spark", "table", "merge", "filter"]


def q_search_terms_set(sf_dir: str):
    """ES terms_set query: ≥ m of the given terms must appear, m read
    PER DOC from a numeric field (minimum_should_match_field; here
    m = 1 + n_chars % 4 so every requirement level occurs).  Scoring is
    bool-should BM25 over the present terms; served distributed
    (membership and requirement are both doc-local facts)."""
    sh = sharded_searcher(documents_index(sf_dir))
    r = sh.terms_set(
        TERMS_SET_TERMS, "n_chars", k=SEARCH_K + 90, min_offset=1, min_mod=4
    )
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            "query_id": pa.array(np.zeros(ids.size, dtype=np.int64)),
            "vec_id": pa.array(_orig_ids(sh, ids)),
            "sim": r["score"],
        }
    )
    res = _rerank_rounded(t, SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _terms_set_sql() -> str:
    vals = ", ".join(f"('{t}')" for t in sorted(set(TERMS_SET_TERMS)))
    return (
        _BM25_BASE_CTES.format(tok=_TOK)
        + f"q(term) AS (VALUES {vals}), "
        f"scored AS (SELECT tf.doc_id, count(*)::BIGINT AS cnt, {_BM25_TERM_EXPR} AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY tf.doc_id), "
        "sel AS (SELECT sc.doc_id, sc.score FROM scored sc "
        " JOIN documents d ON d.doc_id = sc.doc_id "
        " WHERE sc.cnt >= (d.n_chars % 4) + 1) "
        "SELECT 0 AS query_id, doc_id, row_number() OVER ("
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        f"FROM sel QUALIFY rank <= {SEARCH_K}"
    )


PINNED_QUERY, PINNED_SEED_QUERY, PINNED_N = "spark table", "merge join", 3


def q_search_pinned(sf_dir: str):
    """ES pinned query: promoted ids rank first in the order given
    (artificial descending scores above any BM25), organic results
    follow with the pins removed.  The pin list is derived from a seed
    query's round-9 top-3 REVERSED (layout-independent — the SQL twin
    derives the identical list), so the gate exercises both the pin
    ordering and the organic exclusion."""
    sh = sharded_searcher(documents_index(sf_dir))
    seed = sh.search(PINNED_SEED_QUERY, k=PINNED_N + 90)
    sids = seed["doc_id"].to_numpy(zero_copy_only=False)
    soid = _orig_ids(sh, sids)
    ssc = seed["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((soid, -_round_half_up(ssc, 9)))[:PINNED_N]
    pins_internal = sids[order][::-1]
    r = sh.pinned(list(pins_internal), PINNED_QUERY, k=SEARCH_K + 90)
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            "query_id": pa.array(np.zeros(ids.size, dtype=np.int64)),
            "vec_id": pa.array(_orig_ids(sh, ids)),
            "sim": r["score"],
        }
    )
    res = _rerank_rounded(t, SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _pinned_sql() -> str:
    """Twin of q_search_pinned: the seed query's round-9 top-3 reversed
    become pins scored 1e9 − position; organic BM25 follows."""

    def scored(cte: str, q: str) -> str:
        vals = ", ".join(f"('{t}')" for t in sorted(set(q.split())))
        return (
            f"{cte}(doc_id, score) AS (SELECT tf.doc_id, {_BM25_TERM_EXPR} "
            f"FROM (VALUES {vals}) q(term) "
            "JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
            "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
            "GROUP BY tf.doc_id)"
        )

    return (
        _BM25_BASE_CTES.format(tok=_TOK)
        + scored("s_seed", PINNED_SEED_QUERY) + ", "
        + scored("s_org", PINNED_QUERY) + ", "
        "seed AS (SELECT doc_id, row_number() OVER ("
        " ORDER BY round(score, 9) DESC, doc_id) AS rk FROM s_seed "
        f" QUALIFY rk <= {PINNED_N}), "
        # reversed: the rank-3 seed doc is pin position 0 (highest score)
        f"pins AS (SELECT doc_id, 1000000000.0 - CAST({PINNED_N} - rk AS DOUBLE) "
        " AS score FROM seed), "
        "organic AS (SELECT doc_id, score FROM s_org "
        " WHERE doc_id NOT IN (SELECT doc_id FROM pins)), "
        "allr AS (SELECT * FROM pins UNION ALL SELECT * FROM organic) "
        "SELECT 0 AS query_id, doc_id, row_number() OVER ("
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        f"FROM allr QUALIFY rank <= {SEARCH_K}"
    )


def q_suggest_completion(sf_dir: str):
    """ES completion-suggester analog: prefix autosuggest ranked by
    df desc / term asc — a term-dictionary read, no postings."""
    s = Searcher(documents_index(sf_dir))
    return s.suggest_completion("s", size=5)


def q_terms_enum(sf_dir: str):
    """ES `_terms_enum`: index terms with a prefix, ascending, with df —
    a sorted-dictionary read (no postings decode)."""
    s = Searcher(documents_index(sf_dir))
    t = s.terms_enum("s", size=8)
    return pa.table(
        {
            "prefix": pa.array(["s"] * t.num_rows, pa.string()),
            "suggestion": t["term"],
            "df": t["df"],
        }
    )


def q_collapse_source(sf_dir: str):
    """ES field collapsing: top-10 hits for a bag-of-words query keeping
    only the best hit per `source` value (winner + final rank both at
    the round9 contract).  Served through the distributed path: shards
    return LOCAL collapsed top-k, the coordinator re-collapses (exact —
    see Searcher.collapse_ids)."""
    s = sharded_searcher(documents_index(sf_dir))
    r = s.search_collapse("spark table merge", k=SEARCH_K, collapse="source")
    ids = r["doc_id"].to_numpy(zero_copy_only=False)
    oid = _orig_ids(s, ids)
    raw = r["score"].to_numpy(zero_copy_only=False)
    order = np.lexsort((oid, -_round_half_up(raw, 9)))
    return pa.table(
        {
            "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int64)),
            "doc_id": pa.array(oid[order]),
            "source": pc.take(r["source"].combine_chunks(), pa.array(order)),
            "score_r": pa.array(_round_half_up(raw[order], 6)),
        }
    )


def q_more_like_this(sf_dir: str):
    """ES more_like_this analog: for each source doc, its top-25 tf×idf
    terms run as a bag-of-words query, source excluded, top-10."""
    s = Searcher(documents_index(sf_dir))
    internal = s.lookup_docids(MLT_SOURCES)
    parts = []
    for src in MLT_SOURCES:
        r = s.more_like_this(
            internal[src], k=SEARCH_K + 90, fetch_k=SEARCH_K + 91
        )
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, src, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(s, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def q_search_page2(sf_dir: str):
    """ES search_after cursor pagination: page 1's k-th hit (at round-9
    ranking granularity) seeds the cursor; the engine returns the hits
    strictly after it — compared against the oracle's rank 11..20
    window.  Cursor position is (round9 score desc, docid asc), stable
    under float noise."""
    idx = documents_index(sf_dir)
    s = Searcher(idx)
    parts = []
    for qid, q in enumerate(DOC_QUERIES):
        r1 = s.search(q, k=SEARCH_K + 90)
        ids = r1["doc_id"].to_numpy(zero_copy_only=False)
        raw = r1["score"].to_numpy(zero_copy_only=False)
        if ids.size <= SEARCH_K:
            continue  # no second page
        # k-th hit under the round9 ranking contract (internal docids
        # are assigned in input order → ascending orig ids, so the
        # tie-break order matches the oracle's)
        order = np.lexsort((ids, -_round_half_up(raw, 9)))
        cur = order[SEARCH_K - 1]
        r2 = s.search(
            q,
            k=SEARCH_K + 90,
            search_after=(float(raw[cur]), int(ids[cur])),
        )
        ids2 = r2["doc_id"].to_numpy(zero_copy_only=False)
        if ids2.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids2.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(s, ids2)),
                    "sim": r2["score"],
                }
            )
        )
    if not parts:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()), "score_r": pa.array([], pa.float64())}
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals (Rae et al. 2021):
    duplicate-word fraction + character share of the most frequent word
    2-/3-gram — one stateless vectorized map_batches (Arrow group_by per
    batch, no shuffle)."""
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda b: textstats.repetition_stats(b, "text"), batch_format="pyarrow"
    )
    return out.select_columns(
        ["doc_id", "dup_word_frac", "top2_char_frac", "top3_char_frac"]
    )


def q_dup_span_stats(sf_dir: str):
    """Duplicated n-gram SPAN statistics (Lee et al. 2107.06499): per doc,
    how many k=3-token positions start a shingle that occurs >= 2 times in
    the whole corpus, plus the distinct duplicated shingles.  The op is
    the classic bounded inverted-index exchange (stages/dedup.py
    duplicated_span_stats); zero-fill + total-span count happen here via
    one cheap token-count pass (at 100 TB this join is the same
    partial_agg shape, keyed by doc_id)."""
    n_docs = pq.read_metadata(_p(sf_dir, "documents")).num_rows
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    dups = dedup_ops.duplicated_span_stats(ds, k=3, n_rows_hint=n_docs)

    def spans(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"].combine_chunks()), "[^a-z0-9]+"
        )
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.utf8_length(toks.values).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(off))
        nt = np.bincount(doc_of, weights=(lens > 0), minlength=len(toks)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ngram_spans": pa.array(np.maximum(nt - 2, 0)),
            }
        )

    # distributed left join (round-4 verdict item 4, hardened round 5):
    # ``dups`` is a groupby combine (duplicated_span_stats ends in
    # partial_agg), and a groupby emits ZERO-COLUMN blocks for empty
    # sort partitions.  map_batches never visits empty blocks, so no
    # sentinel can patch them, and Dataset.join dies on the column-less
    # block (verified: ArrowInvalid "No match for FieldRef.Name(doc_id)"
    # 5/5 trials once any coarse group is empty).  The safe distributed
    # shape is g_doc_stats': tag-union both sides onto one null-padded
    # schema (zero-column blocks pass a groupby shuffle harmlessly —
    # verified 5/5), ONE coarse-key shuffle co-locates each doc's rows,
    # and the left join runs vectorized inside the bounded group.
    tot_ds = _rd(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        spans, batch_format="pyarrow"
    )

    def pad(tag: str):
        def fn(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].combine_chunks()
            u = ids.cast(pa.uint64()).to_numpy(zero_copy_only=False)
            mixed = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)).astype(
                np.int64
            )
            cols: dict = {"doc_id": ids}
            for c in ("ngram_spans", "dup_ngram_positions", "distinct_dup_ngrams"):
                cols[c] = (
                    b[c].combine_chunks().cast(pa.int64())
                    if c in b.column_names
                    else pa.nulls(b.num_rows, pa.int64())
                )
            cols["__part"] = pa.array([tag] * b.num_rows, pa.string())
            cols["__bucket"] = pa.array(mixed)
            return pa.table(cols)

        return fn

    unioned = tot_ds.map_batches(pad("tot"), batch_format="pyarrow").union(
        dups.map_batches(pad("dup"), batch_format="pyarrow")
    )

    def assemble(g: pa.Table) -> pa.Table:
        is_tot = pc.equal(g["__part"], pa.scalar("tot"))
        tot = g.filter(is_tot)
        dup = g.filter(pc.invert(is_tot))
        tid = tot["doc_id"].to_numpy(zero_copy_only=False)
        did = dup["doc_id"].to_numpy(zero_copy_only=False)
        out_pos = np.zeros(tid.size, np.int64)
        out_dn = np.zeros(tid.size, np.int64)
        if did.size:
            order = np.argsort(did, kind="stable")
            did = did[order]
            pos = dup["dup_ngram_positions"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )[order]
            dn = dup["distinct_dup_ngrams"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )[order]
            ix = np.searchsorted(did, tid)
            hit = (ix < did.size) & (did[np.minimum(ix, did.size - 1)] == tid)
            out_pos[hit] = pos[ix[hit]]
            out_dn[hit] = dn[ix[hit]]
        return pa.table(
            {
                "doc_id": tot["doc_id"].combine_chunks(),
                "ngram_spans": tot["ngram_spans"].combine_chunks(),
                "dup_ngram_positions": pa.array(out_pos),
                "distinct_dup_ngrams": pa.array(out_dn),
            }
        )

    joined = unioned.groupby("__bucket").map_groups(
        assemble, batch_format="pyarrow"
    )
    out = pa.concat_tables(
        [
            b
            for b in joined.iter_batches(batch_format="pyarrow")
            if b.num_rows and b.num_columns
        ]
    )
    return out.take(pc.sort_indices(out["doc_id"]))


def q_unigram_ppl(sf_dir: str):
    """CCNet-style LM quality signal (arXiv:1911.00359): per-doc
    perplexity under the corpus's own unigram model, computed exactly.
    Pass 1 builds the (term, cnt) model via one bounded coarse-key
    groupby; the vocabulary-sized table broadcasts via ray.put; pass 2
    scores every doc in an actor-pool map_batches (model loaded once per
    actor, sorted-hash lookup per batch)."""
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    model = textstats.unigram_counts(ds)
    ref = ray.put(model)
    out = (
        _rd(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(
            textstats.UnigramPerplexity,
            fn_constructor_kwargs={"model_ref": ref},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .select_columns(["doc_id", "unigram_ppl"])
    )
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "unigram_ppl_r": pa.array(
                _round_half_up(t["unigram_ppl"].to_numpy(zero_copy_only=False), 6)
            ),
        }
    ).sort_by([("doc_id", "ascending")])


def q_gopher_filter(sf_dir: str):
    """Gopher quality FILTER verdict (Rae et al. 2021 Table A1 rules
    composed): one stateless vectorized map_batches, no shuffle."""
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda b: textstats.gopher_filter(b, "text"), batch_format="pyarrow"
    ).select_columns(["doc_id", "gopher_keep", "gopher_fail_mask"])
    return pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by(
        [("doc_id", "ascending")]
    )


_DSIR_BUCKETS = 64
_DSIR_K = 100


def q_dsir(sf_dir: str):
    """DSIR data selection (Xie et al. 2302.03169, stages/dsir.py):
    hashed unigram+bigram multinomial importance log-weights of every
    doc — target distribution = the ``lang='en'`` slice, raw = the full
    corpus — plus the deterministic top-100 selection flag.  Two
    n_buckets-bounded count shuffles, a broadcast λ vector, one
    stateless scoring pass."""
    from elasticsearch_assets_ray.stages.dsir import dsir_select

    raw = _rd(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    target = raw.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")), batch_format="pyarrow"
    )
    out = dsir_select(
        raw, target, "text", "doc_id", n_buckets=_DSIR_BUCKETS, k=_DSIR_K
    )
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).sort_by(
        [("doc_id", "ascending")]
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "dsir_logw_r": pa.array(
                _round_half_up(t["logw"].to_numpy(zero_copy_only=False), 6)
            ),
            "dsir_sel": t["selected"].combine_chunks().cast(pa.int64()),
        }
    )


def _dsir_sql() -> str:
    """Twin of q_dsir: the same Horner-hashed unigram+bigram buckets
    (HUGEINT mod 2^64 — oracles_hard._horner is bit-identical to
    textstats.polynomial_hash), add-one-smoothed multinomial
    log-ratio, per-doc sum, top-K at the round-9/docID contract."""
    from elasticsearch_assets_ray.pipelines import oracles_hard as _oh

    nb, k = _DSIR_BUCKETS, _DSIR_K
    return (
        "WITH tl AS (SELECT doc_id, lang, "
        "regexp_extract_all(lower(text), '[a-z0-9]+') AS L FROM documents), "
        "ug AS (SELECT doc_id, lang, unnest(L) AS g FROM tl), "
        "bg AS (SELECT doc_id, lang, unnest(list_transform(range(1, len(L)), "
        "i -> L[i] || ' ' || L[i+1])) AS g FROM tl), "
        "ng AS (SELECT * FROM ug UNION ALL SELECT * FROM bg), "
        f"nb AS (SELECT doc_id, lang, CAST({_oh._horner('g')} % {nb} AS BIGINT) AS b "
        "FROM ng), "
        "tcnt AS (SELECT b, count(*)::BIGINT AS c FROM nb WHERE lang = 'en' GROUP BY b), "
        "rcnt AS (SELECT b, count(*)::BIGINT AS c FROM nb GROUP BY b), "
        "tt AS (SELECT count(*)::DOUBLE AS t FROM nb WHERE lang = 'en'), "
        "rt AS (SELECT count(*)::DOUBLE AS t FROM nb), "
        "lam AS (SELECT r.b, "
        f"ln((coalesce(t.c, 0) + 1)::DOUBLE / (tt.t + {nb})) - "
        f"ln((r.c + 1)::DOUBLE / (rt.t + {nb})) AS l "
        "FROM rcnt r LEFT JOIN tcnt t USING (b) CROSS JOIN tt CROSS JOIN rt), "
        "w AS (SELECT nb.doc_id, sum(lam.l) AS lw FROM nb "
        "JOIN lam USING (b) GROUP BY nb.doc_id), "
        "wa AS (SELECT d.doc_id, coalesce(w.lw, 0.0) AS lw "
        "FROM documents d LEFT JOIN w USING (doc_id)), "
        "rk AS (SELECT doc_id, lw, row_number() OVER "
        "(ORDER BY round(lw, 9) DESC, doc_id) AS rn FROM wa) "
        "SELECT doc_id, round(lw, 6) AS dsir_logw_r, "
        f"CASE WHEN rn <= {k} THEN 1 ELSE 0 END AS dsir_sel "
        "FROM rk ORDER BY doc_id"
    )


def q_search_phrase_prefix(sf_dir: str):
    """ES match_phrase_prefix analog: complete terms adjacent in order,
    immediately followed by any index term with the stem — verified on
    positional postings with the prefix expansion as an alternatives
    set in the chain's last step."""
    return _search_many(
        sf_dir, PHRASE_PREFIX_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90
    )


def q_search_sloppy(sf_dir: str):
    """Sloppy phrases `"a b"~N` (Lucene slop, ordered-window contract):
    terms in order with ≤ N interleaved tokens, verified on positional
    postings via a greedy minimal chain."""
    return _search_many(sf_dir, SLOPPY_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_unordered(sf_dir: str):
    """Unordered proximity `"a b"~uN` (span_near in_order=false
    extension): one distinct position per term instance, any order,
    span width ≤ m+N — verified on positional postings via the
    vectorized window-cover kernel."""
    return _search_many(sf_dir, UNORDERED_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_regexp(sf_dir: str):
    """Lucene `/regexp/` term queries: anchored-RE2 expansion over the
    sorted term dictionary (leading-literal range pruning), expansion
    terms scoring individually; works flat and as boolean-tree leaves."""
    return _search_many(sf_dir, REGEXP_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_msm(sf_dir: str):
    """ES minimum_should_match request parameter: each query requires at
    least N distinct should terms present; scoring unchanged."""
    return _search_many(
        sf_dir, MSM_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90, msm=MSM_NS
    )


def q_function_score(sf_dir: str):
    """ES function_score / field_value_factor analog: BM25 ×
    log1p(0.01 · n_chars) — length boosting from stored metadata."""
    s = Searcher(documents_index(sf_dir))
    parts = []
    for qid, q in enumerate(DOC_QUERIES[:4]):
        r = s.function_score(
            q, "n_chars", k=SEARCH_K + 90, factor=0.01, modifier="log1p"
        )
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(s, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


RESCORE_PAIRS = [
    ("spark table merge", "key value row"),
    ("fast scan filter", "window agg"),
    ("key value row column", "spark merge"),
]
RESCORE_WINDOW = 40
RESCORE_QW, RESCORE_RW = 1.0, 2.0


def q_search_rescore(sf_dir: str):
    """ES rescore API analog: the primary top-window reranked by
    primary·qw + secondary·rw, secondary gathered at the window only
    (never a corpus-wide second scoring pass)."""
    s = Searcher(documents_index(sf_dir))
    parts = []
    for qid, (prim, resc) in enumerate(RESCORE_PAIRS):
        r = s.rescore(
            prim,
            resc,
            k=RESCORE_WINDOW,
            window_size=RESCORE_WINDOW,
            query_weight=RESCORE_QW,
            rescore_weight=RESCORE_RW,
        )
        ids = r["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(s, ids)),
                    "sim": r["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def q_approx_terms(sf_dir: str):
    """ES terms-agg distributed ACCURACY contract
    (stages/relational.approx_terms_agg): per-shard top-shard_size
    candidate truncation over a deterministic doc%4 hash partition,
    merged counts + per-bucket doc_count_error_upper_bound +
    sum_other_doc_count.  The one thing an exact single-node facet can
    never show: what a multi-shard ES cluster's terms agg actually
    returns."""
    from elasticsearch_assets_ray.stages.relational import approx_terms_agg

    return approx_terms_agg(
        _rd(sf_dir, "documents", columns=["doc_id", "lang"]),
        "lang",
        "doc_id",
        size=3,
        shard_size=3,
        n_shards=4,
        distinct_hint=8,
    )


def _approx_terms_sql() -> str:
    """Twin of q_approx_terms: the same truncate-then-merge with window
    functions (a shard that returned fewer than shard_size buckets has
    a complete list — its hidden-count bound is 0)."""
    return (
        "WITH c AS (SELECT doc_id % 4 AS sh, lang AS v, count(*)::BIGINT AS n "
        "FROM documents WHERE lang IS NOT NULL GROUP BY sh, v), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY sh ORDER BY n DESC, v) AS rk, "
        "count(*) OVER (PARTITION BY sh) AS nv FROM c), "
        "ret AS (SELECT * FROM r WHERE rk <= 3), "
        "lastc AS (SELECT sh, CASE WHEN max(nv) > 3 THEN min(n) ELSE 0 END AS l "
        "FROM ret GROUP BY sh), "
        "m AS (SELECT v, sum(n)::BIGINT AS cnt FROM ret GROUP BY v), "
        "e AS (SELECT m.v, m.cnt, (SELECT coalesce(sum(l), 0) FROM lastc "
        "WHERE lastc.sh NOT IN (SELECT sh FROM ret WHERE ret.v = m.v)) AS err FROM m), "
        "tot AS (SELECT coalesce(sum(n), 0) AS t FROM c), "
        "gb AS (SELECT coalesce(sum(l), 0) AS g FROM lastc), "
        "top AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, v) AS rk FROM e), "
        "sel AS (SELECT v, cnt, err FROM top WHERE rk <= 3) "
        "SELECT v AS value, cnt AS count, err AS error_bound FROM sel "
        "UNION ALL SELECT '__other__', "
        "(SELECT t FROM tot) - (SELECT coalesce(sum(cnt), 0) FROM sel), "
        "(SELECT g FROM gb)"
    )


def q_facet_lang(sf_dir: str):
    """ES terms-aggregation analog: per-language hit counts over every
    doc matching a BOOLEAN query, served through the DISTRIBUTED path —
    each bucket-range shard actor aggregates its own match set and only
    K small (value, count) partials reach the coordinator (ES computes
    aggs shard-side; the match set never crosses the wire)."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.facet("(spark OR merge) AND table", by="lang")


def q_histogram_nchars(sf_dir: str):
    """ES histogram-aggregation analog: doc-count per
    floor(n_chars/100)·100 bucket, shard-side partial buckets merged by
    summing (same distributed-agg contract as q_facet_lang)."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.histogram("spark table", "n_chars", 100.0)


def q_match_stats(sf_dir: str):
    """ES extended_stats + (exact) percentiles aggregations over the
    match set of a fulltext query, served through the DISTRIBUTED path:
    each bucket-range shard actor returns a (value, count) partial
    (size ∝ distinct n_chars values, never match size), counts merge as
    exact integers, and the final float math runs once on the merged
    table — bit-identical to the single-searcher path by construction."""
    sh = sharded_searcher(documents_index(sf_dir))
    from elasticsearch_assets_ray.query.engine import (
        percentiles_from_value_counts,
        stats_from_value_counts,
    )

    # ONE distributed match + value-count scatter feeds both finalizers
    vc = sh.value_counts("spark table", "n_chars")
    st = stats_from_value_counts(vc)
    pct = percentiles_from_value_counts(vc, (25.0, 50.0, 75.0, 95.0, 99.0))
    metrics = [
        "count", "min", "max", "sum", "sum_of_squares",
        "avg", "variance", "std_deviation",
    ]
    names = metrics + [f"p{int(p)}" for p in pct["percent"].to_pylist()]
    vals = [float(st[m]) for m in metrics] + pct["value"].to_pylist()
    return pa.table(
        {
            "metric": pa.array(names, pa.string()),
            "value": pa.array([round(v, 6) for v in vals], pa.float64()),
        }
    )


MIX_EPOCHS: dict[str, float] = {"en": 2.5, "fr": 0.5, "de": 0.0}


def q_mixture_sample(sf_dir: str):
    """Training-data domain mixing: per-domain epoch weights upsample
    (e>1), downsample (e<1) or drop (e=0) — floor(e) whole copies plus
    an exact-integer-threshold Bernoulli for the fraction, a pure
    function of (id, salt): partitioning-invariant, no shuffle, the
    corpus streams.  ``epoch`` is the 0-based copy index."""
    from elasticsearch_assets_ray.stages.sampling import mixture_sample

    ds = _rd(sf_dir, "documents", columns=["doc_id", "source", "lang"])
    out = mixture_sample(ds, MIX_EPOCHS, key_col="lang", default_epochs=1.0)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    return t.sort_by([("doc_id", "ascending"), ("epoch", "ascending")])


PERC_QUERIES: dict[str, str] = {
    "spark_tables": "spark table",
    "must_merge": "+merge join",
    "scan_phrase": '"table scan"',
    "no_vector": "batch -vector",
    "en_stream": "stream lang:en",
    "not_phrase": 'key -"table scan"',
}


def _percolate_sql(queries: dict[str, str]) -> str:
    """UNION ALL of per-query match predicates over documents — built
    from the SAME query strings the percolator registers, mirroring the
    engine's flat semantics (candidates ≥1 positive term; must all
    present; must_not absent; phrases adjacent on the space-joined
    analyzed token string; eq filters)."""
    from elasticsearch_assets_ray.query.parser import parse_query

    arms = []
    for name in sorted(queries):
        p = parse_query(queries[name])
        conds = []
        ex = (
            "EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = d.doc_id "
            "AND tok.term = '{t}')"
        )
        if p.should and not p.must and not p.phrases:
            ors = " OR ".join(ex.format(t=t) for t in sorted(set(p.should)))
            conds.append(f"({ors})")
        for t in sorted(set(p.must)):
            conds.append(ex.format(t=t))
        for t in sorted(set(p.must_not)):
            conds.append("NOT " + ex.format(t=t))
        for phr in p.phrases:
            conds.append(f"ts.s LIKE '% {' '.join(phr)} %'")
        for phr in p.not_phrases:
            conds.append(f"ts.s NOT LIKE '% {' '.join(phr)} %'")
        for f, v in sorted(set(p.filters)):
            conds.append(f"COALESCE(d.{f} = '{v}', FALSE)")
        arms.append(
            f"SELECT d.doc_id, '{name}' AS query_name FROM documents d "
            "JOIN ts ON ts.doc_id = d.doc_id WHERE "
            + " AND ".join(conds)
        )
    return (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "ts AS (SELECT doc_id, ' ' || array_to_string("
        f"{_TOK}, ' ') || ' ' AS s FROM documents) "
        + " UNION ALL ".join(arms)
    )


ADJ_QUERIES: dict[str, str] = {
    "spark": "spark",
    "table": "table",
    "merge_must": "+merge join",
}


def q_filters_agg(sf_dir: str):
    """ES filters aggregation: doc count per named query, distributed —
    ONE scatter carries the whole named set; shard counts sum exactly."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.filters_agg(ADJ_QUERIES)


def q_adjacency_matrix(sf_dir: str):
    """ES adjacency_matrix aggregation: named filters plus pairwise
    `a&b` intersections, distributed exactly (doc-partitioned shards ⇒
    intersection counts sum; ids never cross the wire)."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.adjacency_matrix(ADJ_QUERIES)


def _filters_agg_sql(queries: dict[str, str]) -> str:
    """Singles from the percolate-style match predicates.  The engine
    emits EVERY named filter (count 0 included — ES filters-agg
    behavior), so the oracle left-joins the name list rather than
    grouping only matched names."""
    names = ", ".join(f"('{n}')" for n in sorted(queries))
    return (
        f"WITH P AS ({_percolate_sql(queries)}), "
        f"N(value) AS (VALUES {names}) "
        "SELECT N.value, COALESCE(count(P.doc_id), 0)::BIGINT AS count "
        "FROM N LEFT JOIN P ON P.query_name = N.value GROUP BY N.value"
    )


def _adjacency_sql(queries: dict[str, str]) -> str:
    """Singles + pairwise intersections via a doc_id self-join on the
    percolate match set (non-empty buckets only, ES behavior)."""
    return (
        f"WITH P AS ({_percolate_sql(queries)}) "
        "SELECT query_name AS value, count(*)::BIGINT AS count FROM P "
        "GROUP BY query_name "
        "UNION ALL "
        "SELECT a.query_name || '&' || b.query_name AS value, "
        "count(*)::BIGINT AS count FROM P a JOIN P b "
        "ON a.doc_id = b.doc_id AND a.query_name < b.query_name "
        "GROUP BY a.query_name, b.query_name"
    )


def q_percolate(sf_dir: str):
    """ES percolate (reverse search): the registered query set compiled
    once and broadcast; documents stream through an actor pool emitting
    (doc_id, query_name) matches — rule-based routing/tagging at ingest
    scale (no shuffle, per-batch work ∝ relevant-term hits)."""
    from elasticsearch_assets_ray.stages.percolate import percolate

    ds = _rd(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = percolate(ds, PERC_QUERIES)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    return t.sort_by([("query_name", "ascending"), ("doc_id", "ascending")])


def q_events_daily_hll(sf_dir: str):
    """events_daily's distinct-user side through the GROUPED HLL sketch
    (the extreme-cardinality swap: one 2^p-byte register blob per
    (batch, day) instead of a (day, user) pair shuffle).  The oracle
    replicates the registers in SQL (splitmix64 + bin()-length ranks),
    so the sketch itself — not just its error band — is verified."""
    ds = _rd(sf_dir, "events", columns=["ts", "user_id"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.cast(
                    pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us")
                ),
                "user_id": b["user_id"],
            }
        )

    from elasticsearch_assets_ray.stages.sketch import grouped_distinct_hll

    t = grouped_distinct_hll(
        ds.map_batches(_day, batch_format="pyarrow"), "day", "user_id", p=12
    )
    return pa.table({"day": t["key"], "n_users_approx": t["distinct"]})


def q_change_point(sf_dir: str):
    """ES change_point aggregation (step_change detector) over the
    daily event-count series: the daily buckets come from the
    distributed combiner-first date_histogram; the O(n²) split scan is
    a driver-side pass over the n bucket values (ES also detects over
    the bucket series, never the raw docs)."""
    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    ds = _rd(sf_dir, "events", columns=["ts"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))}
        )

    daily = partial_agg(
        ds.map_batches(_day, batch_format="pyarrow"),
        ["day"],
        [AggSpec("n", "day", "count")],
        distinct_hint=5000,
    )
    t = _collect(daily).sort_by([("day", "ascending")])
    cp = pl.change_point(t, "n")
    return pa.table(
        {
            "cp_day": t["day"].slice(cp["index"] - 1, 1),
            "cp_index": pa.array([cp["index"]], pa.int64()),
            "score_r": pa.array([_round_half_up(np.array([cp["score"]]), 6)[0]]),
        }
    )


def _change_point_sql() -> str:
    """Twin of q_change_point: the same pinned SSE expression per split,
    argmin by (sse, split)."""
    return (
        "WITH daily AS (SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n "
        " FROM events GROUP BY day), "
        "idx AS (SELECT day, n, row_number() OVER (ORDER BY day) AS i FROM daily), "
        "tot AS (SELECT count(*)::BIGINT AS nn, sum(n)::BIGINT AS s, "
        " sum(n * n)::BIGINT AS q FROM idx), "
        "pre AS (SELECT i, sum(n) OVER (ORDER BY i)::BIGINT AS sl, "
        " sum(n * n) OVER (ORDER BY i)::BIGINT AS ql FROM idx), "
        # every operand cast to DOUBLE BEFORE multiply/subtract — the
        # engine computes in float64 end-to-end, and BIGINT*BIGINT stays
        # exact past 2^53 where doubles round (argmin near-ties would flip)
        "scored AS (SELECT p.i AS split, "
        " (CAST(p.ql AS DOUBLE) - (CAST(p.sl AS DOUBLE) * CAST(p.sl AS DOUBLE))"
        "  / CAST(p.i AS DOUBLE)) "
        " + ((CAST(t.q AS DOUBLE) - CAST(p.ql AS DOUBLE))"
        "  - ((CAST(t.s AS DOUBLE) - CAST(p.sl AS DOUBLE))"
        "     * (CAST(t.s AS DOUBLE) - CAST(p.sl AS DOUBLE)))"
        "  / CAST(t.nn - p.i AS DOUBLE)) AS sse, "
        " CAST(t.q AS DOUBLE) - (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))"
        "  / CAST(t.nn AS DOUBLE) AS sse0 "
        " FROM pre p CROSS JOIN tot t WHERE p.i < t.nn), "
        "best AS (SELECT split, sse, sse0, "
        " row_number() OVER (ORDER BY sse, split) AS rn FROM scored) "
        "SELECT (SELECT day FROM idx WHERE i = b.split + 1) AS cp_day, "
        "b.split + 1 AS cp_index, round(b.sse0 - b.sse, 6) AS score_r "
        "FROM best b WHERE rn = 1"
    )


#: the five synthetic event types (sorted) — the frequent_item_sets alphabet
EVENT_TYPE_ITEMS = ["click", "error", "purchase", "signup", "view"]


def q_frequent_item_sets(sf_dir: str):
    """ES frequent_item_sets aggregation: transactions = the distinct
    event types per user (bitmask alphabet), support counted exactly via
    two combiner-first shuffles + a driver mask closure
    (stages/itemsets.py)."""
    from elasticsearch_assets_ray.stages.itemsets import frequent_item_sets

    ds = _rd(sf_dir, "events", columns=["user_id", "event_type"])
    out = frequent_item_sets(
        ds, "user_id", "event_type", EVENT_TYPE_ITEMS, min_support=1, min_size=2
    )
    return out.sort_by([("itemset", "ascending")])


def _frequent_item_sets_sql() -> str:
    flags = ", ".join(
        f"max(CASE WHEN event_type = '{it}' THEN 1 ELSE 0 END) AS f{i}"
        for i, it in enumerate(EVENT_TYPE_ITEMS)
    )
    arms = []
    n = len(EVENT_TYPE_ITEMS)
    for s in range(1, 1 << n):
        size = bin(s).count("1")
        if size < 2:
            continue
        label = "+".join(it for i, it in enumerate(EVENT_TYPE_ITEMS) if s >> i & 1)
        cond = " AND ".join(f"f{i} = 1" for i in range(n) if s >> i & 1)
        arms.append(
            f"SELECT '{label}' AS itemset, {size} AS size, "
            f"count(*)::BIGINT AS support FROM f WHERE {cond}"
        )
    return (
        "WITH f AS (SELECT user_id, "
        + flags
        + " FROM events GROUP BY user_id) "
        "SELECT itemset, size, support FROM ("
        + " UNION ALL ".join(arms)
        + ") WHERE support >= 1 ORDER BY itemset"
    )


AGG_RANGES: list[tuple[float | None, float | None]] = [
    (None, 200.0),
    (200.0, 400.0),
    (400.0, None),
]


def q_facet_metric(sf_dir: str):
    """ES terms agg + avg metric SUB-aggregation (the bucket+metric
    shape ES composes per shard), served distributed: shard actors
    return (value, metric, count) integer partials; the float math runs
    once after the exact merge."""
    sh = sharded_searcher(documents_index(sf_dir))
    t = sh.facet_metric("spark table", by="lang", metric="n_chars")
    return pa.table(
        {
            "value": t["value"],
            "count": t["count"],
            "avg_r": pa.array(
                [round(x, 6) for x in t["avg"].to_pylist()], pa.float64()
            ),
        }
    )


def q_significant_terms(sf_dir: str):
    """ES significant_terms (JLH) over the match set of a fulltext
    query, distributed: each shard tokenizes ITS matching docs into a
    (term, fg) partial; background df comes from the coordinator's term
    dictionary; exact — unlike ES's default shard-local approximation."""
    sh = sharded_searcher(documents_index(sf_dir))
    t = sh.significant_terms("spark table", size=10, min_doc_count=3)
    return pa.table(
        {
            "term": t["term"],
            "fg": t["fg"],
            "bg": t["bg"],
            "score_r": pa.array(
                [round(x, 6) for x in t["score"].to_pylist()], pa.float64()
            ),
        }
    )


def q_range_agg(sf_dir: str):
    """ES range aggregation ([from, to) half-open buckets, independent
    counting, ES `lo-hi` keys) over the fulltext match set — one
    value_counts scatter, binned once on the coordinator."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.range_agg("spark table", "n_chars", AGG_RANGES)


def q_top_hits(sf_dir: str):
    """ES terms agg + top_hits SUB-aggregation: per-lang top-3 hits at
    the round-9/docID ranking contract, shard-local per-bucket top-n
    partials re-selected by the shared comparator (exact merge)."""
    sh = sharded_searcher(documents_index(sf_dir))
    t = sh.top_hits("spark table", by="lang", n=3)
    return pa.table(
        {
            "value": t["value"],
            "rank": t["rank"],
            "doc_id": t["doc_id"],
            "score_r": pa.array(
                [round(x, 6) for x in t["score"].to_pylist()], pa.float64()
            ),
        }
    )


SPLIT_RATIOS = {"train": 0.8, "val": 0.1, "test": 0.1}
STRATA_FRACTIONS = {"de": 0.5, "en": 0.25, "fr": 0.75, "es": 1.0}


def q_events_daily(sf_dir: str):
    """ES date_histogram + cardinality aggregation analog over the
    events table: per UTC day, event count and DISTINCT active users.
    Counts are combiner-first (`partial_agg`); the distinct-user side
    dedups (day, user) pairs with ONE bounded shuffle before the final
    count — the two-phase exact-cardinality shape that scales (a
    HyperLogLog sketch would replace phase one at extreme cardinality)."""
    ds = _rd(sf_dir, "events", columns=["ts", "user_id"])

    def _day(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.cast(
                    pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us")
                ),
                "user_id": b["user_id"],
            }
        )

    days = ds.map_batches(_day, batch_format="pyarrow")
    # ONE scan + ONE bounded shuffle: the (day, user) pair counts carry
    # both answers — n_events = Σ pair counts, n_users = non-null pair
    # rows.  The pair table is small (≤ users × days); materialize it so
    # the two final aggregations don't re-execute the events scan.
    pairs = partial_agg(
        days,
        ["day", "user_id"],
        [AggSpec("n", "day", "count")],
    ).materialize()
    n_events = partial_agg(
        pairs,
        ["day"],
        [AggSpec("n_events", "n", "sum")],
        distinct_hint=4096,  # ~11 years of days
    )
    # count(DISTINCT user_id) excludes nulls (SQL semantics)
    non_null = pairs.map_batches(
        lambda b: b.filter(pc.is_valid(b["user_id"])), batch_format="pyarrow"
    )
    n_users = partial_agg(
        non_null,
        ["day"],
        [AggSpec("n_users", "user_id", "count")],
        distinct_hint=4096,
    )
    a = _collect(n_events)
    b = _collect(n_users)
    bmap = dict(
        zip(b["day"].to_pylist(), b["n_users"].to_pylist())
    )
    return pa.table(
        {
            "day": a["day"],
            "n_events": a["n_events"],
            "n_users": pa.array(
                [bmap.get(d, 0) for d in a["day"].to_pylist()], pa.int64()
            ),
        }
    )


COMPOSITE_SOURCES: tuple = (("lang", None), ("n_chars", 200.0))
COMPOSITE_PAGE = 7


def q_composite_agg(sf_dir: str):
    """ES ``composite`` aggregation: the after_key-paginated bucket scan,
    served DISTRIBUTED (per-page scatter of size-bounded shard partials,
    exact merged counts) and driven to exhaustion here — every page
    is emitted with its page number, so the oracle checks both the
    bucket space AND the pagination boundaries."""
    sh = sharded_searcher(documents_index(sf_dir))
    pages = []
    after = None
    for pageno in range(1000):  # hard stop; the scan exhausts long before
        t, after = sh.composite(
            "spark table", COMPOSITE_SOURCES, size=COMPOSITE_PAGE, after=after
        )
        if t.num_rows == 0:
            break
        pages.append(
            pa.table(
                {
                    "page": pa.array([pageno] * t.num_rows, pa.int64()),
                    "lang": t["lang"],
                    "bucket": t["n_chars"],
                    "count": t["count"],
                }
            )
        )
        if t.num_rows < COMPOSITE_PAGE:
            break
    return pa.concat_tables(pages)


def q_search_alias(sf_dir: str):
    """ES filtered alias (filter-context bool.filter): search through an
    alias whose filter query silently restricts the match set — scores
    are the RAW query's BM25, untouched (filters never score), evaluated
    shard-locally."""
    from elasticsearch_assets_ray.query.templates import AliasStore

    sh = sharded_searcher(documents_index(sf_dir))
    aliases = AliasStore()
    aliases.put("spark_docs", sh, filter="merge join")
    t = aliases.search("spark_docs", "spark table", k=10)
    return pa.table(
        {
            "query_id": pa.array([0] * t.num_rows, pa.int64()),
            "doc_id": t["doc_id"],
            "rank": pa.array(range(1, t.num_rows + 1), pa.int64()),
            "score_r": pa.array(
                [round(x, 6) for x in t["score"].to_pylist()], pa.float64()
            ),
        }
    )


def q_search_explain(sf_dir: str):
    """ES _explain over the top-3 hits of a query: per-term BM25
    breakdown whose contributions the SQL twin re-derives from the same
    formula — and whose sorted-order sum IS the hit's score (pinned
    bit-exactly in tests)."""
    sh = sharded_searcher(documents_index(sf_dir))
    top = sh.search("spark table", k=3)
    rows = []
    for d in top["doc_id"].to_pylist():
        e = sh.explain("spark table", int(d))
        for t, tf, c in zip(
            e["term"].to_pylist(), e["tf"].to_pylist(), e["contribution"].to_pylist()
        ):
            rows.append((t, int(d), int(tf), round(float(c), 6)))
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "tf": pa.array([r[2] for r in rows], pa.int64()),
            "contribution_r": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def q_matrix_stats(sf_dir: str):
    """ES matrix_stats over (n_chars, token_count): integer co-moment
    partials per batch (one tiny row each), exact sums, all float math
    once at the end — mean / sample variance / covariance / Pearson
    correlation, bit-replicated by the SQL twin's identical E-form
    expressions."""
    from elasticsearch_assets_ray.stages.relational import matrix_stats
    from elasticsearch_assets_ray.stages.textstats import token_stats

    ds = _rd(sf_dir, "documents", columns=["text", "n_chars"]).map_batches(
        token_stats, batch_format="pyarrow"
    )
    return matrix_stats(ds, ["n_chars", "token_count"])


AUTO_HISTO_TARGET = 20


def q_auto_date_histogram(sf_dir: str):
    """ES auto_date_histogram: the interval comes off a fixed rounding
    ladder — the smallest whose aligned bucket count fits the target —
    then the bucketing is a plain combiner-first date histogram.  The
    chosen interval is emitted on every row so the oracle verifies the
    ladder choice, not just the buckets."""
    from elasticsearch_assets_ray.sources.dates import auto_interval_us
    from elasticsearch_assets_ray.sources.reader import min_max_probe

    lo, hi = min_max_probe(_p(sf_dir, "events"), "ts")
    mn = int(pa.scalar(lo, pa.timestamp("us")).cast(pa.int64()).as_py())
    mx = int(pa.scalar(hi, pa.timestamp("us")).cast(pa.int64()).as_py())
    iv = auto_interval_us(mn, mx, AUTO_HISTO_TARGET)

    ds = _rd(sf_dir, "events", columns=["ts"])

    def bucketize(b: pa.Table) -> pa.Table:
        us = b["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"bucket": pa.array((us // iv) * iv, pa.int64())}
        )

    t = _collect(
        partial_agg(
            ds.map_batches(bucketize, batch_format="pyarrow"),
            ["bucket"],
            [AggSpec("count", "bucket", "count")],
            distinct_hint=AUTO_HISTO_TARGET * 2,
        )
    ).sort_by([("bucket", "ascending")])
    return pa.table(
        {
            "bucket": t["bucket"].combine_chunks().cast(pa.timestamp("us")),
            "count": t["count"].combine_chunks().cast(pa.int64()),
            "interval_us": pa.array([iv] * t.num_rows, pa.int64()),
        }
    )


GEOHASH_PRECISION = 2  # 32×32 world grid — bounded bucket count at any sf


def q_geohash_grid(sf_dir: str):
    """ES geohash_grid aggregation over the derived event lat/lon:
    vectorized integer bit-interleave encode per batch, combiner-first
    count partials, exact merge.  Geohash (not Mercator geotile) is the
    oracle-checked grid because its quantizer has no transcendentals —
    the SQL twin computes the identical cell."""
    from elasticsearch_assets_ray.sources.geo import geohash_grid

    ds = _rd(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        _derive_latlon, batch_format="pyarrow"
    )
    return geohash_grid(ds, "lat", "lon", precision=GEOHASH_PRECISION)


def q_rare_terms(sf_dir: str):
    """ES rare_terms (long-tail buckets, exact): untruncated per-shard
    facet partials merged THEN filtered to count ≤ 2 — ES approximates
    with a CuckooFilter, this path is exact."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.rare_terms("spark table", by="n_chars", max_doc_count=2)


def q_multi_terms(sf_dir: str):
    """ES multi_terms ((lang, source) tuple buckets, count-desc),
    distributed with untruncated tuple-key partials."""
    sh = sharded_searcher(documents_index(sf_dir))
    t = sh.multi_terms("spark table", ("lang", "source"), size=10)
    return t.append_column(
        "rank", pa.array(range(1, t.num_rows + 1), pa.int64())
    )


def q_mad_nchars(sf_dir: str):
    """ES median_absolute_deviation over the match set — exact, from the
    same one value_counts scatter as stats/percentiles."""
    sh = sharded_searcher(documents_index(sf_dir))
    v = sh.mad("spark table", "n_chars")
    return pa.table({"mad_r": pa.array([round(float(v), 6)], pa.float64())})


def q_weighted_avg(sf_dir: str):
    """ES terms + weighted_avg sub-agg over the lineitem table: average
    extended price weighted by quantity, per returnflag.  Money is
    summed in integer cents and weights in integer units (combiner-first
    partial_agg), so the one final float division is exact-input —
    bit-identical to the SQL twin."""
    ds = _rd(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def der(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))), pa.int64()
        )
        qty = pc.cast(b["l_quantity"], pa.int64())
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "vw": pc.multiply(cents, qty),
                "w": qty,
            }
        )

    t = _collect(
        partial_agg(
            ds.map_batches(der, batch_format="pyarrow"),
            ["l_returnflag"],
            [AggSpec("sum_vw", "vw", "sum"), AggSpec("sum_w", "w", "sum")],
            distinct_hint=8,
        )
    ).sort_by([("l_returnflag", "ascending")])
    wavg = [
        round((vw / 100.0) / w, 6)
        for vw, w in zip(t["sum_vw"].to_pylist(), t["sum_w"].to_pylist())
    ]
    return pa.table(
        {
            "l_returnflag": t["l_returnflag"],
            "sum_w": t["sum_w"].combine_chunks().cast(pa.int64()),
            "wavg_r": pa.array(wavg, pa.float64()),
        }
    )


def q_pipeline_daily(sf_dir: str):
    """ES pipeline aggregations over a date_histogram parent: the daily
    event counts are built DISTRIBUTED (combiner-first ``partial_agg``,
    the shuffle moves per-batch partials), then the pipeline chain —
    derivative, cumulative_sum, moving_fn(avg, window=3), serial_diff
    (lag 2), bucket_selector(n ≥ avg) + bucket_sort(top 5), and the
    sibling ``*_bucket`` stats — runs ONCE on the merged bucket table,
    exactly ES's reduce-phase placement (pipeline aggs never touch data
    nodes).  Output is tall: (part, value, count, metric_r), one row per
    bucket per pipeline stage, nulls (warm-up buckets) omitted."""
    from elasticsearch_assets_ray.query import pipeline_aggs as pl

    ds = _rd(sf_dir, "events", columns=["ts"])
    days = ds.map_batches(
        lambda b: pa.table(
            {"day": pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))}
        ),
        batch_format="pyarrow",
    )
    b = _collect(
        partial_agg(days, ["day"], [AggSpec("n", "day", "count")], distinct_hint=4096)
    ).sort_by([("day", "ascending")])
    b = pl.derivative(b, "n")
    b = pl.cumulative_sum(b, "n")
    b = pl.moving_fn(b, "n", window=3)
    b = pl.serial_diff(b, "n", lag=2)
    # bucket_script (share of the running total) + normalize methods
    b = pl.bucket_script(
        b, ["n", "n_cumsum"], lambda n, c: n / c, "n_share"
    )
    b = pl.normalize(b, "n", "percent_of_sum", out="n_pct")
    b = pl.normalize(b, "n", "z-score", out="n_z")
    b = pl.rate(b, "n", bucket="day", unit="hour")
    b = pl.rate(b, "n", bucket="day", unit="week")
    ds_ = pc.strftime(b["day"], format="%Y-%m-%d").to_pylist()
    n = b["n"].to_pylist()
    deriv = b["n_deriv"].to_pylist()
    csum = b["n_cumsum"].to_pylist()
    mavg = b["n_mavg"].to_pylist()
    d2 = b["n_diff2"].to_pylist()
    rows: list[tuple[str, str, int, float]] = []
    share = b["n_share"].to_pylist()
    npct = b["n_pct"].to_pylist()
    nz = b["n_z"].to_pylist()
    rh = b["n_rate_hour"].to_pylist()
    rw = b["n_rate_week"].to_pylist()
    for i in range(b.num_rows):
        if deriv[i] is not None:
            rows.append(("deriv", ds_[i], int(deriv[i]), 0.0))
        rows.append(("cumsum", ds_[i], int(csum[i]), 0.0))
        if mavg[i] is not None:
            rows.append(("mavg", ds_[i], 0, round(float(mavg[i]), 6)))
        if d2[i] is not None:
            rows.append(("diff2", ds_[i], int(d2[i]), 0.0))
        rows.append(("bscript", ds_[i], 0, _round_half_up(float(share[i]), 6)))
        rows.append(("norm_pct", ds_[i], 0, _round_half_up(float(npct[i]), 6)))
        rows.append(("norm_z", ds_[i], 0, _round_half_up(float(nz[i]), 6)))
        rows.append(("rate_hour", ds_[i], 0, _round_half_up(float(rh[i]), 6)))
        rows.append(("rate_week", ds_[i], 0, _round_half_up(float(rw[i]), 6)))
    # cumulative_cardinality: distinct users ever seen, per day — a
    # bounded (day,user) dedup shuffle, first-seen fold on the driver
    pairs = _collect(
        partial_agg(
            _rd(sf_dir, "events", columns=["ts", "user_id"]).map_batches(
                lambda t: pa.table(
                    {
                        "day": pc.cast(
                            pc.floor_temporal(t["ts"], unit="day"),
                            pa.timestamp("us"),
                        ),
                        "user_id": t["user_id"],
                    }
                ),
                batch_format="pyarrow",
            ),
            ["day", "user_id"],
            [AggSpec("c", "user_id", "count")],
        )
    )
    fu = (
        pairs.group_by("user_id")
        .aggregate([("day", "min")])
        .column("day_min")
        .to_numpy(zero_copy_only=False)
    )
    days_np = b["day"].to_numpy(zero_copy_only=False)
    cc = np.searchsorted(np.sort(fu), days_np, side="right")
    for i in range(b.num_rows):
        rows.append(("cumcard", ds_[i], int(cc[i]), 0.0))
    # moving_percentiles (exact backing): per-(day, value) partials from
    # ONE combiner-first shuffle, window merge + quantile on the driver
    dvc = _collect(
        partial_agg(
            _rd(sf_dir, "events", columns=["ts", "value"]).map_batches(
                lambda t: pa.table(
                    {
                        "day": pc.cast(
                            pc.floor_temporal(t["ts"], unit="day"),
                            pa.timestamp("us"),
                        ),
                        "value": t["value"],
                    }
                ),
                batch_format="pyarrow",
            ),
            ["day", "value"],
            [AggSpec("count", "value", "count")],
        )
    )
    mp = pl.moving_percentiles(dvc, "day", window=3, percent=50.0)
    mp_ds = pc.strftime(mp["day"], format="%Y-%m-%d").to_pylist()
    for d, v in zip(mp_ds, mp["value"].to_pylist()):
        rows.append(("mperc", d, 0, _round_half_up(float(v), 6)))
    sib = pl.sibling_stats(b, "n")
    # bucket_selector(n >= avg_bucket) then bucket_sort(n desc, day asc, 5)
    kept = pl.bucket_selector(b, "n", "gte", sib["avg"])
    top = pl.bucket_sort(
        kept, [("n", "descending"), ("day", "ascending")], size=5
    )
    tds = pc.strftime(top["day"], format="%Y-%m-%d").to_pylist()
    tn = top["n"].to_pylist()
    for r, (d, v) in enumerate(zip(tds, tn), start=1):
        rows.append(("top", d, int(v), float(r)))
    for k in ("count", "min", "max", "sum"):
        rows.append(("sibling", k, int(sib[k]), 0.0))
    rows.append(("sibling", "avg", 0, round(float(sib["avg"]), 6)))
    return pa.table(
        {
            "part": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.string()),
            "count": pa.array([r[2] for r in rows], pa.int64()),
            "metric_r": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


PACK_BUDGET = 1000


def q_pack_documents(sf_dir: str):
    """Token-budgeted greedy sequence packing (LLM training prep):
    docs in id order fill a pack until the budget would overflow;
    oversize docs stay whole in their own pack.  One shard here (the
    distributed contract packs each partition independently with
    partition-prefixed pack ids)."""
    from elasticsearch_assets_ray.stages.packing import pack_documents

    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    stats = ds.map_batches(
        lambda b: textstats.token_stats(b, "text"), batch_format="pyarrow"
    ).select_columns(["doc_id", "token_count"])
    packed = pack_documents(
        stats.repartition(1), budget=PACK_BUDGET, count_col="token_count"
    )
    return packed.select_columns(["doc_id", "token_count", "pack_id", "pack_pos"])


CHUNK_WINDOW = 40
CHUNK_STRIDE = 32


def q_chunk_documents(sf_dir: str):
    """Token-window document chunking with overlap (stages/chunking.py):
    window 40 / stride 32 over the canonical analysis chain's kept
    tokens (the context-window chunking every pretraining / RAG
    ingestion pipeline needs).  One stateless vectorized map_batches —
    no shuffle; chunk_text is the space-joined token slice so the
    operator is string-exactly oracle-checkable."""
    from elasticsearch_assets_ray.stages.chunking import chunk_documents

    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, window=CHUNK_WINDOW, stride=CHUNK_STRIDE)


def _chunk_sql(w: int = CHUNK_WINDOW, s: int = CHUNK_STRIDE) -> str:
    """Twin of q_chunk_documents: chunk k of an n-token doc covers
    kept-token positions [k*s, min(k*s+w, n)); DuckDB list slices are
    1-based inclusive so the text slice is T[k*s+1 : k*s+n_tokens]."""
    return (
        f"WITH tk AS (SELECT doc_id, {_TOK} AS T FROM documents), "
        "b AS (SELECT doc_id, T, CAST(len(T) AS BIGINT) AS n FROM tk), "
        "m AS (SELECT doc_id, T, n, "
        f" CASE WHEN n = 0 THEN 0 WHEN n <= {w} THEN 1 "
        f"      ELSE (n - {w} + {s} - 1) // {s} + 1 END AS m FROM b), "
        "ch AS (SELECT doc_id, T, n, "
        " unnest(generate_series(0, m - 1)) AS k FROM m WHERE m > 0) "
        "SELECT doc_id, CAST(k AS BIGINT) AS chunk_id, "
        f" CAST(k * {s} AS BIGINT) AS start_tok, "
        f" CAST(least(k * {s} + {w}, n) - k * {s} AS BIGINT) AS n_tokens, "
        f" array_to_string(T[k * {s} + 1 : least(k * {s} + {w}, n)], ' ') "
        "  AS chunk_text "
        "FROM ch"
    )


# ---------------------------------------------------------------------------
# ES|QL (query/esql.py) — the pipe language compiled onto Ray Data
# ---------------------------------------------------------------------------

_ESQL_TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _esql_tables(sf_dir: str) -> dict[str, str]:
    return {t: _p(sf_dir, t) for t in _ESQL_TABLE_NAMES}


ESQL_DAILY = """FROM events
| WHERE event_type != "view"
| EVAL day = DATE_TRUNC("day", ts)
| STATS n_events = COUNT(*), n_users = COUNT_DISTINCT(user_id) BY day
| SORT day
| LIMIT 100000"""

ESQL_REVENUE = """FROM orders
| RENAME o_custkey AS c_custkey
| LOOKUP JOIN customer ON c_custkey
| EVAL rc = TO_LONG(ROUND(o_totalprice * 100))
| STATS revenue_c = SUM(rc), n_orders = COUNT(*) BY c_mktsegment
| EVAL revenue = revenue_c / 100.0
| KEEP c_mktsegment, revenue, n_orders
| SORT c_mktsegment"""

ESQL_MATCH = """FROM documents
| WHERE MATCH(text, "spark join", "and") AND lang != "de"
| STATS count = COUNT(*), med = MEDIAN(n_chars) BY lang
| EVAL metric_r = ROUND(med, 6)
| RENAME lang AS value
| KEEP value, count, metric_r
| SORT value"""

ESQL_PCTL = """FROM events
| WHERE value IS NOT NULL
| STATS count = COUNT(*), p90 = PERCENTILE(value, 90) BY event_type
| EVAL metric_r = ROUND(p90, 6)
| RENAME event_type AS value
| KEEP value, count, metric_r
| SORT value"""

ESQL_STRINGS = """FROM documents
| EVAL head = SUBSTRING(text, 1, 12), up = TO_UPPER(lang), tag = CONCAT(lang, ":", source), ln = LENGTH(text)
| WHERE ln % 7 == 3 AND NOT(lang IN ("xx"))
| KEEP doc_id, head, up, tag, ln
| SORT doc_id
| LIMIT 200"""


def q_esql_daily(sf_dir: str):
    """ES|QL date_histogram + exact distinct: WHERE filter, EVAL
    DATE_TRUNC, STATS COUNT/COUNT_DISTINCT BY day — the main counts ride
    one combiner-first partial_agg, the distinct side a bounded
    (day, user)-dedup branch (query/esql.py)."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_DAILY, _esql_tables(sf_dir), stats_hint=4096)


def q_esql_revenue(sf_dir: str):
    """ES|QL LOOKUP JOIN (8.18): broadcast hash join against the small
    customer lookup index + cents-exact revenue STATS — same result
    contract as q_revenue_by_segment, expressed in the pipe language."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_REVENUE, _esql_tables(sf_dir), stats_hint=8)


def q_esql_match(sf_dir: str):
    """ES|QL MATCH() full-text filter (AND operator) composed with
    STATS MEDIAN — the match is the analyzed-token membership mask,
    evaluated per batch in filter context; MEDIAN is exact
    (quantile_cont convention) where ES t-digests."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_MATCH, _esql_tables(sf_dir), stats_hint=8)


def q_esql_match_idx(sf_dir: str):
    """ESQL_MATCH through MATCH PUSHDOWN: the MATCH conjunct resolves
    ONCE through the fulltext index's score-free match_ids (how ES|QL
    itself serves MATCH) and the scan drops the text column entirely —
    the id-membership filter is the only trace.  Same oracle as
    esql_match: the two serving paths must be value-identical."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(
        ESQL_MATCH,
        _esql_tables(sf_dir),
        stats_hint=8,
        indexes={
            "documents": {
                "dir": documents_index(sf_dir),
                "field": "text",
                "key": "doc_id",
            }
        },
    )


def q_esql_pctl(sf_dir: str):
    """ES|QL PERCENTILE (exact, from the bounded (key, value)-count
    branch) per event_type."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_PCTL, _esql_tables(sf_dir), stats_hint=8)


def q_esql_strings(sf_dir: str):
    """ES|QL scalar-function battery: SUBSTRING/TO_UPPER/CONCAT/LENGTH,
    `%` arithmetic, NOT IN, SORT+LIMIT fused to a streaming top-k."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_STRINGS, _esql_tables(sf_dir))


ESQL_GROK = """FROM events
| GROK props "%{NUMBER:k:int}"
| STATS count = COUNT(*), ksum = SUM(k) BY event_type
| EVAL metric_r = TO_DOUBLE(ksum)
| RENAME event_type AS value
| KEEP value, count, metric_r
| SORT value"""

ESQL_MV = """FROM documents
| EVAL w = SPLIT(SUBSTRING(text, 1, 20), " ")
| MV_EXPAND w
| WHERE LENGTH(w) > 3
| STATS count = COUNT(*) BY w
| RENAME w AS value
| EVAL metric_r = 0.0
| KEEP value, count, metric_r
| SORT count DESC, value ASC
| LIMIT 25"""


def q_esql_grok(sf_dir: str):
    """ES|QL GROK: semi-structured extraction (one vectorized
    pc.extract_regex per batch, %{NUMBER:k:int} typed capture) feeding an
    integer-exact STATS — the ingest-pipeline grok processor analog."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_GROK, _esql_tables(sf_dir), stats_hint=8)


def q_esql_mv(sf_dir: str):
    """ES|QL SPLIT + MV_EXPAND: multivalue expansion (offset arithmetic,
    no Python loop) with a post-expansion WHERE and term-count STATS —
    SORT+LIMIT fused to a deterministic (count DESC, value ASC) top-k."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_MV, _esql_tables(sf_dir))


ESQL_FORK = """FROM documents
| FORK ( WHERE MATCH(text, "spark join", "and") )
       ( WHERE n_chars > 450 )
| STATS count = COUNT(*) BY _fork, lang
| EVAL value = CONCAT(_fork, ":", lang), metric_r = 0.0
| KEEP value, count, metric_r
| SORT value"""


def q_esql_fork(sf_dir: str):
    """ES|QL FORK (8.19): two branch sub-pipelines — a MATCH filter and
    a numeric filter — over the shared stream, unioned with the _fork
    discriminator and aggregated per (branch, lang)."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_FORK, _esql_tables(sf_dir), stats_hint=16)


ESQL_STATS2 = """FROM events
| WHERE value IS NOT NULL
| EVAL vc = TO_LONG(ROUND(value * 100))
| STATS count = COUNT(*), sd = STD_DEV(vc), wa = WEIGHTED_AVG(vc, user_id), tp = TOP(vc, 3, "desc") BY event_type
| MV_EXPAND tp
| EVAL value = CONCAT(event_type, ":", TO_STRING(tp)), metric_r = ROUND(sd + wa, 6)
| KEEP value, count, metric_r
| SORT value"""


def q_esql_stats2(sf_dir: str):
    """ES|QL extended STATS battery: STD_DEV (pinned-DOUBLE population
    moments over integer cents — the SQL twin replicates the exact
    float64 expression order), WEIGHTED_AVG (integer sum pair), and TOP
    (top-3 with multiplicity) flattened to rows via MV_EXPAND.  sd+wa
    ride ONE rounded metric column: a defect in either flips the gate
    hash."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_STATS2, _esql_tables(sf_dir), stats_hint=8)


ESQL_INLINE = """FROM events
| WHERE value IS NOT NULL
| EVAL vc = TO_LONG(ROUND(value * 100))
| INLINESTATS gn = COUNT(*), gsum = SUM(vc) BY event_type
| WHERE vc * gn > gsum
| STATS count = COUNT(*) BY event_type
| RENAME event_type AS value
| EVAL metric_r = 0.0
| KEEP value, count, metric_r
| SORT value"""


def q_esql_inline(sf_dir: str):
    """ES|QL INLINESTATS (the window-function analog): per-type count
    and cents-sum joined back onto every event row without collapsing,
    then an integer-exact above-group-average filter (vc·gn > gsum —
    no float division anywhere)."""
    from elasticsearch_assets_ray.query.esql import esql

    return esql(ESQL_INLINE, _esql_tables(sf_dir), stats_hint=8)


_BPE_TOP_PAIRS = 30


def q_bpe_pairs(sf_dir: str):
    """Distributed BPE training, iteration-0 evidence: the weighted
    adjacent-symbol pair counts over the (one-shuffle) word-frequency
    dictionary — the exact quantity the first merge argmaxes over
    (stages/bpe_train.py).  Top pairs by (count DESC, pair ASC)."""
    from elasticsearch_assets_ray.stages.bpe_train import (
        _init_symbols,
        collect_word_freqs,
        pair_counts,
        word_freqs,
    )

    wf = collect_word_freqs(word_freqs(_rd(sf_dir, "documents", columns=["text"])))
    words = wf["word"].to_pylist()
    weights = wf["count"].to_numpy(zero_copy_only=False).astype(np.int64)
    syms, word_ids, vocab = _init_symbols(words)
    uk, cnt = pair_counts(syms, word_ids, weights)
    V = int(syms.max()) + 1
    pairs = [f"{vocab[int(k // V)]}|{vocab[int(k % V)]}" for k in uk]
    order = sorted(range(len(pairs)), key=lambda i: (-int(cnt[i]), pairs[i]))
    top = order[:_BPE_TOP_PAIRS]
    return pa.table(
        {
            "value": pa.array([pairs[i] for i in top], pa.string()),
            "count": pa.array([int(cnt[i]) for i in top], pa.int64()),
            "metric_r": pa.array(
                [float(r + 1) for r in range(len(top))], pa.float64()
            ),
        }
    )


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment over the documents table
    — one stateless map_batches, stable across runs/partitionings
    (stages/sampling.py; beyond-the-reference training-data op)."""
    from elasticsearch_assets_ray.stages.sampling import assign_splits

    ds = _rd(sf_dir, "documents", columns=["doc_id"])
    return assign_splits(ds, SPLIT_RATIOS)


def q_stratified_sample(sf_dir: str):
    """Per-language Bernoulli sampling at different rates (downsample
    high-resource langs, keep low-resource) — one index_in + one
    compare per batch, no shuffle."""
    from elasticsearch_assets_ray.stages.sampling import stratified_sample

    ds = _rd(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(
        ds, STRATA_FRACTIONS, key_col="lang", default_fraction=0.1
    )


def q_search_boolops(sf_dir: str):
    """Lucene boolean expressions — AND / OR / NOT + parentheses, the
    operator surface of the ``query_string`` queries the reference
    passes to Lucene verbatim (utils.ts:94-100).  Match = tree
    evaluation (incl. DNF shapes the flat +/- syntax cannot express);
    score = Lucene's sum-of-matching-clauses over the positive-polarity
    term leaves."""
    return _search_many(sf_dir, BOOLOP_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


def q_search_range(sf_dir: str):
    """Fielded RANGE filters (`n_chars:[150 TO 300}`, `n_chars:>=400`,
    `lang:[de TO es]`) — the xLucene range clause the reference itself
    emits for its date windows (SpacesReaderClient.ts:250); compared in
    the column's type, evaluated like the equality filters."""
    return _search_many(sf_dir, RANGE_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90)


# ---------------------------------------------------------------------------
# delete-by-query + expunge (the _delete_by_query / _forcemerge analogs)
# ---------------------------------------------------------------------------

DELETE_TERM = "stream"
_DELETED_IDX_CACHE: dict[str, str] = {}
_EXPUNGED_IDX_CACHE: dict[str, str] = {}


def _linked_index_copy(src: str, dst: str) -> str:
    """Hardlink copy of an index (manifest + segments + docstore): the
    parquet payloads stay shared read-only; tombstones and any new files
    land only in the copy."""
    import shutil

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    for sub in ("segments", "docstore"):
        for root, _dirs, files in os.walk(os.path.join(src, sub)):
            rel = os.path.relpath(root, src)
            os.makedirs(os.path.join(dst, rel), exist_ok=True)
            for f in files:
                os.link(os.path.join(root, f), os.path.join(dst, rel, f))
    shutil.copy2(os.path.join(src, "manifest.json"), dst)
    return dst


def deleted_documents_index(sf_dir: str) -> str:
    """Documents index copy with every DELETE_TERM match tombstoned."""
    from elasticsearch_assets_ray.index.deletes import delete_by_query

    if sf_dir in _DELETED_IDX_CACHE:
        return _DELETED_IDX_CACHE[sf_dir]
    dst = _linked_index_copy(
        documents_index(sf_dir), documents_index(sf_dir) + "-del"
    )
    delete_by_query(dst, DELETE_TERM)
    _DELETED_IDX_CACHE[sf_dir] = dst
    return dst


def expunged_documents_index(sf_dir: str) -> str:
    """The tombstoned copy physically expunged (stats recomputed)."""
    import shutil

    from elasticsearch_assets_ray.index.deletes import expunge_deletes

    if sf_dir in _EXPUNGED_IDX_CACHE:
        return _EXPUNGED_IDX_CACHE[sf_dir]
    ddir = deleted_documents_index(sf_dir)
    out = ddir + "-exp"
    shutil.rmtree(out, ignore_errors=True)
    expunge_deletes(ddir, out)
    _EXPUNGED_IDX_CACHE[sf_dir] = out
    return out


def q_delete_search(sf_dir: str):
    """``_delete_by_query`` analog: tombstoned docs vanish from results
    immediately while BM25 stats stay at FULL-corpus values until expunge
    (Lucene deleted-doc semantics) — the oracle scores with full-corpus
    stats and drops matching docs from the candidates only."""
    return _search_many(
        sf_dir,
        DOC_QUERIES,
        SEARCH_K,
        fetch_k=SEARCH_K + 90,
        index_dir=deleted_documents_index(sf_dir),
    )


def q_expunge_search(sf_dir: str):
    """``_forcemerge?only_expunge_deletes`` analog: deleted docs are
    physically removed and N/df/avgdl recomputed — the oracle is plain
    BM25 over the filtered documents table."""
    return _search_many(
        sf_dir,
        DOC_QUERIES,
        SEARCH_K,
        fetch_k=SEARCH_K + 90,
        index_dir=expunged_documents_index(sf_dir),
    )


_BPE_ISH = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


_PII_SUFFIX_SQL = (
    "text || (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || "
    "'@example.com now' ELSE '' END) || (CASE WHEN doc_id % 5 = 0 THEN "
    "' host 10.' || (doc_id % 256) || '.3.7 up' ELSE '' END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN ' id 123-45-6789' ELSE '' END)"
)


def _inject_pii(batch):
    """Deterministic PII injection for the gate corpus (the synthetic
    text has none) — mirrored exactly by ``_PII_SUFFIX_SQL``."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    out = []
    for i, t in zip(ids, texts):
        s = t
        if i % 3 == 0:
            s += f" contact user{i}@example.com now"
        if i % 5 == 0:
            s += f" host 10.{i % 256}.3.7 up"
        if i % 7 == 0:
            s += " id 123-45-6789"
        out.append(s)
    return pa.table({"doc_id": batch["doc_id"], "text": pa.array(out)})


def _pii_stats_sql() -> str:
    """Oracle for q_pii_stats: same injected corpus, same RE2 patterns
    (DuckDB regexp_* is RE2), same replacement order."""
    from elasticsearch_assets_ray.stages.scrub import PII_PATTERNS

    pats = list(PII_PATTERNS.items())
    counts = ", ".join(
        "len(regexp_extract_all(text, '" + p + "'))::BIGINT AS n_" + k
        for k, p in pats
    )
    red = "text"
    for _k, p in pats:
        red = "regexp_replace(" + red + ", '" + p + "', '[PII]', 'g')"
    return (
        "WITH base AS (SELECT doc_id, " + _PII_SUFFIX_SQL + " AS text "
        "FROM documents) SELECT doc_id, " + counts + ", "
        "length(" + red + ")::BIGINT AS n_chars_redacted FROM base"
    )


def _contamination_sql() -> str:
    """Oracle for q_contamination_stats: shared shingle CTEs (k=3) over
    ALL documents; benchmark = distinct shingles of the first 5 docs;
    per-doc overlap via list_intersect."""
    from elasticsearch_assets_ray.pipelines.oracles_hard import _shingle_ctes

    return (
        "WITH base AS (SELECT doc_id, text FROM documents), "
        + _shingle_ctes()
        + ", bench AS (SELECT DISTINCT unnest(SH) AS s FROM shl WHERE doc_id IN "
        "(SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5)), "
        "bl AS (SELECT list(s) AS l FROM bench), "
        "per AS (SELECT doc_id, len(SH) AS n_all, "
        "len(list_intersect(SH, bl.l)) AS n_hit FROM shl CROSS JOIN bl) "
        "SELECT doc_id, n_hit::BIGINT AS n_contam_shingles, "
        "n_hit::DOUBLE / n_all AS contam_frac FROM per"
    )


def q_pii_stats(sf_dir: str):
    """PII detection + redaction (stages/scrub.py): per-doc RE2 match
    counts for email/ipv4/ssn plus the post-redaction char count, over
    a corpus with deterministically-injected PII.  pyarrow and DuckDB
    both run RE2, so one pattern string serves engine and oracle; a
    wrong count OR a wrong replacement span breaks the hash."""
    from elasticsearch_assets_ray.stages import scrub

    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_and_redact(b: pa.Table) -> pa.Table:
        t = scrub.pii_stats(b, "text")
        r = scrub.redact_pii(b, "text")
        t = t.append_column(
            "n_chars_redacted", pc.cast(pc.utf8_length(r["text"]), pa.int64())
        )
        return t.drop_columns(["text"])

    return ds.map_batches(_inject_pii, batch_format="pyarrow").map_batches(
        stats_and_redact, batch_format="pyarrow"
    )


def q_contamination_stats(sf_dir: str):
    """Benchmark decontamination (stages/scrub.py): the 'benchmark' is
    the first 5 documents; their k=3 shingle set is hashed once,
    broadcast via ray.put, and every doc reports how many of its
    distinct shingles appear in it (GPT-3 appendix-C style overlap scan;
    k=13 is the production default, k=3 here so the SQL oracle reuses
    the shared shingle CTEs)."""
    from elasticsearch_assets_ray.stages import scrub

    head = (
        pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
        .sort_by("doc_id")
        .slice(0, 5)
    )
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])
    out = scrub.contamination_stats(
        ds, head["text"].combine_chunks(), text_col="text", k=3
    )
    return out.select_columns(["doc_id", "n_contam_shingles", "contam_frac"])


def q_bpe_token_count(sf_dir: str):
    """BPE-ish pre-tokenizer counting (GPT-2-style word/number/punct
    pieces with leading-space attachment), vectorized Arrow regex;
    pattern chosen to evaluate identically under Python re and RE2."""
    ds = _rd(sf_dir, "documents", columns=["doc_id", "text"])

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"], _BPE_ISH)
        return pa.table(
            {"doc_id": b["doc_id"], "bpe_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow")


def q_media_decode(sf_dir: str):
    """Multimodal decode through the gate — now a REAL codec: payloads
    are genuine PNG bytes (pure-Python encoder), the actor-pool stage
    inflates + unfilters them (stages/png.py), and the oracle predicts
    width/height/pixel-sum in closed form because the synthetic image
    content is a pure function of media_id (synth_media_table fmt="png").
    A wrong decode (filter math, CRC, inflate framing) breaks the hash."""
    from elasticsearch_assets_ray.stages import multimodal as mm

    t = mm.synth_media_table(200, fmt="png")
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        mm.MediaDecodeStage,
        fn_constructor_kwargs={"codec": "png"},
        batch_size=mm.MediaDecodeStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["media_id", "width", "height", "n_pixels", "pix_sum"])


def q_video_frames(sf_dir: str):
    """Video frame sampling through the gate — REAL bytes end to end:
    MJPNG containers (length-prefixed genuine PNG frames), every 2nd
    frame decoded by the pure-Python PNG codec in an actor-pool
    flat_map stage; the oracle predicts each sampled frame's dims and
    pixel sum in closed form (synth_media_table fmt="mjpng")."""
    from elasticsearch_assets_ray.stages import multimodal as mm

    t = mm.synth_media_table(120, fmt="mjpng", kind="video")
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        mm.VideoFrameSampleStage,
        fn_constructor_kwargs={"stride": 2},
        batch_size=mm.VideoFrameSampleStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    r = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    mid = r["media_id"].to_numpy(zero_copy_only=False)
    fr = r["frame"].to_numpy(zero_copy_only=False)
    w = r["width"].to_numpy(zero_copy_only=False)
    h = r["height"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "media_id": pa.array(mid * 100 + fr),
            "width": r["width"],
            "height": r["height"],
            "n_pixels": pa.array(w * h),
            "pix_sum": r["pix_sum"],
        }
    )


def q_audio_decode(sf_dir: str):
    """Audio decode through the gate — REAL codec: payloads are genuine
    WAV (RIFF PCM16 mono) bytes, the actor-pool stage walks the RIFF
    chunks by hand (stages/wav.py), and the oracle predicts sample count
    / exact sums / zero crossings in closed form because the synthetic
    clip content is a pure function of media_id (synth fmt="wav").  A
    wrong parse (chunk offsets, pad rule, sample framing) breaks the
    hash."""
    from elasticsearch_assets_ray.stages import multimodal as mm

    t = mm.synth_media_table(200, kind="audio", fmt="wav")
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        mm.AudioFeatureStage,
        fn_constructor_kwargs={"codec": "wav"},
        batch_size=mm.AudioFeatureStage.suggested_batch_size,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(
        ["media_id", "n_samples", "sample_rate", "samp_sum", "samp_sqsum", "n_zero_cross"]
    )


def q_incremental_delta(sf_dir: str):
    """Persistent-mode analog through the gate: two window ticks over the
    events table (content = props JSON text), then a merged-searcher term
    count — deterministic; the windowed machinery is the thing under
    test (rows-only: recursion over windows is not SQL)."""
    import shutil
    from datetime import datetime

    from elasticsearch_assets_ray.index.build import IndexConfig
    from elasticsearch_assets_ray.index.incremental import IncrementalIndex

    root = os.path.join("/tmp", "esr_inc_cache", os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    cfg = IndexConfig(
        content_col="props",
        id_cols=("event_id",),
        keep_cols=("event_type",),
        store_content=False,
        target_partition_rows=4096,
        runs_per_bucket=4,
        num_shards=8,
    )
    inc = IncrementalIndex(root, config=cfg)
    t1 = inc.tick(_p(sf_dir, "events"), (datetime(2024, 1, 1), datetime(2024, 1, 16)), "ts")
    t2 = inc.tick(_p(sf_dir, "events"), (datetime(2024, 1, 16), datetime(2024, 2, 1)), "ts")
    s = inc.searcher(prune=False)
    res = s.search("k", k=10_000_000)  # every event props contains 'k'
    return pa.table(
        {
            "tick_id": pa.array([t1["tick_id"], t2["tick_id"], "total_matched"]),
            "n_docs": pa.array(
                [t1["n_docs"], t2["n_docs"], res.num_rows], pa.int64()
            ),
        }
    )


def q_props_extract(sf_dir: str):
    """Semi-structured payload extraction: pull the integer field out of
    the events' JSON props with a vectorized Arrow regex (the DataEntity
    metadata-extraction analog)."""
    ds = _rd(sf_dir, "events", columns=["event_id", "props"])

    def extract(b: pa.Table) -> pa.Table:
        s = pc.extract_regex(b["props"], r"(?P<k>[0-9]+)")
        k = pc.cast(pc.struct_field(s, "k"), pa.int64())
        return pa.table({"event_id": b["event_id"], "k": k})

    return ds.map_batches(extract, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# keyspace partitioning (P7/P8/P9 analogs)
# ---------------------------------------------------------------------------


def q_date_interval_slices(sf_dir: str):
    """Fixed-interval date slicing from a config string ("5d"): the
    reference's interval vocabulary (date-helpers.ts dateOptions /
    processInterval) producing per-window slice plans + counts."""
    from elasticsearch_assets_ray.sources.reader_api import ReaderAPI

    api = ReaderAPI(_p(sf_dir, "events"), date_col="ts")
    slices = api.make_date_interval_ranges("5d")
    cnts = [api.count(s) for s in slices]
    return pa.table(
        {
            "slice_id": pa.array(range(len(slices)), pa.int64()),
            "win_start": pa.array([s.start for s in slices], pa.timestamp("us")),
            "win_end": pa.array([s.end for s in slices], pa.timestamp("us")),
            "cnt": pa.array(cnts, pa.int64()),
        }
    )


def q_keyspace_plan(sf_dir: str):
    """Quantile range-partition boundaries over customer names (the
    idSlicerOptimized variable-width ranges taken to equal-count
    ranges)."""
    from elasticsearch_assets_ray.sources.keyspace import SortedKeyspace, quantile_key_ranges

    # the distributed path: ONE ds.sort over the pruned key column, then
    # boundary-metadata probes (driver memory ∝ files, not rows)
    ks = SortedKeyspace.build(
        _p(sf_dir, "customer"),
        "c_name",
        SortedKeyspace.default_layout_dir(_p(sf_dir, "customer"), "c_name"),
    )
    bounds = quantile_key_ranges(ks, 8)
    return pa.table(
        {
            "part_id": pa.array(range(1, 8), pa.int64()),
            "boundary_key": pa.array(bounds, pa.string()),
        }
    )


def q_prefix_dfs(sf_dir: str):
    """idSlicer DFS over the documents 'source' keyspace (rows-only: the
    recursion is data-dependent; verified by invariant tests)."""
    from elasticsearch_assets_ray.sources.keyspace import SortedKeyspace, prefix_dfs_partitions

    ks = SortedKeyspace.build(
        _p(sf_dir, "documents"),
        "source",
        SortedKeyspace.default_layout_dir(_p(sf_dir, "documents"), "source"),
    )
    slices = prefix_dfs_partitions(ks, "abcdefghijklmnopqrstuvwxyz0123456789", 30)
    return pa.table(
        {
            "prefix": pa.array([s.prefix for s in slices], pa.string()),
            "cnt": pa.array([s.count for s in slices], pa.int64()),
            "exact": pa.array([s.exact for s in slices], pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# state storage (T1)
# ---------------------------------------------------------------------------


def q_state_enrich(sf_dir: str):
    # split the single-file read into several blocks so the actor pool
    # actually gets parallel batches (one parquet file = one block
    # otherwise)
    ds = ray.data.read_parquet(
        _p(sf_dir, "events"), columns=["event_id", "user_id"], override_num_blocks=8
    )
    out = ds.map_batches(
        DocstoreCache,
        fn_constructor_kwargs=dict(
            store_path=_p(sf_dir, "customer"),
            key_col="c_custkey",
            value_cols=["c_name", "c_mktsegment"],
            batch_key_col="user_id",
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["event_id", "user_id", "c_name", "c_mktsegment"])


# ---------------------------------------------------------------------------
# SQL oracles
# ---------------------------------------------------------------------------

_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


_SAMPLER_QUERY = DOC_QUERIES[1]  # "fast scan filter"
_SAMPLER_N = 60
_DIV_QUERY = DOC_QUERIES[0]  # "spark table merge join"
_DIV_N, _DIV_CAP, _DIV_SCAN = 25, 2, 250


def q_sampler_agg(sf_dir: str):
    """ES sampler agg: terms sub-agg over only the top-N best-scoring
    matches (global deterministic sample; see
    ShardedSearcher.sampler_terms for the shard_size note)."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.sampler_terms(_SAMPLER_QUERY, by="lang", sample_size=_SAMPLER_N)


def q_diversified_sampler(sf_dir: str):
    """ES diversified_sampler agg: best-first sample capped at
    max_per_value docs per source, terms sub-agg over the kept set."""
    sh = sharded_searcher(documents_index(sf_dir))
    return sh.diversified_sampler_terms(
        _DIV_QUERY,
        dedup_field="source",
        by="lang",
        sample_size=_DIV_N,
        max_per_value=_DIV_CAP,
        scan_cap=_DIV_SCAN,
    )


# ES date_range agg: (label, from_inclusive, to_exclusive) — ranges may
# OVERLAP and be open-ended, exactly ES's contract (a plain histogram
# cannot express either)
_DATE_RANGES = [
    ("early", None, "2024-01-11"),
    ("mid", "2024-01-11", "2024-01-21"),
    ("late", "2024-01-21", None),
    ("first_half", None, "2024-01-16"),  # overlaps early + mid
]


def q_date_range_agg(sf_dir: str):
    """ES ``date_range`` aggregation over events: per named range, the
    event count AND the exact distinct active users.  One scan emits
    (range, user) membership rows (a row lands in EVERY overlapping
    range); the (range, user) pair counts then carry both answers with
    ONE bounded shuffle — the events_daily two-phase shape."""
    ds = _rd(sf_dir, "events", columns=["ts", "user_id"])
    ranges = [
        (
            label,
            None if lo is None else np.datetime64(lo, "us"),
            None if hi is None else np.datetime64(hi, "us"),
        )
        for label, lo, hi in _DATE_RANGES
    ]

    def expand(b: pa.Table) -> pa.Table:
        outs = []
        for label, lo, hi in ranges:
            cond = None
            if lo is not None:
                cond = pc.greater_equal(b["ts"], pa.scalar(lo, pa.timestamp("us")))
            if hi is not None:
                c2 = pc.less(b["ts"], pa.scalar(hi, pa.timestamp("us")))
                cond = c2 if cond is None else pc.and_(cond, c2)
            f = b if cond is None else b.filter(cond)
            outs.append(
                pa.table(
                    {
                        "range": pa.array([label] * f.num_rows, pa.string()),
                        "user_id": f["user_id"],
                    }
                )
            )
        return pa.concat_tables(outs)

    pairs = partial_agg(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["range", "user_id"],
        [AggSpec("n", "range", "count")],
    ).materialize()
    n_events = _collect(
        partial_agg(
            pairs, ["range"], [AggSpec("n_events", "n", "sum")], distinct_hint=64
        )
    )
    non_null = pairs.map_batches(
        lambda b: b.filter(pc.is_valid(b["user_id"])), batch_format="pyarrow"
    )
    n_users = _collect(
        partial_agg(
            non_null, ["range"], [AggSpec("n_users", "user_id", "count")],
            distinct_hint=64,
        )
    )
    umap = dict(zip(n_users["range"].to_pylist(), n_users["n_users"].to_pylist()))
    return pa.table(
        {
            "value": n_events["range"],
            "count": n_events["n_events"].combine_chunks().cast(pa.int64()),
            "metric_r": pa.array(
                [
                    float(umap.get(r, 0))
                    for r in n_events["range"].to_pylist()
                ],
                pa.float64(),
            ),
        }
    )


def _date_range_sql() -> str:
    arms = []
    for label, lo, hi in _DATE_RANGES:
        conds = []
        if lo is not None:
            conds.append(f"ts >= TIMESTAMP '{lo}'")
        if hi is not None:
            conds.append(f"ts < TIMESTAMP '{hi}'")
        where = f"WHERE {' AND '.join(conds)}" if conds else ""
        arms.append(
            f"SELECT '{label}' AS value, count(*)::BIGINT AS count, "
            "CAST(count(DISTINCT user_id) AS DOUBLE) AS metric_r "
            f"FROM events {where}"
        )
    return " UNION ALL ".join(arms)


_SM_QUERIES = ["spark table", "merge", "fast filter"]


def _var_map(values: np.ndarray, counts: np.ndarray) -> tuple:
    """scripted_metric map/combine state for a population variance:
    exact integer (n, Σv·c, Σv²·c) from the merged value_counts."""
    vi = values.astype(np.int64)
    return (
        int(counts.sum()),
        int((vi * counts).sum()),
        int((vi * vi * counts).sum()),
    )


def _var_reduce(state: tuple) -> dict:
    n, s, ss = (float(x) for x in state)
    if n == 0:
        return {"n": 0, "var": None}
    # the SQL twin states the identical IEEE expression over the same
    # exact integer aggregates, so the double is bit-identical
    return {"n": int(state[0]), "var": (ss - s * s / n) / n}


def q_scripted_metric(sf_dir: str):
    """ES scripted_metric agg (population variance of n_chars over each
    query's match set): shard-side integer partials, one reduce."""
    sh = sharded_searcher(documents_index(sf_dir))
    rows = []
    for q in _SM_QUERIES:
        out = sh.scripted_metric(q, "n_chars", _var_map, _var_reduce)
        var_r = float(_round_half_up(out["var"], 6)) if out["var"] is not None else 0.0
        rows.append((q, out["n"], var_r))
    return pa.table(
        {
            "value": pa.array([r[0] for r in rows], pa.string()),
            "count": pa.array([r[1] for r in rows], pa.int64()),
            "metric_r": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def _scripted_metric_sql() -> str:
    arms = []
    for q in _SM_QUERIES:
        match = " OR ".join(
            f"list_contains({_TOK}, '{t}')" for t in sorted(set(q.split()))
        )
        arms.append(
            f"SELECT '{q}' AS value, count(*)::BIGINT AS count, "
            "round((CAST(sum(n_chars * n_chars) AS DOUBLE) "
            " - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE) "
            "   / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE), 6) "
            "AS metric_r "
            f"FROM documents WHERE {match}"
        )
    return " UNION ALL ".join(arms)


def _sampler_sql() -> str:
    return (
        f"SELECT d.lang AS value, count(*)::BIGINT AS count "
        f"FROM ({_bm25_sql([_SAMPLER_QUERY], _SAMPLER_N)}) r "
        "JOIN documents d USING (doc_id) GROUP BY d.lang"
    )


def _diversified_sampler_sql() -> str:
    return (
        f"WITH ranked AS (SELECT r.rank, r.doc_id, d.source, d.lang "
        f"FROM ({_bm25_sql([_DIV_QUERY], _DIV_SCAN)}) r "
        "JOIN documents d USING (doc_id)), "
        "div AS (SELECT *, row_number() OVER "
        "(PARTITION BY source ORDER BY rank) AS pv FROM ranked), "
        "kept AS (SELECT *, row_number() OVER (ORDER BY rank) AS kk "
        f"FROM div WHERE pv <= {_DIV_CAP}) "
        "SELECT lang AS value, count(*)::BIGINT AS count "
        f"FROM kept WHERE kk <= {_DIV_N} GROUP BY lang"
    )


def _bm25_sql(
    queries: list[str],
    k: int,
    delete_term: str | None = None,
    expunged: bool = False,
    page: int = 1,
) -> str:
    """DuckDB BM25 oracle over `documents`, matching the engine's pinned
    analysis chain + scoring (k1=1.2, b=0.75, Lucene idf) exactly.

    ``delete_term`` models the delete-by-query gates: with
    ``expunged=False`` (tombstone semantics) stats stay FULL-corpus and
    matching docs are only dropped from the candidates; with
    ``expunged=True`` the whole computation runs over the filtered
    corpus (stats recomputed)."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    values = []
    for qid, q in enumerate(queries):
        for t in sorted(set(tokenize_text(q))):
            values.append(f"({qid}, '{t}')")
    vals = ", ".join(values)
    docs = "SELECT * FROM documents"
    if delete_term is not None and expunged:
        docs = (
            "SELECT * FROM documents WHERE doc_id NOT IN ("
            f"SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest({_TOK}) "
            f"AS term FROM documents) dt WHERE term = '{delete_term}')"
        )
    tombstone_where = (
        f"WHERE tf.doc_id NOT IN (SELECT doc_id FROM tok WHERE term = '{delete_term}')"
        if delete_term is not None and not expunged
        else ""
    )
    return f"""
WITH docs AS ({docs}), tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM docs
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM docs) AS avgdl
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), q(query_id, term) AS (VALUES {vals}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  {tombstone_where}
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id)
         - {(page - 1) * k} AS rank,
       round(score, 6) AS score_r
FROM scored
QUALIFY rank + {(page - 1) * k} <= {page * k}
   AND rank >= 1
"""


def _analyzed_bm25_sql(queries: list[str], k: int) -> str:
    """Twin of q_search_analyzed: the (stop, s_stem) chain replicated in
    SQL over BOTH the pluralized corpus tokens AND the raw query tokens
    (query analysis is part of the contract, so the oracle re-derives it
    rather than embedding pre-analyzed terms)."""
    from elasticsearch_assets_ray.stages.analysis import AnalyzerSpec
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    spec = AnalyzerSpec.from_dict(ANALYZER_DICT)
    stem = spec.sql_term_expr("t0")
    keep = spec.sql_keep_expr("t0")
    values = []
    for qid, q in enumerate(queries):
        for t in sorted(set(tokenize_text(q))):
            values.append(f"({qid}, '{t}')")
    vals = ", ".join(values)
    return f"""
WITH docs AS (SELECT doc_id, {_pluralize_sql('text')} AS text FROM documents),
tok0 AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t0 FROM docs
), tok AS (
  SELECT doc_id, {stem} AS term FROM tok0 WHERE {keep}
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
         (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM docs) AS avgdl
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), q0(query_id, t0) AS (VALUES {vals}),
q AS (
  SELECT DISTINCT query_id, {stem} AS term FROM q0 WHERE {keep}
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id ORDER BY round(score, 9) DESC, doc_id) AS rank,
       round(score, 6) AS score_r
FROM scored
QUALIFY rank <= {k}
"""


def _cosine_probe_sql(
    k: int, filter_term: str | None = None, min_sim: float | None = None
) -> str:
    """THE planted-probe cosine top-k oracle, shared by every ANN gate
    (LSH / IVF / PQ / index-resident kNN) so the probe construction
    lives in ONE place; ``filter_term`` restricts candidates to docs
    containing the token (the filtered-kNN twin).  (rank_eval helpers
    directly below reuse _bm25_sql the same way.)"""
    corpus = "embeddings e"
    if filter_term is not None:
        corpus = (
            "embeddings e JOIN (SELECT doc_id FROM documents "
            "WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), "
            f"'{filter_term}')) m ON m.doc_id = e.vec_id"
        )
    return (
        "WITH q AS (SELECT vec_id AS query_id, "
        "  list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01) AS qv "
        "  FROM embeddings WHERE vec_id IN (0, 1, 2)), "
        "s AS (SELECT q.query_id, e.vec_id, "
        "  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim "
        f"  FROM {corpus} CROSS JOIN q) "
        "SELECT query_id, vec_id, "
        " row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, vec_id) AS rank, "
        " round(sim, 6) AS sim_r "
        # the similarity cutoff keeps a PREFIX of the ranking, so
        # WHERE-before-window yields identical survivor ranks
        + (f"FROM s WHERE round(sim, 9) >= {min_sim!r} " if min_sim is not None else "FROM s ")
        + f"QUALIFY rank <= {k}"
    )


SPAN_SPECS: list[dict] = [
    {"span_first": {"match": {"span_term": "scan"}, "end": 5}},
    {
        "span_not": {
            "include": {"span_term": "value"},
            "exclude": {"span_term": "small"},
            "pre": 1,
            "post": 1,
        }
    },
    {
        "span_near": {
            "clauses": [{"span_term": "window"}, {"span_term": "join"}],
            "slop": 1,
            "in_order": True,
        }
    },
    {
        "span_within": {
            "little": {"span_term": "value"},
            "big": {
                "span_near": {
                    "clauses": [{"span_term": "key"}, {"span_term": "row"}],
                    "slop": 3,
                    "in_order": True,
                }
            },
        }
    },
    {
        "span_containing": {
            "big": {
                "span_near": {
                    "clauses": [{"span_term": "spark"}, {"span_term": "merge"}],
                    "slop": 4,
                    "in_order": True,
                }
            },
            "little": {"span_term": "table"},
        }
    },
]


def q_span_search(sf_dir: str):
    """ES span queries (query/spans.py): span_first / span_not /
    span_near over positional postings — positional constraints FILTER
    exactly, scoring is bag-of-words BM25 over the positive terms (the
    repo's phrase contract)."""
    from elasticsearch_assets_ray.query import spans as span_mod

    idx = documents_index(sf_dir)
    s = Searcher(idx)
    parts = []
    for qid, spec in enumerate(SPAN_SPECS):
        res = span_mod.span_search(s, spec, k=SEARCH_K + 90)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(s, ids)),
                    "sim": res["score"],
                }
            )
        )
    if not parts:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "score_r": pa.array([], pa.float64()),
            }
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _span_cand_sql(spec: dict) -> tuple[str, list[str]]:
    """(candidate-docs SQL condition over ``tl``, positive terms) for the
    pinned SPAN_SPECS shapes — the DuckDB twin of query/spans.py's
    evaluator (greedy-chain existence ⟺ the join conditions here)."""
    if "span_first" in spec:
        t = spec["span_first"]["match"]["span_term"]
        e = int(spec["span_first"]["end"])
        return (
            f"SELECT DISTINCT doc_id FROM tl WHERE term = '{t}' AND p + 1 <= {e}",
            [t],
        )
    if "span_not" in spec:
        s = spec["span_not"]
        ti = s["include"]["span_term"]
        tx = s["exclude"]["span_term"]
        pre, post = int(s.get("pre", 0)), int(s.get("post", 0))
        return (
            f"SELECT DISTINCT i.doc_id FROM tl i WHERE i.term = '{ti}' "
            f"AND NOT EXISTS (SELECT 1 FROM tl x WHERE x.doc_id = i.doc_id "
            f"AND x.term = '{tx}' AND x.p < i.p + 1 + {post} "
            f"AND x.p + 1 > i.p - {pre})",
            [ti],
        )
    if "span_near" in spec:
        s = spec["span_near"]
        terms = [c["span_term"] for c in s["clauses"]]
        slop = int(s.get("slop", 0))
        m = len(terms)
        joins = [f"tl a0"]
        conds = [f"a0.term = '{terms[0]}'"]
        for i in range(1, m):
            joins.append(
                f"JOIN tl a{i} ON a{i}.doc_id = a0.doc_id "
                f"AND a{i}.p >= a{i-1}.p + 1"
            )
            conds.append(f"a{i}.term = '{terms[i]}'")
        conds.append(f"a{m-1}.p - a0.p <= {slop + m - 1}")
        return (
            "SELECT DISTINCT a0.doc_id FROM "
            + " ".join(joins)
            + " WHERE "
            + " AND ".join(conds),
            terms,
        )
    if "span_within" in spec or "span_containing" in spec:
        # term little inside a 2-term ordered near big (the pinned gate
        # shape).  The evaluator's near produces ONE minimal span per
        # start (greedy min end ≥ a.p + 1), so the SQL pins r.p to that
        # MIN — containment tests against produced spans, not all pairs.
        # At the doc level within and containing are the same predicate
        # (∃ big ⊇ little), which is why one twin serves both.
        s = spec.get("span_within") or spec.get("span_containing")
        tl_ = s["little"]["span_term"]
        nb = s["big"]["span_near"]
        ta, tb = (c["span_term"] for c in nb["clauses"])
        slop = int(nb.get("slop", 0))
        return (
            f"SELECT DISTINCT v.doc_id FROM tl v WHERE v.term = '{tl_}' "
            f"AND EXISTS (SELECT 1 FROM tl a JOIN tl r ON r.doc_id = a.doc_id "
            f"AND r.term = '{tb}' AND r.p >= a.p + 1 "
            f"AND r.p = (SELECT min(r2.p) FROM tl r2 WHERE r2.doc_id = a.doc_id "
            f"AND r2.term = '{tb}' AND r2.p >= a.p + 1) "
            f"WHERE a.doc_id = v.doc_id AND a.term = '{ta}' "
            f"AND r.p - a.p <= {slop + 1} AND v.p >= a.p AND v.p <= r.p)",
            [tl_, ta, tb] if "span_within" in spec else [ta, tb, tl_],
        )
    raise ValueError(f"unsupported span spec for SQL: {sorted(spec)}")


def _span_sql(specs: list[dict], k: int) -> str:
    arms = []
    for qid, spec in enumerate(specs):
        cand, terms = _span_cand_sql(spec)
        tlist = ", ".join(f"'{t}'" for t in terms)
        arms.append(
            f"SELECT {qid} AS query_id, tf.doc_id, sum({_TERM_SCORE_SQL}) AS score "
            f"FROM tf JOIN df ON df.term = tf.term "
            f"JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
            f"WHERE tf.term IN ({tlist}) AND tf.doc_id IN ({cand}) "
            f"GROUP BY tf.doc_id"
        )
    return (
        f"WITH tl AS (SELECT doc_id, unnest({_TOK}) AS term, "
        f"generate_subscripts({_TOK}, 1) - 1 AS p FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tl GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tl GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "scored AS (" + " UNION ALL ".join(arms) + ") "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        f"FROM scored QUALIFY rank <= {k}"
    )


# ES intervals query: one spec per query_id covering the three sources
INTERVALS_SPECS: list[dict] = [
    {"match": {"query": "key value", "max_gaps": 2, "ordered": True}},
    {
        "any_of": {
            "intervals": [
                {"match": {"query": "spark table", "max_gaps": 0, "ordered": True}},
                {"match": {"query": "merge join", "max_gaps": 0, "ordered": True}},
            ]
        }
    },
    {
        "all_of": {
            "intervals": [
                {"match": {"query": "fast scan", "max_gaps": 0, "ordered": True}},
                {"match": {"query": "filter"}},
            ],
            "max_gaps": 3,
            "ordered": True,
        }
    },
]


def q_intervals_search(sf_dir: str):
    """ES ``intervals`` query (query/intervals.py) through the
    DISTRIBUTED path: match (ordered, max_gaps) / any_of / all_of
    lowered onto the span evaluator; interval existence FILTERS, the
    bag-of-words BM25 over the spec's terms scores (the repo's
    positional contract)."""
    sh = sharded_searcher(documents_index(sf_dir))
    parts = []
    for qid, spec in enumerate(INTERVALS_SPECS):
        res = sh.intervals(spec, k=SEARCH_K + 90)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(_orig_ids(sh, ids)),
                    "sim": res["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _intervals_sql() -> str:
    """Twin of q_intervals_search over the _span_sql skeleton.  Each
    EXISTS condition is the greedy chain's existence test (exact — see
    the per-shape derivations in the conditions below)."""
    # q0 match("key value", gaps 2): value at [pk+1, pk+3]
    cand0 = (
        "SELECT DISTINCT a.doc_id FROM tl a JOIN tl b ON b.doc_id = a.doc_id "
        "AND a.term = 'key' AND b.term = 'value' "
        "AND b.p >= a.p + 1 AND b.p <= a.p + 3"
    )
    # q1 any_of(adjacent "spark table", adjacent "merge join")
    cand1 = (
        "SELECT DISTINCT a.doc_id FROM tl a JOIN tl b ON b.doc_id = a.doc_id "
        "AND ((a.term = 'spark' AND b.term = 'table') "
        "  OR (a.term = 'merge' AND b.term = 'join')) AND b.p = a.p + 1"
    )
    # q2 all_of([adjacent "fast scan", "filter"], gaps 3): filter at
    # [pf+2, pf+5] (gap beyond the 3-token minimal width <= 3)
    cand2 = (
        "SELECT DISTINCT a.doc_id FROM tl a "
        "JOIN tl b ON b.doc_id = a.doc_id AND a.term = 'fast' "
        "AND b.term = 'scan' AND b.p = a.p + 1 "
        "JOIN tl c ON c.doc_id = a.doc_id AND c.term = 'filter' "
        "AND c.p >= a.p + 2 AND c.p <= a.p + 5"
    )
    arms = []
    for qid, (cand, terms) in enumerate(
        [
            (cand0, ["key", "value"]),
            (cand1, ["join", "merge", "spark", "table"]),
            (cand2, ["fast", "filter", "scan"]),
        ]
    ):
        tlist = ", ".join(f"'{t}'" for t in terms)
        arms.append(
            f"SELECT {qid} AS query_id, tf.doc_id, sum({_TERM_SCORE_SQL}) AS score "
            f"FROM tf JOIN df ON df.term = tf.term "
            f"JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
            f"WHERE tf.term IN ({tlist}) AND tf.doc_id IN ({cand}) "
            f"GROUP BY tf.doc_id"
        )
    return (
        f"WITH tl AS (SELECT doc_id, unnest({_TOK}) AS term, "
        f"generate_subscripts({_TOK}, 1) - 1 AS p FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tl GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tl GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "scored AS (" + " UNION ALL ".join(arms) + ") "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        f"FROM scored QUALIFY rank <= {SEARCH_K}"
    )


PHRASE_SUGG_INPUTS = ["sor ro vlue", "prt ky tble"]
PHRASE_SUGG_SIZE = 5
PHRASE_SUGG_EDITS = 2
PHRASE_SUGG_PER_TOKEN = 5

_PHRASE_LM_CACHE: dict[str, object] = {}


def q_phrase_suggest(sf_dir: str):
    """ES phrase suggester (query/phrase_suggest.py): distributed bigram
    LM build (one vectorized map_batches pass + combiner-first
    partial_agg), then exact stupid-backoff scoring of the per-token
    edit-neighborhood product space for two misspelled inputs."""
    from elasticsearch_assets_ray.query import phrase_suggest as ps

    if sf_dir not in _PHRASE_LM_CACHE:
        _PHRASE_LM_CACHE[sf_dir] = ps.build_phrase_lm(
            _rd(sf_dir, "documents", columns=["text"]), "text"
        )
    lm = _PHRASE_LM_CACHE[sf_dir]
    parts = []
    for qid, text in enumerate(PHRASE_SUGG_INPUTS):
        t = ps.suggest_phrases(
            lm,
            text,
            size=PHRASE_SUGG_SIZE,
            max_edits=PHRASE_SUGG_EDITS,
            per_token=PHRASE_SUGG_PER_TOKEN,
        )
        parts.append(
            pa.table(
                {
                    "query_id": pa.array([qid] * t.num_rows, pa.int64()),
                    "rank": t["rank"],
                    "suggestion": t["suggestion"],
                    "score_r": t["score_r"],
                }
            )
        )
    return pa.concat_tables(parts)


def _phrase_suggest_sql(
    inputs: list[str], size: int, max_edits: int, per_token: int
) -> str:
    """DuckDB twin of the phrase suggester: the same bigram counts from
    a zipped-unnest token stream, the same banded-Levenshtein candidate
    ranking, and the stupid-backoff score written with the engine's
    float-op order (ln of the division, left-to-right addition)."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    cand_ctes, phrase_sels = [], []
    for qid, text in enumerate(inputs):
        toks = tokenize_text(text)
        for i, tok in enumerate(toks):
            cand_ctes.append(
                f"c_{qid}_{i} AS (SELECT term, cnt FROM ("
                f"SELECT u.term, u.cnt, row_number() OVER (ORDER BY "
                f"levenshtein(u.term, '{tok}'), u.cnt DESC, u.term) AS rn "
                f"FROM uni u WHERE levenshtein(u.term, '{tok}') <= {max_edits}"
                f") WHERE rn <= {per_token})"
            )
        sel = [f"c_{qid}_0 c0 CROSS JOIN tot t"]
        score = ["ln(c0.cnt::DOUBLE / t.n)"]
        for i in range(1, len(toks)):
            sel.append(f"CROSS JOIN c_{qid}_{i} c{i}")
            sel.append(
                f"LEFT JOIN bi b{i} ON b{i}.v = c{i-1}.term AND b{i}.w = c{i}.term"
            )
            score.append(
                f"coalesce(ln(b{i}.nb::DOUBLE / c{i-1}.cnt), "
                f"ln(0.4 * c{i}.cnt::DOUBLE / t.n))"
            )
        sugg = " || ' ' || ".join(f"c{i}.term" for i in range(len(toks)))
        phrase_sels.append(
            f"SELECT {qid} AS query_id, {sugg} AS suggestion, "
            + " + ".join(score)
            + " AS score FROM "
            + " ".join(sel)
        )
    return (
        f"WITH tl AS (SELECT doc_id, unnest({_TOK}) AS term, "
        f"generate_subscripts({_TOK}, 1) AS p FROM documents), "
        "uni AS (SELECT term, count(*)::BIGINT AS cnt FROM tl GROUP BY term), "
        "tot AS (SELECT sum(cnt)::DOUBLE AS n FROM uni), "
        "bi AS (SELECT a.term AS v, b.term AS w, count(*)::BIGINT AS nb "
        " FROM tl a JOIN tl b ON b.doc_id = a.doc_id AND b.p = a.p + 1 "
        " GROUP BY a.term, b.term), "
        + ", ".join(cand_ctes)
        + ", ph AS ("
        + " UNION ALL ".join(phrase_sels)
        + ") SELECT query_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, suggestion) AS rank, suggestion, "
        f"round(score, 6) AS score_r FROM ph QUALIFY rank <= {size}"
    )


RANK_EVAL_QUERIES = DOC_QUERIES[:4]


def _rank_eval_sql(queries: list[str], k: int) -> str:
    """DuckDB twin of the ``_rank_eval`` metrics: the _bm25_sql ranked
    list, per-doc graded ratings (distinct query terms present), and the
    five ES metrics as window/group expressions.  The ERR prefix product
    is exp(Σ ln(1-R)) — the SAME float expression the engine evaluates
    (query/rank_eval.py:metric_values), so round-6 compare is stable."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in enumerate(queries)
        for t in sorted(set(tokenize_text(q)))
    )
    return f"""
WITH ranked AS (SELECT * FROM ({_bm25_sql(queries, k)})),
q(query_id, term) AS (VALUES {vals}),
qn AS (SELECT query_id, count(*)::BIGINT AS n_terms FROM q GROUP BY query_id),
dt AS (SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest({_TOK}) AS term FROM documents)),
ratings AS (
  SELECT q.query_id, dt.doc_id, count(*)::BIGINT AS g
  FROM q JOIN dt ON dt.term = q.term
  GROUP BY q.query_id, dt.doc_id),
rr AS (
  SELECT r.query_id, r.rank, coalesce(g.g, 0) AS g
  FROM ranked r
  LEFT JOIN ratings g ON g.query_id = r.query_id AND g.doc_id = r.doc_id),
tot AS (SELECT query_id, count(*)::DOUBLE AS total_rel
        FROM ratings GROUP BY query_id),
ideal AS (SELECT query_id, g,
                 row_number() OVER (PARTITION BY query_id ORDER BY g DESC) AS rn
          FROM ratings),
idcg AS (SELECT query_id, sum((pow(2, g) - 1.0) / log2(rn + 1.0)) AS idcg
         FROM ideal WHERE rn <= {k} GROUP BY query_id),
errt AS (
  SELECT rr.query_id, rr.rank,
         (pow(2, rr.g) - 1.0) / pow(2, qn.n_terms) AS r
  FROM rr JOIN qn USING (query_id)),
errw AS (
  SELECT query_id, rank, r,
         coalesce(sum(ln(1.0 - r)) OVER (
            PARTITION BY query_id ORDER BY rank
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS lnacc
  FROM errt),
errq AS (SELECT query_id, sum((r / rank) * exp(lnacc)) AS err
         FROM errw GROUP BY query_id),
comp AS (
  SELECT query_id,
         count(*)::DOUBLE AS retrieved,
         sum(CASE WHEN g >= 1 THEN 1 ELSE 0 END)::DOUBLE AS rel_ret,
         coalesce(max(CASE WHEN g >= 1 THEN 1.0 / rank END), 0.0) AS mrr,
         sum((pow(2, g) - 1.0) / log2(rank + 1.0)) AS dcg
  FROM rr GROUP BY query_id),
perq AS (
  SELECT c.query_id,
         c.rel_ret / c.retrieved AS p_prec,
         c.rel_ret / t.total_rel AS p_recall,
         c.mrr AS p_mrr,
         c.dcg / i.idcg AS p_ndcg,
         coalesce(e.err, 0.0) AS p_err
  FROM comp c
  JOIN tot t USING (query_id)
  JOIN idcg i USING (query_id)
  LEFT JOIN errq e USING (query_id)),
tall AS (
  SELECT query_id, 'precision' AS metric, p_prec AS v FROM perq
  UNION ALL SELECT query_id, 'recall', p_recall FROM perq
  UNION ALL SELECT query_id, 'mrr', p_mrr FROM perq
  UNION ALL SELECT query_id, 'ndcg', p_ndcg FROM perq
  UNION ALL SELECT query_id, 'err', p_err FROM perq)
SELECT query_id, metric, round(v, 6) AS value_r FROM tall
UNION ALL
SELECT -1 AS query_id, metric, round(avg(v), 6) AS value_r
FROM tall GROUP BY metric
"""


def q_rank_eval(sf_dir: str):
    """ES ``_rank_eval`` API (query/rank_eval.py): the four rated
    requests run through the DISTRIBUTED scatter-gather serving path
    (the same pinned round-9 ranked contract as search_topk), ratings
    for the retrieved docs come from a bounded 4·k-row read, and the
    corpus rating histogram (recall denominator + NDCG ideal ordering)
    is a distributed one-pass map_batches reduce — nothing per-doc on
    the driver."""
    from elasticsearch_assets_ray.query import rank_eval as re_mod

    idx = documents_index(sf_dir)
    sh = sharded_searcher(idx)
    ranked = _search_many(
        sf_dir, RANK_EVAL_QUERIES, SEARCH_K, fetch_k=SEARCH_K + 90, searcher=sh
    )
    hists = re_mod.rating_histograms(
        _rd(sf_dir, "documents", columns=["text"]), RANK_EVAL_QUERIES
    )
    ids = ranked["doc_id"].to_numpy(zero_copy_only=False)
    texts: dict[int, str] = {}
    if ids.size:
        uniq = np.unique(ids)
        t = _collect(
            _rd(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
                lambda b, u=uniq: b.filter(pc.is_in(b["doc_id"], pa.array(u))),
                batch_format="pyarrow",
            )
        )
        texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    gains_by_query: dict[int, list[int]] = {}
    qarr = ranked["query_id"].to_numpy(zero_copy_only=False)
    rarr = ranked["rank"].to_numpy(zero_copy_only=False)
    for qid, qtext in enumerate(RANK_EVAL_QUERIES):
        sel = np.flatnonzero(qarr == qid)
        sel = sel[np.argsort(rarr[sel], kind="stable")]
        gains_by_query[qid] = re_mod._gains_for(
            [texts[int(d)] for d in ids[sel]], re_mod.query_terms(qtext)
        )
    return re_mod.rank_eval_from_gains(
        RANK_EVAL_QUERIES, gains_by_query, hists, SEARCH_K
    )


def documents_source_index(sf_dir: str) -> str:
    """Second per-field index (field = ``source``) over the same corpus
    — the Lucene one-postings-per-field storage shape multi_match needs
    (see query/multi_match.py)."""
    key = sf_dir + "|source"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join("/tmp", "esr_index_cache", f"{tag}-documents-source-v1")
    build_index(
        _p(sf_dir, "documents"),
        out,
        config=IndexConfig(
            content_col="source",
            id_cols=("doc_id",),
            store_content=False,
        ),
    )
    _INDEX_CACHE[key] = out
    return out


MULTI_MATCH_QUERY = "spark table src3"
MULTI_MATCH_TB = 0.3


def q_multi_match(sf_dir: str):
    """ES multi_match over (text, source) per-field indexes: query_id
    0 = best_fields (tie_breaker 0.3), 1 = most_fields, 2 = cross_fields
    (blended max-df term statistics)."""
    from elasticsearch_assets_ray.query import multi_match as mm

    searchers = {
        "text": Searcher(documents_index(sf_dir)),
        "source": Searcher(documents_source_index(sf_dir)),
    }
    parts = []
    for qid, typ in enumerate(mm.MM_TYPES):
        res = mm.multi_match(
            searchers,
            MULTI_MATCH_QUERY,
            mm_type=typ,
            tie_breaker=MULTI_MATCH_TB,
            k=SEARCH_K + 90,
        )
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(ids),  # multi_match returns ORIG ids
                    "sim": res["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _multi_match_sql(query: str, k: int, tb: float) -> str:
    """DuckDB twin of the three multi_match types over per-field token
    streams with PER-FIELD statistics (df/dl/avgdl), mirroring the
    engine's combine arithmetic exactly."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    terms = sorted(set(tokenize_text(query)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    fields = {"text": "lower(text)", "source": "lower(source)"}
    ctes = ["nd AS (SELECT count(*)::DOUBLE AS n FROM documents)"]
    for f, expr in fields.items():
        tokf = f"regexp_extract_all({expr}, '[a-z0-9]+')"
        ctes.append(
            f"tok_{f} AS (SELECT doc_id, unnest({tokf}) AS term FROM documents)"
        )
        ctes.append(
            f"tf_{f} AS (SELECT doc_id, term, count(*)::BIGINT AS tf "
            f"FROM tok_{f} GROUP BY doc_id, term)"
        )
        ctes.append(
            f"dl_{f} AS (SELECT doc_id, count(*)::BIGINT AS dl "
            f"FROM tok_{f} GROUP BY doc_id)"
        )
        ctes.append(
            f"st_{f} AS (SELECT (SELECT sum(dl) FROM dl_{f})::DOUBLE / nd.n AS avgdl, "
            f"nd.n AS n FROM nd)"
        )
        ctes.append(
            f"df_{f} AS (SELECT term, count(*)::BIGINT AS df FROM tf_{f} GROUP BY term)"
        )
        # per-doc total field score over the query terms (field stats)
        ctes.append(
            f"fs_{f} AS (SELECT tf.doc_id, sum("
            f"ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * "
            f"(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl)))"
            f") AS score FROM tf_{f} tf JOIN df_{f} df ON df.term = tf.term "
            f"JOIN dl_{f} dl ON dl.doc_id = tf.doc_id CROSS JOIN st_{f} s "
            f"WHERE tf.term IN ({tlist}) GROUP BY tf.doc_id)"
        )
        # per-(doc, term) contribution with the BLENDED df (cross_fields)
        ctes.append(
            f"xs_{f} AS (SELECT tf.doc_id, tf.term, "
            f"ln(1 + (s.n - bd.df + 0.5) / (bd.df + 0.5)) * "
            f"(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl)))"
            f" AS score FROM tf_{f} tf JOIN bdf bd ON bd.term = tf.term "
            f"JOIN dl_{f} dl ON dl.doc_id = tf.doc_id CROSS JOIN st_{f} s "
            f"WHERE tf.term IN ({tlist}))"
        )
    bdf = (
        "bdf AS (SELECT term, max(df)::BIGINT AS df FROM "
        "(SELECT term, df FROM df_text UNION ALL SELECT term, df FROM df_source) "
        f"WHERE term IN ({tlist}) GROUP BY term)"
    )
    # field-name order pinned: source, text (sorted) for the sums
    both = (
        "bb AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, "
        "coalesce(a.score, 0.0) AS s_src, coalesce(b.score, 0.0) AS s_txt "
        "FROM fs_source a FULL OUTER JOIN fs_text b ON b.doc_id = a.doc_id)"
    )
    cross = (
        "crossx AS (SELECT doc_id, sum(best) AS score FROM ("
        "SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, "
        "greatest(coalesce(a.score, 0.0), coalesce(b.score, 0.0)) AS best "
        "FROM xs_source a FULL OUTER JOIN xs_text b "
        "ON b.doc_id = a.doc_id AND b.term = a.term) GROUP BY doc_id)"
    )
    arms = [
        # best_fields: max + tb*(sum - max)
        "SELECT 0 AS query_id, doc_id, greatest(s_src, s_txt) + "
        f"{tb} * ((s_src + s_txt) - greatest(s_src, s_txt)) AS score FROM bb",
        # most_fields: sum in sorted field order (source + text)
        "SELECT 1 AS query_id, doc_id, s_src + s_txt AS score FROM bb",
        "SELECT 2 AS query_id, doc_id, score FROM crossx",
    ]
    # bdf must precede the xs_ CTEs that reference it: emit CTEs in two
    # groups (duckdb resolves WITH items in order)
    head = [c for c in ctes if c.startswith(("nd ", "tok_", "tf_", "dl_", "st_", "df_"))]
    tail = [c for c in ctes if c.startswith("fs_")] + [bdf] + [
        c for c in ctes if c.startswith("xs_")
    ] + [both, cross]
    return (
        "WITH "
        + ", ".join(head + tail)
        + " SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        "FROM (" + " UNION ALL ".join(arms) + ") "
        f"QUALIFY rank <= {k}"
    )


#: combined_fields specs: (query, per-field weights ≥ 1)
COMBINED_FIELDS_SPECS: list[tuple[str, dict[str, float]]] = [
    ("spark table src3", {"source": 2.0}),
    ("fast scan src1", {"source": 3.0}),
]


def q_combined_fields(sf_dir: str):
    """ES combined_fields query over (text, source): BM25 over ONE
    synthetic merged field (weighted tf/dl sums, blended max-df term
    stats) — NOT a per-field score combiner like multi_match.  Served
    DISTRIBUTED: per-field ShardedSearchers (the duck-typed raw surface)
    — global stats from the coordinators, candidate postings + doclens
    scatter-gathered from the range shards."""
    from elasticsearch_assets_ray.query import multi_match as mm

    searchers = {
        "text": sharded_searcher(documents_index(sf_dir)),
        "source": sharded_searcher(documents_source_index(sf_dir)),
    }
    parts = []
    for qid, (q, wts) in enumerate(COMBINED_FIELDS_SPECS):
        res = mm.combined_fields(searchers, q, weights=wts, k=SEARCH_K + 90)
        ids = res["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            continue
        parts.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(ids.size, qid, dtype=np.int64)),
                    "vec_id": pa.array(ids),  # already ORIG ids
                    "sim": res["score"],
                }
            )
        )
    res = _rerank_rounded(pa.concat_tables(parts), SEARCH_K)
    return pa.table(
        {
            "query_id": res["query_id"],
            "doc_id": res["vec_id"],
            "rank": res["rank"],
            "score_r": res["sim_r"],
        }
    )


def _combined_fields_sql(k: int) -> str:
    """DuckDB twin of q_combined_fields: weighted tf/dl merge (field
    order pinned source, text — 2-addend sums are order-free), blended
    max df, the engine's exact BM25 constants."""
    from elasticsearch_assets_ray.stages.tokenizer import tokenize_text

    fields = {"text": "lower(text)", "source": "lower(source)"}
    ctes = ["nd AS (SELECT count(*)::DOUBLE AS n FROM documents)"]
    for f, expr in fields.items():
        tokf = f"regexp_extract_all({expr}, '[a-z0-9]+')"
        ctes.append(
            f"tok_{f} AS (SELECT doc_id, unnest({tokf}) AS term FROM documents)"
        )
        ctes.append(
            f"tf_{f} AS (SELECT doc_id, term, count(*)::DOUBLE AS tf "
            f"FROM tok_{f} GROUP BY doc_id, term)"
        )
        ctes.append(
            f"dl_{f} AS (SELECT doc_id, count(*)::DOUBLE AS dl "
            f"FROM tok_{f} GROUP BY doc_id)"
        )
        ctes.append(
            f"df_{f} AS (SELECT term, count(*)::BIGINT AS df FROM tf_{f} GROUP BY term)"
        )
        ctes.append(
            f"av_{f} AS (SELECT (SELECT sum(dl) FROM dl_{f}) / (SELECT n FROM nd) AS a)"
        )
    arms = []
    for qid, (q, wts) in enumerate(COMBINED_FIELDS_SPECS):
        terms = sorted(set(tokenize_text(q)))
        tlist = ", ".join(f"'{t}'" for t in terms)
        ws = float(wts.get("source", 1.0))
        wt = float(wts.get("text", 1.0))
        ctes.append(
            f"bdf_{qid} AS (SELECT term, max(df)::BIGINT AS df FROM "
            "(SELECT term, df FROM df_text UNION ALL SELECT term, df FROM df_source) "
            f"WHERE term IN ({tlist}) GROUP BY term)"
        )
        # weighted tf merge: ≤2 addends per (doc, term) — order-free
        ctes.append(
            f"tfc_{qid} AS (SELECT term, doc_id, sum(wtf) AS tfc FROM ("
            f"SELECT term, doc_id, {ws!r} * tf AS wtf FROM tf_source "
            f"WHERE term IN ({tlist}) "
            f"UNION ALL SELECT term, doc_id, {wt!r} * tf FROM tf_text "
            f"WHERE term IN ({tlist})) GROUP BY term, doc_id)"
        )
        ctes.append(
            f"dlc_{qid} AS (SELECT d.doc_id, "
            f"{ws!r} * coalesce(s.dl, 0.0) + {wt!r} * coalesce(t.dl, 0.0) AS dlc "
            "FROM documents d LEFT JOIN dl_source s ON s.doc_id = d.doc_id "
            "LEFT JOIN dl_text t ON t.doc_id = d.doc_id)"
        )
        ctes.append(
            f"avc_{qid} AS (SELECT {ws!r} * (SELECT a FROM av_source) + "
            f"{wt!r} * (SELECT a FROM av_text) AS v)"
        )
        arms.append(
            f"SELECT {qid} AS query_id, u.doc_id, "
            "sum( ln(1 + (nd.n - bd.df + 0.5) / (bd.df + 0.5)) "
            "* (u.tfc * 2.2) / (u.tfc + 1.2 * (0.25 + 0.75 * (dl.dlc / av.v))) ) AS score "
            f"FROM tfc_{qid} u JOIN bdf_{qid} bd ON bd.term = u.term "
            f"JOIN dlc_{qid} dl ON dl.doc_id = u.doc_id "
            f"CROSS JOIN nd CROSS JOIN avc_{qid} av "
            "WHERE bd.df > 0 GROUP BY u.doc_id"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        "FROM (" + " UNION ALL ".join(arms) + ") "
        f"QUALIFY rank <= {k}"
    )


PCT_RANK_VALUES = (150.0, 306.0, 450.0)
TTEST_GROUPS = ("click", "view")


def q_boxplot_nchars(sf_dir: str):
    """ES boxplot aggregation over the match set of 'spark table' —
    exact quartiles + IQR whiskers from the same DISTRIBUTED
    value_counts scatter as match_stats (per-shard (value, count)
    partials, driver finalize)."""
    from elasticsearch_assets_ray.query.engine import boxplot_from_value_counts

    sh = sharded_searcher(documents_index(sf_dir))
    vc = sh.value_counts("spark table", "n_chars")
    bx = boxplot_from_value_counts(vc)
    names = ["min", "max", "q1", "q2", "q3", "lower", "upper"]
    return pa.table(
        {
            "metric": pa.array(names, pa.string()),
            "value_r": pa.array([round(float(bx[m]), 6) for m in names], pa.float64()),
        }
    )


def q_percentile_ranks(sf_dir: str):
    """ES percentile_ranks over the same match set (midpoint convention,
    see percentile_ranks_from_value_counts)."""
    from elasticsearch_assets_ray.query.engine import (
        percentile_ranks_from_value_counts,
    )

    sh = sharded_searcher(documents_index(sf_dir))
    vc = sh.value_counts("spark table", "n_chars")
    pr = percentile_ranks_from_value_counts(vc, PCT_RANK_VALUES)
    return pa.table(
        {
            "value_s": pa.array(["%g" % x for x in pr["value"].to_pylist()], pa.string()),
            "rank_r": pa.array(
                [round(v, 6) if v is not None else None for v in pr["rank"].to_pylist()],
                pa.float64(),
            ),
        }
    )


def q_string_stats(sf_dir: str):
    """ES string_stats over documents.source: count, length min/max/avg,
    Shannon entropy (log2, char distribution) — one distributed pass,
    alphabet-bounded reduce (stages/textstats.py:string_stats)."""
    st = textstats.string_stats(_rd(sf_dir, "documents", columns=["source"]), "source")
    names = ["count", "min_length", "max_length", "avg_length", "entropy"]
    return pa.table(
        {
            "metric": pa.array(names, pa.string()),
            "value_r": pa.array(
                [round(float(st[m]), 6) for m in names], pa.float64()
            ),
        }
    )


def q_t_test(sf_dir: str):
    """ES t_test aggregation (unpaired heteroscedastic = Welch) between
    the 'click' and 'view' event values: per-group (n, Σx, Σx²) partials
    through the combiner-first partial_agg, the t statistic computed
    once on the driver with sample variance (n−1) — the exact formula
    the SQL twin writes out."""
    import math

    ds = _rd(sf_dir, "events", columns=["event_type", "value"])
    g1, g2 = TTEST_GROUPS
    ds = ds.map_batches(
        lambda b, keep=TTEST_GROUPS: b.filter(pc.is_in(b["event_type"], pa.array(list(keep)))),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "x": b["value"],
                "xx": pc.multiply(b["value"], b["value"]),
            }
        ),
        batch_format="pyarrow",
    )
    t = _collect(
        partial_agg(
            ds,
            ["event_type"],
            [
                AggSpec("n", "x", "count"),
                AggSpec("s", "x", "sum"),
                AggSpec("ss", "xx", "sum"),
            ],
        )
    )
    row = {
        et: (int(n), float(s), float(ss))
        for et, n, s, ss in zip(
            t["event_type"].to_pylist(),
            t["n"].to_pylist(),
            t["s"].to_pylist(),
            t["ss"].to_pylist(),
        )
    }

    def mv(et):
        n, s, ss = row[et]
        m = s / n
        var = (ss - s * s / n) / (n - 1)
        return n, m, var

    n1, m1, v1 = mv(g1)
    n2, m2, v2 = mv(g2)
    tval = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    return pa.table(
        {
            "pair": pa.array([f"{g1}#{g2}"], pa.string()),
            "t_r": pa.array([round(tval, 6)], pa.float64()),
        }
    )


def q_geo_centroid(sf_dir: str):
    """ES geo_centroid + geo_bounds over the derived event lat/lon —
    seven-number per-batch partials, no shuffle (sources/geo.py)."""
    from elasticsearch_assets_ray.sources.geo import geo_centroid_bounds

    ds = _rd(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        _derive_latlon, batch_format="pyarrow"
    )
    cb = geo_centroid_bounds(ds, "lat", "lon")
    names = ["centroid_lat", "centroid_lon", "top", "bottom", "left", "right", "count"]
    return pa.table(
        {
            "metric": pa.array(names, pa.string()),
            "value_r": pa.array([round(float(cb[m]), 6) for m in names], pa.float64()),
        }
    )


_MATCH_SET_SQL = (
    f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
    "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')), "
    "v AS (SELECT d.n_chars::DOUBLE AS x FROM m JOIN documents d "
    " ON d.doc_id = m.doc_id WHERE d.n_chars IS NOT NULL) "
)


def _boxplot_sql() -> str:
    return (
        _MATCH_SET_SQL
        + ", q AS (SELECT quantile_cont(x, 0.25) AS q1, quantile_cont(x, 0.50) AS q2, "
        "quantile_cont(x, 0.75) AS q3 FROM v), "
        "f AS (SELECT q1, q2, q3, q1 - 1.5 * (q3 - q1) AS lo, "
        "q3 + 1.5 * (q3 - q1) AS hi FROM q) "
        "SELECT 'min' AS metric, round(min(x), 6) AS value_r FROM v "
        "UNION ALL SELECT 'max', round(max(x), 6) FROM v "
        "UNION ALL SELECT 'q1', round(q1, 6) FROM f "
        "UNION ALL SELECT 'q2', round(q2, 6) FROM f "
        "UNION ALL SELECT 'q3', round(q3, 6) FROM f "
        "UNION ALL SELECT 'lower', round((SELECT min(x) FROM v, f WHERE x >= f.lo), 6) FROM f "
        "UNION ALL SELECT 'upper', round((SELECT max(x) FROM v, f WHERE x <= f.hi), 6) FROM f"
    )


def _pct_rank_sql() -> str:
    arms = []
    for x in PCT_RANK_VALUES:
        arms.append(
            f"SELECT '{'%g' % x}' AS value_s, round(100.0 * "
            f"(sum(CASE WHEN x < {x} THEN 1 ELSE 0 END) + "
            f"0.5 * sum(CASE WHEN x = {x} THEN 1 ELSE 0 END)) / count(*), 6) "
            "AS rank_r FROM v"
        )
    return _MATCH_SET_SQL + " ".join(
        ("UNION ALL " if i else "") + a for i, a in enumerate(arms)
    )


def _string_stats_sql() -> str:
    return (
        "WITH vals AS (SELECT source AS s FROM documents WHERE source IS NOT NULL), "
        "ch AS (SELECT unnest(regexp_extract_all(s, '.')) AS c FROM vals), "
        "cc AS (SELECT c, count(*)::DOUBLE AS n FROM ch GROUP BY c), "
        "tot AS (SELECT sum(n) AS t FROM cc) "
        "SELECT 'count' AS metric, round(count(*), 6) AS value_r FROM vals "
        "UNION ALL SELECT 'min_length', round(min(length(s)), 6) FROM vals "
        "UNION ALL SELECT 'max_length', round(max(length(s)), 6) FROM vals "
        "UNION ALL SELECT 'avg_length', "
        " round(sum(length(s))::DOUBLE / count(*), 6) FROM vals "
        "UNION ALL SELECT 'entropy', "
        " round(-sum((n / t) * log2(n / t)), 6) FROM cc CROSS JOIN tot"
    )


def _t_test_sql() -> str:
    g1, g2 = TTEST_GROUPS
    part = (
        "SELECT count(*)::BIGINT AS n, sum(value) AS s, sum(value * value) AS ss "
        "FROM events WHERE event_type = '{g}'"
    )
    return (
        f"WITH a AS ({part.format(g=g1)}), b AS ({part.format(g=g2)}), "
        "fa AS (SELECT n, s / n AS m, (ss - s * s / n) / (n - 1) AS v FROM a), "
        "fb AS (SELECT n, s / n AS m, (ss - s * s / n) / (n - 1) AS v FROM b) "
        f"SELECT '{g1}#{g2}' AS pair, "
        "round((fa.m - fb.m) / sqrt(fa.v / fa.n + fb.v / fb.n), 6) AS t_r "
        "FROM fa, fb"
    )


def _geo_centroid_sql() -> str:
    lat, lon = _GEO_LATLON_SQL
    return (
        f"WITH g AS (SELECT {lat} AS lat, {lon} AS lon FROM events) "
        "SELECT 'centroid_lat' AS metric, round(sum(lat) / count(*), 6) AS value_r FROM g "
        "UNION ALL SELECT 'centroid_lon', round(sum(lon) / count(*), 6) FROM g "
        "UNION ALL SELECT 'top', round(max(lat), 6) FROM g "
        "UNION ALL SELECT 'bottom', round(min(lat), 6) FROM g "
        "UNION ALL SELECT 'left', round(min(lon), 6) FROM g "
        "UNION ALL SELECT 'right', round(max(lon), 6) FROM g "
        "UNION ALL SELECT 'count', round(count(*), 6) FROM g"
    )


def _sql_range_lit(v: str) -> str:
    """Range-bound literal: numeric-looking bounds stay numeric (the
    engine casts bounds into the column's Arrow type — int columns
    compare numerically), anything else is a quoted string."""
    try:
        float(v)
        return v
    except ValueError:
        return "'" + v.replace("'", "''") + "'"


def _range_sql(fld: str, lo, loi: bool, hi, hii: bool) -> str:
    conds = []
    if lo is not None:
        conds.append(f"d.{fld} {'>=' if loi else '>'} {_sql_range_lit(lo)}")
    if hi is not None:
        conds.append(f"d.{fld} {'<=' if hii else '<'} {_sql_range_lit(hi)}")
    if not conds:  # fully open `f:[* TO *]`: existence
        conds.append(f"d.{fld} IS NOT NULL")
    return " AND ".join(conds)


_TERM_SCORE_SQL = (
    "ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * "
    "((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))))"
)
_TERM_SCORE_FROM = (
    "FROM tf JOIN df ON df.term = tf.term "
    "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
    "WHERE tf.doc_id = sc.doc_id AND "
)


def _tree_sql(node) -> tuple[str, str]:
    """(match_sql, score_sql) for a boolean tree, both over
    ``sc.doc_id`` — mirrors ``Searcher._tree_eval`` exactly: match =
    tree evaluation; score = Lucene's sum-of-matching-clauses (an OR
    sums its matching children left-to-right, a failed AND contributes
    nothing, NOT and filter leaves never score; the per-term value is
    idf × tf-saturation in the engine's multiplication order)."""
    from elasticsearch_assets_ray.query.expand import wildcard_regex

    kind = node[0]
    cond = None
    if kind == "term":
        cond = f"tf.term = '{node[1]}'"
    elif kind == "prefix":
        cond = f"tf.term LIKE '{node[1]}%'"
    elif kind == "wildcard":
        cond = f"regexp_matches(tf.term, '{wildcard_regex(node[1])}')"
    elif kind == "regexp":
        cond = f"regexp_matches(tf.term, '^(?:{node[1]})$')"
    elif kind == "fuzzy":
        cond = f"levenshtein(tf.term, '{node[1]}') <= {node[2]}"
    if cond is not None:
        return (
            f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = sc.doc_id AND {cond})",
            f"COALESCE((SELECT sum({_TERM_SCORE_SQL}) {_TERM_SCORE_FROM}{cond}), 0)",
        )
    if kind == "filter":
        pred = node[1]
        if pred[0] == "eq":
            c = f"d.{pred[1]} = '{pred[2].replace(chr(39), chr(39) * 2)}'"
        elif pred[0] == "match":
            # analyzed `field.text:token`: token membership under the
            # shared analyzer, the SQL twin of engine._filter_bits "match"
            c = (
                f"list_contains(regexp_extract_all(lower(d.{pred[1]}), "
                f"'[a-z0-9]+'), '{pred[2]}')"
            )
        elif pred[0] == "exists":
            c = f"d.{pred[1]} IS NOT NULL"
        else:
            c = _range_sql(pred[1], *pred[2:])
        return (
            f"COALESCE((SELECT {c} FROM documents d "
            "WHERE d.doc_id = sc.doc_id), FALSE)",
            "0",
        )
    if kind == "boost":
        m, s = _tree_sql(node[1])
        return m, f"(({s}) * {node[2]!r})"
    if kind == "not":
        m, _s = _tree_sql(node[1])
        return f"(NOT {m})", "0"
    parts = [_tree_sql(c) for c in node[1]]
    score = "(" + " + ".join(p[1] for p in parts) + ")"
    if kind == "and":
        match = "(" + " AND ".join(p[0] for p in parts) + ")"
        return match, f"(CASE WHEN {match} THEN {score} ELSE 0 END)"
    return "(" + " OR ".join(p[0] for p in parts) + ")", score


def _tree_multiterm_nodes(node, neg: bool = False) -> list:
    """Positive-polarity prefix/wildcard/fuzzy leaves (their expansion
    terms are scoring candidates, like the flat pre_arms)."""
    kind = node[0]
    if kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        return [] if neg else [node]
    if kind == "not":
        return _tree_multiterm_nodes(node[1], not neg)
    if kind == "boost":
        return _tree_multiterm_nodes(node[1], neg)
    if kind in ("and", "or"):
        return [x for c in node[1] for x in _tree_multiterm_nodes(c, neg)]
    return []


def _sloppy_exists_sql(phrase: tuple, slop: int) -> str:
    """EXISTS chain over the ``posn`` (doc, term, pos) CTE: ordered
    positions p1 < … < pm with span ≤ m-1+slop — the engine's sloppy
    ordered-window contract enumerated exactly."""
    m = len(phrase)
    aliases = [f"s{i}" for i in range(m)]
    froms = ", ".join(f"posn {a}" for a in aliases)
    conds = [f"{a}.doc_id = sc.doc_id" for a in aliases]
    conds += [
        f"{a}.term = '{t}'" for a, t in zip(aliases, phrase)
    ]
    conds += [
        f"{aliases[i]}.pos > {aliases[i - 1]}.pos" for i in range(1, m)
    ]
    conds.append(f"{aliases[-1]}.pos - {aliases[0]}.pos <= {m - 1 + slop}")
    return f"EXISTS (SELECT 1 FROM {froms} WHERE {' AND '.join(conds)})"


def _unordered_exists_sql(phrase: tuple, n: int) -> str:
    """EXISTS over ``posn`` for unordered proximity `"..."~uN`: one
    DISTINCT position per term instance (duplicate query terms get a
    canonical `<` chain), any order, span width ≤ m+N — the engine's
    unordered-window contract enumerated exactly."""
    m = len(phrase)
    aliases = [f"u{i}" for i in range(m)]
    froms = ", ".join(f"posn {a}" for a in aliases)
    conds = [f"{a}.doc_id = sc.doc_id" for a in aliases]
    conds += [f"{a}.term = '{t}'" for a, t in zip(aliases, phrase)]
    for i in range(m):
        for j in range(i + 1, m):
            if phrase[i] == phrase[j]:
                conds.append(f"{aliases[i]}.pos < {aliases[j]}.pos")
    pos_list = ", ".join(f"{a}.pos" for a in aliases)
    conds.append(f"greatest({pos_list}) - least({pos_list}) + 1 <= {m + n}")
    return f"EXISTS (SELECT 1 FROM {froms} WHERE {' AND '.join(conds)})"


def _phrase_prefix_exists_sql(terms: tuple, stem: str) -> str:
    """EXISTS chain for a phrase-prefix: the complete terms strictly
    adjacent, immediately followed by any token LIKE 'stem%'."""
    m = len(terms)
    aliases = [f"s{i}" for i in range(m + 1)]
    froms = ", ".join(f"posn {a}" for a in aliases)
    conds = [f"{a}.doc_id = sc.doc_id" for a in aliases]
    conds += [f"s{i}.term = '{t}'" for i, t in enumerate(terms)]
    conds += [f"s{i}.pos = s0.pos + {i}" for i in range(1, m + 1)]
    conds.append(f"s{m}.term LIKE '{stem}%'")
    return f"EXISTS (SELECT 1 FROM {froms} WHERE {' AND '.join(conds)})"


def _bm25_bool_sql(queries: list[str], k: int, msm: list[int] | None = None) -> str:
    """DuckDB oracle for the boolean/phrase query surface, mirroring the
    engine's semantics exactly: candidates match ≥1 scoring term; all
    MUST terms present, no MUST_NOT term present; every phrase adjacent
    (consecutive tokens — checked on the space-joined analyzed token
    string), no negated phrase adjacent; score = bag-of-words BM25 over
    the scoring terms."""
    from elasticsearch_assets_ray.query.parser import _range_key, parse_query

    from elasticsearch_assets_ray.query.expand import wildcard_regex

    score_vals, must_vals, not_vals, phr_vals = [], [], [], []
    pre_arms, npre_vals, mpre_vals = [], [], []
    mwild_vals, nwild_vals, mfz_vals, nfz_vals = [], [], [], []
    flt_conds: dict[int, list[str]] = {}
    flt_msm: list[str] = []
    slp_conds: list[str] = []
    tree_conds: dict[int, str] = {}
    tree_scores: dict[int, str] = {}
    for qid, qtext in enumerate(queries):
        p = parse_query(qtext)
        if p.bool_tree is not None:
            # boolean-expression query: match predicate + clause-aware
            # score printed straight from the tree (mirrors _tree_eval);
            # candidates still come from the scored CTE (≥1 positive
            # term — complete for grounded trees)
            from elasticsearch_assets_ray.query.expand import (
                wildcard_regex as _wrx,
            )

            tree_conds[qid], tree_scores[qid] = _tree_sql(p.bool_tree)
            for t in p.scoring_terms:
                score_vals.append(f"({qid}, '{t}')")
            for leaf in _tree_multiterm_nodes(p.bool_tree):
                if leaf[0] == "prefix":
                    pre_arms.append(
                        f"SELECT {qid} AS query_id, term FROM df "
                        f"WHERE term LIKE '{leaf[1]}%'"
                    )
                elif leaf[0] == "wildcard":
                    pre_arms.append(
                        f"SELECT {qid} AS query_id, term FROM df "
                        f"WHERE regexp_matches(term, '{_wrx(leaf[1])}')"
                    )
                elif leaf[0] == "regexp":
                    pre_arms.append(
                        f"SELECT {qid} AS query_id, term FROM df "
                        f"WHERE regexp_matches(term, '^(?:{leaf[1]})$')"
                    )
                else:
                    pre_arms.append(
                        f"SELECT {qid} AS query_id, term FROM df "
                        f"WHERE levenshtein(term, '{leaf[1]}') <= {leaf[2]}"
                    )
            continue
        # fielded metadata filters: conjunctive per-doc predicates over
        # the documents row (filter context — stats untouched)
        for fld, val in sorted(set(p.filters)):
            v = val.replace("'", "''")
            flt_conds.setdefault(qid, []).append(
                f"COALESCE(d.{fld} = '{v}', FALSE)"
            )
        for fld, val in sorted(set(p.not_filters)):
            v = val.replace("'", "''")
            flt_conds.setdefault(qid, []).append(
                f"NOT COALESCE(d.{fld} = '{v}', FALSE)"
            )
        # analyzed `field.text:token` match filters (token membership
        # under the shared analyzer — engine._filter_bits "match" twin)
        for fld, tok in sorted(set(p.match_filters)):
            flt_conds.setdefault(qid, []).append(
                f"COALESCE(list_contains(regexp_extract_all(lower(d.{fld}), "
                f"'[a-z0-9]+'), '{tok}'), FALSE)"
            )
        for fld, tok in sorted(set(p.not_match_filters)):
            flt_conds.setdefault(qid, []).append(
                f"NOT COALESCE(list_contains(regexp_extract_all(lower(d.{fld}), "
                f"'[a-z0-9]+'), '{tok}'), FALSE)"
            )
        # fielded RANGE filters: same filter context; a bound that looks
        # numeric stays a numeric literal (n_chars int column), anything
        # else compares as a string — mirroring the engine's cast of the
        # bound into the COLUMN's Arrow type
        for fld, lo, loi, hi, hii in sorted(set(p.range_filters), key=_range_key):
            flt_conds.setdefault(qid, []).append(
                f"COALESCE({_range_sql(fld, lo, loi, hi, hii)}, FALSE)"
            )
        for fld, lo, loi, hi, hii in sorted(
            set(p.not_range_filters), key=_range_key
        ):
            flt_conds.setdefault(qid, []).append(
                f"NOT COALESCE({_range_sql(fld, lo, loi, hi, hii)}, FALSE)"
            )
        for fld in sorted(set(p.exists_filters)):
            flt_conds.setdefault(qid, []).append(f"d.{fld} IS NOT NULL")
        for fld in sorted(set(p.not_exists_filters)):
            flt_conds.setdefault(qid, []).append(f"d.{fld} IS NULL")
        for t in p.scoring_terms:
            score_vals.append(f"({qid}, '{t}')")
        if msm and msm[qid] > 0:
            # ES minimum_should_match: ≥ N distinct should terms present
            sq = ", ".join(f"'{t}'" for t in sorted(set(p.should)))
            flt_msm.append(
                f"(sc.query_id <> {qid} OR (SELECT count(DISTINCT tf.term) "
                f"FROM tf WHERE tf.doc_id = sc.doc_id AND tf.term IN ({sq})) "
                f">= {msm[qid]})"
            )
        for t in sorted(set(p.must)):
            must_vals.append(f"({qid}, '{t}')")
        for t in sorted(set(p.must_not)):
            not_vals.append(f"({qid}, '{t}')")
        for ph in p.phrases:
            phr_vals.append(f"({qid}, ' {' '.join(ph)} ', FALSE)")
        for ph in p.not_phrases:
            phr_vals.append(f"({qid}, ' {' '.join(ph)} ', TRUE)")
        # sloppy phrases: ordered positions within span ≤ m-1+slop,
        # enumerated as an EXISTS chain over the (doc, term, pos) table;
        # negative slop encodes unordered proximity `~uN` (distinct
        # positions, any order, span width ≤ m+N)
        for ph, slop in p.sloppy_phrases:
            ex = (
                _unordered_exists_sql(ph, -slop - 1)
                if slop < 0
                else _sloppy_exists_sql(ph, slop)
            )
            slp_conds.append(f"(sc.query_id <> {qid} OR {ex})")
        for ph, slop in p.not_sloppy_phrases:
            ex = (
                _unordered_exists_sql(ph, -slop - 1)
                if slop < 0
                else _sloppy_exists_sql(ph, slop)
            )
            slp_conds.append(f"(sc.query_id <> {qid} OR NOT {ex})")
        for ph, stem in p.phrase_prefixes:
            slp_conds.append(
                f"(sc.query_id <> {qid} OR "
                f"{_phrase_prefix_exists_sql(ph, stem)})"
            )
        for ph, stem in p.not_phrase_prefixes:
            slp_conds.append(
                f"(sc.query_id <> {qid} OR NOT "
                f"{_phrase_prefix_exists_sql(ph, stem)})"
            )
        for pre in sorted(set(p.prefixes) | set(p.must_prefixes)):
            # expansion terms become SHOULD/scoring terms (the engine's
            # scoring rewrite of a trailing-star clause)
            pre_arms.append(
                f"SELECT {qid} AS query_id, term FROM df WHERE term LIKE '{pre}%'"
            )
        for pre in sorted(set(p.must_prefixes)):
            mpre_vals.append(f"({qid}, '{pre}%')")
        for pre in sorted(set(p.not_prefixes)):
            npre_vals.append(f"({qid}, '{pre}%')")
        # general wildcards: same anchored RE2 regex string engine- and
        # oracle-side (pyarrow and DuckDB are both RE2)
        for w in sorted(set(p.wildcards) | set(p.must_wildcards)):
            pre_arms.append(
                f"SELECT {qid} AS query_id, term FROM df "
                f"WHERE regexp_matches(term, '{wildcard_regex(w)}')"
            )
        for w in sorted(set(p.must_wildcards)):
            mwild_vals.append(f"({qid}, '{wildcard_regex(w)}')")
        for w in sorted(set(p.not_wildcards)):
            nwild_vals.append(f"({qid}, '{wildcard_regex(w)}')")
        # fuzzy clauses: DuckDB levenshtein() is the same plain edit
        # distance as the engine's vectorized DP (query/expand.py)
        for t, n in sorted(set(p.fuzzies) | set(p.must_fuzzies)):
            pre_arms.append(
                f"SELECT {qid} AS query_id, term FROM df "
                f"WHERE levenshtein(term, '{t}') <= {n}"
            )
        for t, n in sorted(set(p.must_fuzzies)):
            mfz_vals.append(f"({qid}, '{t}', {n})")
        for t, n in sorted(set(p.not_fuzzies)):
            nfz_vals.append(f"({qid}, '{t}', {n})")
        # regexp clauses `/pat/` use the anchored form on both sides
        # (pyarrow and DuckDB are both RE2) and ride the wildcard lists
        for r in sorted(set(p.regexps) | set(p.must_regexps)):
            pre_arms.append(
                f"SELECT {qid} AS query_id, term FROM df "
                f"WHERE regexp_matches(term, '^(?:{r})$')"
            )
        for r in sorted(set(p.must_regexps)):
            mwild_vals.append(f"({qid}, '^(?:{r})$')")
        for r in sorted(set(p.not_regexps)):
            nwild_vals.append(f"({qid}, '^(?:{r})$')")

    ctes = [
        f"tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)",
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term)",
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id)",
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        "(SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl)",
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)",
        "q AS ("
        + " UNION ".join(
            ([f"SELECT * FROM (VALUES {', '.join(score_vals)}) v(query_id, term)"]
             if score_vals else [])
            + pre_arms
        )
        + ")",
        "scored AS (SELECT q.query_id, tf.doc_id, "
        "sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        "* (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        "FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        "JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
        "GROUP BY q.query_id, tf.doc_id)",
    ]
    preds = []
    if must_vals:
        ctes.append(f"mq(query_id, term) AS (VALUES {', '.join(must_vals)})")
        preds.append(
            "(SELECT count(*) FROM mq WHERE mq.query_id = sc.query_id) = "
            "(SELECT count(*) FROM mq JOIN tf ON tf.term = mq.term "
            "AND tf.doc_id = sc.doc_id WHERE mq.query_id = sc.query_id)"
        )
    if not_vals:
        ctes.append(f"nq(query_id, term) AS (VALUES {', '.join(not_vals)})")
        preds.append(
            "NOT EXISTS (SELECT 1 FROM nq JOIN tf ON tf.term = nq.term "
            "AND tf.doc_id = sc.doc_id WHERE nq.query_id = sc.query_id)"
        )
    if phr_vals:
        ctes.append(
            f"dstr AS (SELECT doc_id, ' ' || array_to_string({_TOK}, ' ') || ' ' AS s "
            "FROM documents)"
        )
        ctes.append(f"ph(query_id, phrase, neg) AS (VALUES {', '.join(phr_vals)})")
        preds.append(
            "NOT EXISTS (SELECT 1 FROM ph JOIN dstr ON dstr.doc_id = sc.doc_id "
            "WHERE ph.query_id = sc.query_id AND "
            "((NOT ph.neg AND NOT contains(dstr.s, ph.phrase)) "
            "OR (ph.neg AND contains(dstr.s, ph.phrase))))"
        )
    if mpre_vals:
        # every must-prefix of the query must match ≥1 of the doc's terms
        ctes.append(f"mpre(query_id, pat) AS (VALUES {', '.join(mpre_vals)})")
        preds.append(
            "(SELECT count(*) FROM mpre WHERE mpre.query_id = sc.query_id) = "
            "(SELECT count(DISTINCT mpre.pat) FROM mpre JOIN tf "
            "ON tf.doc_id = sc.doc_id AND tf.term LIKE mpre.pat "
            "WHERE mpre.query_id = sc.query_id)"
        )
    if npre_vals:
        ctes.append(f"npre(query_id, pat) AS (VALUES {', '.join(npre_vals)})")
        preds.append(
            "NOT EXISTS (SELECT 1 FROM npre JOIN tf ON tf.doc_id = sc.doc_id "
            "AND tf.term LIKE npre.pat WHERE npre.query_id = sc.query_id)"
        )
    if mwild_vals:
        # every must-wildcard of the query must match ≥1 of the doc's terms
        ctes.append(f"mwild(query_id, rx) AS (VALUES {', '.join(mwild_vals)})")
        preds.append(
            "(SELECT count(*) FROM mwild WHERE mwild.query_id = sc.query_id) = "
            "(SELECT count(DISTINCT mwild.rx) FROM mwild JOIN tf "
            "ON tf.doc_id = sc.doc_id AND regexp_matches(tf.term, mwild.rx) "
            "WHERE mwild.query_id = sc.query_id)"
        )
    if nwild_vals:
        ctes.append(f"nwild(query_id, rx) AS (VALUES {', '.join(nwild_vals)})")
        preds.append(
            "NOT EXISTS (SELECT 1 FROM nwild JOIN tf ON tf.doc_id = sc.doc_id "
            "AND regexp_matches(tf.term, nwild.rx) "
            "WHERE nwild.query_id = sc.query_id)"
        )
    if mfz_vals:
        ctes.append(f"mfz(query_id, stem, n) AS (VALUES {', '.join(mfz_vals)})")
        preds.append(
            "(SELECT count(*) FROM mfz WHERE mfz.query_id = sc.query_id) = "
            "(SELECT count(DISTINCT mfz.stem || '~' || mfz.n) FROM mfz JOIN tf "
            "ON tf.doc_id = sc.doc_id AND levenshtein(tf.term, mfz.stem) <= mfz.n "
            "WHERE mfz.query_id = sc.query_id)"
        )
    if nfz_vals:
        ctes.append(f"nfz(query_id, stem, n) AS (VALUES {', '.join(nfz_vals)})")
        preds.append(
            "NOT EXISTS (SELECT 1 FROM nfz JOIN tf ON tf.doc_id = sc.doc_id "
            "AND levenshtein(tf.term, nfz.stem) <= nfz.n "
            "WHERE nfz.query_id = sc.query_id)"
        )
    if flt_conds:
        arms = [
            f"(sc.query_id <> {qid} OR (SELECT {' AND '.join(conds)} "
            "FROM documents d WHERE d.doc_id = sc.doc_id))"
            for qid, conds in sorted(flt_conds.items())
        ]
        preds.append("(" + " AND ".join(arms) + ")")
    preds.extend(flt_msm)
    if slp_conds:
        ctes.append(
            f"tkl AS (SELECT doc_id, {_TOK} AS T FROM documents)"
        )
        ctes.append(
            "posn AS (SELECT doc_id, unnest(T) AS term, "
            "unnest(generate_series(1, len(T))) AS pos FROM tkl)"
        )
        preds.extend(slp_conds)
    for qid, cond in sorted(tree_conds.items()):
        preds.append(f"(sc.query_id <> {qid} OR {cond})")
    score_expr = "sc.score"
    if tree_scores:
        score_expr = (
            "(CASE sc.query_id "
            + " ".join(
                f"WHEN {qid} THEN {s}" for qid, s in sorted(tree_scores.items())
            )
            + " ELSE sc.score END)"
        )
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT query_id, doc_id, row_number() OVER "
        f"(PARTITION BY query_id ORDER BY round({score_expr}, 9) DESC, doc_id) AS rank, "
        f"round({score_expr}, 6) AS score_r "
        f"FROM scored sc{where} QUALIFY rank <= {k}"
    )


ORACLES: dict[str, str] = {
    "date_range_scan": (
        "SELECT event_id, ts, user_id, event_type, value FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'"
    ),
    "key_prefix_scan": (
        "SELECT doc_id, source, lang FROM documents WHERE source LIKE 'src1%'"
    ),
    "projection": "SELECT doc_id, lang, n_chars FROM documents",
    "predicate_count": (
        "SELECT count(*) AS cnt FROM events WHERE event_type = 'purchase' AND value > 50"
    ),
    "min_max_probe": "SELECT min(ts) AS min_ts, max(ts) AS max_ts FROM events",
    "reindex_events": (
        "SELECT user_id, event_id, event_type, value * 2 AS value, ts "
        "FROM events"
    ),
    "bulk_index_lww": (
        "SELECT user_id, event_id, event_type, value, ts FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1"
    ),
    "bulk_create_first": (
        "SELECT user_id, event_id, event_type, value, ts FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) = 1"
    ),
    "bulk_delete": (
        "SELECT doc_id, source, lang FROM documents "
        "WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src0')"
    ),
    "bulk_rekey": (
        "WITH mv AS (SELECT doc_id AS old_id, doc_id + 1000000 AS doc_id, "
        "  'src1-moved' AS source, lang FROM documents WHERE source = 'src1') "
        "SELECT doc_id, source, lang FROM documents "
        "WHERE doc_id NOT IN (SELECT old_id FROM mv) "
        "  AND doc_id NOT IN (SELECT doc_id FROM mv) "
        "UNION ALL SELECT doc_id, source, lang FROM mv"
    ),
    "bulk_update_fields": (
        "SELECT c.c_custkey, c.c_name, c.c_mktsegment, "
        "coalesce(u.newbal, c.c_acctbal) AS c_acctbal "
        "FROM customer c LEFT JOIN ("
        "  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS newbal "
        "  FROM orders GROUP BY o_custkey) u ON u.o_custkey = c.c_custkey"
    ),
    "geo_box_count": (
        "WITH g AS (SELECT event_id, "
        f"{_GEO_LATLON_SQL[0]} AS lat, {_GEO_LATLON_SQL[1]} AS lon FROM events) "
        f"SELECT count(*) AS cnt FROM g WHERE lat >= {_GEO_BOX['bottom']} "
        f"AND lat <= {_GEO_BOX['top']} AND lon >= {_GEO_BOX['left']} "
        f"AND lon <= {_GEO_BOX['right']}"
    ),
    "geo_distance_agg": _geo_distance_agg_sql(),
    "geo_polygon_count": _geo_polygon_sql(),
    "geo_line": _geo_line_sql(),
    "geo_distance_topk": (
        "WITH g AS (SELECT event_id, "
        f"{_GEO_LATLON_SQL[0]} AS lat, {_GEO_LATLON_SQL[1]} AS lon FROM events), "
        "d AS (SELECT event_id, 2 * 6371.0088 * asin(sqrt("
        f"pow(sin(radians({_GEO_POINT[0]} - lat) / 2), 2) + "
        f"cos(radians(lat)) * cos(radians({_GEO_POINT[0]})) * "
        f"pow(sin(radians({_GEO_POINT[1]} - lon) / 2), 2))) AS km FROM g) "
        "SELECT event_id, row_number() OVER "
        "(ORDER BY round(km, 6), event_id) AS rank, round(km, 3) AS dist_r "
        "FROM d QUALIFY rank <= 10"
    ),
    "key_charclass_scan": (
        "SELECT doc_id, source, lang FROM documents "
        "WHERE regexp_matches(source, '^src[0-3]')"
    ),
    "bulk_update_script": (
        "WITH u AS (SELECT o_custkey, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS delta "
        "FROM orders GROUP BY o_custkey) "
        "SELECT c.c_custkey, c.c_name, "
        "CASE WHEN u.o_custkey IS NULL THEN c.c_acctbal "
        "ELSE c.c_acctbal + u.delta END AS c_acctbal "
        "FROM customer c LEFT JOIN u ON u.o_custkey = c.c_custkey"
    ),
    "bulk_upsert": (
        "WITH u AS (SELECT o_custkey + 100 AS k, "
        "   sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS newbal "
        "   FROM orders GROUP BY o_custkey) "
        "SELECT c.c_custkey, c.c_name, coalesce(u.newbal, c.c_acctbal) AS c_acctbal "
        "FROM customer c LEFT JOIN u ON u.k = c.c_custkey "
        "UNION ALL "
        "SELECT u.k AS c_custkey, CAST(NULL AS VARCHAR) AS c_name, u.newbal AS c_acctbal "
        "FROM u WHERE u.k NOT IN (SELECT c_custkey FROM customer)"
    ),
    "tpch_q1": (
        "SELECT l_returnflag, l_linestatus, "
        "sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty, "
        "sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base, "
        "(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0) / count(*) AS avg_qty, "
        "(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0) / count(*) AS avg_price, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "revenue_by_segment": (
        "SELECT c_mktsegment, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue, "
        "count(*) AS n_orders "
        "FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY c_mktsegment"
    ),
    "top_orders": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "has_child_orders": (
        "WITH c AS (SELECT l_orderkey, "
        "  CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents "
        "  FROM lineitem WHERE l_returnflag = 'R'), "
        "agg AS (SELECT l_orderkey AS o_orderkey, count(*) AS n_children, "
        "  sum(cents) AS sum_c FROM c GROUP BY 1) "
        "SELECT o.o_orderkey, a.n_children, a.sum_c / 100.0 AS score "
        "FROM orders o JOIN agg a USING (o_orderkey) WHERE a.n_children >= 2 "
        "ORDER BY score DESC, o.o_orderkey LIMIT 50"
    ),
    "has_parent_lines": (
        "WITH p AS (SELECT o_orderkey, "
        "  CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
        "  FROM orders WHERE o_orderpriority = '1-URGENT') "
        "SELECT l.l_orderkey, l.l_linenumber, p.cents / 100.0 AS score "
        "FROM lineitem l JOIN p ON p.o_orderkey = l.l_orderkey "
        "ORDER BY score DESC, l.l_orderkey, l.l_linenumber LIMIT 50"
    ),
    "children_by_priority": (
        "SELECT o.o_orderpriority, count(*) AS n_children, "
        "sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS revenue_cents, "
        "(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) "
        " / 100.0) / CAST(count(*) AS DOUBLE) AS avg_price "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"
    ),
    "exact_dedup": (
        "SELECT event_id, props FROM events "
        "QUALIFY row_number() OVER (PARTITION BY props ORDER BY event_id) = 1"
    ),
    "token_stats": (
        f"SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS token_count, "
        f"CAST(len(list_distinct({_TOK})) AS BIGINT) AS uniq_token_count, "
        "CAST(length(text) AS BIGINT) AS char_count FROM documents"
    ),
    "quality_stats": (
        "WITH b AS (SELECT doc_id, "
        f" CAST(len({_TOK}) AS BIGINT) AS n_words, "
        " CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct, "
        f" CAST(len(list_filter({_TOK}, x -> x IN ({_STOPWORD_SQL}))) AS BIGINT) AS n_stop, "
        " CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS tok_chars, "
        " CAST(length(text) AS BIGINT) AS n_chars "
        "FROM documents) "
        "SELECT doc_id, n_words, n_punct, "
        " CAST(n_stop AS DOUBLE) / greatest(n_words, 1) AS stopword_ratio, "
        " CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio, "
        " CASE WHEN n_words > 0 THEN CAST(tok_chars AS DOUBLE) / n_words ELSE 0.0 END AS mean_word_len "
        "FROM b"
    ),
    "lang_stats": (
        f"SELECT lang, count(*) AS n_docs, "
        f"CAST(sum(len({_TOK})) AS DOUBLE) / count(*) AS avg_tokens "
        "FROM documents GROUP BY lang"
    ),
    "embedding_topk": (
        "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv "
        "  FROM embeddings WHERE vec_id IN (0, 1, 2)), "
        "s AS (SELECT q.query_id, e.vec_id, "
        "  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim "
        "  FROM embeddings e CROSS JOIN q) "
        "SELECT query_id, vec_id, "
        " row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 9) DESC, vec_id) AS rank, "
        " round(sim, 6) AS sim_r "
        f"FROM s QUALIFY rank <= {_ANN_K}"
    ),
    "embedding_lsh_topk": _cosine_probe_sql(1),
    "embedding_knn": _cosine_probe_sql(1),
    "embedding_knn_sim": _cosine_probe_sql(10, min_sim=_KNN_SIM_THRESHOLD),
    "embedding_knn_filtered": _cosine_probe_sql(3, filter_term="data"),
    "embedding_pq_topk": _cosine_probe_sql(1),
    "embedding_ivf_topk": _cosine_probe_sql(1),
    "state_enrich": (
        "SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment "
        "FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id"
    ),
    "props_extract": (
        "SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events"
    ),
    "bpe_token_count": (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT) AS bpe_tokens "
        "FROM documents"
    ),
    # window starts = generate_series over [min, max+1us) stepped 5 days;
    # counts = events in [start, min(start+5d, hi))
    "date_interval_slices": (
        "WITH mm AS (SELECT min(ts) AS lo, max(ts) + INTERVAL 1 MICROSECOND AS hi FROM events), "
        "st AS (SELECT unnest(generate_series(lo, hi, INTERVAL 5 DAY)) AS s FROM mm), "
        "w AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS slice_id, "
        "  least(s + INTERVAL 5 DAY, (SELECT hi FROM mm)) AS e "
        "  FROM st WHERE s < (SELECT hi FROM mm)) "
        "SELECT w.slice_id, w.s AS win_start, w.e AS win_end, "
        "  (SELECT count(*) FROM events ev WHERE ev.ts >= w.s AND ev.ts < w.e) AS cnt "
        "FROM w"
    ),
    "keyspace_plan": (
        "WITH s AS (SELECT c_name AS k, row_number() OVER (ORDER BY c_name) AS rn FROM customer), "
        "n AS (SELECT count(*) AS cnt FROM customer), "
        "r AS (SELECT i AS part_id, (i * cnt) // 8 + 1 AS rk FROM range(1, 8) t(i), n) "
        "SELECT r.part_id, s.k AS boundary_key FROM r JOIN s ON s.rn = r.rk"
    ),
    # closed-form prediction of the PNG decode output: the synthetic
    # image content is a pure function of media_id (q_media_decode)
    "media_decode": (
        "WITH m AS (SELECT i AS media_id, 8 + (i*7919) % 56 AS width, "
        " 8 + (i*104729) % 56 AS height FROM range(0, 200) t(i)), "
        "j AS (SELECT media_id, width, height, "
        " unnest(range(0, width*height)) AS jj FROM m), "
        "s AS (SELECT media_id, sum((media_id*31 + jj*17) % 256)::BIGINT AS pix_sum "
        " FROM j GROUP BY media_id) "
        "SELECT m.media_id, m.width, m.height, m.width*m.height AS n_pixels, "
        "s.pix_sum FROM m JOIN s USING (media_id)"
    ),
    "video_frames": (
        "WITH m AS (SELECT i AS id, 4 + (i*13) % 9 AS nf FROM range(0, 120) t(i)), "
        "fr AS (SELECT id, unnest(range(0, nf, 2)) AS f FROM m), "
        "d AS (SELECT id, f, 8 + (id*7919 + f*101) % 24 AS width, "
        " 8 + (id*104729 + f*59) % 24 AS height FROM fr), "
        "j AS (SELECT id, f, width, height, "
        " unnest(range(0, width*height)) AS jj FROM d), "
        "s AS (SELECT id, f, sum((id*31 + f*7 + jj*17) % 256)::BIGINT AS pix_sum "
        " FROM j GROUP BY id, f) "
        "SELECT d.id*100 + d.f AS media_id, d.width, d.height, "
        "d.width*d.height AS n_pixels, s.pix_sum "
        "FROM d JOIN s ON s.id = d.id AND s.f = d.f"
    ),
    # closed-form prediction of the WAV decode output: samples are a
    # pure function of media_id (q_audio_decode): n = 64+(id*7919)%192,
    # s[j] = (id*31 + j*17) % 257 - 128
    "audio_decode": (
        "WITH m AS (SELECT i AS media_id, 64 + (i*7919) % 192 AS n_samples "
        " FROM range(0, 200) t(i)), "
        "j AS (SELECT media_id, n_samples, "
        " unnest(range(0, n_samples)) AS jj FROM m), "
        "v AS (SELECT media_id, jj, "
        " (media_id*31 + jj*17) % 257 - 128 AS s, "
        " CASE WHEN jj > 0 THEN (media_id*31 + (jj-1)*17) % 257 - 128 END AS sp "
        " FROM j), "
        "agg AS (SELECT media_id, sum(s)::BIGINT AS samp_sum, "
        " sum(s*s)::BIGINT AS samp_sqsum, "
        " sum(CASE WHEN sp IS NOT NULL AND s * sp < 0 THEN 1 ELSE 0 END)::BIGINT "
        "   AS n_zero_cross FROM v GROUP BY media_id) "
        "SELECT m.media_id, m.n_samples, 8000 AS sample_rate, agg.samp_sum, "
        "agg.samp_sqsum, agg.n_zero_cross FROM m JOIN agg USING (media_id)"
    ),
    "search_topk": _bm25_sql(DOC_QUERIES, SEARCH_K),
    "rank_eval": _rank_eval_sql(RANK_EVAL_QUERIES, SEARCH_K),
    "span_search": _span_sql(SPAN_SPECS, SEARCH_K),
    "intervals_search": _intervals_sql(),
    "boxplot_nchars": _boxplot_sql(),
    "percentile_ranks": _pct_rank_sql(),
    "string_stats": _string_stats_sql(),
    "t_test_values": _t_test_sql(),
    "geo_centroid": _geo_centroid_sql(),
    "multi_match": _multi_match_sql(MULTI_MATCH_QUERY, SEARCH_K, MULTI_MATCH_TB),
    "combined_fields": _combined_fields_sql(SEARCH_K),
    "phrase_suggest": _phrase_suggest_sql(
        PHRASE_SUGG_INPUTS, PHRASE_SUGG_SIZE, PHRASE_SUGG_EDITS, PHRASE_SUGG_PER_TOKEN
    ),
    "sort_search": _sort_search_sql(),
    "top_metrics_agg": _top_metrics_sql(),
    "change_point": _change_point_sql(),
    "frequent_item_sets": _frequent_item_sets_sql(),
    "random_sampler": _random_sampler_sql(),
    "transform_pivot": _TRANSFORM_PIVOT_SQL,
    "downsample": _DOWNSAMPLE_SQL,
    "eql_funnel": _eql_funnel_sql(),
    "cardinality_agg": _cardinality_sql(),
    "missing_global_agg": _missing_global_sql(),
    "search_synonyms": _synonym_sql(SEARCH_K),
    "decay_score": _decay_sql(SEARCH_K),
    "random_score": _random_sql(SEARCH_K),
    "update_by_query": _update_by_query_sql(),
    "sampler_agg": _sampler_sql(),
    "diversified_sampler": _diversified_sampler_sql(),
    "scripted_metric": _scripted_metric_sql(),
    "runtime_sort": _runtime_sort_sql(),
    "date_range_agg": _date_range_sql(),
    "blocklist_stats": _blocklist_sql(),
    "rank_feature": _rank_feature_sql(),
    "distance_feature": _distance_feature_sql(),
    "script_score": _script_score_sql(),
    "search_terms_set": _terms_set_sql(),
    "search_pinned": _pinned_sql(),
    "hybrid_rrf": hybrid.rrf_sql(
        _bm25_sql(DOC_QUERIES[:3], _HYBRID_W),
        _cosine_probe_sql(_HYBRID_W),
        k=_HYBRID_K,
    ),
    "hybrid_linear": hybrid.linear_sql(
        _bm25_sql(DOC_QUERIES[:3], _HYBRID_W),
        _cosine_probe_sql(_HYBRID_W),
        w_bm25=_LINEAR_W[0],
        w_knn=_LINEAR_W[1],
        k=_HYBRID_K,
    ),
    "search_sharded": _bm25_sql(DOC_QUERIES, SEARCH_K),
    # CCS rank identity: the SAME full-table BM25 — the federation must
    # reproduce it across the cluster boundary
    "search_ccs": _bm25_sql(DOC_QUERIES, SEARCH_K),
    "search_ccs_wild": _bm25_bool_sql(WILDCARD_QUERIES, SEARCH_K),
    "search_analyzed": _analyzed_bm25_sql(ANALYZED_QUERIES, SEARCH_K),
    "search_resharded": _bm25_sql(DOC_QUERIES[:4], SEARCH_K),
    "fulltext_count": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "qt(query_id, term) AS (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, q in enumerate(DOC_QUERIES)
            for t in sorted(set(q.split()))
        )
        + "), "
        "m AS (SELECT DISTINCT qt.query_id, tok.doc_id FROM qt "
        " JOIN tok ON tok.term = qt.term), "
        "c AS (SELECT query_id, count(*) AS cnt FROM m GROUP BY query_id), "
        "q2 AS (SELECT DISTINCT query_id FROM qt) "
        # zero-match queries still emit a row (the engine side always
        # reports every query_id)
        "SELECT q2.query_id, COALESCE(c.cnt, 0)::BIGINT AS cnt "
        "FROM q2 LEFT JOIN c USING (query_id)"
    ),
    "search_page2": _bm25_sql(DOC_QUERIES, SEARCH_K, page=2),
    "collapse_source": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q(term) AS (VALUES ('merge'), ('spark'), ('table')), "
        "scored AS (SELECT tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY tf.doc_id), "
        "c AS (SELECT sc.doc_id, sc.score, d.source FROM scored sc "
        " JOIN documents d ON d.doc_id = sc.doc_id), "
        # null collapse values stay singleton groups (ES semantics,
        # matching Searcher.search_collapse)
        "w AS (SELECT *, row_number() OVER (PARTITION BY "
        " CASE WHEN source IS NULL THEN 'n:' || doc_id ELSE 'v:' || source END "
        " ORDER BY round(score, 9) DESC, doc_id) AS gr FROM c) "
        "SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rank, "
        "doc_id, source, round(score, 6) AS score_r FROM w WHERE gr = 1 "
        f"QUALIFY rank <= {SEARCH_K}"
    ),
    "highlight": (
        f"WITH tkl AS (SELECT doc_id, {_TOK} AS T FROM documents "
        f" WHERE doc_id IN ({', '.join(map(str, HIGHLIGHT_DOCS))})), "
        "posn AS (SELECT doc_id, unnest(T) AS term, "
        " unnest(generate_series(1, len(T))) AS pos FROM tkl), "
        "starts AS (SELECT doc_id, unnest(generate_series(1, len(T))) AS p FROM tkl), "
        "qt(query_id, term) AS (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, qq in enumerate(HIGHLIGHT_QUERIES)
            for t in sorted(set(qq.split()))
        )
        + "), "
        "mt AS (SELECT qt.query_id, m.doc_id, m.pos FROM posn m "
        " JOIN qt ON qt.term = m.term), "
        "mc AS (SELECT s.doc_id, q.query_id, s.p, count(mt.pos) AS c "
        " FROM starts s CROSS JOIN (SELECT DISTINCT query_id FROM qt) q "
        " LEFT JOIN mt ON mt.query_id = q.query_id AND mt.doc_id = s.doc_id "
        f"  AND mt.pos >= s.p AND mt.pos < s.p + {HIGHLIGHT_WINDOW} "
        " GROUP BY 1, 2, 3), "
        "best AS (SELECT *, row_number() OVER (PARTITION BY query_id, doc_id "
        " ORDER BY c DESC, p) AS rn FROM mc) "
        "SELECT b.query_id, b.doc_id, b.p AS start, b.c AS n_matched, "
        f"array_to_string(t.T[b.p : least(b.p + {HIGHLIGHT_WINDOW - 1}, len(t.T))], ' ') "
        "AS snippet FROM best b JOIN tkl t ON t.doc_id = b.doc_id WHERE rn = 1"
    ),
    "search_compound": _compound_sql(),
    "match_bool_prefix": _match_bool_prefix_sql(),
    "weighted_tokens": _weighted_tokens_sql(),
    "term_vectors": (
        f"WITH tl AS (SELECT unnest({_TOK}) AS term, "
        f"generate_subscripts({_TOK}, 1) AS p FROM documents WHERE doc_id = 7) "
        "SELECT tl.term, tf.tf, (tl.p - 1)::BIGINT AS pos FROM tl "
        "JOIN (SELECT term, count(*)::BIGINT AS tf FROM tl GROUP BY term) tf "
        "USING (term)"
    ),
    "suggest_completion": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term), "
        "cand AS (SELECT 's' AS prefix, term AS suggestion, df, "
        " row_number() OVER (ORDER BY df DESC, term) AS rn "
        " FROM df WHERE term LIKE 's%') "
        "SELECT prefix, suggestion, df FROM cand WHERE rn <= 5"
    ),
    "suggest_terms": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term), "
        "qt(token) AS (VALUES "
        + ", ".join(f"('{t}')" for t in SUGGEST_TEXT.split())
        + "), "
        "cand AS (SELECT qt.token, df.term AS suggestion, "
        " levenshtein(df.term, qt.token)::BIGINT AS distance, df.df, "
        " row_number() OVER (PARTITION BY qt.token ORDER BY "
        "  levenshtein(df.term, qt.token), df.df DESC, df.term) AS rn "
        " FROM qt JOIN df ON levenshtein(df.term, qt.token) <= 2) "
        "SELECT token, suggestion, distance, df FROM cand WHERE rn <= 5"
    ),
    "more_like_this": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        f"srcs(src) AS (VALUES {', '.join(f'({x})' for x in MLT_SOURCES)}), "
        "ranked AS (SELECT tf.doc_id AS src, tf.term, row_number() OVER "
        " (PARTITION BY tf.doc_id ORDER BY "
        "  tf.tf * ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5)) DESC, tf.term) AS rn "
        " FROM tf JOIN df ON df.term = tf.term CROSS JOIN stats st "
        " WHERE tf.doc_id IN (SELECT src FROM srcs)), "
        "sel AS (SELECT src, term FROM ranked WHERE rn <= 25), "
        "scored AS (SELECT sel.src AS query_id, tf.doc_id, "
        " sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM sel JOIN tf ON tf.term = sel.term JOIN df ON df.term = sel.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s "
        " GROUP BY sel.src, tf.doc_id) "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 9) DESC, doc_id) AS rank, round(score, 6) AS score_r "
        "FROM scored WHERE doc_id <> query_id "
        f"QUALIFY rank <= {SEARCH_K}"
    ),
    "delete_search": _bm25_sql(DOC_QUERIES, SEARCH_K, delete_term=DELETE_TERM),
    "expunge_search": _bm25_sql(
        DOC_QUERIES, SEARCH_K, delete_term=DELETE_TERM, expunged=True
    ),
    "search_boolean": _bm25_bool_sql(BOOLEAN_QUERIES, SEARCH_K),
    "search_prefix": _bm25_bool_sql(PREFIX_QUERIES, SEARCH_K),
    "search_fuzzy": _bm25_bool_sql(FUZZY_QUERIES, SEARCH_K),
    # the generated SQL's only levenshtein() calls are the fuzzy-clause
    # expansions, so the transposition twin is a straight metric swap
    "search_fuzzy_osa": _bm25_bool_sql(FUZZY_OSA_QUERIES, SEARCH_K).replace(
        "levenshtein(", "damerau_levenshtein("
    ),
    "search_wildcard": _bm25_bool_sql(WILDCARD_QUERIES, SEARCH_K),
    "search_filtered": _bm25_bool_sql(FILTERED_QUERIES, SEARCH_K),
    "search_range": _bm25_bool_sql(RANGE_QUERIES, SEARCH_K),
    "search_boolops": _bm25_bool_sql(BOOLOP_QUERIES, SEARCH_K),
    "search_msm": _bm25_bool_sql(MSM_QUERIES, SEARCH_K, msm=MSM_NS),
    "search_regexp": _bm25_bool_sql(REGEXP_QUERIES, SEARCH_K),
    "search_sloppy": _bm25_bool_sql(SLOPPY_QUERIES, SEARCH_K),
    "search_unordered": _bm25_bool_sql(UNORDERED_QUERIES, SEARCH_K),
    "search_phrase_prefix": _bm25_bool_sql(PHRASE_PREFIX_QUERIES, SEARCH_K),
    # greedy sequence packing: the pack boundaries replay in SQL as a
    # recursive CTE over PACKS (each step jumps to the first overflowing
    # row); pack_id prefix = min(doc_id) << 32, matching the engine's
    # partition-prefixed ids on the single-shard gate layout
    "pack_documents": (
        f"WITH RECURSIVE counts AS (SELECT doc_id, CAST(len({_TOK}) AS BIGINT) "
        " AS token_count FROM documents), "
        "t AS (SELECT doc_id, token_count, row_number() OVER (ORDER BY doc_id) AS rn, "
        " sum(token_count) OVER (ORDER BY doc_id) AS cum FROM counts), "
        "packs(k, start_rn, start_cum) AS ( "
        " SELECT 0, 1, CAST(0 AS HUGEINT) "
        " UNION ALL "
        " SELECT k + 1, "
        f"  greatest((SELECT coalesce(min(rn), (SELECT max(rn) + 1 FROM t)) FROM t "
        f"            WHERE t.cum > p.start_cum + {PACK_BUDGET}), p.start_rn + 1), "
        f"  (SELECT cum FROM t WHERE rn = greatest((SELECT coalesce(min(rn), "
        f"    (SELECT max(rn) + 1 FROM t)) FROM t WHERE t.cum > p.start_cum + {PACK_BUDGET}), "
        "    p.start_rn + 1) - 1) "
        " FROM packs p WHERE p.start_rn <= (SELECT max(rn) FROM t)) "
        "SELECT t.doc_id, t.token_count, "
        " (SELECT min(doc_id) FROM documents) * 4294967296 + "
        " (SELECT max(k) FROM packs p WHERE p.start_rn <= t.rn) AS pack_id, "
        " t.rn - (SELECT max(p.start_rn) FROM packs p WHERE p.start_rn <= t.rn) AS pack_pos "
        "FROM t"
    ),
    # Gopher repetition signals — same float arithmetic order both sides
    "repetition_stats": (
        f"WITH tk AS (SELECT doc_id, {_TOK} AS T FROM documents), "
        "base AS (SELECT doc_id, CAST(len(T) AS DOUBLE) AS nt, "
        " CAST(len(list_distinct(T)) AS DOUBLE) AS nd, "
        " CAST(COALESCE(list_sum(list_transform(T, t -> length(t))), 0) AS DOUBLE) AS chars "
        "FROM tk), "
        "ng2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(T) - 1), "
        " i -> T[i] || ' ' || T[i + 1])) AS ng FROM tk WHERE len(T) >= 2), "
        "c2 AS (SELECT doc_id, ng, CAST(count(*) AS DOUBLE) AS c, "
        " CAST(length(ng) - 1 AS DOUBLE) AS w FROM ng2 GROUP BY doc_id, ng), "
        "t2 AS (SELECT doc_id, c * w AS num FROM "
        " (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, ng) AS rn FROM c2) "
        " WHERE rn = 1), "
        "ng3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(T) - 2), "
        " i -> T[i] || ' ' || T[i + 1] || ' ' || T[i + 2])) AS ng FROM tk WHERE len(T) >= 3), "
        "c3 AS (SELECT doc_id, ng, CAST(count(*) AS DOUBLE) AS c, "
        " CAST(length(ng) - 2 AS DOUBLE) AS w FROM ng3 GROUP BY doc_id, ng), "
        "t3 AS (SELECT doc_id, c * w AS num FROM "
        " (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, ng) AS rn FROM c3) "
        " WHERE rn = 1) "
        "SELECT b.doc_id, "
        " CASE WHEN b.nt > 0 THEN 1 - b.nd / b.nt ELSE 0.0 END AS dup_word_frac, "
        " CASE WHEN b.chars > 0 THEN COALESCE(t2.num, 0) / b.chars ELSE 0.0 END AS top2_char_frac, "
        " CASE WHEN b.chars > 0 THEN COALESCE(t3.num, 0) / b.chars ELSE 0.0 END AS top3_char_frac "
        "FROM base b LEFT JOIN t2 ON t2.doc_id = b.doc_id "
        "LEFT JOIN t3 ON t3.doc_id = b.doc_id"
    ),
    "function_score": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q(query_id, term) AS (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, qq in enumerate(DOC_QUERIES[:4])
            for t in sorted(set(qq.split()))
        )
        + "), "
        "scored AS (SELECT q.query_id, tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY q.query_id, tf.doc_id), "
        "fs AS (SELECT sc.query_id, sc.doc_id, "
        " sc.score * ln(1 + 0.01 * COALESCE(d.n_chars, 0)) AS total "
        " FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id) "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(total, 9) DESC, doc_id) AS rank, round(total, 6) AS score_r "
        f"FROM fs QUALIFY rank <= {SEARCH_K}"
    ),
    "search_rescore": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q1(query_id, term) AS (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, (p, _r) in enumerate(RESCORE_PAIRS)
            for t in sorted(set(p.split()))
        )
        + "), q2(query_id, term) AS (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, (_p, r) in enumerate(RESCORE_PAIRS)
            for t in sorted(set(r.split()))
        )
        + "), "
        "s1 AS (SELECT q1.query_id, tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q1 JOIN tf ON tf.term = q1.term JOIN df ON df.term = q1.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY q1.query_id, tf.doc_id), "
        "s2 AS (SELECT q2.query_id, tf.doc_id, sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        " * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q2 JOIN tf ON tf.term = q2.term JOIN df ON df.term = q2.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY q2.query_id, tf.doc_id), "
        "w AS (SELECT *, row_number() OVER (PARTITION BY query_id "
        " ORDER BY round(score, 9) DESC, doc_id) AS prk FROM s1), "
        "comb AS (SELECT w.query_id, w.doc_id, "
        f" w.score * {RESCORE_QW!r} + coalesce(s2.score, 0) * {RESCORE_RW!r} AS total "
        " FROM w LEFT JOIN s2 ON s2.query_id = w.query_id AND s2.doc_id = w.doc_id "
        f" WHERE w.prk <= {RESCORE_WINDOW}) "
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(total, 9) DESC, doc_id) AS rank, round(total, 6) AS score_r "
        f"FROM comb QUALIFY rank <= {SEARCH_K}"
    ),
    "events_daily": (
        "SELECT date_trunc('day', ts) AS day, "
        "count(*)::BIGINT AS n_events, "
        "count(DISTINCT user_id)::BIGINT AS n_users "
        "FROM events GROUP BY day"
    ),
    # composite agg: the full bucket space in key order, row_number
    # assigning pages of COMPOSITE_PAGE (the after_key pagination walks
    # the same order, so page boundaries land identically)
    "composite_agg": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')), "
        "k AS (SELECT d.lang AS lang, floor(d.n_chars / 200.0) * 200.0 AS bucket, "
        " count(*)::BIGINT AS count FROM m JOIN documents d ON d.doc_id = m.doc_id "
        " WHERE d.lang IS NOT NULL AND d.n_chars IS NOT NULL GROUP BY lang, bucket) "
        "SELECT CAST(floor((row_number() OVER (ORDER BY lang, bucket) - 1) "
        f"/ {COMPOSITE_PAGE}) AS BIGINT) AS page, lang, bucket, count FROM k"
    ),
    # geohash_grid: the generated SQL twin of geohash_encode (same
    # quantize/interleave/base-32 arithmetic) applied per event
    "geohash_grid": _geohash_grid_oracle(),
    # filtered alias: raw BM25 of the query, match set intersected with
    # the filter's (filter context — never scores)
    "search_alias": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q(term) AS (VALUES ('spark'), ('table')), "
        "flt AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge', 'join')), "
        "scored AS (SELECT tf.doc_id, "
        " sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        "  * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY tf.doc_id) "
        "SELECT 0 AS query_id, sc.doc_id, row_number() OVER "
        "(ORDER BY round(sc.score, 9) DESC, sc.doc_id) AS rank, "
        "round(sc.score, 6) AS score_r "
        "FROM scored sc JOIN flt ON flt.doc_id = sc.doc_id "
        "QUALIFY rank <= 10"
    ),
    # _explain: per-term contribution = the BM25 summand itself; top-3
    # docs re-derived by the same full ranking (round-9/docID order)
    "search_explain": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q(term) AS (VALUES ('spark'), ('table')), "
        "contrib AS (SELECT tf.doc_id, tf.term, tf.tf, "
        " ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        "  * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) AS c "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s), "
        "scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id), "
        "top AS (SELECT doc_id FROM scored "
        " QUALIFY row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) <= 3) "
        "SELECT c.term, c.doc_id, c.tf, round(c.c, 6) AS contribution_r "
        "FROM contrib c JOIN top USING (doc_id)"
    ),
    # matrix_stats: identical E-form float expressions over the same
    # exact integer sums (sum(x*x) of BIGINT promotes losslessly; every
    # operand is cast to DOUBLE at the same point as the Python side)
    "matrix_stats": (
        f"WITH f AS (SELECT n_chars::BIGINT AS x, len({_TOK})::BIGINT AS y "
        " FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL), "
        "s AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, "
        " sum(y)::BIGINT AS sy, sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy, "
        " sum(x*y)::BIGINT AS sxy FROM f), "
        "d AS (SELECT n, "
        " (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1) AS vx, "
        " (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n) / (n - 1) AS vy, "
        " (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / (n - 1) AS cv, "
        " sx::DOUBLE / n AS mx, sy::DOUBLE / n AS my FROM s) "
        "SELECT 'count' AS stat, 'n_chars' AS fx, 'n_chars' AS fy, "
        " CAST(n AS DOUBLE) AS value_r FROM d "
        "UNION ALL SELECT 'count', 'token_count', 'token_count', CAST(n AS DOUBLE) FROM d "
        "UNION ALL SELECT 'mean', 'n_chars', 'n_chars', round(mx, 6) FROM d "
        "UNION ALL SELECT 'mean', 'token_count', 'token_count', round(my, 6) FROM d "
        "UNION ALL SELECT 'variance', 'n_chars', 'n_chars', round(vx, 6) FROM d "
        "UNION ALL SELECT 'variance', 'token_count', 'token_count', round(vy, 6) FROM d "
        "UNION ALL SELECT 'covariance', 'n_chars', 'token_count', round(cv, 6) FROM d "
        "UNION ALL SELECT 'correlation', 'n_chars', 'token_count', "
        " round(cv / sqrt(vx * vy), 6) FROM d"
    ),
    # auto_date_histogram: the CASE ladder must pick the same interval,
    # then the bucket key is the same integer floor-multiple
    "auto_date_histogram": _auto_histo_oracle(),
    # rare_terms: global counts first, THEN the ≤ filter (rarest-first)
    "rare_terms": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')) "
        "SELECT CAST(d.n_chars AS VARCHAR) AS value, count(*)::BIGINT AS count "
        "FROM m JOIN documents d ON d.doc_id = m.doc_id "
        "WHERE d.n_chars IS NOT NULL GROUP BY d.n_chars HAVING count(*) <= 2"
    ),
    # multi_terms: tuple buckets, count-desc then keys-asc, top 10
    "multi_terms": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')) "
        "SELECT d.lang, d.source, count(*)::BIGINT AS count, "
        "row_number() OVER (ORDER BY count(*) DESC, d.lang, d.source) AS rank "
        "FROM m JOIN documents d ON d.doc_id = m.doc_id "
        "WHERE d.lang IS NOT NULL AND d.source IS NOT NULL "
        "GROUP BY d.lang, d.source QUALIFY rank <= 10"
    ),
    # median_absolute_deviation: both medians at quantile_cont convention
    "mad_nchars": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')), "
        "v AS (SELECT d.n_chars::DOUBLE AS x FROM m JOIN documents d "
        " ON d.doc_id = m.doc_id WHERE d.n_chars IS NOT NULL), "
        "med AS (SELECT quantile_cont(x, 0.5) AS mm FROM v) "
        "SELECT round(quantile_cont(abs(v.x - med.mm), 0.5), 6) AS mad_r "
        "FROM v CROSS JOIN med GROUP BY med.mm"
    ),
    # weighted_avg: integer-cents × integer-quantity partials
    "weighted_avg": (
        "SELECT l_returnflag, sum(CAST(l_quantity AS BIGINT)) AS sum_w, "
        "round((sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
        " * CAST(l_quantity AS BIGINT)) / 100.0) "
        " / sum(CAST(l_quantity AS BIGINT)), 6) AS wavg_r "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    # pipeline aggregations: SQL window functions over the same daily
    # buckets mirror the reduce-phase chain stage by stage (integer
    # counts sum exactly in float64, so mavg doubles agree bit-for-bit)
    "pipeline_daily": (
        "WITH b AS (SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n "
        " FROM events GROUP BY day), "
        "fu AS (SELECT user_id, min(date_trunc('day', ts)) AS fd "
        " FROM events GROUP BY user_id), "
        "pv AS (SELECT date_trunc('day', ts) AS day, value FROM events), "
        "di AS (SELECT day, row_number() OVER (ORDER BY day) AS i "
        " FROM (SELECT DISTINCT day FROM pv)), "
        "mp AS (SELECT a.day, round(quantile_cont(p.value, 0.5), 6) AS p50 "
        " FROM di a JOIN di b ON b.i BETWEEN a.i - 2 AND a.i "
        " JOIN pv p ON p.day = b.day GROUP BY a.day), "
        "w AS (SELECT day, strftime(day, '%Y-%m-%d') AS ds, n, "
        " n - lag(n) OVER (ORDER BY day) AS deriv, "
        " sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS csum, "
        " round(avg(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6) AS mavg, "
        " n - lag(n, 2) OVER (ORDER BY day) AS d2 FROM b) "
        "SELECT 'deriv' AS part, ds AS value, deriv AS count, 0.0 AS metric_r "
        " FROM w WHERE deriv IS NOT NULL "
        "UNION ALL SELECT 'cumsum', ds, csum, 0.0 FROM w "
        "UNION ALL SELECT 'mavg', ds, 0, mavg FROM w WHERE mavg IS NOT NULL "
        "UNION ALL SELECT 'diff2', ds, d2, 0.0 FROM w WHERE d2 IS NOT NULL "
        "UNION ALL SELECT 'bscript', ds, 0, "
        " round(CAST(n AS DOUBLE) / CAST(csum AS DOUBLE), 6) FROM w "
        "UNION ALL SELECT 'norm_pct', ds, 0, "
        " round(CAST(n AS DOUBLE) / (SELECT CAST(sum(n) AS DOUBLE) FROM b), 6) FROM w "
        "UNION ALL SELECT 'norm_z', ds, 0, "
        " round((CAST(n AS DOUBLE) - (SELECT avg(n) FROM b)) / "
        "  (SELECT sqrt(sum((CAST(n AS DOUBLE) - (SELECT avg(n) FROM b)) * "
        "   (CAST(n AS DOUBLE) - (SELECT avg(n) FROM b))) / count(*)) FROM b), 6) "
        " FROM w "
        "UNION ALL SELECT 'rate_hour', ds, 0, "
        " round(CAST(n AS DOUBLE) * (3600.0 / 86400.0), 6) FROM w "
        "UNION ALL SELECT 'rate_week', ds, 0, "
        " round(CAST(n AS DOUBLE) * (604800.0 / 86400.0), 6) FROM w "
        "UNION ALL SELECT 'cumcard', ds, "
        " (SELECT count(*) FROM fu WHERE fu.fd <= w.day), 0.0 FROM w "
        "UNION ALL SELECT 'mperc', strftime(day, '%Y-%m-%d'), 0, p50 FROM mp "
        "UNION ALL SELECT 'top', ds, n, "
        " CAST(row_number() OVER (ORDER BY n DESC, day) AS DOUBLE) FROM w "
        " WHERE n >= (SELECT avg(n) FROM b) "
        " QUALIFY row_number() OVER (ORDER BY n DESC, day) <= 5 "
        "UNION ALL SELECT 'sibling', 'count', count(*), 0.0 FROM b "
        "UNION ALL SELECT 'sibling', 'min', min(n), 0.0 FROM b "
        "UNION ALL SELECT 'sibling', 'max', max(n), 0.0 FROM b "
        "UNION ALL SELECT 'sibling', 'sum', sum(n), 0.0 FROM b "
        "UNION ALL SELECT 'sibling', 'avg', 0, round(avg(n), 6) FROM b"
    ),
    "approx_terms": _approx_terms_sql(),
    # facet/histogram aggregations: count over the exhaustive match set
    "facet_lang": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT doc_id FROM documents WHERE "
        "(EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = documents.doc_id AND tok.term = 'spark') "
        "OR EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = documents.doc_id AND tok.term = 'merge')) "
        "AND EXISTS (SELECT 1 FROM tok WHERE tok.doc_id = documents.doc_id AND tok.term = 'table')) "
        "SELECT d.lang AS value, count(*) AS count FROM m JOIN documents d "
        "ON d.doc_id = m.doc_id WHERE d.lang IS NOT NULL GROUP BY d.lang"
    ),
    "histogram_nchars": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')) "
        "SELECT floor(d.n_chars / 100.0) * 100.0 AS bucket, count(*) AS count "
        "FROM m JOIN documents d ON d.doc_id = m.doc_id "
        "WHERE d.n_chars IS NOT NULL GROUP BY bucket"
    ),
    # terms agg + avg sub-agg: integer n_chars sums are exact in float64,
    # so the engine's Σ(metric·count)/Σcount equals SQL's sum(x)/count(*)
    "facet_metric": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')) "
        "SELECT d.lang AS value, count(*) AS count, "
        "round(sum(d.n_chars)::DOUBLE / count(*), 6) AS avg_r "
        "FROM m JOIN documents d ON d.doc_id = m.doc_id "
        "WHERE d.lang IS NOT NULL AND d.n_chars IS NOT NULL GROUP BY d.lang"
    ),
    # significant_terms JLH: fgPct = fg/|match|, bgPct = df/n_docs;
    # the float expression mirrors significant_terms_from_partials
    # term-by-term so the doubles agree before the shared round(…, 6)
    "significant_terms": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "dt AS (SELECT DISTINCT doc_id, term FROM tok), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')), "
        "fg AS (SELECT term, count(*)::BIGINT AS fg FROM dt "
        " WHERE doc_id IN (SELECT doc_id FROM m) GROUP BY term), "
        "bg AS (SELECT term, count(*)::BIGINT AS bg FROM dt GROUP BY term), "
        "tot AS (SELECT (SELECT count(*) FROM m)::DOUBLE AS fgt, "
        " (SELECT count(*) FROM documents)::DOUBLE AS n), "
        "sc AS (SELECT fg.term, fg.fg, bg.bg, "
        " ((fg.fg / t.fgt) - (bg.bg / t.n)) * ((fg.fg / t.fgt) / (bg.bg / t.n)) AS score "
        " FROM fg JOIN bg USING (term) CROSS JOIN tot t "
        " WHERE fg.fg >= 3 AND (fg.fg / t.fgt) > (bg.bg / t.n)) "
        "SELECT term, fg, bg, round(score, 6) AS score_r FROM sc "
        "QUALIFY row_number() OVER (ORDER BY round(score, 9) DESC, term) <= 10"
    ),
    # range agg: [from, to) half-open, each bucket counted independently;
    # the label literals are pinned by tests to engine.range_label
    "range_agg": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')), "
        "v AS (SELECT d.n_chars::DOUBLE AS x FROM m JOIN documents d "
        " ON d.doc_id = m.doc_id WHERE d.n_chars IS NOT NULL) "
        "SELECT '*-200.0' AS value, (SELECT count(*) FROM v WHERE x < 200.0) AS count "
        "UNION ALL SELECT '200.0-400.0', "
        " (SELECT count(*) FROM v WHERE x >= 200.0 AND x < 400.0) "
        "UNION ALL SELECT '400.0-*', (SELECT count(*) FROM v WHERE x >= 400.0)"
    ),
    # terms agg + top_hits sub-agg: full BM25 (same CTE structure as
    # _bm25_sql) then per-lang rank at round-9/docID granularity
    "top_hits": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term), "
        "dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id), "
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
        " (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl), "
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term), "
        "q(term) AS (VALUES ('spark'), ('table')), "
        "scored AS (SELECT tf.doc_id, "
        " sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
        "  * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl))) ) AS score "
        " FROM q JOIN tf ON tf.term = q.term JOIN df ON df.term = q.term "
        " JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s GROUP BY tf.doc_id) "
        "SELECT d.lang AS value, "
        " row_number() OVER (PARTITION BY d.lang ORDER BY round(sc.score, 9) DESC, sc.doc_id) AS rank, "
        " sc.doc_id, round(sc.score, 6) AS score_r "
        "FROM scored sc JOIN documents d ON d.doc_id = sc.doc_id "
        "WHERE d.lang IS NOT NULL "
        "QUALIFY rank <= 3"
    ),
    # extended_stats + exact percentiles over the same OR match set; the
    # float expressions mirror stats_from_value_counts structurally so
    # the doubles are bit-comparable before the shared round(…, 6)
    "match_stats": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('spark', 'table')), "
        "v AS (SELECT d.n_chars::DOUBLE AS x FROM m JOIN documents d "
        " ON d.doc_id = m.doc_id WHERE d.n_chars IS NOT NULL), "
        "s AS (SELECT count(*)::DOUBLE AS n, min(x) AS mn, max(x) AS mx, "
        " sum(x) AS sm, sum(x*x) AS ss FROM v) "
        "SELECT 'count' AS metric, round(n, 6) AS value FROM s "
        "UNION ALL SELECT 'min', round(mn, 6) FROM s "
        "UNION ALL SELECT 'max', round(mx, 6) FROM s "
        "UNION ALL SELECT 'sum', round(sm, 6) FROM s "
        "UNION ALL SELECT 'sum_of_squares', round(ss, 6) FROM s "
        "UNION ALL SELECT 'avg', round(sm / n, 6) FROM s "
        "UNION ALL SELECT 'variance', round(ss / n - (sm / n) * (sm / n), 6) FROM s "
        "UNION ALL SELECT 'std_deviation', "
        " round(sqrt(ss / n - (sm / n) * (sm / n)), 6) FROM s "
        "UNION ALL SELECT 'p25', round(quantile_cont(x, 0.25), 6) FROM v "
        "UNION ALL SELECT 'p50', round(quantile_cont(x, 0.50), 6) FROM v "
        "UNION ALL SELECT 'p75', round(quantile_cont(x, 0.75), 6) FROM v "
        "UNION ALL SELECT 'p95', round(quantile_cont(x, 0.95), 6) FROM v "
        "UNION ALL SELECT 'p99', round(quantile_cont(x, 0.99), 6) FROM v"
    ),
    # incremental_delta: per-window doc counts are plain range counts, and
    # 'total_matched' is the windowed docs whose props tokenize to contain
    # the probe term 'k' (tokenizer = lowercase [a-z0-9]+ runs, replicated
    # as a boundary regex) — the window/merge machinery is what the Ray
    # side tests, but the NUMBERS are SQL-checkable
    "incremental_delta": (
        "WITH w1 AS (SELECT count(*) AS c FROM events "
        "  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-16'), "
        "w2 AS (SELECT count(*) AS c FROM events "
        "  WHERE ts >= TIMESTAMP '2024-01-16' AND ts < TIMESTAMP '2024-02-01'), "
        "m AS (SELECT count(*) AS c FROM events "
        "  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01' "
        "  AND regexp_matches(lower(props), '(^|[^a-z0-9])k([^a-z0-9]|$)')) "
        "SELECT '2024-01-01T00-00-00__2024-01-16T00-00-00' AS tick_id, c AS n_docs FROM w1 "
        "UNION ALL SELECT '2024-01-16T00-00-00__2024-02-01T00-00-00', c FROM w2 "
        "UNION ALL SELECT 'total_matched', c FROM m"
    ),
}

# hash/sketch oracles: SQL replicas of the pipelines' exact arithmetic
# (uint64 Horner hashes, minhash permutation constants, banding) — see
# pipelines/oracles_hard.py for the construction arguments.
from elasticsearch_assets_ray.pipelines import oracles_hard as _oh  # noqa: E402

ORACLES.update(
    {
        "fingerprint": _oh.fingerprint_sql(),
        "dup_span_stats": _oh.dup_span_stats_sql(),
        "exact_substr": _exact_substr_sql(),
        "line_dedup": _line_dedup_sql(),
    "collapse_inner": _collapse_inner_sql(5, 3),
    "ingest_events": (
        "SELECT user_id, event_id, "
        "regexp_replace(upper(event_type), 'O', '0', 'g') AS event_type, "
        "value * 3 AS value, ts FROM events"
    ),
    "terms_enum": (
        f"SELECT 's' AS prefix, term AS suggestion, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        f"FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents) "
        "WHERE starts_with(term, 's') GROUP BY term ORDER BY term LIMIT 8"
    ),
    "unigram_ppl": (
        f"WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents), "
        "cnt AS (SELECT term, count(*)::DOUBLE AS c FROM tok GROUP BY term), "
        "tot AS (SELECT count(*)::DOUBLE AS n FROM tok), "
        "d AS (SELECT tok.doc_id, sum(ln(cnt.c / t.n)) AS s, count(*)::DOUBLE AS m "
        " FROM tok JOIN cnt USING (term) CROSS JOIN tot t GROUP BY tok.doc_id) "
        "SELECT doc.doc_id, coalesce(round(exp(-d.s / d.m), 6), 0.0) AS unigram_ppl_r "
        "FROM documents doc LEFT JOIN d USING (doc_id) ORDER BY doc_id"
    ),
        "lang_id": _oh.lang_id_sql(),
        "simhash_pairs": _oh.simhash_pairs_sql(max_hamming=3),
        "minhash_pairs": _oh.minhash_pairs_sql(
            num_perm=64, bands=16, shingle_k=3, threshold=0.5
        ),
        "ngram_pairs": _oh.ngram_pairs_sql(threshold=0.5),
        "events_daily_hll": _oh.events_daily_hll_sql(p=12),
        "percolate": _percolate_sql(PERC_QUERIES),
        "mixture_sample": _oh.mixture_sample_sql(
            MIX_EPOCHS, key_col="lang", default_epochs=1.0, salt="mix"
        ),
        "filters_agg": _filters_agg_sql(ADJ_QUERIES),
        "adjacency_matrix": _adjacency_sql(ADJ_QUERIES),
        "pii_stats": _pii_stats_sql(),
        "contamination_stats": _contamination_sql(),
        "prefix_dfs": _oh.prefix_dfs_sql("abcdefghijklmnopqrstuvwxyz0123456789", 30),
        "embedding_dedup": _oh.embedding_dedup_sql(threshold=0.99),
        "semdedup": _oh.embedding_dedup_sql(threshold=0.99),
        "neardup_clusters": _oh.neardup_clusters_sql(
            num_perm=64, bands=16, shingle_k=3, threshold=0.5
        ),
        "split_assign": _oh.split_assign_sql(SPLIT_RATIOS),
        "stratified_sample": _oh.stratified_sample_sql(
            STRATA_FRACTIONS, key_col="lang", default_fraction=0.1
        ),
    }
)

# Gopher filter verdict: the SAME CASE logic over the quality/repetition
# oracle CTEs (inputs bit-identical → threshold comparisons deterministic)
ORACLES["dsir"] = _dsir_sql()
ORACLES["chunk_documents"] = _chunk_sql()

# ES|QL twins.  esql_revenue's LOOKUP JOIN is a left join in ES|QL; every
# o_custkey exists in customer (TPC-H referential integrity), so the
# inner-join twin is row-identical.
ORACLES["esql_daily"] = (
    "SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n_events, "
    "count(DISTINCT user_id)::BIGINT AS n_users "
    "FROM events WHERE event_type != 'view' GROUP BY day"
)
ORACLES["esql_revenue"] = ORACLES["revenue_by_segment"]
ORACLES["esql_match"] = (
    "SELECT lang AS value, count(*)::BIGINT AS count, "
    "round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS metric_r "
    "FROM documents WHERE lang != 'de' "
    f"AND list_contains({_TOK}, 'spark') AND list_contains({_TOK}, 'join') "
    "GROUP BY lang"
)
ORACLES["esql_pctl"] = (
    "SELECT event_type AS value, count(*)::BIGINT AS count, "
    "round(quantile_cont(value, 0.9), 6) AS metric_r "
    "FROM events WHERE value IS NOT NULL GROUP BY event_type"
)
ORACLES["tpch_q6"] = (
    "SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
    " CAST(round(l_discount * 10000) AS BIGINT)) / 1000000.0 AS revenue, "
    "count(*)::BIGINT AS n FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)
ORACLES["tpch_q3"] = (
    "SELECT o_orderkey, o_orderdate, "
    "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
    " (10000 - CAST(round(l_discount * 10000) AS BIGINT))) / 1000000.0 AS revenue "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "AND o_orderdate < TIMESTAMP '1998-01-01' "
    "AND l_shipdate > TIMESTAMP '1996-06-30' "
    "GROUP BY o_orderkey, o_orderdate "
    "ORDER BY revenue DESC, o_orderkey LIMIT 10"
)
ORACLES["esql_match_idx"] = ORACLES["esql_match"]
ORACLES["esql_stats2"] = (
    "WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc, "
    " user_id FROM events WHERE value IS NOT NULL), "
    "g AS (SELECT event_type, count(*)::BIGINT AS count, "
    " sqrt(greatest((CAST(sum(vc * vc) AS DOUBLE) - "
    "  (CAST(sum(vc) AS DOUBLE) * CAST(sum(vc) AS DOUBLE)) / "
    "  CAST(count(vc) AS DOUBLE)) / CAST(count(vc) AS DOUBLE), 0)) AS sd, "
    " CAST(sum(vc * user_id) AS DOUBLE) / CAST(sum(user_id) AS DOUBLE) AS wa "
    " FROM b GROUP BY event_type), "
    "t AS (SELECT event_type, "
    " unnest((list_sort(list(vc), 'DESC'))[1:3]) AS tp FROM b GROUP BY event_type) "
    "SELECT g.event_type || ':' || CAST(t.tp AS VARCHAR) AS value, g.count, "
    "round(g.sd + g.wa, 6) AS metric_r "
    "FROM g JOIN t ON g.event_type = t.event_type"
)
ORACLES["esql_inline"] = (
    "WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc "
    " FROM events WHERE value IS NOT NULL), "
    "g AS (SELECT event_type, count(*)::BIGINT AS gn, sum(vc)::BIGINT AS gsum "
    " FROM b GROUP BY event_type) "
    "SELECT b.event_type AS value, count(*)::BIGINT AS count, 0.0 AS metric_r "
    "FROM b JOIN g USING (event_type) WHERE b.vc * g.gn > g.gsum "
    "GROUP BY b.event_type"
)
ORACLES["esql_fork"] = (
    "WITH u AS ("
    " SELECT 'fork1' AS f, lang FROM documents "
    f" WHERE list_contains({_TOK}, 'spark') AND list_contains({_TOK}, 'join') "
    " UNION ALL SELECT 'fork2' AS f, lang FROM documents WHERE n_chars > 450) "
    "SELECT f || ':' || lang AS value, count(*)::BIGINT AS count, "
    "0.0 AS metric_r FROM u GROUP BY f, lang"
)
ORACLES["tpch_q5"] = (
    "SELECT r_name || ':' || n_name AS c_mktsegment, "
    "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
    " (10000 - CAST(round(l_discount * 10000) AS BIGINT))) / 1000000.0 AS revenue, "
    "count(*)::BIGINT AS n_orders "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o_orderdate < TIMESTAMP '1997-01-01' "
    "GROUP BY r_name, n_name"
)
ORACLES["bpe_pairs"] = (
    f"WITH tok AS (SELECT unnest({_TOK}) AS word FROM documents), "
    "wf AS (SELECT word, count(*)::BIGINT AS c FROM tok "
    " WHERE length(word) <= 64 GROUP BY word), "
    "p AS ("
    " SELECT unnest(list_transform(generate_series(1, length(word) - 1), "
    "   i -> substring(word, i, 1) || '|' || substring(word, i + 1, 1))) AS pair, "
    "   c FROM wf "
    " UNION ALL "
    " SELECT substring(word, length(word), 1) || '|</w>' AS pair, c FROM wf) "
    "SELECT pair AS value, sum(c)::BIGINT AS count, "
    " CAST(row_number() OVER (ORDER BY sum(c) DESC, pair) AS DOUBLE) AS metric_r "
    "FROM p GROUP BY pair ORDER BY count DESC, value LIMIT 30"
)
ORACLES["esql_grok"] = (
    "SELECT event_type AS value, count(*)::BIGINT AS count, "
    "CAST(sum(CAST(regexp_extract(props, '([+-]?[0-9]+(?:\\.[0-9]+)?)', 1) "
    "AS BIGINT)) AS DOUBLE) AS metric_r FROM events GROUP BY event_type"
)
ORACLES["esql_mv"] = (
    "SELECT w AS value, count(*)::BIGINT AS count, 0.0 AS metric_r "
    "FROM (SELECT unnest(string_split(substr(text, 1, 20), ' ')) AS w "
    "FROM documents) WHERE length(w) > 3 GROUP BY w "
    "ORDER BY count DESC, value ASC LIMIT 25"
)
ORACLES["esql_strings"] = (
    "SELECT doc_id, substr(text, 1, 12) AS head, upper(lang) AS up, "
    "lang || ':' || source AS tag, length(text)::BIGINT AS ln "
    "FROM documents WHERE length(text) % 7 = 3 AND lang NOT IN ('xx') "
    "ORDER BY doc_id LIMIT 200"
)
ORACLES["gopher_filter"] = (
    f"WITH q AS ({ORACLES['quality_stats']}), "
    f"r AS ({ORACLES['repetition_stats']}), "
    "t AS (SELECT q.doc_id, "
    " (CASE WHEN q.n_words < 30 OR q.n_words > 100000 THEN 1 ELSE 0 END) "
    "+ (CASE WHEN q.mean_word_len < 3.0 OR q.mean_word_len > 10.0 THEN 2 ELSE 0 END) "
    "+ (CASE WHEN q.stopword_ratio < 0.02 THEN 4 ELSE 0 END) "
    "+ (CASE WHEN r.dup_word_frac > 0.6 THEN 8 ELSE 0 END) "
    "+ (CASE WHEN r.top2_char_frac > 0.20 THEN 16 ELSE 0 END) "
    "+ (CASE WHEN r.top3_char_frac > 0.18 THEN 32 ELSE 0 END) AS f "
    "FROM q JOIN r USING (doc_id)) "
    "SELECT doc_id, CASE WHEN f = 0 THEN 1 ELSE 0 END AS gopher_keep, "
    "f AS gopher_fail_mask FROM t ORDER BY doc_id"
)


QUERIES = {
    "date_range_scan": q_date_range_scan,
    "key_prefix_scan": q_key_prefix_scan,
    "projection": q_projection,
    "predicate_count": q_predicate_count,
    "min_max_probe": q_min_max_probe,
    "bulk_index_lww": q_bulk_index_lww,
    "reindex_events": q_reindex_events,
    "bulk_create_first": q_bulk_create_first,
    "bulk_delete": q_bulk_delete,
    "bulk_rekey": q_bulk_rekey,
    "bulk_update_fields": q_bulk_update_fields,
    "bulk_update_script": q_bulk_update_script,
    "bulk_upsert": q_bulk_upsert,
    "key_charclass_scan": q_key_charclass_scan,
    "geo_box_count": q_geo_box_count,
    "geo_distance_topk": q_geo_distance_topk,
    "tpch_q1": q_tpch_q1,
    "revenue_by_segment": q_revenue_by_segment,
    "top_orders": q_top_orders,
    "has_child_orders": q_has_child_orders,
    "has_parent_lines": q_has_parent_lines,
    "children_by_priority": q_children_by_priority,
    "exact_dedup": q_exact_dedup,
    "minhash_pairs": q_minhash_pairs,
    "ngram_pairs": q_ngram_pairs,
    "neardup_clusters": q_neardup_clusters,
    "exact_substr": q_exact_substr,
    "line_dedup": q_line_dedup,
    "simhash_pairs": q_simhash_pairs,
    "token_stats": q_token_stats,
    "quality_stats": q_quality_stats,
    "lang_stats": q_lang_stats,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "embedding_topk": q_embedding_topk,
    "embedding_lsh_topk": q_embedding_lsh_topk,
    "embedding_ivf_topk": q_embedding_ivf_topk,
    "embedding_pq_topk": q_embedding_pq_topk,
    "embedding_knn": q_embedding_knn,
    "embedding_knn_sim": q_embedding_knn_sim,
    "embedding_knn_filtered": q_embedding_knn_filtered,
    "embedding_dedup": q_embedding_dedup,
    "search_topk": q_search_topk,
    "search_sharded": q_search_sharded,
    "search_ccs": q_search_ccs,
    "search_ccs_wild": q_search_ccs_wild,
    "search_analyzed": q_search_analyzed,
    "search_resharded": q_search_resharded,
    "rank_eval": q_rank_eval,
    "span_search": q_span_search,
    "intervals_search": q_intervals_search,
    "boxplot_nchars": q_boxplot_nchars,
    "percentile_ranks": q_percentile_ranks,
    "string_stats": q_string_stats,
    "t_test_values": q_t_test,
    "geo_centroid": q_geo_centroid,
    "multi_match": q_multi_match,
    "combined_fields": q_combined_fields,
    "phrase_suggest": q_phrase_suggest,
    "hybrid_rrf": q_hybrid_rrf,
    "hybrid_linear": q_hybrid_linear,
    "sort_search": q_sort_search,
    "top_metrics_agg": q_top_metrics,
    "cardinality_agg": q_cardinality_agg,
    "missing_global_agg": q_missing_global_agg,
    "search_synonyms": q_search_synonyms,
    "decay_score": q_decay_score,
    "random_score": q_random_score,
    "update_by_query": q_update_by_query,
    "sampler_agg": q_sampler_agg,
    "random_sampler": q_random_sampler,
    "transform_pivot": q_transform_pivot,
    "downsample": q_downsample,
    "eql_funnel": q_eql_funnel,
    "diversified_sampler": q_diversified_sampler,
    "scripted_metric": q_scripted_metric,
    "runtime_sort": q_runtime_sort,
    "date_range_agg": q_date_range_agg,
    "blocklist_stats": q_blocklist_stats,
    "rank_feature": q_rank_feature,
    "search_terms_set": q_search_terms_set,
    "search_pinned": q_search_pinned,
    "fulltext_count": q_fulltext_count,
    "search_page2": q_search_page2,
    "collapse_source": q_collapse_source,
    "more_like_this": q_more_like_this,
    "suggest_terms": q_suggest_terms,
    "suggest_completion": q_suggest_completion,
    "search_compound": q_search_compound,
    "match_bool_prefix": q_match_bool_prefix,
    "weighted_tokens": q_weighted_tokens,
    "term_vectors": q_term_vectors,
    "highlight": q_highlight,
    "delete_search": q_delete_search,
    "expunge_search": q_expunge_search,
    "search_boolean": q_search_boolean,
    "search_prefix": q_search_prefix,
    "search_fuzzy": q_search_fuzzy,
    "search_fuzzy_osa": q_search_fuzzy_osa,
    "search_wildcard": q_search_wildcard,
    "search_filtered": q_search_filtered,
    "search_range": q_search_range,
    "search_boolops": q_search_boolops,
    "search_msm": q_search_msm,
    "search_regexp": q_search_regexp,
    "search_sloppy": q_search_sloppy,
    "search_unordered": q_search_unordered,
    "search_phrase_prefix": q_search_phrase_prefix,
    "facet_lang": q_facet_lang,
    "approx_terms": q_approx_terms,
    "match_stats": q_match_stats,
    "histogram_nchars": q_histogram_nchars,
    "facet_metric": q_facet_metric,
    "significant_terms": q_significant_terms,
    "range_agg": q_range_agg,
    "top_hits": q_top_hits,
    "events_daily": q_events_daily,
    "change_point": q_change_point,
    "frequent_item_sets": q_frequent_item_sets,
    "events_daily_hll": q_events_daily_hll,
    "pipeline_daily": q_pipeline_daily,
    "composite_agg": q_composite_agg,
    "geohash_grid": q_geohash_grid,
    "search_explain": q_search_explain,
    "search_alias": q_search_alias,
    "matrix_stats": q_matrix_stats,
    "auto_date_histogram": q_auto_date_histogram,
    "rare_terms": q_rare_terms,
    "multi_terms": q_multi_terms,
    "mad_nchars": q_mad_nchars,
    "weighted_avg": q_weighted_avg,
    "percolate": q_percolate,
    "mixture_sample": q_mixture_sample,
    "filters_agg": q_filters_agg,
    "adjacency_matrix": q_adjacency_matrix,
    "search_rescore": q_search_rescore,
    "function_score": q_function_score,
    "distance_feature": q_distance_feature,
    "script_score": q_script_score,
    "state_enrich": q_state_enrich,
    "date_interval_slices": q_date_interval_slices,
    "keyspace_plan": q_keyspace_plan,
    "prefix_dfs": q_prefix_dfs,
    "props_extract": q_props_extract,
    "incremental_delta": q_incremental_delta,
    "bpe_token_count": q_bpe_token_count,
    "pii_stats": q_pii_stats,
    "contamination_stats": q_contamination_stats,
    "repetition_stats": q_repetition_stats,
    "dup_span_stats": q_dup_span_stats,
    "unigram_ppl": q_unigram_ppl,
    "gopher_filter": q_gopher_filter,
    "dsir": q_dsir,
    "terms_enum": q_terms_enum,
    "semdedup": q_semdedup,
    "collapse_inner": q_collapse_inner,
    "ingest_events": q_ingest_events,
    "video_frames": q_video_frames,
    "geo_distance_agg": q_geo_distance_agg,
    "geo_polygon_count": q_geo_polygon_count,
    "geo_line": q_geo_line,
    "pack_documents": q_pack_documents,
    "chunk_documents": q_chunk_documents,
    "esql_daily": q_esql_daily,
    "esql_revenue": q_esql_revenue,
    "esql_match": q_esql_match,
    "esql_match_idx": q_esql_match_idx,
    "esql_pctl": q_esql_pctl,
    "esql_strings": q_esql_strings,
    "esql_grok": q_esql_grok,
    "esql_mv": q_esql_mv,
    "esql_fork": q_esql_fork,
    "esql_stats2": q_esql_stats2,
    "esql_inline": q_esql_inline,
    "bpe_pairs": q_bpe_pairs,
    "tpch_q6": q_tpch_q6,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "split_assign": q_split_assign,
    "stratified_sample": q_stratified_sample,
    "media_decode": q_media_decode,
    "audio_decode": q_audio_decode,
}
