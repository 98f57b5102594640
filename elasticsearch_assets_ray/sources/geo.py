"""Geo predicates and distance ranking — the native analog of the
reference's geo query surface (Q5: geo bounding box / geo distance +
``_geo_distance`` sort, reference utils.ts:102-107, geoSearch
utils.ts:167-250, validateGeoParameters utils.ts:112-165).

The reference delegates geo evaluation to Elasticsearch; here:

- :func:`geo_box_filter` — a pushdown ``pyarrow.compute`` expression
  (lat/lon stored as plain float columns), so the bounding box prunes at
  the Parquet scan like any range predicate;
- :func:`haversine_km` — vectorized great-circle distance (float64);
- :func:`geo_distance_topk` — the ``_geo_distance`` sort as a
  streaming top-k: per-batch distance + local prune, tiny global merge
  (never a full sort).

Box semantics follow the reference's top_left/bottom_right convention:
lat ∈ [bottom, top], lon ∈ [left, right] (no antimeridian wrap — same
caveat as the reference's validated box).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

EARTH_RADIUS_KM = 6371.0088


def geo_box_filter(
    lat_col: str, lon_col: str, *, top: float, left: float, bottom: float, right: float
):
    """Bounding-box pushdown expression (reference geoBoundingBox clause)."""
    if not (-90 <= bottom <= top <= 90):
        raise ValueError("latitude box invalid (need -90 <= bottom <= top <= 90)")
    if not (-180 <= left <= right <= 180):
        raise ValueError("longitude box invalid (need -180 <= left <= right <= 180)")
    return (
        (pc.field(lat_col) >= bottom)
        & (pc.field(lat_col) <= top)
        & (pc.field(lon_col) >= left)
        & (pc.field(lon_col) <= right)
    )


def point_in_polygon(
    lat: np.ndarray, lon: np.ndarray, polygon: list[tuple[float, float]]
) -> np.ndarray:
    """ES ``geo_polygon`` query membership test: crossing-number
    (ray-casting, even-odd rule — what Lucene's polygon tessellation
    implements for simple polygons).  ``polygon`` is a list of
    (lat, lon) vertices, implicitly closed, and must contain NO
    horizontal edge (equal adjacent latitudes would divide by zero —
    split such an edge).  Boundary behavior is pinned to this exact
    float64 expression; the SQL oracle computes the identical formula
    term-for-term, so even points numerically ON an edge classify the
    same way in both engines."""
    n = len(polygon)
    if n < 3:
        raise ValueError("polygon needs at least 3 vertices")
    for i in range(n):
        if polygon[i][0] == polygon[(i + 1) % n][0]:
            raise ValueError("horizontal polygon edges are not supported")
    inside = np.zeros(lat.shape, dtype=bool)
    for i in range(n):
        yi, xi = polygon[i]
        yj, xj = polygon[(i + 1) % n]
        cond = (yi > lat) != (yj > lat)
        xint = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= cond & (lon < xint)
    return inside


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Great-circle distance (km), float64 vectorized.  The formula is
    written identically in the SQL oracle: 2R·asin(√(sin²(Δφ/2) +
    cosφ₁·cosφ₂·sin²(Δλ/2)))."""
    p1 = np.radians(lat1.astype(np.float64))
    p2 = np.radians(float(lat2))
    dphi = np.radians(lat2 - lat1.astype(np.float64))
    dlam = np.radians(lon2 - lon1.astype(np.float64))
    a = np.sin(dphi / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2.0) ** 2
    return EARTH_RADIUS_KM * 2.0 * np.arcsin(np.sqrt(a))


def geo_distance_topk(
    ds: ray.data.Dataset,
    lat_col: str,
    lon_col: str,
    *,
    point: tuple[float, float],
    k: int,
    id_col: str,
) -> pa.Table:
    """``_geo_distance`` ascending sort, streamed: each batch computes
    distances and keeps its local k nearest; the driver merges ≤ k per
    block.  Returns (id, distance_km) ties broken by id."""
    lat0, lon0 = point

    def local(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        d = haversine_km(lat, lon, lat0, lon0)
        t = pa.table(
            {
                id_col: batch[id_col],
                "distance_km": pa.array(d),
            }
        )
        idx = pc.sort_indices(
            t, sort_keys=[("distance_km", "ascending"), (id_col, "ascending")]
        )[:k]
        return t.take(idx)

    pruned = ds.map_batches(local, batch_format="pyarrow")
    parts = list(pruned.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts) if parts else pa.table(
        {id_col: pa.array([], pa.int64()), "distance_km": pa.array([], pa.float64())}
    )
    idx = pc.sort_indices(
        t, sort_keys=[("distance_km", "ascending"), (id_col, "ascending")]
    )[:k]
    return t.take(idx)


# ---------------------------------------------------------------------------
# geohash grid aggregation (ES geohash_grid)
# ---------------------------------------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(
    lat: np.ndarray, lon: np.ndarray, precision: int = 5
) -> np.ndarray:
    """Vectorized geohash (the classic base-32 Z-order code).  Geohash is
    PURE integer subdivision — quantize lat/lon on an equirectangular
    grid, bit-interleave starting with a longitude bit, emit 5-bit
    base-32 chars.  No transcendentals anywhere, so a SQL twin computes
    the identical cell (the reason this grid — and not Mercator
    geotile_grid, whose y needs ln/tan — is the oracle-checked one;
    geotile differs only in the quantizer)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    nbits = precision * 5
    nlon = (nbits + 1) // 2  # first (most significant) bit is longitude
    nlat = nbits // 2
    latq = np.floor((lat.astype(np.float64) + 90.0) / 180.0 * (1 << nlat)).astype(
        np.int64
    )
    lonq = np.floor((lon.astype(np.float64) + 180.0) / 360.0 * (1 << nlon)).astype(
        np.int64
    )
    np.clip(latq, 0, (1 << nlat) - 1, out=latq)  # lat=+90 / lon=+180 edge
    np.clip(lonq, 0, (1 << nlon) - 1, out=lonq)
    g = np.zeros(latq.shape, dtype=np.int64)
    bl, bt = nlon - 1, nlat - 1
    for k in range(nbits):
        g <<= 1
        if k % 2 == 0:
            g |= (lonq >> bl) & 1
            bl -= 1
        else:
            g |= (latq >> bt) & 1
            bt -= 1
    chars = np.array(list(GEOHASH32))
    out = chars[(g >> (5 * (precision - 1))) & 31]
    for c in range(1, precision):
        out = np.char.add(out, chars[(g >> (5 * (precision - 1 - c))) & 31])
    return out


def geohash_grid(
    ds: ray.data.Dataset, lat_col: str, lon_col: str, precision: int = 5
) -> pa.Table:
    """ES ``geohash_grid`` aggregation over a Dataset: per-batch encode +
    combiner-first count partials (the shuffle moves ≤ 32^precision cell
    partials per batch, never points), merged exactly; buckets ordered
    count-desc then cell-asc (the ES grid bucket order)."""
    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg

    def enc(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        return pa.table({"geohash": pa.array(geohash_encode(lat, lon, precision))})

    cells = ds.map_batches(enc, batch_format="pyarrow")
    agg = partial_agg(cells, ["geohash"], [AggSpec("count", "geohash", "count")])
    parts = list(agg.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts) if parts else pa.table(
        {"geohash": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
    )
    return pa.table(
        {
            "geohash": t["geohash"].combine_chunks(),
            "count": t["count"].combine_chunks().cast(pa.int64()),
        }
    ).sort_by([("count", "descending"), ("geohash", "ascending")])


def geohash_grid_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """The SQL twin of :func:`geohash_encode` as a scalar expression over
    ``lat_expr``/``lon_expr`` — identical quantize + interleave + base-32
    arithmetic, generated for the given precision."""
    nbits = precision * 5
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    latq = f"CAST(floor((({lat_expr}) + 90.0) / 180.0 * {1 << nlat}) AS BIGINT)"
    lonq = f"CAST(floor((({lon_expr}) + 180.0) / 360.0 * {1 << nlon}) AS BIGINT)"
    # interleaved integer: walk output bits MSB→LSB, alternating lon/lat
    terms = []
    bl, bt = nlon - 1, nlat - 1
    for k in range(nbits):
        pos = nbits - 1 - k
        if k % 2 == 0:
            terms.append(f"(((lonq >> {bl}) & 1) << {pos})")
            bl -= 1
        else:
            terms.append(f"(((latq >> {bt}) & 1) << {pos})")
            bt -= 1
    g = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH32}', CAST(((g >> {5 * (precision - 1 - c)}) & 31) AS INTEGER) + 1, 1)"
        for c in range(precision)
    )
    return (
        f"(SELECT {chars} FROM (SELECT {g} AS g FROM (SELECT "
        f"LEAST(GREATEST({latq}, 0), {(1 << nlat) - 1}) AS latq, "
        f"LEAST(GREATEST({lonq}, 0), {(1 << nlon) - 1}) AS lonq)))"
    )


def geo_distance_agg(
    ds: ray.data.Dataset,
    lat_col: str,
    lon_col: str,
    *,
    point: tuple[float, float],
    ranges: list[tuple[float | None, float | None]],
) -> pa.Table:
    """ES ``geo_distance`` aggregation: document counts per distance
    range from an origin (half-open [from, to); ranges may overlap —
    each is counted independently, the ES contract; ``None`` = open
    end).  Keys use the ES ``from-to`` convention with ``*`` for open
    ends.  Per-batch partial counts (one small vector per batch) sum on
    the driver — no shuffle, corpus streams.

    Bucket membership compares ``round(km, 6)`` on BOTH engine and SQL
    sides (the repo-wide float contract: libm trig may differ by ulps
    between numpy and DuckDB)."""
    lat0, lon0 = point

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        km = np.round(haversine_km(lat, lon, lat0, lon0), 6)
        counts = []
        for lo, hi in ranges:
            m = np.ones(km.size, dtype=bool)
            if lo is not None:
                m &= km >= lo
            if hi is not None:
                m &= km < hi
            counts.append(int(m.sum()))
        return pa.table(
            {
                "ridx": pa.array(range(len(ranges)), pa.int64()),
                "count": pa.array(counts, pa.int64()),
            }
        )

    totals = np.zeros(len(ranges), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # a delivered batch may CONCATENATE several per-block partials →
        # repeated ridx values; fancy-index += would drop duplicates
        np.add.at(
            totals,
            b["ridx"].to_numpy(zero_copy_only=False),
            b["count"].to_numpy(zero_copy_only=False),
        )

    def key(lo, hi):
        a = "*" if lo is None else f"{lo:.1f}"
        b = "*" if hi is None else f"{hi:.1f}"
        return f"{a}-{b}"

    return pa.table(
        {
            "value": pa.array([key(lo, hi) for lo, hi in ranges], pa.string()),
            "count": pa.array(totals),
        }
    )


def geo_centroid_bounds(ds: ray.data.Dataset, lat_col: str, lon_col: str) -> dict:
    """ES ``geo_centroid`` + ``geo_bounds`` aggregations in ONE pass:
    per-batch partials (n, Σlat, Σlon, min/max lat/lon) — seven numbers
    per batch, merged on the driver.  Centroid is the arithmetic mean of
    the coordinates (ES computes it on encoded geopoints, quantized to
    ~1e-7°; this repo pins the exact float mean — documented
    divergence); bounds is the tight lat/lon envelope.  No shuffle, the
    corpus streams."""

    def part(b: pa.Table) -> pa.Table:
        la = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([la.size], pa.int64()),
                "lat_sum": pa.array([float(la.sum())], pa.float64()),
                "lon_sum": pa.array([float(lo.sum())], pa.float64()),
                "lat_min": pa.array([float(la.min()) if la.size else None], pa.float64()),
                "lat_max": pa.array([float(la.max()) if la.size else None], pa.float64()),
                "lon_min": pa.array([float(lo.min()) if lo.size else None], pa.float64()),
                "lon_max": pa.array([float(lo.max()) if lo.size else None], pa.float64()),
            }
        )

    t = pa.concat_tables(
        list(ds.map_batches(part, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    n = int(pc.sum(t["n"]).as_py() or 0)
    if n == 0:
        return {}
    return {
        "centroid_lat": float(pc.sum(t["lat_sum"]).as_py()) / n,
        "centroid_lon": float(pc.sum(t["lon_sum"]).as_py()) / n,
        "top": float(pc.max(t["lat_max"]).as_py()),
        "bottom": float(pc.min(t["lat_min"]).as_py()),
        "left": float(pc.min(t["lon_min"]).as_py()),
        "right": float(pc.max(t["lon_max"]).as_py()),
        "count": n,
    }


def geotile_encode(
    lat: np.ndarray, lon: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator ``z/x/y`` tile coordinates (the ES geotile_grid
    quantizer), vectorized.  NOT oracle-gated: the y quantizer runs
    ``ln∘tan`` through ``floor``, so a 1-ulp library difference can flip
    a boundary point's tile — geohash_grid (integer bit-interleave, no
    transcendentals) is the hash-checked grid; geotile is pytest-pinned
    against this reference implementation (same rationale as
    q_geohash_grid's docstring)."""
    nt = float(1 << zoom)
    x = np.floor((lon + 180.0) / 360.0 * nt)
    latr = np.radians(np.clip(lat, -85.05112878, 85.05112878))
    y = np.floor((1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) / np.pi) / 2.0 * nt)
    x = np.clip(x, 0, nt - 1).astype(np.int64)
    y = np.clip(y, 0, nt - 1).astype(np.int64)
    return x, y


def geotile_grid(
    ds: ray.data.Dataset, lat_col: str, lon_col: str, zoom: int
) -> pa.Table:
    """ES ``geotile_grid`` aggregation: per-batch vectorized tile encode
    + count partials, exact integer merge via ``partial_agg`` — the same
    combiner-first shape as geohash_grid.  Output (tile, count) with the
    ES key format ``z/x/y``, count-desc / tile-asc."""
    from elasticsearch_assets_ray.stages.relational import AggSpec, partial_agg

    def part(b: pa.Table) -> pa.Table:
        la = b[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = b[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x, y = geotile_encode(la, lo, zoom)
        key = x << 32 | y
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tkey": pa.array(uk, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    merged = pa.concat_tables(
        list(
            partial_agg(
                ds.map_batches(part, batch_format="pyarrow"),
                ["tkey"],
                [AggSpec("count", "n", "sum")],
            ).iter_batches(batch_format="pyarrow")
        )
    )
    k = merged["tkey"].to_numpy(zero_copy_only=False)
    cnt = merged["count"].to_numpy(zero_copy_only=False)
    tiles = [f"{zoom}/{int(kk) >> 32}/{int(kk) & 0xFFFFFFFF}" for kk in k]
    t = pa.table(
        {"tile": pa.array(tiles, pa.string()), "count": pa.array(cnt, pa.int64())}
    )
    return t.sort_by([("count", "descending"), ("tile", "ascending")])


def geo_line(
    ds: ray.data.Dataset,
    group_col: str,
    lat10_col: str,
    lon10_col: str,
    sort_cols: list[str],
    size: int = 100,
) -> pa.Table:
    """ES ``geo_line`` aggregation analog: per group, the track joining
    the first ``size`` points in ``sort_cols`` order (ES sorts by a
    numeric field and truncates at ``size``, 10000 max).  Coordinates
    come in as INTEGER deci-degrees (lat·10 / lon·10) so the track
    string is exact on both sides of the oracle — float→string
    formatting is never portable across engines.

    Shape: ``groupby(group).map_groups`` — each group's points sort and
    join inside its task, the wire carries one (group, track) row per
    group.  Groups are assumed bounded (an unbounded-group geo_line is
    unbounded output by definition)."""
    import pyarrow.compute as _pc

    def track(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return pa.table(
                {
                    "value": pa.array([], pa.string()),
                    "count": pa.array([], pa.int64()),
                }
            )
        s = g.sort_by([(c, "ascending") for c in sort_cols]).slice(0, size)
        pts = _pc.binary_join_element_wise(
            _pc.cast(s[lat10_col], pa.string()),
            _pc.cast(s[lon10_col], pa.string()),
            ":",
        )
        if isinstance(pts, pa.ChunkedArray):
            pts = pts.combine_chunks()
        joined = pa.compute.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(pts)], pa.int32()), pts
            ),
            ";",
        )
        return pa.table(
            {
                "value": pa.array(
                    [f"{g[group_col][0].as_py()}#{joined[0].as_py()}"],
                    pa.string(),
                ),
                "count": pa.array([s.num_rows], pa.int64()),
            }
        )

    parts = [
        t
        for t in ds.groupby(group_col)
        .map_groups(track, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_columns
    ]
    out = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"value": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    )
    return out.sort_by([("value", "ascending")])
