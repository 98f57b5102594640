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
