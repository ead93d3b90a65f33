"""B4 — two-phase point-in-polygon spatial join (SURVEY §2.2).

Phase 1 (prefilter): polygons are pre-exploded to their covering hex cells
at a coarse res; points get the same cell id; the candidate set is a plain
*equi-join on cell* — broadcast when the polygon side is small (admin/ZIP
dims always are), shuffle-hash otherwise.  Catalyst sees an ordinary join;
no custom strategy needed (SURVEY §4.2).

Phase 2 (refine): exact ray-casting (crossing-number) point-in-ring test,
numpy-vectorized over Arrow batches — all edges of a batch are flattened
into one array pass, crossings aggregated per row with bincount.  No
per-row Python.

Scale notes: the cover res trades candidate-set size vs join fan-out; skew
from hot cities is handled by AQE skew-join plus optional explicit salting
(operators.salt).  Cover enumeration is conservative (axial bbox of the
ring's xy bbox + margin) — false positives are removed by phase 2, false
negatives cannot occur for single-face polygons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import hexgrid
from ..functions.geo import latlon_to_xyz
from ..functions.s2 import xyz_to_face_uv

DEFAULT_COVER_RES = 7


def _ring_cover_cells(lats: np.ndarray, lons: np.ndarray, res: int) -> np.ndarray:
    """Cover cells for one ring: axial bbox of the xy-bbox corners + margin."""
    x, y, z = latlon_to_xyz(lats, lons)
    face, u, v = xyz_to_face_uv(x, y, z)
    if len(np.unique(face)) != 1:
        raise ValueError("polygon spans multiple cube faces (v1 limitation)")
    f = int(face[0])
    # xy bbox corners -> axial coords -> integer bbox with margin
    corners_u = np.array([u.min(), u.min(), u.max(), u.max()])
    corners_v = np.array([v.min(), v.max(), v.min(), v.max()])
    qf, rf = hexgrid._xy_to_axial(corners_u, corners_v, res)
    q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    qq, rr = np.meshgrid(np.arange(q0, q1 + 1), np.arange(r0, r1 + 1))
    qq, rr = qq.ravel(), rr.ravel()
    return hexgrid.pack(np.full_like(qq, res), np.full_like(qq, f), qq, rr)


def cover_cells_udf(res: int):
    """pandas UDF: ring array<struct<lat,lon>> -> array<long> cover cells."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover(rings: pd.Series) -> pd.Series:
        out = []
        for ring in rings:
            lats = np.array([p["lat"] for p in ring], dtype=np.float64)
            lons = np.array([p["lon"] for p in ring], dtype=np.float64)
            out.append(_ring_cover_cells(lats, lons, res))
        return pd.Series(out)

    return cover


def points_in_rings_np(py, px, ring_lats, ring_lons):
    """Vectorized crossing-number test for a batch of (point, ring) pairs.

    py/px: float arrays (n,); ring_lats/ring_lons: lists of per-row arrays.
    Returns bool array (n,). One flat pass over all edges of the batch.
    """
    n = len(py)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(r) for r in ring_lats), dtype=np.int64, count=n)
    edge_counts = lens - 1  # rings are closed (last == first)
    row_idx = np.repeat(np.arange(n), edge_counts)
    flat_lat = np.concatenate([np.asarray(r, dtype=np.float64) for r in ring_lats])
    flat_lon = np.concatenate([np.asarray(r, dtype=np.float64) for r in ring_lons])
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    # edge endpoint indices within the flat arrays
    first = np.repeat(starts, edge_counts) + _ranges(edge_counts)
    y1, y2 = flat_lat[first], flat_lat[first + 1]
    x1, x2 = flat_lon[first], flat_lon[first + 1]
    pyr, pxr = py[row_idx], px[row_idx]
    straddle = (y1 > pyr) != (y2 > pyr)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (pyr - y1) * (x2 - x1) / (y2 - y1)
    cross = straddle & (pxr < xint)
    counts = np.bincount(row_idx[cross], minlength=n)
    return (counts % 2) == 1


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)


_pip_udf_schema = T.BooleanType()


@F.pandas_udf(_pip_udf_schema)
def _pip_udf(
    lat: pd.Series, lon: pd.Series, ring_lat: pd.Series, ring_lon: pd.Series
) -> pd.Series:
    inside = points_in_rings_np(
        lat.to_numpy(), lon.to_numpy(), list(ring_lat), list(ring_lon)
    )
    return pd.Series(inside)


def prepare_polygons(polys: DataFrame, res: int = DEFAULT_COVER_RES) -> DataFrame:
    """polygons -> one row per (cover cell, polygon) with flat ring arrays.

    Flat ring_lat/ring_lon arrays (instead of array<struct>) keep the Arrow
    transfer into the refine UDF zero-copy-friendly."""
    return polys.select(
        "poly_id",
        "level",
        "postcode",
        F.transform("ring", lambda p: p["lat"]).alias("ring_lat"),
        F.transform("ring", lambda p: p["lon"]).alias("ring_lon"),
        F.explode(cover_cells_udf(res)(F.col("ring"))).alias("cell"),
    )


def spatial_join(
    points: DataFrame,
    polys: DataFrame,
    res: int = DEFAULT_COVER_RES,
    broadcast_polys: bool = True,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """points x polygons -> rows of points with their containing polygon.

    Returns the point columns + (poly_id, level, postcode). A point on a
    shared boundary resolves by crossing-number convention; a point in no
    polygon is dropped (inner-join semantics, like the reference assigning
    a document to its district)."""
    poly_cells = prepare_polygons(polys, res)
    if broadcast_polys:
        poly_cells = F.broadcast(poly_cells)
    pts = hexgrid.with_hex_cell(points, res, lat=lat, lon=lon, out_col="__cell")
    cand = pts.join(poly_cells, pts["__cell"] == poly_cells["cell"], "inner")
    refined = cand.filter(
        _pip_udf(F.col(lat), F.col(lon), F.col("ring_lat"), F.col("ring_lon"))
    )
    return refined.drop("__cell", "cell", "ring_lat", "ring_lon")
