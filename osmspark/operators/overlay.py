"""Polygon-polygon intersection join (spatial overlay, B4c) — which
pairs of polygons from two dims overlap: admin x ZIP coverage, geofence
conflict checks, vectorized-raster features (tiles.vectorize_raster)
joined back against the admin dim.

Same two-phase shape as the PIP join, lifted one rank: phase 1 joins the
two sides' COVER CELLS (prepare_polygons — per-polygon covers computed in
a pandas UDF, superset of every cell the polygon touches, so any
intersecting pair shares at least one candidate cell); phase 2 verifies
each candidate pair exactly with the standard polygon-intersection
predicate:

    intersect(A, B)  :=  any vertex of B inside A
                      or any vertex of A inside B
                      or any edge of A properly crossing any edge of B

plus a strictly-INTERIOR sample point of each ring tested in the other
(vertex-in catches containment, edge-cross catches the plus-sign overlap
where neither polygon holds a vertex of the other, and the interior
points catch coincident / shared-all-vertices pairs — a duplicated
geofence — where every vertex is ON the boundary and every edge pair is
collinear, defeating both strict tests).  Semantics notes:
interior-overlap semantics — pairs that merely TOUCH along a boundary
with zero interior overlap are not guaranteed either way (the even-odd
boundary ambiguity the PIP join documents); antimeridian rings must be
pre-unwrapped (each comparison shifts its partner into the reference
ring's longitude frame).

Scale shape: covers are per-polygon pandas-UDF work (no driver collect
of either dim), the candidate join is a shuffle equi-join on the cell
key, and the verifier is one Arrow UDF whose per-row cost is
O(|A| * |B|) in the RING LENGTHS (dims have tens-to-hundreds of
vertices), embarrassingly parallel over candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .spatial_join import _pip_single_ring, prepare_polygons, split_ring


def _pieces(ring_lat, ring_lon):
    """split_ring with a fast path: an ordinary ring (lon span <= 180,
    poles untouched) is its own single piece — split_ring's
    unwrap/densify machinery costs ~0.4 ms per call even on a 5-vertex
    rectangle, which dominated the pair verifier (measured 53 s for a
    10k x 10k dim overlay; the fast path cuts the predicate ~20x)."""
    if (ring_lon.max() - ring_lon.min() <= 180.0
            and -90.0 < ring_lat.min() and ring_lat.max() < 90.0):
        return [(ring_lat, ring_lon)]
    return split_ring(ring_lat, ring_lon)


def _any_vertex_inside(vlat, vlon, ring_lat, ring_lon) -> bool:
    """Any of the query vertices strictly inside the (possibly split)
    ring — reuses the engine's crossing-number kernel."""
    acc = np.zeros(len(vlat), dtype=bool)
    for rl, rlo in _pieces(ring_lat, ring_lon):
        acc |= _pip_single_ring(vlat, vlon, rl, rlo)
    return bool(acc.any())


def _any_edge_cross(alat, alon, blat, blon) -> bool:
    """Any PROPER crossing between an edge of ring A and an edge of ring
    B (strict orientation signs on both sides) — vectorized over the
    full (edges_A x edges_B) grid."""
    ax1, ay1 = alon[:-1], alat[:-1]
    ax2, ay2 = alon[1:], alat[1:]
    bx1, by1 = blon[:-1], blat[:-1]
    bx2, by2 = blon[1:], blat[1:]

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    # (nA, 1) vs (1, nB) broadcasting
    d1 = orient(ax1[:, None], ay1[:, None], ax2[:, None], ay2[:, None],
                bx1[None, :], by1[None, :])
    d2 = orient(ax1[:, None], ay1[:, None], ax2[:, None], ay2[:, None],
                bx2[None, :], by2[None, :])
    d3 = orient(bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
                ax1[:, None], ay1[:, None])
    d4 = orient(bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
                ax2[:, None], ay2[:, None])
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def _interior_point(lats, lons):
    """A point STRICTLY inside the ring (even-odd): intersect the ring
    with a horizontal chord at a lat between min and max (nudged off any
    vertex latitude), take the midpoint of the first crossing interval.
    Needed because coincident/shared-boundary polygons defeat both
    strict vertex-in and proper edge-cross — identical rings have every
    vertex ON the boundary and every edge collinear."""
    la0, la1 = float(lats.min()), float(lats.max())
    if la1 <= la0:
        return None
    y = (la0 + la1) / 2.0
    for _ in range(8):
        if not np.any(np.isclose(lats, y, rtol=0.0, atol=1e-12)):
            break
        y += (la1 - la0) * 1e-7
    y1, y2 = lats[:-1], lats[1:]
    x1, x2 = lons[:-1], lons[1:]
    m = (y1 > y) != (y2 > y)
    if not np.any(m):
        return None
    xs = np.sort(x1[m] + (y - y1[m]) / (y2[m] - y1[m]) * (x2[m] - x1[m]))
    if len(xs) < 2:
        return None
    return y, float((xs[0] + xs[1]) / 2.0)


def _to_frame(ref_lons, lons):
    """Shift `lons` by a multiple of 360 into `ref_lons`'s frame — the
    edge-cross and interior-point legs compare raw coordinates, so an
    unwrapped antimeridian ring (e.g. 175..185) must meet its partner in
    ONE longitude frame (the PIP kernel does this internally; these legs
    need it done explicitly)."""
    if len(ref_lons) == 0 or len(lons) == 0:
        return lons
    shift = 360.0 * np.round((np.mean(ref_lons) - np.mean(lons)) / 360.0)
    return lons + shift


def polygons_intersect_np(alat, alon, blat, blon) -> bool:
    """The exact pairwise predicate (numpy arrays of ring vertices,
    closed rings)."""
    blon_f = _to_frame(alon, blon)
    if _any_vertex_inside(blat, blon, alat, alon):
        return True
    if _any_vertex_inside(alat, alon, blat, blon):
        return True
    if _any_edge_cross(alat, alon, blat, blon_f):
        return True
    # coincident / shared-boundary cases: strictly-interior sample points
    pa = _interior_point(alat, alon)
    if pa is not None and _any_vertex_inside(
            np.array([pa[0]]), np.array([pa[1]]), blat, blon):
        return True
    pb = _interior_point(blat, blon_f)
    if pb is not None and _any_vertex_inside(
            np.array([pb[0]]), np.array([pb[1]]), alat, alon):
        return True
    return False


def _pairwise_polygon_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res: int,
    predicate,
) -> DataFrame:
    """Shared scaffold of the overlay joins: cover-cell candidate
    equi-join of two polygon dims, one row per candidate (a, b) pair,
    filtered by the given numpy pair `predicate(alat, alon, blat,
    blon) -> bool` inside one Arrow UDF."""
    pa = prepare_polygons(polys_a, res).select(
        F.col("poly_id").alias("a_id"),
        F.col("ring_lat").alias("__alat"),
        F.col("ring_lon").alias("__alon"),
        "cell",
    )
    pb = prepare_polygons(polys_b, res).select(
        F.col("poly_id").alias("b_id"),
        F.col("ring_lat").alias("__blat"),
        F.col("ring_lon").alias("__blon"),
        "cell",
    )
    cand = (
        pa.join(pb, "cell")
        .dropDuplicates(["a_id", "b_id"])   # rings identical per id
    )

    @F.pandas_udf(T.BooleanType())
    def verify(alat: pd.Series, alon: pd.Series,
               blat: pd.Series, blon: pd.Series) -> pd.Series:
        out = np.zeros(len(alat), dtype=bool)
        for i in range(len(alat)):
            out[i] = predicate(
                np.asarray(alat.iloc[i], dtype=np.float64),
                np.asarray(alon.iloc[i], dtype=np.float64),
                np.asarray(blat.iloc[i], dtype=np.float64),
                np.asarray(blon.iloc[i], dtype=np.float64),
            )
        return pd.Series(out)

    return (
        cand.filter(verify(F.col("__alat"), F.col("__alon"),
                           F.col("__blat"), F.col("__blon")))
        .select("a_id", "b_id")
    )


def polygon_intersect_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res: int = 7,
) -> DataFrame:
    """(a_id, b_id) for every intersecting pair.  Both inputs use the
    engine polygon schema (poly_id, level, ring, postcode); neither side
    is collected to the driver."""
    return _pairwise_polygon_join(polys_a, polys_b, res,
                                  polygons_intersect_np)


def _all_vertices_inside(vlat, vlon, ring_lat, ring_lon) -> bool:
    acc = np.zeros(len(vlat), dtype=bool)
    for rl, rlo in _pieces(ring_lat, ring_lon):
        acc |= _pip_single_ring(vlat, vlon, rl, rlo)
    return bool(acc.all())


def polygon_contains_np(alat, alon, blat, blon) -> bool:
    """A fully contains B: every vertex of B strictly inside A and no
    proper edge crossing (a crossing would mean part of B escapes even
    with all vertices inside — a concave A).  Boundary-touching
    containment inherits the even-odd ambiguity (documented)."""
    blon_f = _to_frame(alon, blon)
    if not _all_vertices_inside(blat, blon, alat, alon):
        return False
    return not _any_edge_cross(alat, alon, blat, blon_f)


def polygon_contains_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    res: int = 7,
) -> DataFrame:
    """(a_id, b_id) for every pair where polygon A fully CONTAINS polygon
    B — 'which ZIP sits inside which admin area'.  Same cover-cell
    candidate join as polygon_intersect_join; the verifier swaps in the
    containment predicate."""
    return _pairwise_polygon_join(polys_a, polys_b, res,
                                  polygon_contains_np)
