"""B4 — two-phase point-in-polygon spatial join (SURVEY §2.2).

Phase 1 (prefilter): polygons are pre-exploded to their covering hex cells;
points get the same cell id; the candidate set is a plain *equi-join on
cell* — broadcast (admin/ZIP dims are small by contract).  Catalyst sees an
ordinary join; no custom strategy needed (SURVEY §4.2).

Phase 2 (refine): exact ray-casting (crossing-number) point-in-ring test,
numpy-vectorized over Arrow batches.  Ring geometry reaches executors ONCE
via a Spark broadcast variable keyed by poly_id — candidate rows carry only
(lat, lon, poly_id), so Arrow transfer stays O(candidates), not
O(candidates * ring_size).

Cover computation runs driver-side in numpy: the polygon side is a
broadcastable dimension by contract (if it weren't, covers would move into
a pandas UDF — same math).  The cover is near-minimal: bbox cells filtered
to centers inside the ring or within ~1.1 circumradius of an edge — a
guaranteed superset of cells that can contain an interior point, so phase 2
sees no false negatives and few false positives.

Scale notes: the cover res trades candidate fan-out vs join width (default
res 8 ~ 1 km cells); hot-city skew on the cell key is handled by AQE
skew-join plus optional explicit salting (operators.salt).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import hexgrid
from ..functions.geo import latlon_to_xyz
from ..functions.s2 import face_uv_to_xyz, xyz_to_face_uv

DEFAULT_COVER_RES = 8
# interior samples per ring edge when collecting touched cube faces (a
# vertex-and-midpoint-only scheme can miss a third face a long edge clips
# away from its midpoint — round-2 ADVICE medium)
_EDGE_FACE_SAMPLES = 7


def unwrap_ring_lons(lons: np.ndarray) -> np.ndarray:
    """Longitude unwrap for a closed ring: each vertex shifted by +-360 so
    consecutive deltas stay within (-180, 180] — an antimeridian-crossing
    ring becomes a continuous frame (e.g. 175 -> 185 instead of 175 -> -175)
    that the latlon crossing-number test handles correctly.  A ring whose
    unwrap does NOT return to its start encircles a pole (net winding);
    those raise — a polar cap has no consistent latlon-straight-edge
    interior and must be expressed as a lat-threshold filter instead."""
    d = np.diff(lons)
    shift = np.cumsum(
        np.where(d > 180.0, -360.0, np.where(d < -180.0, 360.0, 0.0))
    )
    out = lons.astype(np.float64).copy()
    out[1:] += shift
    if abs(out[-1] - out[0]) > 1e-9:
        raise ValueError(
            "ring winds around a pole (unwrapped longitudes do not close); "
            "express polar caps as a latitude filter"
        )
    return out


# --- geometry helpers (numpy, driver-side for the dim, reusable anywhere) --
def _point_segment_dist2(px, py, x1, y1, x2, y2):
    """Squared distance from points (px,py) to segments; all (n,m) arrays."""
    dx, dy = x2 - x1, y2 - y1
    seg2 = dx * dx + dy * dy
    tnum = (px - x1) * dx + (py - y1) * dy
    t = np.clip(np.divide(tnum, seg2, out=np.zeros_like(tnum),
                          where=seg2 > 0), 0.0, 1.0)
    cx = x1 + t * dx
    cy = y1 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


# unit axis of each cube face (S2 face layout; s2.face_uv_to_xyz)
_FACE_AXES = np.array([
    [1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1],
], dtype=np.float64)


def _xyz_to_uv_on_face(f: int, x, y, z):
    """Gnomonic (u, v) of points onto the plane of a GIVEN face `f` —
    the per-face inverse of s2.face_uv_to_xyz.  Valid for points in the
    open hemisphere of the face axis (denominator sign checked by caller).
    Unlike xyz_to_face_uv, |u|/|v| may exceed 1 (point lives off-face)."""
    if f == 0:
        return y / x, z / x
    if f == 1:
        return -x / y, z / y
    if f == 2:
        return -x / z, -y / z
    if f == 3:
        return z / x, y / x
    if f == 4:
        return z / y, -x / y
    return -y / z, -x / z


def _cover_on_face(f: int, u, v, res: int):
    """Cover cells of ONE face for a ring projected to that face's uv plane:
    bbox cells whose center is inside the ring or within 1.1*circumradius of
    an edge, clipped to the face square (plus one cell of slack — only cells
    some point can actually map to are useful join keys).

    Returns (cells, interior): interior marks cells whose center is inside
    the ring AND clear of every edge by (2*circumradius + L_max^2/2), where
    L_max is the longest adjacent edge in uv units — every point of such a
    cell is inside the polygon.  One circumradius covers the hex
    center-to-point distance; the rest bounds the discrepancy between
    uv-straight cover edges (gnomonic = exact great circles) and
    latlon-straight refine edges, which grows with the SQUARE of edge
    length (chord-sagitta; a fixed circumradius count does not bound it for
    multi-hundred-km edges — round-2 ADVICE).  Interior-cell candidates
    skip the ray-cast refine entirely."""
    radius = hexgrid._res_frame(res)[0]
    pad = 2.0 * radius
    seg2 = (u[1:] - u[:-1]) ** 2 + (v[1:] - v[:-1]) ** 2
    interior_margin = 2.0 * radius + (0.5 * float(seg2.max()) if len(seg2) else 0.0)
    empty = np.zeros(0, dtype=np.int64)
    lo_u, hi_u = max(u.min(), -1.0 - pad), min(u.max(), 1.0 + pad)
    lo_v, hi_v = max(v.min(), -1.0 - pad), min(v.max(), 1.0 + pad)
    if lo_u > hi_u or lo_v > hi_v:
        return empty, np.zeros(0, dtype=bool)  # ring part misses this face
    corners_u = np.array([lo_u, lo_u, hi_u, hi_u])
    corners_v = np.array([lo_v, hi_v, lo_v, hi_v])
    qf, rf = hexgrid._xy_to_axial(corners_u, corners_v, res)
    q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    qq, rr = np.meshgrid(np.arange(q0, q1 + 1), np.arange(r0, r1 + 1))
    qq, rr = qq.ravel(), rr.ravel()
    cx, cy = hexgrid._axial_to_xy(qq.astype(np.float64), rr.astype(np.float64), res)
    # center-in-ring (in uv plane) ...
    inside = points_in_rings_np(
        cy, cx, [v] * len(cx), [u] * len(cx)
    )  # note: "lat" axis := v, "lon" axis := u (any consistent pair works)
    # ... or center near an edge
    d2 = _point_segment_dist2(
        cx[:, None], cy[:, None],
        u[None, :-1], v[None, :-1], u[None, 1:], v[None, 1:],
    ).min(axis=1)
    on_face = (np.abs(cx) <= 1.0 + pad) & (np.abs(cy) <= 1.0 + pad)
    keep = (inside | (d2 <= (1.1 * radius) ** 2)) & on_face
    interior = (inside & (d2 > interior_margin ** 2))[keep]
    qq, rr = qq[keep], rr[keep]
    cells = hexgrid.pack(np.full_like(qq, res), np.full_like(qq, f), qq, rr)
    return cells, interior


def _ring_cover_cells(lats: np.ndarray, lons: np.ndarray, res: int) -> np.ndarray:
    """Cover cells only (compatibility wrapper over the flagged variant)."""
    return _ring_cover_cells_flagged(lats, lons, res)[0]


@functools.lru_cache(maxsize=None)
def _face_neighbors(f: int, side: str) -> tuple[int, ...]:
    """Cube faces adjacent to face `f` across one boundary of its uv square
    ('u+','u-','v+','v-'), derived numerically: probe points just beyond
    the boundary and ask xyz_to_face_uv who owns them."""
    out = set()
    for w in (-0.9, 0.0, 0.9):
        if side == "u+":
            u, v = 1.2, w
        elif side == "u-":
            u, v = -1.2, w
        elif side == "v+":
            u, v = w, 1.2
        else:
            u, v = w, -1.2
        x, y, z = face_uv_to_xyz(np.array([f]), np.array([u]), np.array([v]))
        nf, _, _ = xyz_to_face_uv(x, y, z)
        out.add(int(nf[0]))
    out.discard(f)
    return tuple(sorted(out))


def _ring_cover_cells_flagged(lats: np.ndarray, lons: np.ndarray, res: int):
    """Near-minimal cover: bbox cells whose center is inside the ring or
    within 1.1*circumradius of an edge (superset guarantee: any point of the
    polygon lies in a cell whose center is <= circumradius away).
    Returns (cells, interior_flags) — see _cover_on_face.

    Antimeridian-crossing rings are handled by longitude unwrap (round-2
    VERDICT item 5; v2 raised ValueError): the cover works on xyz, which is
    lon-mod-360 invariant, and the refine receives the unwrapped ring plus
    a matching point-lon normalization (see _pip_single_ring).  Rings still
    wider than 180 deg after unwrap are rejected (hemisphere-scale).

    Multi-face: the ring is re-projected onto every cube face touched by a
    vertex or an edge sample (7 interior samples per edge — a midpoint-only
    scheme can miss a third face the edge clips off-center; round-2 ADVICE
    medium), then a FIXPOINT sweep adds any neighbor face whose boundary
    the padded per-face uv bbox spills across — the analytic backstop for
    corner grazes narrower than the sampling.  Polygons wider than a
    hemisphere (any vertex behind a definitely-touched face's plane) are
    rejected — an admin/ZIP dim never is; spill-discovered faces whose
    plane some vertex sits behind are skipped instead (a polygon actually
    covering such a face would be hemisphere-scale)."""
    lons = unwrap_ring_lons(np.asarray(lons, dtype=np.float64))
    if lons.max() - lons.min() > 180.0:
        raise ValueError(
            "ring spans >180 deg of longitude after unwrap "
            "(hemisphere-scale polygons must be split before joining)"
        )
    x, y, z = latlon_to_xyz(lats, lons)
    face, _, _ = xyz_to_face_uv(x, y, z)
    # faces touched by vertices + by interior samples of every edge
    ts = np.linspace(0.0, 1.0, _EDGE_FACE_SAMPLES + 2)[1:-1]
    sx = (x[:-1, None] * (1 - ts) + x[1:, None] * ts).ravel()
    sy = (y[:-1, None] * (1 - ts) + y[1:, None] * ts).ravel()
    sz = (z[:-1, None] * (1 - ts) + z[1:, None] * ts).ravel()
    snorm = np.sqrt(sx * sx + sy * sy + sz * sz)
    sface, _, _ = xyz_to_face_uv(sx / snorm, sy / snorm, sz / snorm)
    definite = set(np.unique(np.concatenate([face, sface])).tolist())

    pad = 2.0 * hexgrid._res_frame(res)[0]
    covers = []
    seen: set[int] = set()
    queue = sorted(definite)
    while queue:
        f = int(queue.pop())
        if f in seen:
            continue
        seen.add(f)
        ax = _FACE_AXES[f]
        dots = x * ax[0] + y * ax[1] + z * ax[2]
        if np.any(dots <= 0.05):
            if f in definite:
                raise ValueError(
                    "polygon spans opposing hemispheres; split it before "
                    "joining"
                )
            continue  # spill-probe face the polygon cannot meaningfully reach
        uf, vf = _xyz_to_uv_on_face(f, x, y, z)
        covers.append(_cover_on_face(f, uf, vf, res))
        # bbox-spill fixpoint: coverage continues past a face boundary ->
        # the neighbor face owns its share of the cover
        for side, crossed in (
            ("u+", uf.max() > 1.0 - pad), ("u-", uf.min() < -1.0 + pad),
            ("v+", vf.max() > 1.0 - pad), ("v-", vf.min() < -1.0 + pad),
        ):
            if crossed:
                queue.extend(n for n in _face_neighbors(f, side)
                             if n not in seen)
    cells = np.concatenate([c for c, _ in covers])
    interior = np.concatenate([i for _, i in covers])
    # dedupe across faces (a cell id is face-scoped, so dupes only arise
    # from overlapping bbox slack) — keep the AND of interior flags
    order = np.argsort(cells, kind="stable")
    cells, interior = cells[order], interior[order]
    uniq_mask = np.ones(len(cells), dtype=bool)
    uniq_mask[1:] = cells[1:] != cells[:-1]
    # a duplicated cell is interior only if every copy says so
    grp = np.cumsum(uniq_mask) - 1
    interior_and = np.ones(int(grp[-1]) + 1 if len(grp) else 0, dtype=bool)
    np.logical_and.at(interior_and, grp, interior)
    return cells[uniq_mask], interior_and


def polygon_covers(polys_rows: list, res: int) -> list[tuple]:
    """[(poly_id, cell, interior), ...] computed driver-side from collected
    rows; interior cells need no ray-cast refine."""
    out = []
    for r in polys_rows:
        lats = np.array([p["lat"] for p in r["ring"]], dtype=np.float64)
        lons = np.array([p["lon"] for p in r["ring"]], dtype=np.float64)
        cells, interior = _ring_cover_cells_flagged(lats, lons, res)
        for c, i in zip(cells, interior):
            out.append((r["poly_id"], int(c), bool(i)))
    return out


def points_in_rings_np(py, px, ring_lats, ring_lons):
    """Vectorized crossing-number test for a batch of (point, ring) pairs.

    py/px: float arrays (n,); ring_lats/ring_lons: lists of per-row arrays.
    Returns bool array (n,). One flat pass over all edges of the batch.
    """
    py = np.asarray(py, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    n = len(py)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(r) for r in ring_lats), dtype=np.int64, count=n)
    edge_counts = lens - 1  # rings are closed (last == first)
    row_idx = np.repeat(np.arange(n), edge_counts)
    flat_lat = np.concatenate([np.asarray(r, dtype=np.float64) for r in ring_lats])
    flat_lon = np.concatenate([np.asarray(r, dtype=np.float64) for r in ring_lons])
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
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


def _grouped_pip(py, px, poly_ids, rings_by_id):
    """Batch refine: group candidate rows by poly_id, one vectorized
    crossing-number pass per distinct polygon in the batch.

    poly ids are factorized to integer codes first — object-string equality
    scans over millions of candidates were the hot spot before."""
    py = np.asarray(py, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    out = np.zeros(len(py), dtype=bool)
    codes, uniques = pd.factorize(poly_ids)
    order = np.argsort(codes, kind="stable")
    bounds = np.searchsorted(codes[order], np.arange(len(uniques) + 1))
    for k, pid in enumerate(uniques):
        idx = order[bounds[k]:bounds[k + 1]]
        if len(idx) == 0:
            continue
        rl, rlon = rings_by_id[pid]
        out[idx] = _pip_single_ring(py[idx], px[idx], rl, rlon)
    return out


def _pip_single_ring(py, px, ring_lat, ring_lon):
    """All points vs ONE ring: (n, edges) matrix crossing test.

    Point longitudes are normalized into the ring's (possibly unwrapped)
    frame: px' = lon_min + (px - lon_min) mod 360.  Identity for any point
    in [lon_min, lon_min + 360) — i.e. for every ordinary ring and point —
    and maps a -175deg point to +185deg when the ring is unwrapped across
    the antimeridian.  Points outside stay outside under the shift (they
    land >= 180deg east of a <=180deg-wide ring)."""
    lon0 = float(ring_lon.min())
    px = lon0 + np.mod(px - lon0, 360.0)
    y1, y2 = ring_lat[None, :-1], ring_lat[None, 1:]
    x1, x2 = ring_lon[None, :-1], ring_lon[None, 1:]
    pyr, pxr = py[:, None], px[:, None]
    straddle = (y1 > pyr) != (y2 > pyr)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (pyr - y1) * (x2 - x1) / (y2 - y1)
    cross = straddle & (pxr < xint)
    return (cross.sum(axis=1) % 2) == 1


def spatial_join(
    points: DataFrame,
    polys: DataFrame,
    res: int = DEFAULT_COVER_RES,
    broadcast_polys: bool = True,
    lat: str = "lat",
    lon: str = "lon",
    interior_shortcut: bool = False,
) -> DataFrame:
    """points x polygons -> point rows + (poly_id, level, postcode).

    Inner-join semantics (a point outside every polygon is dropped);
    boundary points resolve by crossing-number convention.

    interior_shortcut: skip the ray-cast for candidates whose cover cell is
    fully interior to the polygon.  Off by default: A/B-measured NEUTRAL to
    slightly negative on few-vertex polygons (Arrow transfer dominates; the
    skipped ray-cast is cheap and the extra flag column + partial indexing
    cost more).  Turn it ON for many-vertex polygons (admin boundaries with
    10^2-10^4 edges), where per-candidate edge math dominates the refine."""
    spark = points.sparkSession
    prows = polys.select("poly_id", "level", "postcode", "ring").collect()
    covers = polygon_covers(prows, res)
    rings_by_id = {
        r["poly_id"]: (
            np.array([p["lat"] for p in r["ring"]], dtype=np.float64),
            # unwrapped frame matches the cover and lets the refine handle
            # antimeridian-crossing rings (see _pip_single_ring)
            unwrap_ring_lons(
                np.array([p["lon"] for p in r["ring"]], dtype=np.float64)
            ),
        )
        for r in prows
    }
    attrs = [(r["poly_id"], r["level"], r["postcode"]) for r in prows]
    bc = spark.sparkContext.broadcast(rings_by_id)

    cover_df = spark.createDataFrame(
        covers, "poly_id string, cell long, interior boolean"
    )
    attrs_df = spark.createDataFrame(
        attrs, "poly_id string, level string, postcode string"
    )
    if broadcast_polys:
        cover_df = F.broadcast(cover_df)
        attrs_df = F.broadcast(attrs_df)

    @F.pandas_udf(T.BooleanType())
    def refine_flagged(plat: pd.Series, plon: pd.Series, pid: pd.Series,
                       interior: pd.Series) -> pd.Series:
        # interior/boundary split: candidates whose cover cell is FULLY
        # inside the polygon are in by construction — the ray-cast runs
        # only on the boundary-cell subset of each Arrow batch (typically
        # a perimeter-fraction of the candidates)
        inter = interior.to_numpy()
        out = inter.copy()
        b = ~inter
        if b.any():
            out[b] = _grouped_pip(
                plat.to_numpy()[b], plon.to_numpy()[b],
                pid.to_numpy()[b], bc.value,
            )
        return pd.Series(out)

    @F.pandas_udf(T.BooleanType())
    def refine(plat: pd.Series, plon: pd.Series, pid: pd.Series) -> pd.Series:
        return pd.Series(
            _grouped_pip(plat.to_numpy(), plon.to_numpy(), pid.to_numpy(),
                         bc.value)
        )

    pts = hexgrid.with_hex_cell(points, res, lat=lat, lon=lon, out_col="__cell")
    cand = pts.join(cover_df, pts["__cell"] == cover_df["cell"], "inner")
    if interior_shortcut:
        refined = cand.filter(
            refine_flagged(F.col(lat), F.col(lon), F.col("poly_id"),
                           F.col("interior"))
        )
    else:
        refined = cand.filter(
            refine(F.col(lat), F.col(lon), F.col("poly_id"))
        )
    return refined.drop("__cell", "cell", "interior").join(attrs_df, "poly_id")


# --- compatibility surface for tests / other callers -----------------------
def cover_cells_udf(res: int):
    """pandas UDF form of the cover (used when the polygon side is too large
    to collect — same math as the driver-side path)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover(rings: pd.Series) -> pd.Series:
        out = []
        for ring in rings:
            lats = np.array([p["lat"] for p in ring], dtype=np.float64)
            lons = np.array([p["lon"] for p in ring], dtype=np.float64)
            out.append(_ring_cover_cells(lats, lons, res))
        return pd.Series(out)

    return cover


def prepare_polygons(polys: DataFrame, res: int = DEFAULT_COVER_RES) -> DataFrame:
    """polygons -> one row per (cover cell, polygon) with flat ring arrays
    (distributed-cover variant for very large polygon sets)."""
    return polys.select(
        "poly_id",
        "level",
        "postcode",
        F.transform("ring", lambda p: p["lat"]).alias("ring_lat"),
        F.transform("ring", lambda p: p["lon"]).alias("ring_lon"),
        F.explode(cover_cells_udf(res)(F.col("ring"))).alias("cell"),
    )


def spatial_join_distributed(
    points: DataFrame,
    polys: DataFrame,
    res: int = DEFAULT_COVER_RES,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Fully distributed PIP join — NO driver-side polygon collect.

    For polygon sets beyond the broadcast-dim contract of `spatial_join`
    (which collects rings once and ships them via a broadcast variable):
    covers are computed per-polygon inside a pandas UDF (prepare_polygons),
    the candidate set is a plain shuffle equi-join on cell, and the refine
    ray-casts against the ring arrays carried on the polygon side of each
    candidate row (grouped per distinct polygon within each Arrow batch,
    so the vectorized crossing-number pass still runs once per polygon per
    batch).  Costs more Arrow transfer than spatial_join — the ring rides
    every candidate row — so prefer `spatial_join` while the dim fits the
    driver; semantics are identical (inner join, crossing-number,
    antimeridian rings unwrapped)."""
    prepared = prepare_polygons(polys, res)
    pts = hexgrid.with_hex_cell(points, res, lat=lat, lon=lon,
                                out_col="__cell")
    cand = pts.join(prepared, pts["__cell"] == prepared["cell"], "inner")

    @F.pandas_udf(T.BooleanType())
    def refine_rows(plat: pd.Series, plon: pd.Series, pid: pd.Series,
                    rlat: pd.Series, rlon: pd.Series) -> pd.Series:
        py = plat.to_numpy()
        px = plon.to_numpy()
        out = np.zeros(len(py), dtype=bool)
        codes, uniques = pd.factorize(pid.to_numpy())
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniques) + 1))
        for g in range(len(uniques)):
            idx = order[bounds[g]:bounds[g + 1]]
            if len(idx) == 0:
                continue
            first = idx[0]
            ring_lat = np.asarray(rlat.iloc[first], dtype=np.float64)
            ring_lon = unwrap_ring_lons(
                np.asarray(rlon.iloc[first], dtype=np.float64)
            )
            out[idx] = _pip_single_ring(py[idx], px[idx], ring_lat, ring_lon)
        return pd.Series(out)

    refined = cand.filter(
        refine_rows(F.col(lat), F.col(lon), F.col("poly_id"),
                    F.col("ring_lat"), F.col("ring_lon"))
    )
    return refined.drop("__cell", "cell", "ring_lat", "ring_lon")
