"""B4 two-phase PIP join vs a pure-Python ray-cast oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmspark.operators import spatial_join as sj


def _pip_py(py, px, ring):
    """Independent scalar crossing-number implementation (the oracle)."""
    inside = False
    for (y1, x1), (y2, x2) in zip(ring, ring[1:]):
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def test_ranges_helper():
    out = sj._ranges(np.array([3, 1, 0, 2]))
    assert out.tolist() == [0, 1, 2, 0, 0, 1]
    assert sj._ranges(np.array([], dtype=np.int64)).tolist() == []


def test_points_in_rings_np_vs_scalar():
    rng = np.random.default_rng(7)
    n = 500
    py = rng.uniform(0, 10, n)
    px = rng.uniform(0, 10, n)
    rings = []
    for i in range(n):
        cx, cy = rng.uniform(2, 8, 2)
        nv = rng.integers(3, 9)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5, 3.0, nv)
        ring = [(cy + r * np.sin(a), cx + r * np.cos(a)) for a, r in zip(ang, rad)]
        ring.append(ring[0])
        rings.append(ring)
    got = sj.points_in_rings_np(
        py, px,
        [np.array([p[0] for p in r]) for r in rings],
        [np.array([p[1] for p in r]) for r in rings],
    )
    exp = np.array([_pip_py(py[i], px[i], rings[i]) for i in range(n)])
    assert (got == exp).all()
    assert exp.any() and (~exp).any()  # both classes exercised


def test_cover_cells_superset(polygons):
    """Every vertex and interior sample of each polygon falls in a cover cell."""
    from osmspark.functions import hexgrid

    rows = polygons.collect()
    for r in rows[:20]:
        ring = [(p["lat"], p["lon"]) for p in r["ring"]]
        lats = np.array([p[0] for p in ring])
        lons = np.array([p[1] for p in ring])
        cover = set(sj._ring_cover_cells(lats, lons, 7).tolist())
        # interior samples: convex combinations of vertices
        rng = np.random.default_rng(1)
        w = rng.dirichlet(np.ones(len(ring)), 50)
        slat = w @ lats
        slon = w @ lons
        cells = hexgrid.latlon_to_cell(slat, slon, 7)
        assert set(cells.tolist()) <= cover


@pytest.fixture(scope="module")
def joined(nodes, polygons):
    pts = nodes.select("id", "lat", "lon")
    return sj.spatial_join(pts, polygons, res=7).cache()


def test_spatial_join_vs_bruteforce(joined, nodes, polygons):
    got = {(r["id"], r["poly_id"]) for r in joined.collect()}
    pts = nodes.select("id", "lat", "lon").collect()
    polys = polygons.collect()
    exp = set()
    for p in pts:
        for pr in polys:
            ring = [(v["lat"], v["lon"]) for v in pr["ring"]]
            if _pip_py(p["lat"], p["lon"], ring):
                exp.add((p["id"], pr["poly_id"]))
    assert got == exp
    assert len(exp) > 100  # non-trivial workload


def test_spatial_join_no_rowwise_python(joined):
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan  # the refine UDF, Arrow-batched


def test_spatial_join_broadcasts_polygons(joined):
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_multiface_polygon_join(spark):
    """Rings straddling cube-face boundaries (lon=45deg: face 0|1 edge;
    lat=45deg at lon=0: face 0|2 edge) — PIP join must equal brute force.
    Round 1 raised ValueError on any multi-face ring."""
    rects = {
        "lon45": (10.0, 12.0, 44.0, 46.0),    # crosses face 0 -> 1
        "lat45": (44.0, 46.0, -1.0, 1.0),     # crosses face 0 -> 2
        "corner": (44.2, 45.8, 43.9, 46.1),   # near the 3-face corner
    }
    rows = []
    for pid, (la0, la1, lo0, lo1) in rects.items():
        ring = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0), (la0, lo0)]
        rows.append((pid, "test", [{"lat": a, "lon": o} for a, o in ring], None))
    polys = spark.createDataFrame(
        rows,
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string",
    )
    rng = np.random.default_rng(11)
    plat_l, plon_l = [], []
    for la0, la1, lo0, lo1 in rects.values():
        plat_l.append(rng.uniform(la0 - 1.0, la1 + 1.0, 1200))
        plon_l.append(rng.uniform(lo0 - 1.0, lo1 + 1.0, 1200))
    plat = np.concatenate(plat_l)
    plon = np.concatenate(plon_l)
    pts = spark.createDataFrame(
        [(str(i), float(plat[i]), float(plon[i])) for i in range(len(plat))],
        "id string, lat double, lon double",
    )
    got = {(r["id"], r["poly_id"])
           for r in sj.spatial_join(pts, polys, res=7).collect()}
    exp = set()
    for pid, (la0, la1, lo0, lo1) in rects.items():
        ring = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0), (la0, lo0)]
        for i in range(len(plat)):
            if _pip_py(plat[i], plon[i], ring):
                exp.add((str(i), pid))
    assert got == exp
    assert len(exp) > 50  # each rect must catch points on BOTH faces


def test_multiface_cover_superset():
    """Interior samples of a face-straddling ring always land in the cover."""
    from osmspark.functions import hexgrid

    lats = np.array([10.0, 10.0, 12.0, 12.0, 10.0])
    lons = np.array([44.0, 46.0, 46.0, 44.0, 44.0])
    cover = set(sj._ring_cover_cells(lats, lons, 8).tolist())
    faces = {hexgrid.unpack(np.array([c]))[1][0] for c in cover}
    assert len(faces) == 2  # cover spans both cube faces
    rng = np.random.default_rng(3)
    slat = rng.uniform(10.0, 12.0, 500)
    slon = rng.uniform(44.0, 46.0, 500)
    cells = hexgrid.latlon_to_cell(slat, slon, 8)
    assert set(cells.tolist()) <= cover


def test_interior_shortcut_equals_full_refine(nodes, polygons):
    """interior_shortcut=True must be result-identical to the full ray-cast
    path (the shortcut only skips work that is provably redundant)."""
    pts = nodes.select("id", "lat", "lon")
    a = {(r["id"], r["poly_id"]) for r in
         sj.spatial_join(pts, polygons, res=7, interior_shortcut=True).collect()}
    b = {(r["id"], r["poly_id"]) for r in
         sj.spatial_join(pts, polygons, res=7, interior_shortcut=False).collect()}
    assert a == b and len(a) > 100


def test_antimeridian_join_equals_shifted_frame(spark):
    """A ring crossing +-180 must join identically to the same geometry
    expressed in a shifted frame where nothing crosses (round-2 VERDICT:
    v2 rejected these; a global admin dim has rings at the antimeridian)."""
    ring = [(10.0, 179.0), (10.0, -179.0), (12.0, -179.0), (12.0, 179.0),
            (10.0, 179.0)]
    polys = spark.createDataFrame(
        [("am", "test", [{"lat": a, "lon": o} for a, o in ring], None)],
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string",
    )
    rng = np.random.default_rng(7)
    plat = rng.uniform(9.0, 13.0, 2000)
    # lons straddling the antimeridian on both sides
    plon_u = rng.uniform(177.5, 182.5, 2000)
    plon = np.where(plon_u > 180.0, plon_u - 360.0, plon_u)
    pts = spark.createDataFrame(
        [(str(i), float(plat[i]), float(plon[i])) for i in range(len(plat))],
        "id string, lat double, lon double",
    )
    got = {r["id"] for r in sj.spatial_join(pts, polys, res=7).collect()}
    # expected: shift the whole frame by -90deg so nothing crosses
    def shift(lo):
        s = lo - 90.0
        return s + 360.0 if s < -180.0 else s
    ring_s = [(la, shift(lo if lo > 0 else lo + 360.0)) for la, lo in ring]
    exp = {str(i) for i in range(len(plat))
           if _pip_py(plat[i], shift(plon_u[i]), ring_s)}
    assert got == exp
    # points on BOTH sides of the antimeridian must be present
    assert any(plon[int(i)] > 0 for i in got)
    assert any(plon[int(i)] < 0 for i in got)
    assert len(exp) > 300


def test_antimeridian_cover_superset():
    """Interior samples of an antimeridian-crossing ring land in its cover."""
    from osmspark.functions import hexgrid

    lats = np.array([10.0, 10.0, 12.0, 12.0, 10.0])
    lons = np.array([179.0, -179.0, -179.0, 179.0, 179.0])
    cover = set(sj._ring_cover_cells(lats, lons, 7).tolist())
    rng = np.random.default_rng(5)
    slat = rng.uniform(10.0, 12.0, 500)
    slon_u = rng.uniform(179.0, 181.0, 500)
    slon = np.where(slon_u > 180.0, slon_u - 360.0, slon_u)
    cells = hexgrid.latlon_to_cell(slat, slon, 7)
    assert set(cells.tolist()) <= cover


def test_spatial_join_distributed_equals_broadcast(nodes, polygons):
    """The no-driver-collect variant must be result-identical to the
    broadcast-dim spatial_join on the same inputs."""
    pts = nodes.select("id", "lat", "lon")
    a = {(r["id"], r["poly_id"]) for r in
         sj.spatial_join(pts, polygons, res=7).collect()}
    b = {(r["id"], r["poly_id"]) for r in
         sj.spatial_join_distributed(pts, polygons, res=7).collect()}
    assert a == b and len(a) > 100


def test_spatial_join_distributed_antimeridian(spark):
    """Distributed variant handles antimeridian rings the same way."""
    ring = [(10.0, 179.0), (10.0, -179.0), (12.0, -179.0), (12.0, 179.0),
            (10.0, 179.0)]
    polys = spark.createDataFrame(
        [("am", "test", [{"lat": a, "lon": o} for a, o in ring], None)],
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string",
    )
    pts = spark.createDataFrame(
        [("in_e", 11.0, 179.5), ("in_w", 11.0, -179.5),
         ("out_n", 13.0, 179.5), ("out_lon", 11.0, 178.0)],
        "id string, lat double, lon double",
    )
    got = {r["id"] for r in
           sj.spatial_join_distributed(pts, polys, res=7).collect()}
    assert got == {"in_e", "in_w"}


def _mk_polys(spark, rings_by_id):
    rows = [(pid, "test", [{"lat": a, "lon": o} for a, o in ring], None)
            for pid, ring in rings_by_id.items()]
    return spark.createDataFrame(
        rows,
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string",
    )


def test_hemisphere_wide_ring_joins(spark):
    """Round-3 VERDICT item 3: a ring spanning >180 deg of longitude used
    to raise; split_ring bisects it into coverable pieces and the join
    must equal a strict planar box test."""
    la0, la1, lo0, lo1 = 0.5, 20.5, -100.5, 100.5  # 201 deg of longitude
    # edge vertices every ~50 deg: consecutive lon deltas stay < 180, so
    # the shortest-path unwrap convention reads the ring unambiguously
    # (a single 201-deg edge would be interpreted as crossing +-180)
    lo_steps = np.linspace(lo0, lo1, 5)
    ring = ([(la0, float(lo)) for lo in lo_steps]
            + [(la1, float(lo)) for lo in lo_steps[::-1]]
            + [(la0, lo0)])
    polys = _mk_polys(spark, {"wide": ring})
    rng = np.random.default_rng(17)
    plat = rng.uniform(-5.0, 26.0, 3000)
    plon = rng.uniform(-120.0, 120.0, 3000)
    pts = spark.createDataFrame(
        [(str(i), float(plat[i]), float(plon[i])) for i in range(len(plat))],
        "id string, lat double, lon double",
    )
    got = {r["id"] for r in sj.spatial_join(pts, polys, res=4).collect()}
    exp = {str(i) for i in range(len(plat))
           if la0 < plat[i] < la1 and lo0 < plon[i] < lo1}
    assert got == exp
    assert len(exp) > 500


def test_polar_cap_ring_joins(spark):
    """A pole-encircling ring (net longitude winding) joins as the region
    between the curve and the encircled pole: winding EASTWARD keeps the
    north side (interior on the traversal's left), WESTWARD the south
    side.  Ground truth: lat vs the (piecewise-linear) curve, with points
    sampled >1 deg away from the boundary so interpolation conventions
    cannot flip them."""
    lon_grid = np.arange(-180.0, 180.1, 5.0)
    curve = -60.0 + 5.0 * np.sin(np.radians(3.0 * lon_grid))
    east = [(float(curve[i]), float(lon_grid[i]))
            for i in range(len(lon_grid))]
    west = list(reversed(east))
    polys = _mk_polys(spark, {"north_side": east, "south_side": west})
    rng = np.random.default_rng(23)
    plat = rng.uniform(-89.5, -30.0, 4000)
    plon = rng.uniform(-180.0, 180.0, 4000)
    f = np.interp(plon, lon_grid, curve)
    keep = np.abs(plat - f) > 1.0  # dodge the boundary band
    plat, plon, f = plat[keep], plon[keep], f[keep]
    pts = spark.createDataFrame(
        [(str(i), float(plat[i]), float(plon[i])) for i in range(len(plat))],
        "id string, lat double, lon double",
    )
    got = {(r["id"], r["poly_id"])
           for r in sj.spatial_join(pts, polys, res=3).collect()}
    exp = set()
    for i in range(len(plat)):
        exp.add((str(i), "north_side" if plat[i] > f[i] else "south_side"))
    assert got == exp
    assert sum(1 for _, p in exp if p == "south_side") > 300
    assert sum(1 for _, p in exp if p == "north_side") > 300


def test_polar_cap_distributed_equals_broadcast(spark):
    """The no-driver-collect variant must split polar rings identically."""
    lon_grid = np.arange(-180.0, 180.1, 10.0)
    curve = -65.0 + 4.0 * np.sin(np.radians(2.0 * lon_grid))
    west = [(float(curve[i]), float(lon_grid[i]))
            for i in range(len(lon_grid))][::-1]
    polys = _mk_polys(spark, {"cap": west})
    rng = np.random.default_rng(29)
    plat = rng.uniform(-89.0, -40.0, 1500)
    plon = rng.uniform(-180.0, 180.0, 1500)
    pts = spark.createDataFrame(
        [(str(i), float(plat[i]), float(plon[i])) for i in range(len(plat))],
        "id string, lat double, lon double",
    )
    a = {r["id"] for r in sj.spatial_join(pts, polys, res=3).collect()}
    b = {r["id"] for r in
         sj.spatial_join_distributed(pts, polys, res=3).collect()}
    assert a == b and len(a) > 100


def test_split_ring_pieces_tile_exactly():
    """split_ring invariant: every point is inside the original ring iff
    it is inside EXACTLY ONE piece (no gaps, no double counting) — checked
    on a concave ring forced through the splitter by width."""
    # concave 'C'-shaped ring, 220 deg wide -> must split; long horizontal
    # edges carry intermediate vertices so the shortest-path unwrap reads
    # them unambiguously (deltas < 180)
    corners = [(0.0, -110.0), (0.0, 110.0), (30.0, 110.0), (30.0, -110.0),
               (20.0, -110.0), (20.0, 100.0), (10.0, 100.0), (10.0, -110.0),
               (0.0, -110.0)]
    ring = []
    for (a0, o0), (a1, o1) in zip(corners, corners[1:]):
        n = max(int(abs(o1 - o0) // 60) + 1, 1)
        for t in np.arange(n) / n:
            ring.append((a0 + t * (a1 - a0), o0 + t * (o1 - o0)))
    ring.append(corners[-1])
    lats = np.array([p[0] for p in ring])
    lons = np.array([p[1] for p in ring])
    pieces = sj.split_ring(lats, lons)
    assert len(pieces) > 1
    rng = np.random.default_rng(31)
    py = rng.uniform(-5.0, 35.0, 4000)
    px = rng.uniform(-130.0, 130.0, 4000)
    counts = np.zeros(len(py), dtype=np.int64)
    for rl, rlon in pieces:
        counts += sj._pip_single_ring(py, px, rl, rlon).astype(np.int64)
    exp = np.array([_pip_py(py[i], px[i], ring) for i in range(len(py))])
    assert (counts <= 1).all()              # disjoint interiors
    assert ((counts == 1) == exp).all()     # union == original
    assert exp.sum() > 300 and (~exp).sum() > 300


def test_spatial_join_adaptive_mixed_dim(spark):
    """Adaptive cover res (round 4): a dim mixing a km-scale rectangle
    with a polar cap must pick a fine res for the rectangle and a coarse
    one for the cap, keep every polygon's cover within the cell budget,
    and return exactly the fixed-ground-truth membership."""
    rect = [(1.2, 103.7), (1.2, 103.9), (1.4, 103.9), (1.4, 103.7),
            (1.2, 103.7)]
    lon_grid = np.arange(-180.0, 180.1, 10.0)
    curve = -65.0 + 4.0 * np.sin(np.radians(2.0 * lon_grid))
    cap = [(float(curve[i]), float(lon_grid[i]))
           for i in range(len(lon_grid))][::-1]  # westward -> south side
    polys = _mk_polys(spark, {"rect": rect, "cap": cap})
    rng = np.random.default_rng(41)
    plat = np.concatenate([rng.uniform(1.0, 1.6, 1500),
                           rng.uniform(-89.0, -40.0, 1500)])
    plon = np.concatenate([rng.uniform(103.5, 104.1, 1500),
                           rng.uniform(-180.0, 180.0, 1500)])
    pts = spark.createDataFrame(
        [(str(i), float(plat[i]), float(plon[i])) for i in range(len(plat))],
        "id string, lat double, lon double",
    )
    got = {(r["id"], r["poly_id"]) for r in sj.spatial_join_adaptive(
        pts, polys, max_res=7, min_res=2, max_cover_cells=2048).collect()}
    f = np.interp(plon, lon_grid, curve)
    exp = set()
    for i in range(len(plat)):
        if 1.2 < plat[i] < 1.4 and 103.7 < plon[i] < 103.9:
            exp.add((str(i), "rect"))
        if plat[i] < f[i] - 1.0:           # clear of the boundary band
            exp.add((str(i), "cap"))
    near_boundary = {(str(i), "cap") for i in range(len(plat))
                     if abs(plat[i] - f[i]) <= 1.0}
    assert got - near_boundary == exp
    assert len(exp) > 400
    # per-poly resolutions + budget
    prows = [{"poly_id": "rect", "ring": [{"lat": a, "lon": o}
                                          for a, o in rect]},
             {"poly_id": "cap", "ring": [{"lat": a, "lon": o}
                                         for a, o in cap]}]
    covers_by_res, res_by_pid, pieces_by_pid = sj.adaptive_polygon_covers(
        prows, max_res=7, min_res=2, max_cover_cells=2048)
    assert len(pieces_by_pid["rect"]) == 1 and len(pieces_by_pid["cap"]) > 1
    assert res_by_pid["rect"] == 7          # small polygon -> finest res
    assert res_by_pid["cap"] < 7            # huge polygon -> coarser res
    from collections import Counter
    for rr, rows in covers_by_res.items():
        for pid, n in Counter(p for p, _c, _i in rows).items():
            assert n <= 2048, (rr, pid, n)
    # round-6 flag shape: every cover row carries the interior bool, and
    # the big cap certifies a substantial interior (the refine-skip fuel)
    flat = [r for rows in covers_by_res.values() for r in rows]
    assert all(isinstance(r[2], bool) for r in flat)
    assert any(r[2] for r in flat if r[0] == "cap")


def test_wide_ring_cover_superset():
    """Interior samples of a hemisphere-wide ring always land in its
    (split-merged) cover."""
    from osmspark.functions import hexgrid

    lo_steps = np.linspace(-100.0, 100.0, 5)
    lats = np.array([0.0] * 5 + [20.0] * 5 + [0.0])
    lons = np.concatenate([lo_steps, lo_steps[::-1], [-100.0]])
    cover = set(sj._ring_cover_cells(lats, lons, 4).tolist())
    rng = np.random.default_rng(37)
    slat = rng.uniform(0.01, 19.99, 800)
    slon = rng.uniform(-99.99, 99.99, 800)
    cells = hexgrid.latlon_to_cell(slat, slon, 4)
    assert set(cells.tolist()) <= cover
