"""Tests for per-group convex hulls (operators/hull.py): python-oracle
equality, two-phase == single-phase on exactly-representable points,
containment/subset properties, canonical CCW form, degenerates, guards.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osmspark.operators.hull import _chain, convex_hull


def _py_hull(pts):
    """Independent textbook monotone chain (not numpy) — open ring,
    CCW from smallest (lon, lat), strictly convex."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
    def build(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out
    lo = build(pts)
    up = build(reversed(pts))
    ring = lo[:-1] + up[:-1]
    if len(ring) < 3:
        return [pts[0], pts[-1]]
    return ring


def _lattice_cloud(rng, n, scale=64):
    """Exactly-representable coordinates (k/64): orientation predicates
    are IEEE-exact, so two-phase == single-phase must hold exactly."""
    return [(rng.randrange(-3 * scale, 3 * scale) / scale,
             rng.randrange(-3 * scale, 3 * scale) / scale)
            for _ in range(n)]


def test_vs_python_oracle_multi_group(spark):
    rng = random.Random(11)
    rows, want = [], {}
    for g in range(6):
        cloud = _lattice_cloud(rng, 40 + 30 * g)
        rows += [(f"g{g}", la, lo) for lo, la in cloud]
        want[f"g{g}"] = _py_hull(cloud)
    df = spark.createDataFrame(rows, "grp string, lat double, lon double")
    got = {r["grp"]: r for r in
           convex_hull(df, by="grp", n_presplit=4).collect()}
    assert set(got) == set(want)
    for g, ring in want.items():
        r = got[g]
        open_got = [(v["lon"], v["lat"]) for v in r["hull"][:-1]]
        assert open_got == ring, g
        assert r["hull"][0] == r["hull"][-1]          # closed
        assert r["n_vertices"] == len(ring)
        assert r["n_points"] == sum(1 for row in rows if row[0] == g)


def test_two_phase_equals_single_phase(spark):
    rng = random.Random(23)
    cloud = _lattice_cloud(rng, 500)
    df = spark.createDataFrame([(la, lo) for lo, la in cloud],
                               "lat double, lon double")
    one = convex_hull(df, n_presplit=1).collect()[0]
    many = convex_hull(df, n_presplit=13).collect()[0]
    assert one["hull"] == many["hull"]
    assert one["n_points"] == many["n_points"] == 500


def test_ccw_canonical_and_containment(spark):
    rng = random.Random(5)
    cloud = _lattice_cloud(rng, 300)
    df = spark.createDataFrame([(la, lo) for lo, la in cloud],
                               "lat double, lon double")
    r = convex_hull(df).collect()[0]
    ring = [(v["lon"], v["lat"]) for v in r["hull"][:-1]]
    # canonical start: lexicographically smallest vertex first
    assert ring[0] == min(ring)
    # CCW: positive shoelace area
    area2 = sum(x0 * y1 - x1 * y0
                for (x0, y0), (x1, y1) in zip(ring, ring[1:] + ring[:1]))
    assert area2 > 0
    # every input point inside or on the hull (cross >= 0 per edge)
    for px, py in set(cloud):
        for (x0, y0), (x1, y1) in zip(ring, ring[1:] + ring[:1]):
            assert (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) >= 0
    # hull vertices are input points
    assert set(ring) <= set(cloud)


def test_degenerates(spark):
    # single point
    df1 = spark.createDataFrame([(1.5, 103.5)], "lat double, lon double")
    r = convex_hull(df1).collect()[0]
    assert r["n_vertices"] == 1 and len(r["hull"]) == 2
    assert r["hull"][0] == r["hull"][1]
    # duplicates of one point
    df2 = spark.createDataFrame([(1.5, 103.5)] * 7, "lat double, lon double")
    r = convex_hull(df2).collect()[0]
    assert r["n_vertices"] == 1 and r["n_points"] == 7
    # collinear set -> 2-vertex diameter, under any presplit
    pts = [(1.0 + i / 8, 103.0 + i / 4) for i in range(20)]
    df3 = spark.createDataFrame(pts, "lat double, lon double")
    for ps in (1, 5):
        r = convex_hull(df3, n_presplit=ps).collect()[0]
        ring = [(v["lat"], v["lon"]) for v in r["hull"][:-1]]
        assert r["n_vertices"] == 2
        assert set(ring) == {pts[0], pts[-1]}


def test_guards(spark):
    df = spark.createDataFrame([(1.0, 103.0), (None, 104.0)],
                               "lat double, lon double")
    with pytest.raises(Exception, match="null lat/lon"):
        convex_hull(df).collect()
    ok = spark.createDataFrame([(1.0, 103.0)], "lat double, lon double")
    with pytest.raises(ValueError, match="n_presplit"):
        convex_hull(ok, n_presplit=0)


def test_chain_matches_oracle_fuzz():
    rng = random.Random(99)
    for trial in range(60):
        n = rng.randrange(1, 40)
        cloud = _lattice_cloud(rng, n, scale=8)   # heavy duplicate/collinear
        import numpy as np
        got = _chain(np.array([p[0] for p in cloud], dtype=float),
                     np.array([p[1] for p in cloud], dtype=float))
        want = _py_hull(cloud)
        assert [tuple(v) for v in got] == want, (trial, cloud)
