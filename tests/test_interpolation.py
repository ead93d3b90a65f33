"""KDE hex smoothing and IDW interpolation vs python oracles, mass
conservation, seam guard, exact-hit rule, plan purity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmspark.functions import hexgrid
from osmspark.functions.geo import haversine_np
from osmspark.operators.knn import idw_interpolate
from osmspark.operators.tiles import kde_smooth


def _kernel(k, sigma):
    offs = hexgrid.kring_offsets(k)
    d = [(abs(dq) + abs(dr) + abs(dq + dr)) // 2 for dq, dr in offs]
    raw = [math.exp(-(x * x) / (2 * sigma * sigma)) for x in d]
    t = sum(raw)
    return offs, [w / t for w in raw]


def test_kde_single_point_exact_weights(spark):
    df = spark.createDataFrame([(1.30, 103.80)], "lat double, lon double")
    got = {r["cell"]: r["density"] for r in
           kde_smooth(df, res=9, k=1, sigma=1.0).collect()}
    # expected: the point's cell spreads over its filled 1-ring with the
    # normalized gaussian kernel; neighbor ids from the numpy twin
    cell = int(hexgrid.latlon_to_cell(
        np.array([1.30]), np.array([103.80]), 9)[0])
    ring = hexgrid.kring(np.array([cell]), 1)[0]
    offs, w = _kernel(1, 1.0)
    exp = {}
    for (dq, dr), wi in zip(offs, w):
        exp[cell + (dq << 28) + dr] = wi
    assert set(got) == set(exp) == set(int(c) for c in ring)
    for c, v in exp.items():
        assert abs(got[c] - v) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_kde_matches_python_convolution_and_conserves_mass(spark):
    import random

    rng = random.Random(9)
    pts = [(1.29 + rng.random() * 0.02, 103.79 + rng.random() * 0.02)
           for _ in range(300)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    k, sigma = 2, 1.2
    got = {r["cell"]: r["density"] for r in
           kde_smooth(df, res=8, k=k, sigma=sigma).collect()}
    cells = hexgrid.latlon_to_cell(
        np.array([p[0] for p in pts]), np.array([p[1] for p in pts]), 8)
    counts = {}
    for c in cells:
        counts[int(c)] = counts.get(int(c), 0) + 1
    offs, w = _kernel(k, sigma)
    exp = {}
    for c, m in counts.items():
        for (dq, dr), wi in zip(offs, w):
            nb = c + (dq << 28) + dr
            exp[nb] = exp.get(nb, 0.0) + m * wi
    assert set(got) == set(exp)
    for c in exp:
        assert abs(got[c] - exp[c]) < 1e-9
    assert abs(sum(got.values()) - len(pts)) < 1e-6  # mass conserved


def test_kde_weighted_and_guards(spark):
    df = spark.createDataFrame(
        [(1.30, 103.80, 5.0), (1.30, 103.80, 2.5)],
        "lat double, lon double, w double")
    got = kde_smooth(df, res=9, k=0, sigma=1.0, weight_col="w").collect()
    assert len(got) == 1 and abs(got[0]["density"] - 7.5) < 1e-12
    with pytest.raises(ValueError, match="sigma"):
        kde_smooth(df, res=9, k=1, sigma=0.0)
    with pytest.raises(ValueError, match="k must"):
        kde_smooth(df, res=9, k=-1)


def test_kde_seam_guard(spark):
    """A point essentially ON a cube-face edge must raise under the
    default strict contract; strict_seam=False completes and documents
    the leak (total mass <= input)."""
    df = spark.createDataFrame(
        [(0.001, 44.9999), (1.30, 103.80)], "lat double, lon double")
    with pytest.raises(Exception, match="face edge"):
        kde_smooth(df, res=9, k=2, sigma=1.0).collect()
    got = kde_smooth(df, res=9, k=2, sigma=1.0,
                     strict_seam=False).collect()
    assert sum(r["density"] for r in got) <= 2.0 + 1e-9


def test_kde_plan_pure_native(spark):
    df = spark.createDataFrame([(1.30, 103.80)], "lat double, lon double")
    plan = kde_smooth(df, res=9, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_idw_matches_python_oracle(spark):
    import random

    rng = random.Random(17)
    pts = [(i, 1.29 + rng.random() * 0.02, 103.79 + rng.random() * 0.02,
            rng.random() * 100) for i in range(200)]
    qs = [(j, 1.29 + rng.random() * 0.02, 103.79 + rng.random() * 0.02)
          for j in range(10)]
    pdf = spark.createDataFrame(
        pts, "id long, lat double, lon double, value double")
    qdf = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    got = {r["query_id"]: (r["estimate"], r["n_neighbors"]) for r in
           idw_interpolate(pdf, qdf, k=5, power=2.0).collect()}
    for qid, qla, qlo in qs:
        ds = sorted(
            (float(haversine_np(np.array([qla]), np.array([qlo]),
                                np.array([la]), np.array([lo]))[0]), i, v)
            for i, la, lo, v in pts)[:5]
        num = sum(v / d ** 2 for d, _, v in ds)
        den = sum(1 / d ** 2 for d, _, _ in ds)
        assert abs(got[qid][0] - num / den) < 1e-9
        assert got[qid][1] == 5


def test_idw_exact_hit_and_guards(spark):
    pdf = spark.createDataFrame(
        [(1, 1.30, 103.80, 42.0), (2, 1.31, 103.81, 7.0)],
        "id long, lat double, lon double, value double")
    qdf = spark.createDataFrame(
        [(1, 1.30, 103.80)], "query_id long, lat double, lon double")
    got = idw_interpolate(pdf, qdf, k=2).collect()
    assert len(got) == 1 and got[0]["estimate"] == 42.0
    with pytest.raises(ValueError, match="k must"):
        idw_interpolate(pdf, qdf, k=0)
    with pytest.raises(ValueError, match="power"):
        idw_interpolate(pdf, qdf, k=1, power=0.0)
