"""DBSCAN composition (radius self-join + degree + components + border).

The neighbor graph's exactness (cell cover == brute force, seam cases,
boundary inclusivity) is the radius-join suite's job; this suite derives
the eps graph from the SAME engine expressions via a brute crossJoin and
checks the clustering logic against a verbatim python DBSCAN with the
documented min-label determinism rule.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from osmspark.functions.geo import haversine_m, sq_deg_dist
from osmspark.operators import cluster as cl


def _brute_pairs(points, eps, metric):
    """Unordered (a, b) eps-pairs via crossJoin — same distance exprs as
    the engine, so boundary membership can't disagree."""
    l = points.select(F.col("id").alias("a"),
                      F.col("lat").alias("alat"), F.col("lon").alias("alon"))
    r = points.select(F.col("id").alias("b"),
                      F.col("lat").alias("blat"), F.col("lon").alias("blon"))
    j = l.crossJoin(r).where(F.col("a") < F.col("b"))
    if metric == "haversine":
        keep = haversine_m(F.col("alat"), F.col("alon"),
                           F.col("blat"), F.col("blon")) <= eps
    else:
        keep = sq_deg_dist(F.col("alat"), F.col("alon"),
                           F.col("blat"), F.col("blon")) <= eps * eps
    return [(r["a"], r["b"]) for r in j.where(keep).collect()]


def _dbscan_py(ids, pairs, min_pts):
    """Reference DBSCAN with the operator's determinism contract:
    component label = min core id (sorted-seed BFS), border point takes
    the min label among its core neighbors."""
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    core = {i for i in ids if len(adj[i]) + 1 >= min_pts}
    label = {}
    for c in sorted(core):
        if c in label:
            continue
        label[c] = c
        stack = [c]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v in core and v not in label:
                    label[v] = c
                    stack.append(v)
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], True)
        else:
            nb = [label[v] for v in adj[i] if v in core]
            out[i] = (min(nb) if nb else None, False)
    return out


def _check_vs_oracle(points, eps, min_pts, metric):
    got = {r["id"]: (r["cluster"], r["is_core"])
           for r in cl.dbscan(points, eps, min_pts, metric=metric).collect()}
    ids = [r["id"] for r in points.select("id").collect()]
    want = _dbscan_py(ids, _brute_pairs(points, eps, metric), min_pts)
    assert got == want
    return want


def test_dbscan_oracle_haversine_real_table(nodes):
    pts = nodes.select("id", "lat", "lon")
    want = _check_vs_oracle(pts, 2000.0, 3, "haversine")
    labels = {c for c, _ in want.values() if c is not None}
    assert len(labels) >= 2                       # multiple clusters
    assert any(c is None for c, _ in want.values())       # some noise
    assert any(core for _, core in want.values())         # some cores


def test_dbscan_oracle_sq_deg_real_table(nodes):
    pts = nodes.select("id", "lat", "lon")
    want = _check_vs_oracle(pts, 0.02, 4, "sq_deg")
    assert any(c is not None for c, _ in want.values())


def _bridge_frame(spark):
    """Two 5-point mutually-adjacent blobs + one bridge point M within
    eps=0.7 deg of exactly one core from each blob (and nothing else)."""
    blob = [(0.0, 0.0), (0.0, 0.4), (0.4, 0.0), (0.4, 0.4), (0.2, 0.2)]
    rows = ([(f"a{i}", lat, lon) for i, (lon, lat) in enumerate(blob)]
            + [(f"b{i}", lat, lon + 1.7) for i, (lon, lat) in enumerate(blob)]
            + [("m", 0.0, 1.05)])
    return spark.createDataFrame(rows, "id string, lat double, lon double")


def test_border_point_does_not_merge_clusters(spark):
    """The DBSCAN-vs-plain-CC distinction: M is within eps of a core in
    BOTH blobs, but M is not core (3 < min_pts incl itself), so the blobs
    stay separate clusters and M joins the min-labeled one."""
    pts = _bridge_frame(spark)
    got = {r["id"]: (r["cluster"], r["is_core"])
           for r in cl.dbscan(pts, 0.7, 4, metric="sq_deg").collect()}
    for i in range(5):
        assert got[f"a{i}"] == ("a0", True)
        assert got[f"b{i}"] == ("b0", True)
    assert got["m"] == ("a0", False)
    # and it matches the python oracle too
    _check_vs_oracle(pts, 0.7, 4, "sq_deg")


def test_noise_and_singleton_core(spark):
    pts = spark.createDataFrame(
        [("p0", 0.0, 0.0), ("p1", 0.0, 0.1), ("iso", 5.0, 5.0)],
        "id string, lat double, lon double")
    # min_pts=2: p0/p1 mutual -> core pair, iso -> noise (NULL cluster)
    got = {r["id"]: (r["cluster"], r["is_core"])
           for r in cl.dbscan(pts, 0.2, 2, metric="sq_deg").collect()}
    assert got == {"p0": ("p0", True), "p1": ("p0", True),
                   "iso": (None, False)}
    # min_pts=1: every point is core; the isolated one is its own cluster
    got1 = {r["id"]: (r["cluster"], r["is_core"])
            for r in cl.dbscan(pts, 0.2, 1, metric="sq_deg").collect()}
    assert got1 == {"p0": ("p0", True), "p1": ("p0", True),
                    "iso": ("iso", True)}


def test_min_pts_guard(spark):
    pts = spark.createDataFrame([("p0", 0.0, 0.0)],
                                "id string, lat double, lon double")
    import pytest as _pt
    with _pt.raises(ValueError, match="min_pts"):
        cl.dbscan(pts, 0.1, 0, metric="sq_deg")


def test_cluster_stats(spark):
    pts = _bridge_frame(spark)
    labeled = cl.dbscan(pts, 0.7, 4, metric="sq_deg")
    stats = {r["cluster"]: r
             for r in cl.cluster_stats(labeled, pts).collect()}
    assert set(stats) == {"a0", "b0"}
    assert stats["a0"]["n_points"] == 6 and stats["a0"]["n_core"] == 5
    assert stats["b0"]["n_points"] == 5 and stats["b0"]["n_core"] == 5
    assert abs(stats["b0"]["centroid_lon"] - 1.9) < 1e-9
    assert stats["a0"]["max_lon"] == 1.05          # M counts into the bbox
