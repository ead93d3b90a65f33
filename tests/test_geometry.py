"""Way geometry: nd-chain length/bbox vs a python oracle; chain breaks on
dangling refs; composed road-length-by-street-type audit."""

import math

from pyspark.sql import functions as F

from osmspark.operators import geometry


def _hav(a, b):
    (la, lo), (lb, lob) = a, b
    dlat = math.radians(lb - la) / 2
    dlon = math.radians(lob - lo) / 2
    x = (math.sin(dlat) ** 2
         + math.cos(math.radians(la)) * math.cos(math.radians(lb))
         * math.sin(dlon) ** 2)
    return 2 * 6371008.8 * math.asin(math.sqrt(x))


def _oracle(nd, coords):
    pts = [coords.get(r) for r in nd]
    resolved = [p for p in pts if p is not None]
    length = 0.0
    n_seg = 0
    for a, b in zip(pts, pts[1:]):
        if a is not None and b is not None:
            length += _hav(a, b)
            n_seg += 1
    bbox = (
        (min(p[0] for p in resolved), max(p[0] for p in resolved),
         min(p[1] for p in resolved), max(p[1] for p in resolved))
        if resolved else (None, None, None, None)
    )
    return len(nd), len(resolved), n_seg, length, bbox


def test_way_geometry_vs_python_oracle(ways, nodes):
    coords = {r["id"]: (r["lat"], r["lon"]) for r in nodes.collect()}
    nd_by_way = {r["id"]: list(r["nd"]) for r in ways.collect()}
    got = {r["way_id"]: r
           for r in geometry.way_geometry(ways, nodes).collect()}
    assert set(got) == set(nd_by_way)
    n_with_segments = 0
    for wid, nd in nd_by_way.items():
        n_refs, n_res, n_seg, length, bbox = _oracle(nd, coords)
        r = got[wid]
        assert (r["n_refs"], r["n_resolved"], r["n_segments"]) == (
            n_refs, n_res, n_seg), wid
        assert abs(r["length_m"] - length) <= 1e-6 * max(length, 1.0), wid
        assert (r["min_lat"], r["max_lat"], r["min_lon"], r["max_lon"]) == bbox
        n_with_segments += n_seg > 0
    assert n_with_segments > 0          # fixture non-vacuous


def test_way_geometry_chain_break(spark):
    """A missing INTERIOR node must break the chain, not bridge it."""
    nodes = spark.createDataFrame(
        [("n1", 0.0, 0.0), ("n3", 0.0, 0.02)],
        "id string, lat double, lon double")
    ways = spark.createDataFrame(
        [("w1", ["n1", "n2", "n3"])], "id string, nd array<string>")
    r = geometry.way_geometry(ways, nodes).collect()[0]
    assert (r["n_refs"], r["n_resolved"], r["n_segments"]) == (3, 2, 0)
    assert r["length_m"] == 0.0
    # fully resolved way for contrast
    ways2 = spark.createDataFrame(
        [("w2", ["n1", "n3"])], "id string, nd array<string>")
    r2 = geometry.way_geometry(ways2, nodes).collect()[0]
    assert r2["n_segments"] == 1 and r2["length_m"] > 2000


def test_way_geometry_plan_native(ways, nodes):
    out = geometry.way_geometry(ways, nodes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_length_by_street_type(ways, nodes):
    """Composition check: group totals == python regroup of the (already
    brute-tested) per-way lengths using the engine's normalized types."""
    from osmspark.operators.audit import normalize_streets

    per_way = {r["way_id"]: r["length_m"]
               for r in geometry.way_geometry(ways, nodes).collect()}
    tagged = ways.filter(F.col("tags")["addr:street"].isNotNull()).select(
        F.col("id").alias("way_id"),
        F.col("tags")["addr:street"].alias("street"))
    types = {r["way_id"]: r["normalized_type"]
             for r in normalize_streets(tagged).collect()}
    want: dict = {}
    for wid, t in types.items():
        n, tot = want.get(t, (0, 0.0))
        want[t] = (n + 1, tot + per_way[wid])
    got = {r["normalized_type"]: (r["n_ways"], r["total_m"])
           for r in geometry.length_by_street_type(ways, nodes).collect()}
    assert set(got) == set(want)
    for t, (n, tot) in want.items():
        assert got[t][0] == n
        assert abs(got[t][1] - tot) <= 1e-6 * max(tot, 1.0)


def _pt_seg_dist_m(p, a, b, lat0):
    """Equirectangular point-to-segment distance in meters."""
    import numpy as np
    s = math.cos(math.radians(lat0)) * 6371008.8
    to_xy = lambda q: np.array([math.radians(q[1]) * s,
                                math.radians(q[0]) * 6371008.8])
    p, a, b = to_xy(p), to_xy(a), to_xy(b)
    seg = b - a
    L2 = float(seg @ seg)
    t = 0.0 if L2 == 0 else max(0.0, min(1.0, float((p - a) @ seg) / L2))
    return float(np.linalg.norm(p - (a + t * seg)))


def test_simplify_ways_guarantees(spark, nodes):
    """DP contract, checked structurally (not via a mirror implementation):
    endpoints kept, kept points are an ordered subset of the resolved run,
    and every DROPPED point is within epsilon of the simplified polyline.
    Ways are built over REAL fixture nodes (dense enough to actually drop
    points at this epsilon) with dangling refs injected mid-way."""
    eps = 200.0
    coords = {r["id"]: (r["lat"], r["lon"]) for r in nodes.collect()}
    ids = sorted(coords)
    nd_by_way = {
        "wA": ids[0:25],
        "wB": ids[25:40] + ["missing-1"] + ids[40:60],   # gap mid-way
        "wC": ["missing-2"] + ids[60:90] + ["missing-3"],
    }
    ways = spark.createDataFrame(
        [(w, nd) for w, nd in nd_by_way.items()],
        "id string, nd array<string>")
    out = {r["way_id"]: r
           for r in geometry.simplify_ways(ways, nodes, eps).collect()}
    assert set(out) == set(nd_by_way)
    checked_drops = 0
    for wid, nd in nd_by_way.items():
        pts = [coords.get(r) for r in nd]
        runs_true = []
        cur = []
        for p in pts:
            if p is None:
                if cur:
                    runs_true.append(cur)
                    cur = []
            else:
                cur.append(p)
        if cur:
            runs_true.append(cur)
        r = out[wid]
        assert r["n_points"] == sum(len(x) for x in runs_true)
        got_runs = [[(p["lat"], p["lon"]) for p in run] for run in r["runs"]]
        assert len(got_runs) == len(runs_true)
        for got, true in zip(got_runs, runs_true):
            # ordered subset with endpoints
            assert got[0] == true[0] and got[-1] == true[-1]
            it = iter(true)
            assert all(p in it for p in got)
            # epsilon guarantee for dropped points
            lat0 = sum(p[0] for p in true) / len(true)
            kept_set = set(got)
            for p in true:
                if p in kept_set:
                    continue
                d = min(_pt_seg_dist_m(p, a, b, lat0)
                        for a, b in zip(got, got[1:]))
                assert d <= eps * 1.001, (wid, p, d)
                checked_drops += 1
    assert checked_drops > 0          # epsilon actually dropped points


def test_simplify_ways_extremes(spark):
    nodes = spark.createDataFrame(
        [("n%d" % i, 0.0 + i * 1e-4, 0.0 + (i % 2) * 1e-4) for i in range(6)],
        "id string, lat double, lon double")
    ways = spark.createDataFrame(
        [("w", ["n%d" % i for i in range(6)])], "id string, nd array<string>")
    # epsilon 0 keeps every point of the zigzag
    r0 = geometry.simplify_ways(ways, nodes, 0.0).collect()[0]
    assert r0["n_kept"] == r0["n_points"] == 6
    # huge epsilon keeps only the endpoints
    r1 = geometry.simplify_ways(ways, nodes, 1e6).collect()[0]
    assert r1["n_kept"] == 2
    assert [len(run) for run in r1["runs"]] == [2]
