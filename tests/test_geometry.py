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
