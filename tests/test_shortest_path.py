"""Multi-source shortest paths: way_edges exactness, Bellman-Ford
fixpoint vs an independent per-source Dijkstra oracle, cross-round
tie-breaking, unreachable handling, guards, determinism."""

from __future__ import annotations

import heapq
import math
import random

import pytest

from osmspark.operators.shortest_path import shortest_paths, way_edges


def _hav(a, b):
    (la, lo), (lb, lob) = a, b
    dlat = math.radians(lb - la) / 2
    dlon = math.radians(lob - lo) / 2
    x = (math.sin(dlat) ** 2
         + math.cos(math.radians(la)) * math.cos(math.radians(lb))
         * math.sin(dlon) ** 2)
    return 2 * 6371008.8 * math.asin(math.sqrt(x))


def test_way_edges_exact(spark):
    nodes = spark.createDataFrame(
        [("n1", 1.30, 103.80), ("n2", 1.30, 103.81), ("n3", 1.31, 103.81),
         ("n4", 1.32, 103.82)],
        "id string, lat double, lon double")
    ways = spark.createDataFrame(
        [("A", ["n1", "n2", "n3"]),
         ("B", ["n2", "missing", "n4"]),      # dangling ref breaks chain
         ("C", ["n1", "n2"])],                # duplicates A's first pair
        "id string, nd array<string>")
    got = {(r["src"], r["dst"]): r["w_m"]
           for r in way_edges(ways, nodes).collect()}
    w12 = _hav((1.30, 103.80), (1.30, 103.81))
    w23 = _hav((1.30, 103.81), (1.31, 103.81))
    exp = {("n1", "n2"): w12, ("n2", "n1"): w12,
           ("n2", "n3"): w23, ("n3", "n2"): w23}
    assert set(got) == set(exp)               # B contributed nothing
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9
    # directed variant keeps only forward edges
    fwd = {(r["src"], r["dst"]) for r in
           way_edges(ways, nodes, bidirectional=False).collect()}
    assert fwd == {("n1", "n2"), ("n2", "n3")}


def _dijkstra_oracle(edges, sources):
    """min over sources of (dist, source_label) per node — the
    lexicographic fixpoint shortest_paths settles to."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    best = {}
    for src_node, label in sources:
        dist = {src_node: 0.0}
        pq = [(0.0, src_node)]
        while pq:
            dd, u = heapq.heappop(pq)
            if dd > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                nd = dd + w
                if nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        for n, dd in dist.items():
            cur = best.get(n)
            if cur is None or (dd, label) < cur:
                best[n] = (dd, label)
    return best


def test_shortest_paths_vs_dijkstra_oracle(spark):
    rng = random.Random(13)
    n = 40
    edges = set()
    for _ in range(160):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((f"v{a}", f"v{b}", float(rng.randint(1, 9))))
    edges = sorted(edges)
    sources = [("v0", "s0"), ("v17", "s1"), ("v33", "s2")]
    e = spark.createDataFrame(edges, "src string, dst string, w_m double")
    s = spark.createDataFrame(sources, "node string, source string")
    stats = {}
    got = {r["node"]: (r["dist_m"], r["source"]) for r in
           shortest_paths(e, s, stats_out=stats).collect()}
    exp = _dijkstra_oracle(edges, sources)
    assert got == exp                 # integer weights -> exact floats
    assert stats["converged"] and stats["rounds"] >= 2
    # determinism: second run identical
    got2 = {r["node"]: (r["dist_m"], r["source"]) for r in
            shortest_paths(e, s).collect()}
    assert got2 == got


def test_tie_breaks_toward_smaller_source_across_rounds(spark):
    # source b reaches x in ONE hop at dist 2; source a reaches x in TWO
    # hops also at dist 2 (arriving a round later) — the fixpoint must
    # still settle x on the smaller label a
    e = spark.createDataFrame(
        [("a", "m", 1.0), ("m", "x", 1.0), ("b", "x", 2.0)],
        "src string, dst string, w_m double")
    s = spark.createDataFrame(
        [("a",), ("b",)], "node string")
    got = {r["node"]: (r["dist_m"], r["source"]) for r in
           shortest_paths(e, s).collect()}
    assert got["x"] == (2.0, "a")
    assert got["m"] == (1.0, "a")


def test_unreachable_absent_isolated_source_present(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "d", 1.0)],
        "src string, dst string, w_m double")
    s = spark.createDataFrame([("a",), ("z",)], "node string")
    got = {r["node"]: (r["dist_m"], r["source"]) for r in
           shortest_paths(e, s).collect()}
    # c, d unreachable -> absent; z isolated source -> present at 0
    assert got == {"a": (0.0, "a"), "b": (1.0, "a"), "z": (0.0, "z")}


def test_guards(spark):
    e = spark.createDataFrame(
        [("a", "b", -1.0)], "src string, dst string, w_m double")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(Exception, match="negative edge weight"):
        shortest_paths(e, s).collect()
    chain = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}", 1.0) for i in range(6)],
        "src string, dst string, w_m double")
    src = spark.createDataFrame([("v0",)], "node string")
    with pytest.raises(RuntimeError, match="did NOT settle"):
        shortest_paths(chain, src, max_rounds=3)
    stats = {}
    out = shortest_paths(chain, src, max_rounds=3, strict=False,
                         stats_out=stats)
    assert not stats["converged"] and out.count() == 4  # v0..v3 settled
    with pytest.raises(ValueError, match="max_rounds"):
        shortest_paths(chain, src, max_rounds=0)
