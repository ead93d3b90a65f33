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


# ---------------------------------------------------------------------------
# isochrone_cells — composition of shortest_paths + hex lattice
# ---------------------------------------------------------------------------
def _iso_fixture(spark, n=9, seed=4):
    """n x n lattice road grid around Singapore with random weights-by-
    geometry (coords drive the haversine weights), plus one off-grid
    unreachable node."""
    from osmspark.operators.shortest_path import way_edges

    rng = random.Random(seed)
    coords = {}
    for i in range(n):
        for j in range(n):
            coords[f"n{i}_{j}"] = (1.29 + 0.004 * i + rng.uniform(0, 1e-4),
                                   103.78 + 0.004 * j + rng.uniform(0, 1e-4))
    coords["island"] = (1.5, 104.2)
    nodes = spark.createDataFrame(
        [(k, la, lo) for k, (la, lo) in sorted(coords.items())],
        "id string, lat double, lon double")
    wid = 0
    rows = []
    for i in range(n):
        for j in range(n):
            if j + 1 < n:
                rows.append((f"w{wid}", [f"n{i}_{j}", f"n{i}_{j+1}"]))
                wid += 1
            if i + 1 < n:
                rows.append((f"w{wid}", [f"n{i}_{j}", f"n{i+1}_{j}"]))
                wid += 1
    ways = spark.createDataFrame(rows, "id string, nd array<string>")
    return nodes, ways, way_edges(ways, nodes), coords


def _iso_oracle(spark, edges_df, nodes_df, sources, bands, res,
                by_source=False):
    """Python Dijkstra + the ENGINE's own (independently golden/property
    -tested) node->cell mapping, then min-per-cell banding in python."""
    from osmspark.functions.hexgrid import with_hex_cell

    best = _dijkstra_oracle(
        [(r["src"], r["dst"], r["w_m"]) for r in edges_df.collect()],
        sources)
    cell_of = {r["id"]: r["cell"] for r in
               with_hex_cell(nodes_df, res, out_col="cell").collect()}
    per = {}
    for node, (dd, label) in best.items():
        if dd > bands[-1] or node not in cell_of:
            continue
        key = (label, cell_of[node]) if by_source else (cell_of[node],)
        cur = per.get(key)
        per[key] = (min(cur[0], dd) if cur else dd,
                    (cur[1] if cur else 0) + 1)
    out = {}
    for key, (md, cnt) in per.items():
        band = next(b for b in bands if md <= b)
        out[key] = (band, md, cnt)
    return out


def test_isochrone_vs_oracle(spark):
    from osmspark.operators.shortest_path import isochrone_cells

    nodes, ways, edges, coords = _iso_fixture(spark)
    srcs = [("n0_0", "A"), ("n8_8", "B")]
    sources = spark.createDataFrame(srcs, "node string, source string")
    bands = [400.0, 900.0, 1600.0]
    got = {(r["cell"],): (r["band_m"], r["min_dist_m"], r["n_nodes"])
           for r in isochrone_cells(edges, nodes, sources, bands,
                                    res=9).collect()}
    want = _iso_oracle(spark, edges, nodes, srcs, bands, res=9)
    assert set(got) == set(want)
    for k, (band, md, cnt) in want.items():
        gb, gm, gc = got[k]
        assert gb == band and gc == cnt and abs(gm - md) < 1e-9
    # the island node is unreachable: its cell must be absent
    from osmspark.functions.hexgrid import with_hex_cell
    island_cell = with_hex_cell(
        nodes.where("id = 'island'"), 9, out_col="cell").first()["cell"]
    assert (island_cell,) not in got


def test_isochrone_by_source_is_network_voronoi(spark):
    from osmspark.operators.shortest_path import isochrone_cells

    nodes, ways, edges, coords = _iso_fixture(spark)
    srcs = [("n0_0", "A"), ("n8_8", "B")]
    sources = spark.createDataFrame(srcs, "node string, source string")
    bands = [500.0, 2000.0]
    got = {(r["source"], r["cell"]): (r["band_m"], r["min_dist_m"],
                                      r["n_nodes"])
           for r in isochrone_cells(edges, nodes, sources, bands, res=9,
                                    by_source=True).collect()}
    want = _iso_oracle(spark, edges, nodes, srcs, bands, res=9,
                       by_source=True)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0] and got[k][2] == want[k][2]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_isochrone_band_boundary_inclusive(spark):
    """A node EXACTLY on a band boundary belongs to that band, and
    beyond-last-band cells are absent."""
    from osmspark.operators.shortest_path import isochrone_cells

    # two nodes, one edge; pick the band equal to the true edge weight
    nodes = spark.createDataFrame(
        [("a", 1.30, 103.80), ("b", 1.30, 103.81), ("c", 1.30, 103.83)],
        "id string, lat double, lon double")
    ways = spark.createDataFrame([("w", ["a", "b", "c"])],
                                 "id string, nd array<string>")
    from osmspark.operators.shortest_path import way_edges
    edges = way_edges(ways, nodes)
    w_ab = {(r["src"], r["dst"]): r["w_m"]
            for r in edges.collect()}[("a", "b")]
    sources = spark.createDataFrame([("a",)], "node string")
    out = {r["cell"]: r for r in isochrone_cells(
        edges, nodes, sources, [w_ab], res=9).collect()}
    # a (dist 0) and b (dist == band, inclusive) are in; c is beyond
    from osmspark.functions.hexgrid import with_hex_cell
    cells = {r["id"]: r["cell"] for r in
             with_hex_cell(nodes, 9, out_col="cell").collect()}
    assert cells["a"] in out and cells["b"] in out
    assert cells["c"] not in out
    assert out[cells["b"]]["band_m"] == w_ab


def test_isochrone_guards(spark):
    from osmspark.operators.shortest_path import isochrone_cells

    nodes = spark.createDataFrame([("a", 1.0, 103.0)],
                                  "id string, lat double, lon double")
    edges = spark.createDataFrame([("a", "a", 1.0)],
                                  "src string, dst string, w_m double")
    sources = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="at least one band"):
        isochrone_cells(edges, nodes, sources, [], res=9)
    with pytest.raises(ValueError, match="strictly increasing"):
        isochrone_cells(edges, nodes, sources, [500.0, 500.0], res=9)
    with pytest.raises(ValueError, match="strictly increasing"):
        isochrone_cells(edges, nodes, sources, [500.0, -1.0], res=9)


def test_isochrone_native_post_fixpoint_plan(spark):
    """Everything downstream of the settled distances is JVM-native:
    no Python eval nodes in the final plan (the hex assignment is the
    staged native path)."""
    from osmspark.operators.shortest_path import isochrone_cells

    nodes, ways, edges, coords = _iso_fixture(spark, n=4)
    sources = spark.createDataFrame([("n0_0",)], "node string")
    df = isochrone_cells(edges, nodes, sources, [2000.0], res=9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
