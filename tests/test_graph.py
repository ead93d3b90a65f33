"""Triangle counting + clustering coefficients: closed-form fixtures, a
DuckDB oracle on a random graph and on the real way graph, and plan shape."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from osmspark.operators.graph import clustering_coefficient, triangle_count

SCHEMA = "src string, dst string"


def _mk(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], schema=SCHEMA)


def test_closed_forms(spark):
    # K4: C(4,3) = 4 triangles, every vertex in 3, coeff 1.0
    k4 = _mk(spark, [(a, b) for a in "abcd" for b in "abcd" if a < b])
    assert triangle_count(k4).collect()[0]["n_triangles"] == 4
    pv = {r["vertex"]: r["n_triangles"]
          for r in triangle_count(k4, per_vertex=True).collect()}
    assert pv == {v: 3 for v in "abcd"}
    cc = {r["vertex"]: (r["deg"], r["n_triangles"], r["coeff"])
          for r in clustering_coefficient(k4).collect()}
    assert cc == {v: (3, 3, 1.0) for v in "abcd"}

    # square: 4 edges, no triangle; pendant vertex coeff 0
    sq = _mk(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                     ("a", "p")])
    assert triangle_count(sq).collect()[0]["n_triangles"] == 0
    cc = {r["vertex"]: r["coeff"] for r in
          clustering_coefficient(sq).collect()}
    assert cc["p"] == 0.0 and all(v == 0.0 for v in cc.values())

    # two triangles sharing edge (a,b)
    bowtie = _mk(spark, [("a", "b"), ("a", "c"), ("b", "c"),
                         ("a", "d"), ("b", "d")])
    assert triangle_count(bowtie).collect()[0]["n_triangles"] == 2
    pv = {r["vertex"]: r["n_triangles"]
          for r in triangle_count(bowtie, per_vertex=True).collect()}
    assert pv == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_duplicates_reverses_loops_collapse(spark):
    tri = _mk(spark, [("a", "b"), ("b", "a"), ("a", "b"),
                      ("b", "c"), ("c", "a"), ("a", "a")])
    assert triangle_count(tri).collect()[0]["n_triangles"] == 1


_DUCK = """
WITH ce AS (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM e WHERE src <> dst
)
SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
FROM ce e1
JOIN ce e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
JOIN ce e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""


def test_vs_duckdb_random_graph(spark):
    rng = np.random.default_rng(5)
    n, m = 120, 900
    pairs = [(f"v{int(a)}", f"v{int(b)}")
             for a, b in rng.integers(0, n, size=(m, 2))]
    e = _mk(spark, pairs)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?,?)", pairs)
    exp_tris = con.execute(_DUCK).fetchall()
    assert triangle_count(e).collect()[0]["n_triangles"] == len(exp_tris)
    # per-vertex: every triangle credits its three corners
    exp_pv = {}
    for x, y, z in exp_tris:
        for v in (x, y, z):
            exp_pv[v] = exp_pv.get(v, 0) + 1
    got_pv = {r["vertex"]: r["n_triangles"]
              for r in triangle_count(e, per_vertex=True).collect()}
    assert got_pv == exp_pv
    assert len(exp_tris) > 30  # fixture density sanity


def test_way_graph_triangles(spark, ways, nodes):
    """The real extracted road graph against the DuckDB oracle."""
    from osmspark.operators.shortest_path import way_edges

    e = way_edges(ways, nodes).select("src", "dst")
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    exp = len(con.execute(_DUCK).fetchall())
    assert triangle_count(e).collect()[0]["n_triangles"] == exp


def test_plan_shape(spark):
    e = _mk(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    plan = triangle_count(e)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan


# --- k-core ------------------------------------------------------------------

def _py_kcore(pairs, k):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def test_k_core_vs_python_oracle(spark):
    from osmspark.operators.graph import k_core

    rng = np.random.default_rng(9)
    pairs = [(f"v{int(a)}", f"v{int(b)}")
             for a, b in rng.integers(0, 80, size=(300, 2))]
    e = _mk(spark, pairs)
    for k in (2, 3, 4):
        got = {r["vertex"]: r["deg"] for r in k_core(e, k).collect()}
        assert got == _py_kcore(pairs, k), k
    assert len(_py_kcore(pairs, 3)) > 5   # fixture exercises real peeling


def test_k_core_closed_forms_and_deep_peel(spark):
    from osmspark.operators.graph import k_core

    # triangle with a tail: the 2-core is exactly the triangle
    tri_tail = _mk(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                           ("c", "d"), ("d", "e")])
    got = {r["vertex"]: r["deg"] for r in k_core(tri_tail, 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    # K4 + pendant: 3-core = K4
    k4p = _mk(spark, [(a, b) for a in "abcd" for b in "abcd" if a < b]
              + [("d", "p")])
    got = {r["vertex"]: r["deg"] for r in k_core(k4p, 3).collect()}
    assert got == {v: 3 for v in "abcd"}
    # a 24-node path peels one layer per round from each end: the 2-core
    # is empty and the loop must run ~n/2 rounds to find that out
    path = _mk(spark, [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(23)])
    assert k_core(path, 2).count() == 0
    # k=1 on an edge table is the identity vertex set
    got1 = {r["vertex"] for r in k_core(tri_tail, 1).collect()}
    assert got1 == {"a", "b", "c", "d", "e"}
    # loud non-convergence guard
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="max_iter"):
        k_core(path, 2, max_iter=3)
    with _pytest.raises(ValueError):
        k_core(path, -1)
