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
