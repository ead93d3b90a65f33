"""Segment-segment intersection join: crafted cases, a DuckDB brute-force
oracle replicating the exact sign arithmetic (bit-exact), cover
completeness across cells, and plan shape."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from osmspark.operators.intersect import (
    segment_crossings,
    segment_intersection_join,
)

SCHEMA = "seg_id string, lat1 double, lon1 double, lat2 double, lon2 double"


def _mk(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_crafted_cases(spark):
    a = _mk(spark, [
        ("x", 1.30, 103.80, 1.30, 103.90),        # horizontal
        ("p", 1.10, 103.80, 1.10, 103.81),        # parallel near-miss
        ("t", 1.20, 103.70, 1.25, 103.70),        # touches 'v' at endpoint
    ])
    b = _mk(spark, [
        ("v", 1.25, 103.85, 1.35, 103.85),        # vertical, crosses 'x'
        ("q", 1.11, 103.80, 1.11, 103.81),        # parallel to 'p'
        ("e", 1.25, 103.60, 1.25, 103.80),        # endpoint ON 't' end
    ])
    got = {(r["a_id"], r["b_id"]): r for r in
           segment_intersection_join(a, b, include_touches=True).collect()}
    assert set(got) == {("x", "v"), ("t", "e")}
    assert got[("x", "v")]["kind"] == "proper"
    assert abs(got[("x", "v")]["int_lat"] - 1.30) < 1e-12
    assert abs(got[("x", "v")]["int_lon"] - 103.85) < 1e-12
    assert got[("t", "e")]["kind"] == "touch"
    assert got[("t", "e")]["int_lat"] is None
    # default excludes touches
    only = {(r["a_id"], r["b_id"]) for r in
            segment_intersection_join(a, b).collect()}
    assert only == {("x", "v")}


def test_asymmetric_crossing_point(spark):
    """Crossing with DIFFERENT parameters along a and b (t_a=0.2, t_b=0.25):
    distinguishes parameter-along-a from parameter-along-b — the round-5
    ADVICE bug (d3/(d3-d4), b's parameter, applied to a's endpoints, gave
    lon 103.825 here instead of the true 103.820)."""
    a = _mk(spark, [("a", 1.30, 103.80, 1.30, 103.90)])       # horizontal
    b = _mk(spark, [("b", 1.29, 103.82, 1.33, 103.82)])       # vertical
    got = segment_intersection_join(a, b).collect()
    assert len(got) == 1
    assert got[0]["kind"] == "proper"
    assert abs(got[0]["int_lat"] - 1.30) < 1e-12
    assert abs(got[0]["int_lon"] - 103.82) < 1e-12
    # and the reversed orientation (b as the a-side): t swaps roles
    got2 = segment_intersection_join(b, a).collect()
    assert abs(got2[0]["int_lat"] - 1.30) < 1e-12
    assert abs(got2[0]["int_lon"] - 103.82) < 1e-12


def test_collinear_overlap_is_touch(spark):
    a = _mk(spark, [("a", 1.0, 103.0, 1.0, 103.10)])
    b = _mk(spark, [("b", 1.0, 103.05, 1.0, 103.20),   # overlaps 'a'
                    ("c", 1.0, 103.11, 1.0, 103.20)])  # collinear, disjoint
    got = {(r["a_id"], r["b_id"]): r["kind"] for r in
           segment_intersection_join(a, b, include_touches=True).collect()}
    assert got == {("a", "b"): "touch"}


def _rand_segs(rng, n, lat0, lon0, span, max_len):
    rows = []
    for i in range(n):
        la = lat0 + rng.uniform(0, span)
        lo = lon0 + rng.uniform(0, span)
        dla = rng.uniform(-max_len, max_len)
        dlo = rng.uniform(-max_len, max_len)
        rows.append((f"s{i}", float(la), float(lo),
                     float(la + dla), float(lo + dlo)))
    return rows


_ORACLE = """
WITH pairs AS (
  SELECT a.seg_id AS a_id, b.seg_id AS b_id,
    (b.lon2-b.lon1)*(a.lat1-b.lat1) - (b.lat2-b.lat1)*(a.lon1-b.lon1) AS d1,
    (b.lon2-b.lon1)*(a.lat2-b.lat1) - (b.lat2-b.lat1)*(a.lon2-b.lon1) AS d2,
    (a.lon2-a.lon1)*(b.lat1-a.lat1) - (a.lat2-a.lat1)*(b.lon1-a.lon1) AS d3,
    (a.lon2-a.lon1)*(b.lat2-a.lat1) - (a.lat2-a.lat1)*(b.lon2-a.lon1) AS d4,
    a.lon1 AS ax1, a.lat1 AS ay1, a.lon2 AS ax2, a.lat2 AS ay2,
    b.lon1 AS bx1, b.lat1 AS by1, b.lon2 AS bx2, b.lat2 AS by2
  FROM sa a, sb b {selfcond}
)
SELECT a_id, b_id,
  CASE WHEN ((d1>0 AND d2<0) OR (d1<0 AND d2>0))
        AND ((d3>0 AND d4<0) OR (d3<0 AND d4>0)) THEN 'proper'
       WHEN (d1=0 AND ax1 BETWEEN least(bx1,bx2) AND greatest(bx1,bx2)
                  AND ay1 BETWEEN least(by1,by2) AND greatest(by1,by2))
         OR (d2=0 AND ax2 BETWEEN least(bx1,bx2) AND greatest(bx1,bx2)
                  AND ay2 BETWEEN least(by1,by2) AND greatest(by1,by2))
         OR (d3=0 AND bx1 BETWEEN least(ax1,ax2) AND greatest(ax1,ax2)
                  AND by1 BETWEEN least(ay1,ay2) AND greatest(ay1,ay2))
         OR (d4=0 AND bx2 BETWEEN least(ax1,ax2) AND greatest(ax1,ax2)
                  AND by2 BETWEEN least(ay1,ay2) AND greatest(ay1,ay2))
       THEN 'touch' END AS kind
FROM pairs WHERE kind IS NOT NULL
"""


def test_vs_duckdb_bruteforce(spark):
    """300x300 random segments (guaranteed crossings at this density) vs
    an all-pairs DuckDB oracle running the SAME sign arithmetic."""
    rng = np.random.default_rng(11)
    ra = _rand_segs(rng, 300, 1.0, 103.0, 0.25, 0.02)
    rb = _rand_segs(rng, 300, 1.0, 103.0, 0.25, 0.02)
    a, b = _mk(spark, ra), _mk(spark, rb)
    got = {(r["a_id"], r["b_id"], r["kind"]) for r in
           segment_intersection_join(a, b, include_touches=True).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE sa(seg_id VARCHAR, lat1 DOUBLE, lon1 DOUBLE,"
                " lat2 DOUBLE, lon2 DOUBLE)")
    con.execute("CREATE TABLE sb AS SELECT * FROM sa LIMIT 0")
    con.executemany("INSERT INTO sa VALUES (?,?,?,?,?)", ra)
    con.executemany("INSERT INTO sb VALUES (?,?,?,?,?)", rb)
    exp = {tuple(r) for r in
           con.execute(_ORACLE.format(selfcond="")).fetchall()}
    assert got == exp
    assert len(exp) > 50  # the fixture actually exercises both classes


def test_self_crossings_vs_duckdb(spark):
    rng = np.random.default_rng(12)
    rows = _rand_segs(rng, 400, 1.0, 103.0, 0.2, 0.02)
    segs = _mk(spark, rows)
    got = {(r["a_id"], r["b_id"]) for r in
           segment_crossings(segs, include_touches=True).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE sa(seg_id VARCHAR, lat1 DOUBLE, lon1 DOUBLE,"
                " lat2 DOUBLE, lon2 DOUBLE)")
    con.execute("CREATE TABLE sb AS SELECT * FROM sa LIMIT 0")
    con.executemany("INSERT INTO sa VALUES (?,?,?,?,?)", rows)
    con.executemany("INSERT INTO sb VALUES (?,?,?,?,?)", rows)
    exp = {(r[0], r[1]) for r in
           con.execute(_ORACLE.format(
               selfcond="WHERE a.seg_id < b.seg_id")).fetchall()}
    assert got == exp and len(exp) > 20


def test_cover_spans_many_cells(spark):
    """A long segment (many cells at res 9) still finds a short crossing
    segment near its far end — candidate completeness across the sampled
    cover, not just the home cell."""
    a = _mk(spark, [("long", 1.000, 103.000, 1.000, 103.200)])  # ~22 km
    b = _mk(spark, [("far", 0.995, 103.195, 1.005, 103.195)])
    got = segment_intersection_join(a, b, res=9).collect()
    assert [(r["a_id"], r["b_id"], r["kind"]) for r in got] \
        == [("long", "far", "proper")]


def test_guards(spark):
    # antimeridian frame
    a = _mk(spark, [("am", 0.0, 179.0, 0.0, -179.0)])
    with pytest.raises(Exception, match="180 deg"):
        segment_intersection_join(a, a).collect()
    # over-long segment for the res
    long = _mk(spark, [("xx", 0.0, 100.0, 0.0, 110.0)])
    with pytest.raises(Exception, match="max_samples"):
        segment_intersection_join(long, long, res=9).collect()


def test_plan_shape(spark):
    rng = np.random.default_rng(13)
    a = _mk(spark, _rand_segs(rng, 50, 1.0, 103.0, 0.2, 0.02))
    b = _mk(spark, _rand_segs(rng, 50, 1.0, 103.0, 0.2, 0.02))
    plan = segment_intersection_join(a, b) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    # exactly the two cover UDFs; the predicate is native
    assert plan.count("ArrowEvalPython") == 2


def test_precovered_layout_path(spark, tmp_path):
    """with_segment_cover layout column written to parquet (the
    write-once layout): identical results through the cells_col path,
    cover UDF absent from the query-time plan, wrong-res raises."""
    import pytest as _pytest
    from osmspark.operators.intersect import with_segment_cover
    from osmspark.operators.zonal import zonal_length

    rng = np.random.default_rng(17)
    ra = _rand_segs(rng, 200, 1.0, 103.0, 0.2, 0.02)
    rb = _rand_segs(rng, 200, 1.0, 103.0, 0.2, 0.02)
    a, b = _mk(spark, ra), _mk(spark, rb)
    with_segment_cover(a, res=9).write.mode("overwrite").parquet(
        str(tmp_path / "a_cov"))
    a_cov = spark.read.parquet(str(tmp_path / "a_cov"))
    plain = {(r["a_id"], r["b_id"], r["kind"]) for r in
             segment_intersection_join(a, b, include_touches=True).collect()}
    layout = {(r["a_id"], r["b_id"], r["kind"]) for r in
              segment_intersection_join(
                  a_cov, b, include_touches=True,
                  a_cells_col="seg_cells").collect()}
    assert plain == layout and len(plain) > 10
    # the a-side cover UDF is gone: only ONE ArrowEvalPython remains
    plan = segment_intersection_join(
        a_cov, b, a_cells_col="seg_cells") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    # both sides pre-covered -> zero Python in the query-time plan
    with_segment_cover(b, res=9).write.mode("overwrite").parquet(
        str(tmp_path / "b_cov"))
    b_cov = spark.read.parquet(str(tmp_path / "b_cov"))
    plan2 = segment_intersection_join(
        a_cov, b_cov, a_cells_col="seg_cells", b_cells_col="seg_cells") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan2
    both = {(r["a_id"], r["b_id"], r["kind"]) for r in
            segment_intersection_join(
                a_cov, b_cov, include_touches=True,
                a_cells_col="seg_cells", b_cells_col="seg_cells").collect()}
    assert both == plain
    # wrong res raises loudly instead of silently matching nothing
    with _pytest.raises(ValueError, match="res="):
        segment_intersection_join(a_cov, b, res=8,
                                  a_cells_col="seg_cells")
    # zonal_length accepts the same layout column
    polys = spark.createDataFrame(
        [("box", "admin",
          [{"lat": la, "lon": lo} for la, lo in
           [(1.0, 103.0), (1.0, 103.2), (1.2, 103.2), (1.2, 103.0),
            (1.0, 103.0)]], None)],
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string")
    zl_plain = {(r["seg_id"], r["poly_id"]): r["len_in_m"] for r in
                zonal_length(a, polys, res=9, pairs=True).collect()}
    zl_layout = {(r["seg_id"], r["poly_id"]): r["len_in_m"] for r in
                 zonal_length(a_cov, polys, res=9, pairs=True,
                              seg_cells_col="seg_cells").collect()}
    assert zl_plain == zl_layout and len(zl_plain) > 0
