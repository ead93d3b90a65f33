"""Zonal statistics: two-phase (interior cells skip the refine) equality
vs the one-phase spatial_join + groupBy form, plus the scale-shape
assertion that the interior shortcut actually fires."""

import pytest
from pyspark.sql import functions as F

from osmspark.operators import spatial_join as sj
from osmspark.operators.zonal import zonal_stats, _covers_and_rings


def _rows(df):
    return {
        r["poly_id"]: tuple(
            round(v, 9) if isinstance(v, float) else v
            for v in r[1:]
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def valued_nodes(nodes):
    # deterministic value with nulls: every 7th node's value is NULL
    v = nodes.select(
        "id", "lat", "lon",
        F.when(F.pmod(F.xxhash64("id"), F.lit(7)) != 0,
               F.col("lat") * 3.0 + F.col("lon")).alias("val"),
    ).cache()
    v.count()
    return v


def test_zonal_equals_spatial_join_agg(valued_nodes, polygons):
    """The headline contract: zonal_stats == spatial_join -> groupBy, for
    every statistic, on the full generated polygon dim (which includes
    boundary-heavy small rings)."""
    got = _rows(zonal_stats(valued_nodes, polygons, value_col="val", res=7))
    exp_df = (
        sj.spatial_join(valued_nodes, polygons, res=7)
        .groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("val").alias("n_values"),
            F.sum("val").alias("sum_v"),
            F.min("val").alias("min_v"),
            F.max("val").alias("max_v"),
            (F.sum("val") / F.count("val")).alias("mean_v"),
        )
    )
    exp = _rows(exp_df)
    assert set(got) == set(exp)
    for pid in exp:
        assert got[pid] == exp[pid], pid


def test_zonal_count_only(valued_nodes, polygons):
    got = _rows(zonal_stats(valued_nodes, polygons, res=7))
    exp = _rows(
        sj.spatial_join(valued_nodes, polygons, res=7)
        .groupBy("poly_id").agg(F.count(F.lit(1)).alias("n_points"))
    )
    assert got == exp


def test_zonal_interior_shortcut_fires(valued_nodes, polygons, spark):
    """Scale shape: on a large polygon, a real fraction of cover cells is
    certified interior, and the refine leg sees only boundary-cell points
    (strictly fewer than the polygon's total points)."""
    big = polygons.filter(F.col("poly_id") == "admin_0")
    if big.count() == 0:  # fall back to the first polygon
        big = polygons.limit(1)
    covers, _ = _covers_and_rings(big, 8)
    n_int = sum(1 for _, _, i in covers if i)
    n_bnd = sum(1 for _, _, i in covers if not i)
    assert n_int > 0, "no interior cells certified on the largest polygon"
    assert n_bnd > 0
    # refine-leg row count < polygon point count (interior points skipped)
    from osmspark.functions import hexgrid
    pts = hexgrid.with_hex_cell(valued_nodes, 8, out_col="__c")
    cov = spark.createDataFrame(
        covers, "poly_id string, cell long, interior boolean")
    in_poly = sj.spatial_join(valued_nodes, big, res=8).count()
    refine_rows = pts.join(
        cov.filter(~F.col("interior")), pts["__c"] == cov["cell"]).count()
    if in_poly > 0:
        assert refine_rows < in_poly


def test_zonal_null_values_and_empty_polygon(spark, valued_nodes):
    """All-null value column -> n_values 0, null sum/mean; a polygon with
    no points emits no row (inner-join semantics, documented)."""
    polys = spark.createDataFrame(
        [("hit", "admin",
          [{"lat": la, "lon": lo} for la, lo in
           [(1.0, 103.0), (1.0, 104.5), (1.9, 104.5), (1.9, 103.0),
            (1.0, 103.0)]], None),
         ("empty", "admin",
          [{"lat": la, "lon": lo} for la, lo in
           [(60.0, 10.0), (60.0, 10.1), (60.1, 10.1), (60.1, 10.0),
            (60.0, 10.0)]], None)],
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string",
    )
    nulled = valued_nodes.withColumn("val", F.lit(None).cast("double"))
    out = {r["poly_id"]: r for r in
           zonal_stats(nulled, polys, value_col="val", res=7).collect()}
    assert "empty" not in out
    if "hit" in out:
        r = out["hit"]
        assert r["n_values"] == 0
        assert r["sum_v"] is None and r["mean_v"] is None


def test_zonal_plan_shape(valued_nodes, polygons):
    """No cartesian; broadcast cover joins; Python only in the boundary
    refine (exactly one ArrowEvalPython per branch that needs it)."""
    plan = zonal_stats(valued_nodes, polygons, value_col="val", res=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan
    # interior branch must NOT evaluate Python: count ArrowEvalPython ==
    # count of refine legs (1)
    assert plan.count("ArrowEvalPython") == 1
