"""Zonal statistics — per-polygon aggregates of a point corpus, two-phase.

The classic raster/GIS "zonal stats" reshaped for a 100 TB point table:
the answer per polygon is (n_points, and optionally sum/min/max/mean of a
value column), but the naive shape — PIP-join every point, then aggregate
— ray-casts the FULL corpus even though almost all of a large polygon's
mass sits far from its boundary.

Two-phase shape (the reason this is its own operator and not
`spatial_join(...).groupBy(...)`):

1. ONE corpus-wide `groupBy(cell)` pre-aggregate (map-side combinable; the
   only shuffle that scales with points — output is |occupied cells| rows).
2. Cover cells certified **fully interior** to a polygon
   (`spatial_join._cover_pieces_flagged` — center inside AND clear of every
   edge by 2*circumradius + chord-sagitta slack, the round-2-audited
   certificate) credit their *cell aggregate* to the polygon directly: no
   per-point refine, no per-point join fan-out.
3. Only points whose cell is a **boundary** cover cell (a
   perimeter-fraction of the corpus: area/perimeter wins ~linearly with
   polygon size) join candidates and go through the exact grouped
   ray-cast refine (`spatial_join._grouped_pip` — the same kernel the PIP
   join uses, so zonal membership IS spatial-join membership, by
   construction).

Inner-join semantics like `spatial_join`: a polygon containing no points
produces no row.  Boundary points resolve by the engine's crossing-number
convention.  Geometry domain matches `spatial_join` (ordinary /
antimeridian / pole-encircling rings via split_ring).

Scale notes: the polygon dim is broadcastable by contract (same as
`spatial_join`; `prepare` covers are a few-thousand-row frame).  The
phase-1 aggregate is the dominant cost and is exactly the `groupBy(cell)`
any tile/rollup pass already pays — callers holding a cell-aggregated
layout (plans/layout.py) can pass `cells` directly and skip the scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import hexgrid
from .spatial_join import (
    DEFAULT_COVER_RES,
    _cover_pieces_flagged,
    _grouped_pip,
    split_ring,
)


def _covers_and_rings(polys: DataFrame, res: int):
    """Driver-side: [(poly_id, cell, interior)] + {poly_id: ring pieces}.
    split_ring runs ONCE per polygon and feeds both cover and refine
    (spatial_join's round-4 convention)."""
    prows = polys.select("poly_id", "ring").collect()
    rings_by_id = {
        r["poly_id"]: split_ring(
            np.array([p["lat"] for p in r["ring"]], dtype=np.float64),
            np.array([p["lon"] for p in r["ring"]], dtype=np.float64),
        )
        for r in prows
    }
    covers = []
    for r in prows:
        cells, interior = _cover_pieces_flagged(rings_by_id[r["poly_id"]], res)
        covers.extend(
            (r["poly_id"], int(c), bool(i)) for c, i in zip(cells, interior)
        )
    return covers, rings_by_id


def zonal_stats(
    points: DataFrame,
    polys: DataFrame,
    value_col: str | None = None,
    res: int = DEFAULT_COVER_RES,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-polygon point statistics: (poly_id, n_points[, n_values, sum_v,
    min_v, max_v, mean_v]).

    `points` needs (lat, lon[, value_col]); `polys` needs (poly_id, ring)
    in the engine's polygon-dim schema.  With `value_col`: `n_values`
    counts non-null values, `sum_v`/`min_v`/`max_v` ignore nulls (SQL
    semantics), `mean_v = sum_v / n_values` (null when all values null).
    Membership is exactly `spatial_join` membership (equality-tested)."""
    spark = points.sparkSession
    covers, rings_by_id = _covers_and_rings(polys, res)
    cover_df = F.broadcast(spark.createDataFrame(
        covers, "poly_id string, cell long, interior boolean"
    ))
    bc = spark.sparkContext.broadcast(rings_by_id)

    cell = "__z_cell"
    if value_col is None:
        pts = hexgrid.with_hex_cell(points, res, lat=lat, lon=lon,
                                    out_col=cell).select(
            lat, lon, cell, F.lit(1.0).alias("__v"))
        has_v = False
    else:
        pts = hexgrid.with_hex_cell(points, res, lat=lat, lon=lon,
                                    out_col=cell).select(
            lat, lon, cell,
            F.col(value_col).cast("double").alias("__v"))
        has_v = True

    # phase 1: the ONLY corpus-wide pass — cell grain, map-side combinable
    cell_agg = pts.groupBy(cell).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("__v").alias("nv"),
        F.sum("__v").alias("s"),
        F.min("__v").alias("mn"),
        F.max("__v").alias("mx"),
    )

    # phase 2a: interior cover cells take the cell aggregate wholesale
    interior_part = cell_agg.join(
        cover_df.filter(F.col("interior")),
        cell_agg[cell] == cover_df["cell"], "inner",
    ).select("poly_id", "n", "nv", "s", "mn", "mx")

    # phase 2b: boundary cover cells — per-point exact refine, then the
    # same partial-aggregate shape
    @F.pandas_udf(T.BooleanType())
    def refine(plat: pd.Series, plon: pd.Series, pid: pd.Series) -> pd.Series:
        return pd.Series(_grouped_pip(
            plat.to_numpy(), plon.to_numpy(), pid.to_numpy(), bc.value))

    boundary = pts.join(
        cover_df.filter(~F.col("interior")),
        pts[cell] == cover_df["cell"], "inner",
    ).filter(refine(F.col(lat), F.col(lon), F.col("poly_id")))
    boundary_part = boundary.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("__v").alias("nv"),
        F.sum("__v").alias("s"),
        F.min("__v").alias("mn"),
        F.max("__v").alias("mx"),
    )

    merged = interior_part.unionByName(boundary_part).groupBy("poly_id").agg(
        F.sum("n").alias("n_points"),
        F.sum("nv").alias("__nv"),
        F.sum("s").alias("__s"),
        F.min("mn").alias("__mn"),
        F.max("mx").alias("__mx"),
    )
    if not has_v:
        return merged.select("poly_id", "n_points")
    return merged.select(
        "poly_id", "n_points",
        F.col("__nv").alias("n_values"),
        F.col("__s").alias("sum_v"),
        F.col("__mn").alias("min_v"),
        F.col("__mx").alias("max_v"),
        F.when(F.col("__nv") > 0, F.col("__s") / F.col("__nv"))
         .alias("mean_v"),
    )
