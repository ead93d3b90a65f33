"""B6 — raster tile rendering (SURVEY §2.2).

Two layers:
  * `with_tile` / `tile_counts`: Web-Mercator (z/x/y) tile assignment and
    per-tile density — pure native expressions (whole-stage codegen), the
    scale path for 10^12 points: one shuffle keyed by tile.
  * `render_density_tiles`: per-tile PX*PX rasters via groupBy(tile) ->
    applyInPandas (numpy histogram2d per group) — the B6 mapInPandas-style
    custom operator; output rows (z, tile_x, tile_y, raster array<int>)
    with deterministic binning so rasters are hash-comparable.

An integer-grid variant (`int_tile`) bins by exact integer arithmetic —
used for the DuckDB-oracle query (bit-identical across engines).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mercator_xy(lat, lon):
    """lat/lon Columns -> (mx, my) in [0,1)^2 Web-Mercator."""
    mx = (lon + F.lit(180.0)) / F.lit(360.0)
    lat_r = F.radians(lat)
    my = (
        F.lit(0.5)
        - F.log(F.tan(F.lit(math.pi / 4) + lat_r / F.lit(2.0))) / F.lit(2 * math.pi)
    )
    return mx, my


def with_tile(df: DataFrame, zoom: int, lat="lat", lon="lon") -> DataFrame:
    """Adds tile_x/tile_y (Web-Mercator z/x/y scheme), native expressions."""
    n = F.lit(float(1 << zoom))
    mx, my = mercator_xy(F.col(lat), F.col(lon))
    return df.withColumn(
        "tile_x", F.least(F.floor(mx * n), F.lit((1 << zoom) - 1)).cast("int")
    ).withColumn(
        "tile_y", F.least(F.floor(my * n), F.lit((1 << zoom) - 1)).cast("int")
    )


def tile_counts(points: DataFrame, zoom: int, lat="lat", lon="lon") -> DataFrame:
    return (
        with_tile(points, zoom, lat, lon)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("cnt"))
    )


def render_density_tiles(
    points: DataFrame, zoom: int, px: int = 64, lat="lat", lon="lon"
) -> DataFrame:
    """(zoom, tile_x, tile_y, raster) — raster is a row-major px*px count
    grid.  One shuffle keyed by tile; each group rasterizes in numpy."""
    n = F.lit(float(1 << zoom))
    mx, my = mercator_xy(F.col(lat), F.col(lon))
    prepared = (
        with_tile(points, zoom, lat, lon)
        .withColumn("fx", mx * n - F.col("tile_x"))  # [0,1) within tile
        .withColumn("fy", my * n - F.col("tile_y"))
        .select("tile_x", "tile_y", "fx", "fy")
    )

    def rasterize(pdf: pd.DataFrame) -> pd.DataFrame:
        h, _, _ = np.histogram2d(
            pdf["fy"].to_numpy(),
            pdf["fx"].to_numpy(),
            bins=px,
            range=[[0.0, 1.0], [0.0, 1.0]],
        )
        return pd.DataFrame(
            {
                "zoom": [zoom],
                "tile_x": [int(pdf["tile_x"].iloc[0])],
                "tile_y": [int(pdf["tile_y"].iloc[0])],
                "raster": [h.astype(np.int64).ravel()],
            }
        )

    return prepared.groupBy("tile_x", "tile_y").applyInPandas(
        rasterize,
        schema="zoom int, tile_x int, tile_y int, raster array<long>",
    )


def raster_from_counts(points: DataFrame, zoom: int, px: int = 64,
                       lat="lat", lon="lon") -> DataFrame:
    """Pure-native equivalent of render_density_tiles: pixel binning +
    groupBy + ordered sparse assembly.  Same (tile, raster) content for
    cross-checking the applyInPandas path, expressed without any Python."""
    n = F.lit(float(1 << zoom))
    mx, my = mercator_xy(F.col(lat), F.col(lon))
    pxl = F.least(F.floor((mx * n - F.col("tile_x")) * px), F.lit(px - 1)).cast("int")
    pyl = F.least(F.floor((my * n - F.col("tile_y")) * px), F.lit(px - 1)).cast("int")
    sparse = (
        with_tile(points, zoom, lat, lon)
        .withColumn("pix", pyl * px + pxl)
        .groupBy("tile_x", "tile_y", "pix")
        .agg(F.count("*").alias("cnt"))
    )
    # dense row-major assembly: scatter sparse (pix, cnt) into a px*px array
    return (
        sparse.groupBy("tile_x", "tile_y")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("pix"), F.col("cnt")))
            ).alias("m")
        )
        .select(
            F.lit(zoom).alias("zoom"),
            "tile_x",
            "tile_y",
            F.transform(
                F.sequence(F.lit(0), F.lit(px * px - 1)),
                lambda i: F.coalesce(F.element_at("m", i), F.lit(0)),
            ).alias("raster"),
        )
    )


def int_tile_counts(points: DataFrame, cell_deg_u: int = 4000,
                    lat_u="lat_u", lon_u="lon_u") -> DataFrame:
    """Oracle-exact integer tiling: inputs are integer 1e-5-degree units;
    tile = integer division — reproducible verbatim in ANSI SQL."""
    return (
        points.withColumn("tile_x", F.floor(F.col(lon_u) / F.lit(float(cell_deg_u))).cast("long"))
        .withColumn("tile_y", F.floor(F.col(lat_u) / F.lit(float(cell_deg_u))).cast("long"))
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("cnt"))
    )
