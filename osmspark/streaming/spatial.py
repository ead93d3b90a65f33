"""Streaming geospatial rollups — the spatial tier under Structured
Streaming (SURVEY B2/B6 x §2.3): a stream of timestamped points gets its
hex cell assigned by the SAME staged native expressions as the batch path
(stateless projections stream as-is), then rolls up into watermarked
tumbling-window per-cell counts — the shape of a live density-tile feed.

The reference is strictly batch; this is the engine-capability surface a
10^12-doc pipeline uses for incremental tile refresh: per micro-batch the
only state is the windowed aggregate (bounded by the watermark), and the
cell assignment adds no Python and no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hexgrid import with_hex_cell


def streaming_cell_counts(
    points: DataFrame,
    res: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(window_start, cell, cnt) — watermarked tumbling-window counts per
    hex cell over a streaming (or batch: same plan) points DataFrame."""
    cells = with_hex_cell(points, res, lat=lat, lon=lon, out_col="cell")
    return (
        cells.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "cell")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cell", "cnt")
    )


def streaming_tile_counts(
    points: DataFrame,
    zoom: int = 12,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(window_start, tile_x, tile_y, cnt) — Web-Mercator tile analogue of
    streaming_cell_counts; REUSES the batch tile assignment
    (operators.tiles.with_tile — same native mercator expressions, so the
    streaming and batch tile ids can never diverge)."""
    from ..operators.tiles import with_tile

    tiles = with_tile(points, zoom, lat=lat, lon=lon).select(
        F.col(ts_col), "tile_x", "tile_y"
    )
    return (
        tiles.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "tile_x", "tile_y")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "tile_x", "tile_y",
                "cnt")
    )


def streaming_geofence(
    points: DataFrame,
    polys: DataFrame,
    res: int = 8,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Streaming spatial join (geofence alerts): a stream of points joined
    against a STATIC polygon dim.

    The batch two-phase join streams AS-IS: cell assignment is a
    stateless native projection, the cover candidate join is a
    stream-static broadcast equi-join (no streaming state), and the
    ray-cast refine is a stateless Arrow-batched filter — so the stream
    emits exactly the rows the batch join would produce for the same
    input (equivalence-tested), including split hemisphere/polar rings.
    One output row per (point, containing polygon)."""
    from ..operators.spatial_join import spatial_join

    return spatial_join(points, polys, res=res, lat=lat, lon=lon)


def streaming_geofence_counts(
    points: DataFrame,
    polys: DataFrame,
    res: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """(window_start, poly_id, cnt) — watermarked tumbling-window entry
    counts per geofence polygon; the live occupancy feed a dispatch /
    alerting pipeline reads.  State is bounded by the watermark; the join
    itself is stateless (see streaming_geofence)."""
    hits = streaming_geofence(points, polys, res=res, lat=lat, lon=lon)
    return (
        hits.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "poly_id")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "poly_id", "cnt")
    )
