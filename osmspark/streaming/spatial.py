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


def streaming_radius_alerts(
    points: DataFrame,
    queries: DataFrame,
    radius: float,
    metric: str = "haversine",
    res: int | None = None,
    point_id: str = "id",
    lat: str = "lat",
    lon: str = "lon",
    carry_cols: tuple = (),
) -> DataFrame:
    """Streaming within-distance join (proximity alerts): a stream of
    points matched against a STATIC query-site table (store locations,
    sensors, geofence centers) — one row per (site, point) within
    `radius`.

    The batch B5b operator streams with ONE adaptation: the STREAM side
    only gets the stateless native cell projection, and all the Python
    (local-scale measurement + disk-cell generation) runs on the small
    STATIC side — which is MATERIALIZED eagerly (localCheckpoint) before
    the join, because a stream-static join whose static subplan still
    contains Arrow UDF nodes deadlocks the micro-batch (observed; the
    checkpointed frame is plain rows and joins fine).  The join itself
    is a stream-static inner equi-join — no streaming state at all.
    Emits exactly the batch join's rows for the same input
    (equivalence-tested)."""
    from ..operators.radius_join import query_disk_cells, within_distance_join

    # rename PER AXIS: the old both-or-nothing drop broke the mixed case
    # (lat='lat', lon='lng' dropped the real lat column), and silently
    # discarding a pre-existing default-named column would hand the join
    # wrong coordinates — raise instead and let the caller disambiguate
    pts = points
    for axis, name in (("lat", lat), ("lon", lon)):
        if name == axis:
            continue
        if axis in pts.columns:
            raise ValueError(
                f"points has a {axis!r} column but {axis} data was mapped "
                f"from {name!r} — drop or rename the conflicting column")
        pts = pts.withColumnRenamed(name, axis)
    q, used_res = query_disk_cells(queries, radius, metric=metric, res=res)
    q = q.localCheckpoint(eager=True)
    return within_distance_join(
        pts, queries, radius, metric=metric, res=used_res,
        point_id=point_id, carry_cols=carry_cols, _prepared=(q, used_res))


def streaming_radius_counts(
    points: DataFrame,
    queries: DataFrame,
    radius: float,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    point_id: str = "id",
    **kwargs,
) -> DataFrame:
    """(window_start, query_id, cnt) — watermarked tumbling-window counts
    of points entering each site's radius; the live proximity-occupancy
    feed.  The join is stateless (streaming_radius_alerts); only the
    windowed aggregate holds state, bounded by the watermark.

    The timestamp rides THROUGH the join as a carried point-side column
    (radius_join's carry_cols) — no stream-stream re-join, so the only
    stateful node in the plan is the watermarked aggregate."""
    extra_carry = tuple(kwargs.pop("carry_cols", ()))
    hits = streaming_radius_alerts(points, queries, radius,
                                   point_id=point_id,
                                   carry_cols=(ts_col,) + extra_carry,
                                   **kwargs)
    return (
        hits.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "query_id")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "query_id", "cnt")
    )
