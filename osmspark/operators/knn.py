"""B5 — kNN via hex k-ring expansion (SURVEY §2.2).

Queries (small side, collected driver-side) are expanded to their k-ring
cells; the candidate set is an equi-join on cell against the distributed
points table; ranking is a window top-k.  Under-filled queries expand the
ring geometrically and retry — an iterative DataFrame loop whose per-round
cost is one broadcast hash join on the big side.

Termination guarantee: for a hex lattice with circumradius R (center-to-
vertex), every point within distance 1.5*R*r - R of the query center lies
inside kring(r).  R in meters is measured per query from its actual ring-1
neighbor spacing (local gnomonic scale), so the bound holds at face edges
too.  A query is done when its k-th candidate distance <= that bound (or
the points table is exhausted).

`knn_bruteforce` is the O(P*Q) reference path (crossJoin + window) — used
as the oracle and for tiny point sets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hexgrid
from ..functions.geo import haversine_m, haversine_np, sq_deg_dist

MAX_QUERIES = 100_000


def _dist_col(metric: str, qlat, qlon, plat, plon):
    if metric == "haversine":
        return haversine_m(qlat, qlon, plat, plon)
    if metric == "sq_deg":
        return sq_deg_dist(qlat, qlon, plat, plon)
    raise ValueError(metric)


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "haversine",
    point_id: str = "id",
) -> DataFrame:
    """(query_id, rank, point_id, dist) — exact top-k by crossJoin.

    The broadcast side is the queries; the points side streams through one
    pass; ranking is a window partitioned by query (TakeOrdered per group).
    Ties break on point id for determinism."""
    q = queries.select(
        F.col("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    )
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
    )
    joined = p.crossJoin(F.broadcast(q)).withColumn(
        "dist",
        _dist_col(metric, F.col("qlat"), F.col("qlon"), F.col("plat"), F.col("plon")),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("point_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "point_id", "dist")
    )


def knn_kring(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 8,
    metric: str = "haversine",
    point_id: str = "id",
    start_ring: int = 1,
    max_rounds: int = 14,
    max_ring: int = 64,
) -> DataFrame:
    """k-ring kNN: equivalent to knn_bruteforce, without the crossJoin.

    points: distributed (point_id, lat, lon, ...); queries: small
    (query_id, lat, lon).

    Fully distributed result path (round-1 VERDICT item 5): each round's
    per-query top-k stays in a localCheckpoint'ed DataFrame; the driver
    collects ONLY (query_id, kth_dist, n_cand) for the still-active set —
    O(active) scalars, never the q*k result rows.  Finished queries'
    top-k rows are kept as DataFrames and lazily unioned at the end, so
    the result never round-trips through the driver."""
    from functools import reduce

    spark = points.sparkSession
    qrows = queries.select("query_id", "lat", "lon").collect()
    if len(qrows) > MAX_QUERIES:
        raise ValueError("query side too large; use knn_bruteforce or batch")
    qid = np.array([r["query_id"] for r in qrows])
    qlat = np.array([r["lat"] for r in qrows], dtype=np.float64)
    qlon = np.array([r["lon"] for r in qrows], dtype=np.float64)
    qcell = hexgrid.latlon_to_cell(qlat, qlon, res)
    qindex = {q: i for i, q in enumerate(qid.tolist())}

    # local circumradius per query, measured from ring-1 neighbor spacing:
    # spacing s = sqrt(3)*R  =>  R = s/sqrt(3)
    ring1 = hexgrid.kring(qcell, 1)  # (n, 7), col 0 == self
    c_lat, c_lon = hexgrid.cell_center_latlon(ring1.ravel())
    c_lat = c_lat.reshape(ring1.shape)
    c_lon = c_lon.reshape(ring1.shape)
    spacing = haversine_np(
        np.repeat(c_lat[:, :1], 6, axis=1),
        np.repeat(c_lon[:, :1], 6, axis=1),
        c_lat[:, 1:],
        c_lon[:, 1:],
    ).min(axis=1)
    radius_m = spacing / np.sqrt(3.0)

    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
    )
    p = p.withColumn("pcell", hexgrid.hex_cell_udf(res)(F.col("plat"), F.col("plon")))
    # cell assignment is reused every expansion round — materialize it once
    p = p.persist()

    # dist -> conservative meters for the coverage-guarantee comparison
    if metric == "sq_deg":
        def to_m(dist_col):
            return F.sqrt(dist_col) * F.lit(111_320.0)
    else:
        def to_m(dist_col):
            return dist_col

    active = np.ones(len(qid), dtype=bool)
    result_dfs: list[DataFrame] = []
    ring = start_ring
    for _ in range(max_rounds):
        if not active.any():
            break
        cells = hexgrid.kring(qcell[active], ring)
        ids = np.repeat(qid[active], cells.shape[1])
        lats = np.repeat(qlat[active], cells.shape[1])
        lons = np.repeat(qlon[active], cells.shape[1])
        # per-query coverage bound for THIS ring (meters)
        covered = np.repeat(
            1.5 * radius_m[active] * ring - radius_m[active], cells.shape[1]
        )
        cand_cells = spark.createDataFrame(
            list(
                zip(
                    ids.tolist(),
                    lats.tolist(),
                    lons.tolist(),
                    covered.tolist(),
                    cells.ravel().tolist(),
                )
            ),
            schema="query_id string, qlat double, qlon double, "
                   "covered_m double, pcell long",
        )
        joined = p.join(F.broadcast(cand_cells), "pcell").withColumn(
            "dist",
            _dist_col(
                metric, F.col("qlat"), F.col("qlon"), F.col("plat"), F.col("plon")
            ),
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("point_id"))
        # materialize this round's top-k ONCE (q*k rows, distributed);
        # both the stats agg and the kept-results filter read the checkpoint
        topk = (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "point_id", "dist", "covered_m")
            .localCheckpoint(eager=True)
        )
        # ONE tiny agg row per active query: done-ness decided by comparing
        # the k-th distance against the ring-coverage bound
        qstats = (
            topk.groupBy("query_id")
            .agg(
                F.max(to_m(F.col("dist"))).alias("kth_m"),
                F.count("*").alias("n"),
                F.first("covered_m").alias("covered_m"),
            )
            .withColumn(
                "done", (F.col("n") == k) & (F.col("kth_m") <= F.col("covered_m"))
            )
        )
        done_ids = [
            r["query_id"] for r in
            qstats.filter(F.col("done")).select("query_id").collect()
        ]
        if done_ids:
            done_df = spark.createDataFrame(
                [(q,) for q in done_ids], "query_id string"
            )
            result_dfs.append(
                topk.join(F.broadcast(done_df), "query_id")
                .select("query_id", "rank", "point_id", "dist")
            )
            for q in done_ids:
                active[qindex[q]] = False
        if active.any():
            ring *= 2
            if ring > max_ring:
                break
    if active.any():
        # long-tail fallback: queries in regions sparser than k within the
        # max ring fall back to a single-pass brute force (they are few;
        # one broadcast of the straggler queries over the points table).
        leftover = spark.createDataFrame(
            list(zip(qid[active].tolist(), qlat[active].tolist(),
                     qlon[active].tolist())),
            schema="query_id string, lat double, lon double",
        )
        result_dfs.append(
            knn_bruteforce(points, leftover, k, metric=metric,
                           point_id=point_id)
        )

    p.unpersist()
    if not result_dfs:
        return spark.createDataFrame(
            [], "query_id string, rank int, point_id string, dist double"
        )
    out = reduce(DataFrame.unionByName, result_dfs)
    return out.select(
        "query_id", F.col("rank").cast("int").alias("rank"),
        "point_id", "dist",
    )
