"""Scale evidence for the operator family that is not part of the
headline bench.py suite (kept separate so the driver's BENCH artifact
stays protocol-comparable across rounds): as-of join (keyed, and
single-global-key window-vs-ranged), way geometry, repetition filters,
PII redaction, int8 quantization, overlay joins at 10k and 100k dims,
rollup pyramid — each timed warmed, best-of-2 (best-of-1 for the
100k overlay), on sf0.1-scale inputs, with per-run host steal%
recorded like the main protocol.

Writes BENCH_MISC_r05.json and prints it.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


from benchlib import steal_jiffies as _steal  # noqa: E402


def main() -> None:
    from osmspark.datagen import gen_documents, gen_vectors
    from osmspark.operators.geometry import way_geometry
    from osmspark.operators.similarity import quantize_embeddings
    from osmspark.operators.temporal import asof_join
    from osmspark.operators.textstats import redact_pii, repetition_stats
    from osmspark.operators.tiles import cell_rollup_pyramid
    from osmspark.session import build_session
    from osmspark.sources import parse_nodes, parse_ways

    spark = build_session("osmspark-bench-misc", cores=32)
    docs = gen_documents(spark, 200_000).persist()
    docs.count()
    nodes = parse_nodes(docs).persist()
    n_nodes = nodes.count()
    ways = parse_ways(docs).persist()
    n_ways = ways.count()
    texts = docs.selectExpr(
        "doc_id", "concat_ws(' ', transform(spans, s -> s.text)) AS text"
    ).persist()
    texts.count()

    results: dict = {}
    steals: dict = {}

    def bench(name, fn, best_of=2):
        """fn() must BUILD ITS FRAME FRESH each call: re-collecting one
        Dataset object lets Spark reuse the completed shuffle map stages
        (MapOutputTracker keeps them registered for the same RDD DAG), so
        a prebuilt-frame timing measures only the final stage — observed
        round 5 at 30-500x flattery on the as-of/quantize/langid rows
        (quantize 0.028 s "steady-state" was a reused-stage no-op hiding
        a real O(d^2) collapse, since fixed in the operator).  The warm
        call absorbs Catalyst/Janino/JIT; identical fresh plans hit the
        codegen cache, so per-call compile overhead stays small."""
        fn()  # warm (codegen compile + JIT + Arrow paths), unmeasured
        best = None
        bsteal = 0.0
        for _ in range(best_of):
            t_a, s_a = _steal()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            t_b, s_b = _steal()
            sp = round(100.0 * (s_b - s_a) / max(1, t_b - t_a), 2)
            if best is None or dt < best:
                best, bsteal = dt, sp
        results[name] = round(best, 3)
        steals[name] = bsteal
        print(f"{name}: {best:.3f}s (steal {bsteal}%)", flush=True)

    # as-of: every node event matched to the latest prior way event by user
    ev_l = nodes.select(F.col("user").alias("k"),
                        F.xxhash64("id").alias("ts"),
                        F.col("id").alias("lval"))
    ev_r = ways.select(F.col("user").alias("k"),
                       F.xxhash64("id").alias("ts"),
                       F.col("id").alias("rval"))
    # aggregate over a MATCHED column: .count() lets column pruning drop
    # the window merge entirely (measured round 5 — the r04 entry timed
    # only the union+filter), while sum(rval_right) forces it
    bench("asof_join_nodes_x_ways",
          lambda: asof_join(ev_l, ev_r, on="ts", by="k").agg(
              F.sum("rval_right")).collect())

    # as-of with ONE global key: the window path serializes every row
    # through a single task; range_buckets spreads the same merge over
    # the timeline buckets (results identical — pytest-pinned)
    gl = spark.range(2_400_000).select(
        F.xxhash64("id").alias("ts"), F.col("id").alias("lval"))
    gr = spark.range(300_000).select(
        F.xxhash64(F.col("id") + 7).alias("ts"), F.col("id").alias("rval"))
    bench("asof_single_key_2p4m_window",
          lambda: asof_join(gl, gr, on="ts").agg(
              F.sum("rval_right")).collect())
    bench("asof_single_key_2p4m_ranged",
          lambda: asof_join(gl, gr, on="ts", range_buckets=32).agg(
              F.sum("rval_right")).collect())

    geo_df = way_geometry(ways, nodes)
    bench("way_geometry", lambda: geo_df.count())

    rep_df = repetition_stats(texts)
    bench("repetition_stats_200k_docs", lambda: rep_df.count())

    pii_df = redact_pii(texts)
    bench("redact_pii_200k_docs", lambda: pii_df.count())

    # trigram language-ID: bounded-sample gram explode -> broadcast
    # profile join -> per-doc agg, all codegen; aggregate over lang so
    # column pruning cannot drop the scoring.  Built FRESH per call —
    # re-collecting one Dataset object lets Spark reuse the completed
    # shuffle map stage (the whole explode+join+partial agg), which
    # measured 0.06 s of final-stage-only work; the honest steady-state
    # number re-executes the map side (plan is cheap to compile here,
    # unlike quantize's)
    from osmspark.operators.langid import lang_id

    bench("lang_trigram_200k_docs",
          lambda: lang_id(texts).groupBy("lang").agg(
              F.count("*"), F.sum("n_grams")).collect())

    vecs = gen_vectors(spark, 500_000, 64).persist()
    vecs.count()
    # deliberately a scale-PRUNING consumer: this is the projection shape
    # that used to trigger the O(d^2) CollapseProject re-inline the
    # operator now guards against with its let_ barrier
    bench("quantize_500k_x64",
          lambda: quantize_embeddings(vecs).select(
              F.sum(F.element_at("qvec", 1).cast("long"))).collect())

    # polygon-polygon overlay at dim scale: a 100x100 rect grid vs a
    # half-pitch-shifted copy (each polygon overlaps ~4 neighbors)
    from osmspark.operators.overlay import polygon_intersect_join

    def _grid(shift_la, shift_lo, tag):
        g = spark.range(10_000).select(
            F.concat(F.lit(tag), F.col("id")).alias("poly_id"),
            F.lit("zip").alias("level"),
            (F.lit(1.13) + (F.col("id") % 100) * F.lit(0.0034)
             + F.lit(shift_la)).alias("la0"),
            (F.lit(103.6) + F.floor(F.col("id") / 100) * F.lit(0.005)
             + F.lit(shift_lo)).alias("lo0"),
        )
        pt = lambda a, o: F.struct(a.alias("lat"), o.alias("lon"))
        la0, lo0 = F.col("la0"), F.col("lo0")
        la1, lo1 = la0 + F.lit(0.004), lo0 + F.lit(0.006)
        return g.select(
            "poly_id", "level",
            F.array(pt(la0, lo0), pt(la0, lo1), pt(la1, lo1),
                    pt(la1, lo0), pt(la0, lo0)).alias("ring"),
            F.lit(None).cast("string").alias("postcode"),
        )

    ga = _grid(0.0, 0.0, "a").persist()
    gb = _grid(0.0017, 0.0025, "b").persist()
    ga.count(), gb.count()
    ovl_df = polygon_intersect_join(ga, gb, res=9)
    bench("overlay_10k_x_10k_polys", lambda: ovl_df.count())

    # the scale the round-4 per-pair verifier could NOT finish
    def _grid_big(shift_la, shift_lo, tag):
        side = 316
        g = spark.range(100_000).select(
            F.concat(F.lit(tag), F.col("id")).alias("poly_id"),
            F.lit("zip").alias("level"),
            (F.lit(1.13) + (F.col("id") % side) * F.lit(0.0034)
             + F.lit(shift_la)).alias("la0"),
            (F.lit(103.6) + F.floor(F.col("id") / side) * F.lit(0.005)
             + F.lit(shift_lo)).alias("lo0"),
        )
        pt = lambda a, o: F.struct(a.alias("lat"), o.alias("lon"))
        la0, lo0 = F.col("la0"), F.col("lo0")
        la1, lo1 = la0 + F.lit(0.004), lo0 + F.lit(0.006)
        return g.select(
            "poly_id", "level",
            F.array(pt(la0, lo0), pt(la0, lo1), pt(la1, lo1),
                    pt(la1, lo0), pt(la0, lo0)).alias("ring"),
            F.lit(None).cast("string").alias("postcode"),
        )

    gab = _grid_big(0.0, 0.0, "a").persist()
    gbb = _grid_big(0.0017, 0.0025, "b").persist()
    gab.count(), gbb.count()
    ovl_big = polygon_intersect_join(gab, gbb, res=9)
    bench("overlay_100k_x_100k_polys", lambda: ovl_big.count(), best_of=1)

    # DBSCAN at corpus scale: 200k points in ~2000 deterministic blobs
    # (native xxhash64 generation — each point sees ~20 eps-neighbors, the
    # classic density-clustering workload).  dbscan() runs driver-side
    # rounds internally (pairs localCheckpoint + component iterations), so
    # like the pyramid the honest timing rebuilds the whole pipeline per
    # call.
    from osmspark.operators.cluster import dbscan

    def _u(h, salt, mod=999_983):
        return F.pmod(F.xxhash64(h + F.lit(salt)), F.lit(mod)) / F.lit(
            float(mod))

    blob = F.col("id") % 2000
    pts_blob = spark.range(200_000).select(
        F.col("id"),
        (F.lit(1.0) + _u(blob, 0) * F.lit(0.5)
         + (_u(F.col("id"), 7) - F.lit(0.5)) * F.lit(0.002)).alias("lat"),
        (F.lit(103.5) + _u(blob, 1_000_000) * F.lit(0.6)
         + (_u(F.col("id"), 13) - F.lit(0.5)) * F.lit(0.002)).alias("lon"),
    ).persist()
    pts_blob.count()
    bench("dbscan_200k_pts_60m",
          lambda: dbscan(pts_blob, 60.0, 5).count())

    # SemDeDup scan: 200k x 64 vectors through 64 pre-trained centroids
    # (training timed apart — the matrix is shared with the IVF index in
    # a real pipeline); the greedy per-cluster GEMM pass is the row
    from osmspark.operators.semdedup import semantic_dedup
    from osmspark.operators.similarity import train_centroids

    vecs200 = gen_vectors(spark, 200_000, 64).persist()
    vecs200.count()
    t0 = time.time()
    cents = train_centroids(vecs200, n_centroids=64, iters=2)
    results["semdedup_train_64c_2it"] = round(time.time() - t0, 3)
    steals["semdedup_train_64c_2it"] = -1.0  # single-shot, untimed steal
    sd_df = semantic_dedup(vecs200, 0.35, centroids=cents)
    bench("semdedup_200k_x64_k64", lambda: sd_df.count())

    # URL domain stats at 2M docs (~4.5M URLs): exact multi-distinct
    # (Expand + two exchanges) vs HLL-sketch (one exchange) A/B
    from osmspark.datagen import gen_url_corpus
    from osmspark.operators.urlstats import domain_stats

    url2m = gen_url_corpus(spark, 2_000_000).persist()
    url2m.count()
    ds_exact = domain_stats(url2m, exact=True)
    ds_hll = domain_stats(url2m, exact=False)
    bench("domain_stats_exact_2m_docs", lambda: ds_exact.count())
    bench("domain_stats_hll_2m_docs", lambda: ds_hll.count())

    # hex KDE smoothing over the full node corpus: 2.4M points through a
    # k=2 (19-cell) normalized stencil — the convolution is one literal
    # explode + two groupBys, all codegen
    from osmspark.operators.tiles import kde_smooth

    kde_df = kde_smooth(nodes.select("lat", "lon"), res=8, k=2,
                        sigma=1.2)
    bench("kde_smooth_2p4m_pts_k2", lambda: kde_df.count())

    # route near-dup: 2k synthetic trajectories (40 pts each; every 4th a
    # jittered copy of its base route) through the cell-token text-dedup
    # composition; timing rebuilds the whole pipeline per call (LSH +
    # verify run driver-side actions internally)
    from osmspark.operators.trajectory import route_near_dup_pairs

    tbase = F.col("id") % 500
    traj2k = spark.range(2_000 * 40).select(
        (F.col("id") % 2_000).alias("traj_id"),
        (F.floor(F.col("id") / 2_000)).cast("double").alias("ts"),
        (F.lit(1.2) + F.pmod(F.xxhash64(tbase % 500), F.lit(997))
         / F.lit(997.0) * F.lit(0.3)
         + F.floor(F.col("id") / 2_000) * F.lit(0.001)
         + (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100)) - F.lit(50))
         * F.lit(2e-7)).alias("lat"),
        (F.lit(103.6) + F.pmod(F.xxhash64(tbase % 500, F.lit(1)),
                               F.lit(997)) / F.lit(997.0) * F.lit(0.4)
         + F.floor(F.col("id") / 2_000) * F.lit(0.0015)
         + (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100)) - F.lit(50))
         * F.lit(2e-7)).alias("lon"),
    ).persist()
    traj2k.count()
    bench("route_near_dup_2k_trajs",
          lambda: route_near_dup_pairs(traj2k, jaccard_threshold=0.5,
                                       res=9).count())

    # HMM map matching: 200k GPS fixes (500 trajectories x 400 fixes,
    # deterministic +-20 m jitter) over a 20k-segment grid network
    # (100 rows x 200 ~100 m segments), everything through candidates +
    # per-trajectory Viterbi
    from osmspark.operators.mapmatch import map_match

    _ky = 111194.9  # m per degree latitude (engine earth radius)
    dx = 100.0 / (_ky * 0.999)  # ~100 m in lon degrees at lat ~1.3
    dy = 0.002  # rows ~222 m apart
    segs = spark.range(100 * 200).select(
        (F.col("id") % 100).cast("string").alias("way_id"),
        F.floor(F.col("id") / 100).cast("int").alias("seg_idx"),
        (F.lit(1.2) + (F.col("id") % 100) * F.lit(dy)).alias("lat1"),
        (F.lit(103.6) + F.floor(F.col("id") / 100) * F.lit(dx)).alias("lon1"),
        (F.lit(1.2) + (F.col("id") % 100) * F.lit(dy)).alias("lat2"),
        (F.lit(103.6) + (F.floor(F.col("id") / 100) + 1) * F.lit(dx)).alias("lon2"),
    ).withColumn("mid_lat", (F.col("lat1") + F.col("lat2")) / 2) \
        .withColumn("mid_lon", (F.col("lon1") + F.col("lon2")) / 2) \
        .withColumn("len_m", F.lit(100.0)).persist()
    segs.count()
    gps200k = spark.range(500 * 400).select(
        (F.col("id") % 500).alias("traj_id"),
        F.floor(F.col("id") / 500).cast("double").alias("ts"),
        (F.lit(1.2) + (F.col("id") % 500) % 100 * F.lit(dy)
         + (F.pmod(F.xxhash64("id"), F.lit(41)) - F.lit(20))
         * F.lit(1.0 / _ky)).alias("lat"),
        (F.lit(103.6) + F.floor(F.col("id") / 500) * F.lit(50.0 / _ky))
        .alias("lon"),
    ).persist()
    gps200k.count()
    mm_df = map_match(gps200k, segs, radius_m=60.0, sigma_m=10.0)
    bench("map_match_200k_fixes_20k_segs", lambda: mm_df.count())

    # convex hull of the full 2.4M-point corpus, one global group: the
    # two-phase shape is what's under test — phase 1 spreads the full
    # scan over n_presplit tasks, only hull vertices reach the reducer
    from osmspark.operators.hull import convex_hull

    bench("convex_hull_2p4m_pts",
          lambda: convex_hull(nodes.select("lat", "lon"),
                              n_presplit=64).count())

    # the pyramid materializes its levels eagerly at BUILD time (that is
    # the operator's whole point — one base scan, no per-zoom recompute),
    # so the honest timing rebuilds it per call, build + final count
    pts_only = nodes.select("lat", "lon")
    bench("cell_pyramid_r9_to_r6",
          lambda: cell_rollup_pyramid(
              pts_only, fine_res=9, coarse_res=6).count())

    # zonal statistics: full 2.4M-point corpus against the 50-polygon dim
    # — the two-phase shape under test: ONE groupBy(cell) pass, interior
    # cover cells credited from cell aggregates, refine only on
    # boundary-cell points.  Aggregated over every stat column so pruning
    # cannot drop a leg.
    from osmspark.datagen import gen_polygons
    from osmspark.operators.zonal import zonal_stats

    zpolys = gen_polygons(spark).persist()
    zpolys.count()
    zpts = nodes.select("lat", "lon", (F.col("lat") * 3.0).alias("val"))
    bench("zonal_stats_2p4m_pts_50_polys",
          lambda: zonal_stats(zpts, zpolys, value_col="val").agg(
              F.sum("n_points"), F.sum("sum_v"), F.min("min_v"),
              F.max("max_v")).collect())

    # segment intersection join: 20k horizontal x 20k vertical ~100 m
    # segments, verticals offset half a spacing so each crosses exactly
    # one horizontal — 20k proper crossings, count asserted (a wrong
    # candidate cover would under-count, not just slow down)
    from osmspark.operators.intersect import segment_intersection_join

    nrow, ncol = 100, 200
    hseg = spark.range(nrow * ncol).select(
        F.col("id").cast("string").alias("seg_id"),
        (F.lit(1.2) + (F.col("id") % nrow) * F.lit(dy)).alias("lat1"),
        (F.lit(103.6) + F.floor(F.col("id") / nrow) * F.lit(dx)).alias("lon1"),
        (F.lit(1.2) + (F.col("id") % nrow) * F.lit(dy)).alias("lat2"),
        (F.lit(103.6) + (F.floor(F.col("id") / nrow) + 1) * F.lit(dx))
        .alias("lon2"),
    ).persist()
    vseg = spark.range(nrow * ncol).select(
        F.col("id").cast("string").alias("seg_id"),
        (F.lit(1.2) + ((F.col("id") % nrow) - 0.5) * F.lit(dy)).alias("lat1"),
        (F.lit(103.6) + (F.floor(F.col("id") / nrow) + 0.5) * F.lit(dx))
        .alias("lon1"),
        (F.lit(1.2) + ((F.col("id") % nrow) + 0.5) * F.lit(dy)).alias("lat2"),
        (F.lit(103.6) + (F.floor(F.col("id") / nrow) + 0.5) * F.lit(dx))
        .alias("lon2"),
    ).persist()
    hseg.count(), vseg.count()
    n_cross = segment_intersection_join(hseg, vseg).count()
    assert n_cross == nrow * ncol, n_cross
    bench("seg_intersection_20k_x_20k",
          lambda: segment_intersection_join(hseg, vseg).count())

    # zonal length: road-km per polygon over the REAL extracted way
    # segments (exact clipping; candidate covers x 50-polygon dim)
    from osmspark.operators.mapmatch import way_segments
    from osmspark.operators.zonal import zonal_length

    wsegs = way_segments(ways, nodes).select(
        F.concat_ws("_", "way_id", "seg_idx").alias("seg_id"),
        "lat1", "lon1", "lat2", "lon2").persist()
    n_wsegs = wsegs.count()
    bench("zonal_length_roadkm_50_polys",
          lambda: zonal_length(wsegs, zpolys).agg(
              F.sum("len_m"), F.sum("n_segments")).collect())

    # nearest-polygon join: full corpus reverse-geocoded against the
    # 50-polygon dim at ~2.2 km degree radius (disk cells + broadcast
    # cover join + factorized distance refine + one argmin aggregate)
    from osmspark.operators.nearest import nearest_polygon

    bench("nearest_polygon_2p4m_pts",
          lambda: nearest_polygon(
              nodes.select("id", "lat", "lon"), zpolys,
              radius_deg=0.02, res=8).agg(
                  F.count(F.lit(1)), F.sum("dist_deg")).collect())

    # triangle counting: 1M-edge hash-wired graph over 100k vertices
    # (mean degree ~20) — two native joins after the degree orientation
    from osmspark.operators.graph import triangle_count

    tedges = spark.range(1_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1_234_567), F.lit(100_000))
        .alias("dst"),
    ).persist()
    tedges.count()
    bench("triangle_count_1m_edges",
          lambda: triangle_count(tedges).collect())

    # k-core peel on the same 1M-edge graph: k chosen above the mean
    # degree so several peel rounds actually run
    from osmspark.operators.graph import k_core

    bench("k_core_k15_1m_edges",
          lambda: k_core(tedges, 15).agg(
              F.count(F.lit(1)), F.sum("deg")).collect())

    out = {
        "metric": "round5_misc_ops_sec",
        "queries": results,
        "steal_pct": steals,
        "n_nodes": int(n_nodes),
        "n_ways": int(n_ways),
        "n_docs": 200_000,
        "cpus": 32,
        "protocol": "warmed best-of-2, per-run steal% recorded",
    }
    with open("/root/repo/BENCH_MISC_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
