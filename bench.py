"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the north-star pipeline (BASELINE.json:metric): interleaved
documents -> span extraction -> hex cell assignment -> two-phase PIP join ->
tile assignment, reported as docs/sec.

The spans input is generated Spark-side (osmspark.datagen — deterministic,
distributed, no Python per row) and cached as parquet under /tmp keyed by
doc count, so repeated runs measure the engine, not the generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

N_DOCS_BY_SF = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}
CACHE_ROOT = "/tmp/osmspark-bench"


def ensure_docs(spark, n_docs: int) -> str:
    """Generate-and-cache the spans documents table."""
    from osmspark.datagen import gen_documents

    path = f"{CACHE_ROOT}/docs_{n_docs}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        gen_documents(spark, n_docs).write.mode("overwrite").parquet(path)
    return path


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/"))
    n_docs = N_DOCS_BY_SF.get(sf, 200_000)

    from osmspark.datagen import gen_polygons
    from osmspark.functions.hexgrid import with_hex_cell
    from osmspark.operators import audit
    from osmspark.operators.knn import knn_kring
    from osmspark.operators.spatial_join import spatial_join
    from osmspark.operators.tiles import render_density_tiles, tile_counts
    from osmspark.session import build_session
    from osmspark.sources import parse_nodes

    spark = build_session("osmspark-bench", cores=cpus)
    docs_path = ensure_docs(spark, n_docs)
    docs = spark.read.parquet(docs_path)
    polys = gen_polygons(spark)

    queries: dict[str, float] = {}

    # JIT/Arrow/parquet warm-up, unmeasured: this VM shows 3-13x first-run
    # JIT penalties even on trivial JVM jobs, so exercise every hot path
    # once on a hash-sample (filter keeps partition structure; limit()
    # would collapse to one task and warm nothing).
    warm_docs = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(20)) < 1)
    warm_nodes = parse_nodes(warm_docs).select("id", "lat", "lon").persist()
    warm_nodes.count()
    warm_nodes.write.mode("overwrite").parquet(f"{CACHE_ROOT}/warmup_out")
    spatial_join(warm_nodes, polys, res=8).count()
    tile_counts(warm_nodes.select("lat", "lon"), zoom=12).count()
    render_density_tiles(warm_nodes.select("lat", "lon"), zoom=12, px=64).count()
    with_hex_cell(warm_nodes.select("lat", "lon"), 9).count()
    warm_nodes.unpersist()

    # Stage 1 (E2' in SURVEY §3.2): extract once -> columnar snapshot.
    # At 100 TB you never re-parse interleaved payloads per query; the
    # shaped nodes table is materialized (B8 snapshot) and every
    # downstream query reads pruned parquet columns.
    from osmspark.plans.checkpoint import SnapshotStore

    store = SnapshotStore(f"{CACHE_ROOT}/stages_{n_docs}_{cpus}")

    def q_extract():
        nodes = parse_nodes(docs).select(
            "id", "lat", "lon", F.col("tags")["addr:street"].alias("street")
        )
        return store.save(nodes, "nodes", inputs=[docs_path])["n_rows"]

    n_nodes, t_extract = timed(q_extract)
    queries["span_extract_snapshot"] = round(t_extract, 3)
    nodes = store.load(spark, "nodes")

    # Q1 headline: cell assign -> broadcast cover join -> ray-cast refine
    def q_spatial():
        joined = spatial_join(nodes.select("id", "lat", "lon"), polys, res=8)
        return joined.groupBy("level").agg(F.count("*").alias("cnt")).collect()

    _, t_spatial = timed(q_spatial)
    queries["spatial_pip_join"] = round(t_spatial, 3)

    # Q2: tile assignment + density raster (z12, 64px)
    def q_tiles():
        pts = nodes.select("lat", "lon")
        tc = tile_counts(pts, zoom=12)
        rr = render_density_tiles(pts, zoom=12, px=64)
        return tc.count() + rr.count()

    _, t_tiles = timed(q_tiles)
    queries["tile_render"] = round(t_tiles, 3)

    # Q3: hex cell assignment alone (the UDF hot path)
    def q_cells():
        return with_hex_cell(nodes.select("lat", "lon"), 9).agg(
            F.countDistinct("hex_r9")
        ).collect()

    _, t_cells = timed(q_cells)
    queries["hex_cell_assign"] = round(t_cells, 3)

    # Q4: flagship audit (street normalization counts)
    def q_audit():
        streets = nodes.select("street").filter(F.col("street").isNotNull())
        return audit.normalized_street_counts(streets).collect()

    _, t_audit = timed(q_audit)
    queries["audit_normalize"] = round(t_audit, 3)

    # Q5: kNN, 50 queries k=10 over extracted points
    def q_knn():
        pts = nodes.select("id", "lat", "lon")
        qs = pts.limit(50).select(F.col("id").alias("query_id"), "lat", "lon")
        return knn_kring(pts, qs, k=10, res=8).count()

    _, t_knn = timed(q_knn)
    queries["knn_kring_50q"] = round(t_knn, 3)

    # Q5b: kNN at 5000 queries — exercises the round-2 distributed result
    # path (per-round stats are the only driver collect); brute force at
    # this query count would be a 5000 x |points| crossJoin
    def q_knn_5k():
        pts = nodes.select("id", "lat", "lon")
        qs = pts.limit(5000).select(F.col("id").alias("query_id"), "lat", "lon")
        return knn_kring(pts, qs, k=10, res=8).count()

    _, t_knn5k = timed(q_knn_5k)
    queries["knn_kring_5000q"] = round(t_knn5k, 3)

    # (The O(P*Q) brute-force kNN reference path is intentionally NOT part
    # of the timed suite — measured separately at sf0.1: ~0.7-0.9 s/query
    # vs ~2 ms/query for kring at 5000 queries; see BASELINE.md.)

    # Q6: TPC-H Q1 on the driver lineitem table (Tier-C breadth)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def q_tpch():
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"),
                F.avg("l_discount"), F.count("*"),
            )
            .collect()
        )

    _, t_tpch = timed(q_tpch)
    queries["tpch_q1"] = round(t_tpch, 3)

    total = round(sum(queries.values()), 3)
    docs_per_sec = round(n_docs / (t_extract + t_spatial), 1)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "n_docs": n_docs,
                "cpus": cpus,
                "spatial_docs_per_sec": docs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
