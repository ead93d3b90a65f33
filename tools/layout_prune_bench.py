"""Measure what the cell-bucketed + cell-clustered layout actually saves.

Three physical layouts of the SAME rows (id, lat, lon, cell, cell_bucket):
  * clustered : partitionBy(cell_bucket) + sortWithinPartitions(cell) —
                the layout `plans/layout.write_cell_bucketed` produces;
                directory pruning AND tight per-row-group cell stats.
  * unsorted  : partitionBy(cell_bucket), no within-file sort — directory
                pruning only; every row group in a touched bucket spans
                the bucket's whole cell range, so footer stats skip
                nothing.  Isolates the row-group-level win.
  * flat      : no partitioning, random row order — the naive table; the
                full scan every spatial query would pay without a layout.

Query: count rows in the ring-2 cell neighborhood of the dense bench city
(19 cells) — `plans/layout.read_cells` for the bucketed layouts, the same
cell IN filter for the flat one.  Metric: per-query INPUT BYTES from the
Spark stage REST API (delta of summed `inputBytes` across completed
stages, the protocol BASELINE.md's shuffle numbers use) plus wall time,
best-of-3 warmed.  Row counts must agree across layouts or the run
aborts — a pruning layout that changes answers is wrong, not fast.

Writes BENCH_LAYOUT_PRUNE.json.  At 100 TB the same footer/directory
machinery is what turns a city-scale query from a table scan into a
few-bucket read; this artifact is the measured local evidence for that
claim (SURVEY §4.2).
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from osmspark.config import HOT_CITIES  # noqa: E402
from osmspark.datagen import gen_documents  # noqa: E402
from osmspark.functions.hexgrid import kring, latlon_to_cell  # noqa: E402
from osmspark.plans import layout  # noqa: E402
from osmspark.session import build_session  # noqa: E402
from osmspark.sources import parse_nodes  # noqa: E402

RES = 10
RING = 1
RG_BYTES = 256 * 1024  # buffered-bytes target: ~10 row groups per bucket file
# at the default 400k-doc scale (4.8M nodes, 64 buckets, 32B/row buffered)
N_DOCS = int(os.environ.get("SPARK_GRAFT_PRUNE_DOCS", "400000"))
ROOT = os.environ.get("SPARK_GRAFT_PRUNE_DIR", "/tmp/layout_prune")


def _read_steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def stage_input_bytes(spark) -> int:
    """Sum inputBytes over all completed stages (REST; UI must be on)."""
    time.sleep(1.5)  # let finished stages land in the store
    url = (f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
           f"{spark.sparkContext.applicationId}/stages?status=complete")
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("inputBytes", 0) for s in stages)


def main() -> None:
    spark = build_session(
        "layout-prune-bench",
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = gen_documents(spark, N_DOCS)
    nodes = parse_nodes(docs).select("id", "lat", "lon")

    clustered = f"{ROOT}/clustered"
    unsorted_p = f"{ROOT}/unsorted"
    flat = f"{ROOT}/flat"
    if not os.path.exists(f"{clustered}/_SUCCESS"):
        layout.write_cell_bucketed(nodes, clustered, res=RES,
                                   row_group_bytes=RG_BYTES)
    base = spark.read.parquet(clustered)  # reuse cell assignment verbatim
    if not os.path.exists(f"{unsorted_p}/_SUCCESS"):
        # same rows + same dirs, row order re-randomized inside each
        # bucket.  The sort must LEAD with the partition column: the
        # partitioned write requires input ordered by cell_bucket and a
        # bare sort on __r gets ELIMINATED in favor of the writer's own
        # bucket sort, silently preserving the source's cell order
        # (observed: the first cut of this strawman produced cell-sorted
        # files and a vacuous A/B)
        (base.withColumn("__r", F.xxhash64("id"))
         .repartition("cell_bucket")
         .sortWithinPartitions("cell_bucket", "__r").drop("__r")
         .write.mode("overwrite")
         .option("parquet.block.size", RG_BYTES)
         .partitionBy("cell_bucket")
         .parquet(unsorted_p))
    if not os.path.exists(f"{flat}/_SUCCESS"):
        (base.withColumn("__r", F.xxhash64("id"))
         .repartition(64, "__r").drop("__r")
         .write.mode("overwrite")
         .option("parquet.block.size", RG_BYTES)
         .parquet(flat))

    lat0, lon0 = HOT_CITIES[3][0], HOT_CITIES[3][1]  # the 15% city: a
    # neighborhood query, not a scan of the dominant cluster
    center = latlon_to_cell(np.array([lat0]), np.array([lon0]), RES)
    cells = [int(c) for c in kring(center, RING)[0].tolist()]

    def q_bucketed(path):
        return layout.read_cells(spark, path, cells).count()

    def q_flat():
        return (spark.read.parquet(flat)
                .filter(F.col("cell").isin(cells)).count())

    runs = {
        "clustered": lambda: q_bucketed(clustered),
        "unsorted_bucketed": lambda: q_bucketed(unsorted_p),
        "flat_random": q_flat,
    }
    out, counts = {}, {}
    for name, fn in runs.items():
        fn()  # warm (JIT + footer cache), unmeasured
        best = None
        for _ in range(3):
            b0 = stage_input_bytes(spark)
            tot0, st0 = _read_steal()
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            tot1, st1 = _read_steal()
            bytes_read = stage_input_bytes(spark) - b0
            steal = 100.0 * (st1 - st0) / max(tot1 - tot0, 1)
            rec = {"sec": round(dt, 3), "input_bytes": int(bytes_read),
                   "steal_pct": round(steal, 2)}
            if best is None or rec["input_bytes"] < best["input_bytes"] or (
                    rec["input_bytes"] == best["input_bytes"]
                    and rec["sec"] < best["sec"]):
                best = rec
            counts.setdefault(name, n)
        out[name] = best

    if len(set(counts.values())) != 1:
        raise RuntimeError(f"layouts disagree on the answer: {counts} — "
                           "pruning must never change results")

    total_rows = spark.read.parquet(clustered).count()
    artifact = {
        "metric": "layout_prune_neighborhood_query",
        "res": RES, "ring": RING, "n_cells": len(cells),
        "n_rows_table": int(total_rows),
        "n_rows_result": int(next(iter(counts.values()))),
        "layouts": out,
        "protocol": "warmed best-of-3 by bytes; stage-REST inputBytes "
                    "delta; identical row counts enforced",
    }
    with open("BENCH_LAYOUT_PRUNE.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    spark.stop()


if __name__ == "__main__":
    main()
