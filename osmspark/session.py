"""Tuned SparkSession builders.

Local mode is a stand-in for a multi-executor cluster (SURVEY.md §6): all
scale-sensitive settings (AQE, skew-join handling, shuffle partitions sized
to cores, Arrow batching for pandas UDFs) are the same ones that matter on a
1000-executor cluster; only master/memory differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "osmspark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    cores=None -> $SPARK_GRAFT_CPUS or all cores. Shuffle partitions default
    to ~2x cores locally; on a real cluster leave AQE to coalesce.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cores)

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # NOT the full machine: oversized heaps on this VM stall 5-10x under
        # multi-threaded allocation storms (lazy page-commit zeroing); 8g
        # covers every local working set and keeps first-touch cost bounded
        .config("spark.driver.memory", os.environ.get("OSMSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # 16 MB splits: local test inputs are sub-GB, and 128 MB splits
        # would leave most cores idle on the scan+parse stage (on a real
        # cluster with TB inputs, raise this back toward 128-256 MB)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
