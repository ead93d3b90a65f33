"""Structured Streaming demo over the `events` table (SURVEY §2.3: the
reference is strictly batch — streaming is an engine capability demo, not a
reference-parity surface).

Patterns covered: file-source readStream with explicit schema, watermarked
tumbling-window aggregation, session windows, watermark-bounded streaming
dedup, and a memory-sink test harness driven to completion with
availableNow (batch-equivalent semantics for bounded input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    Spark's file stream source requires a *directory*; the testdata ships a
    single parquet file, so a per-path symlink dir stands in (read-only,
    /root/testdata untouched)."""
    import hashlib
    import os
    import tempfile

    src = f"{sf_dir}/events.parquet"
    if os.path.isfile(src):
        d = os.path.join(
            tempfile.gettempdir(),
            "osmspark-stream-" + hashlib.sha1(src.encode()).hexdigest()[:12],
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
        src = d
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(src)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "cnt", "total_value",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) — stateful streaming agg."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stateful_user_running_totals(events: DataFrame) -> DataFrame:
    """CUSTOM stateful streaming operator via applyInPandasWithState (task
    spec: 'applyInPandasWithState for custom stateful operators'): per-user
    running event count + value total held in GroupState across
    micro-batches; each batch a user appears in emits their updated running
    row (update semantics).  State is two scalars per user — bounded, and
    shuffled only on user_id."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "append") -> DataFrame:
    """Drive a bounded stream to completion synchronously; returns the
    materialized result as a batch DataFrame."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
