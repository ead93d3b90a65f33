"""Interval join vs a DuckDB range-join oracle, plan shape, guards."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from osmspark.operators.interval import interval_join

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "ts", "user_id")


@pytest.fixture(scope="module")
def ranges(spark):
    """Deterministic validity windows over the events month: 400 ranges
    of mixed lengths (minutes to days), some overlapping, some empty."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        start = base + datetime.timedelta(
            minutes=(i * 7919) % (30 * 24 * 60))
        length = [5, 90, 60 * 26, 3][i % 4]  # min / 1.5h / 26h / 3min
        rows.append((i, start, start + datetime.timedelta(minutes=length)))
    return spark.createDataFrame(
        rows, "range_id long, start timestamp, end timestamp")


def _oracle(events_df, ranges_df, how):
    con = duckdb.connect()
    con.register("ev", events_df.toPandas())
    con.register("rg", ranges_df.toPandas())
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return sorted(map(tuple, con.execute(f"""
        SELECT e.event_id, r.range_id
        FROM ev e {join} rg r
          ON e.ts >= r.start AND e.ts < r."end"
    """).fetchall()))


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("bin_width", [None, 3600.0, 86400.0 * 7])
def test_interval_join_matches_duckdb(spark, events, ranges, how, bin_width):
    got = sorted(
        (r["event_id"], r["range_id"])
        for r in interval_join(events, ranges, ts_col="ts",
                               bin_width=bin_width, how=how)
        .select("event_id", "range_id").collect())
    assert got == _oracle(events, ranges, how)
    assert len(got) > len(set(e for e, _ in got)) or how == "inner"


def test_interval_join_meets_once_no_dedup(spark, events, ranges):
    """Every qualifying pair appears exactly once even at a bin width
    that explodes each range to many bins."""
    out = interval_join(events, ranges, bin_width=60.0).select(
        "event_id", "range_id")
    assert out.count() == out.distinct().count()


def test_interval_join_numeric_and_edges(spark):
    ev = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 25.0), (4, None)],
        "event_id long, ts double")
    rg = spark.createDataFrame(
        [(0, 10.0, 20.0),   # e1 in (start inclusive), e2 out (end open)
         (1, 20.0, 20.0),   # empty range: matches nothing
         (2, 30.0, 5.0),    # inverted: matches nothing
         (3, None, 50.0)],  # null bound: matches nothing
        "range_id long, start double, end double")
    got = sorted((r["event_id"], r["range_id"]) for r in interval_join(
        ev, rg, bin_width=5.0).select("event_id", "range_id").collect())
    assert got == [(1, 0)]
    left = interval_join(ev, rg, bin_width=5.0, how="left")
    assert left.count() == 4  # every event survives
    assert left.filter(F.col("range_id").isNull()).count() == 3


def test_interval_join_guards(spark):
    ev = spark.createDataFrame([(1, 10.0)], "event_id long, ts double")
    rg = spark.createDataFrame([(0, 0.0, 1e9)],
                               "range_id long, start double, end double")
    with pytest.raises(Exception, match="max_bins_per_range"):
        interval_join(ev, rg, bin_width=1.0,
                      max_bins_per_range=100).collect()
    with pytest.raises(ValueError, match="exist on both sides"):
        interval_join(ev.withColumn("start", F.lit(0.0)), rg)
    with pytest.raises(ValueError, match="how="):
        interval_join(ev, rg, how="full")
    with pytest.raises(ValueError, match="bin_width must be positive"):
        interval_join(ev, rg, bin_width=-1.0)
    empty = rg.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        interval_join(ev, empty)


def test_interval_join_plan_shape(spark, events, ranges):
    """Equi-join on the bin key (no cartesian / broadcast NLJ), zero
    Python, containment riding the same join."""
    plan = interval_join(events, ranges, bin_width=3600.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" in plan, plan


@pytest.mark.parametrize("how", ["inner", "left"])
def test_interval_join_salted_equals_plain(spark, events, ranges, how):
    """salt=4 returns exactly the plain join's pairs (ranges cover every
    lane, so lane assignment cannot change the result), and the salted
    key still plans as an equi-join."""
    plain = sorted(
        (r["event_id"], r["range_id"])
        for r in interval_join(events, ranges, bin_width=3600.0, how=how)
        .select("event_id", "range_id").collect())
    salted_df = interval_join(events, ranges, bin_width=3600.0, how=how,
                              salt=4)
    salted = sorted((r["event_id"], r["range_id"])
                    for r in salted_df.select("event_id", "range_id")
                    .collect())
    assert salted == plain
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    with pytest.raises(ValueError, match="salt"):
        interval_join(events, ranges, bin_width=3600.0, salt=0)


def test_interval_join_streams_stream_static(spark, events, ranges, tmp_path):
    """The operator is pure native ops, so a streaming LEFT side joins a
    static ranges side with the SAME code path — batch parity checked on
    both join types (stream-static left-outer is supported when the
    stream is on the left)."""
    from osmspark.streaming import events as ev

    path = str(tmp_path / "iv_stream")
    events.coalesce(4).write.parquet(path)
    for how in ("inner", "left"):
        es = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 2).parquet(path))
        got = sorted(
            (r["event_id"], r["range_id"])
            for r in ev.run_to_memory(
                interval_join(es, ranges, bin_width=3600.0, how=how),
                f"iv_{how}")
            .select("event_id", "range_id").collect())
        want = sorted(
            (r["event_id"], r["range_id"])
            for r in interval_join(events, ranges, bin_width=3600.0,
                                   how=how)
            .select("event_id", "range_id").collect())
        assert got == want


def test_interval_join_int64_beyond_double_precision(spark):
    """Containment is decided in the original types: int64 keys past
    2^53 (where doubles cannot represent adjacent integers) still join
    exactly at range boundaries."""
    base = 1 << 53
    ev = spark.createDataFrame(
        [(1, base), (2, base + 1), (3, base + 2), (4, base + 3)],
        "event_id long, ts long")
    rg = spark.createDataFrame(
        [(0, base + 1, base + 3)],  # [2^53+1, 2^53+3): events 2 and 3
        "range_id long, start long, end long")
    got = sorted((r["event_id"], r["range_id"]) for r in interval_join(
        ev, rg, bin_width=10.0).select("event_id", "range_id").collect())
    assert got == [(2, 0), (3, 0)]
    # an exact-nonempty range that collapses under double rounding still
    # matches its contained event
    rg2 = spark.createDataFrame([(0, base, base + 1)],
                                "range_id long, start long, end long")
    got2 = [(r["event_id"], r["range_id"]) for r in interval_join(
        ev, rg2, bin_width=10.0).select("event_id", "range_id").collect()]
    assert got2 == [(1, 0)]


def test_interval_join_internal_name_guard(spark):
    ev = spark.createDataFrame([(1, 10.0)], "event_id long, ts double")
    rg = spark.createDataFrame([(0, 0.0, 20.0)],
                               "range_id long, start double, end double")
    with pytest.raises(ValueError, match="internal helper names"):
        interval_join(ev.withColumn("__ij_bin", F.lit(1)), rg,
                      bin_width=5.0)
    with pytest.raises(ValueError, match="internal helper names"):
        interval_join(ev, rg.withColumn("__ij_salt", F.lit(1)),
                      bin_width=5.0)
