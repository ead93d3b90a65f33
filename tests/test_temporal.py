"""As-of join: engine result == DuckDB's native ASOF JOIN on the same
data, both directions, plus tolerance and edge cases."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmspark.operators.temporal import asof_join


def _mkdata():
    # deterministic LCG; duplicate timestamps on purpose (tie semantics)
    def lcg(seed):
        x = seed
        while True:
            x = (x * 48271) % 2147483647
            yield x

    g = lcg(7)
    left = [(k, next(g) % 500, i) for i in range(120) for k in ("a", "b")]
    right = [(k, next(g) % 500, 1000 + i) for i in range(80) for k in ("a", "b")]
    return left, right


@pytest.fixture(scope="module")
def frames(spark):
    left, right = _mkdata()
    ldf = spark.createDataFrame(left, "k string, ts long, lval long")
    rdf = spark.createDataFrame(right, "k string, ts long, rval long")
    return ldf, rdf, left, right


def _duck_asof(left, right, direction):
    con = duckdb.connect()
    con.register("l", pd.DataFrame(left, columns=["k", "ts", "lval"]))
    con.register("r", pd.DataFrame(right, columns=["k", "ts", "rval"]))
    op = ">=" if direction == "backward" else "<="
    rows = con.sql(
        f"SELECT l.k, l.ts, l.lval, r.ts AS rts, r.rval "
        f"FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts {op} r.ts"
    ).fetchall()
    return {(k, ts, lv): (rts, rv) for k, ts, lv, rts, rv in rows}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_duckdb(frames, direction):
    """DuckDB ships a native ASOF JOIN — an independent engine oracle.
    Duplicate right timestamps: DuckDB picks an arbitrary row among
    equal-ts matches, so compare on the matched TIMESTAMP (the as-of
    semantics), not the payload."""
    ldf, rdf, left, right = frames
    got = {
        (r["k"], r["ts"], r["lval"]): r["ts_right"]
        for r in asof_join(ldf, rdf, on="ts", by="k",
                           direction=direction).collect()
    }
    want = _duck_asof(left, right, direction)
    assert set(got) == set(want)
    for key, rts in got.items():
        assert rts == want[key][0], (key, rts, want[key])


def test_asof_join_python_oracle_with_tolerance(frames):
    ldf, rdf, left, right = frames
    got = {
        (r["k"], r["ts"], r["lval"]): (r["ts_right"], r["rval_right"])
        for r in asof_join(ldf, rdf, on="ts", by="k",
                           tolerance=25).collect()
    }
    by_key: dict = {}
    for k, ts, rv in right:
        by_key.setdefault(k, []).append((ts, rv))
    for k in by_key:
        by_key[k].sort()
    for (k, ts, lv), (rts, rv) in got.items():
        cands = [(t, v) for t, v in by_key.get(k, []) if t <= ts]
        if not cands or ts - max(cands)[0] > 25:
            assert rts is None and rv is None, (k, ts)
        else:
            best_t = max(cands)[0]
            assert rts == best_t
            # deterministic tiebreak: max struct among equal-ts rows
            assert rv == max(v for t, v in cands if t == best_t)


def test_asof_join_exact_ts_matches_and_no_match(spark):
    ldf = spark.createDataFrame(
        [("a", 10, 1), ("a", 5, 2), ("b", 3, 3)], "k string, ts long, lval long")
    rdf = spark.createDataFrame(
        [("a", 10, 100), ("a", 7, 101)], "k string, ts long, rval long")
    got = {(r["k"], r["ts"]): r["rval_right"]
           for r in asof_join(ldf, rdf, on="ts", by="k").collect()}
    assert got[("a", 10)] == 100      # exact timestamp matches (<=)
    assert got[("a", 5)] is None      # nothing at or before 5
    assert got[("b", 3)] is None      # key with no right rows at all
    assert len(got) == 3              # every left row survives


def test_asof_join_plan_native(frames):
    ldf, rdf, _, _ = frames
    out = asof_join(ldf, rdf, on="ts", by="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_asof_join_null_timestamps(spark):
    """Null-ts right rows never match; a null-ts left row matches nothing
    (forward mode is where DESC NULLS LAST would otherwise hand it the
    minimum-ts right row)."""
    ldf = spark.createDataFrame(
        [("a", 10, 1), ("a", None, 2)], "k string, ts long, lval long")
    rdf = spark.createDataFrame(
        [("a", None, 100), ("a", 50, 101), ("a", 5, 102)],
        "k string, ts long, rval long")
    back = {(r["k"], r["ts"]): (r["ts_right"], r["rval_right"])
            for r in asof_join(ldf, rdf, on="ts", by="k").collect()}
    assert back[("a", 10)] == (5, 102)       # not the null-ts row
    assert back[("a", None)] == (None, None)
    fwd = {(r["k"], r["ts"]): (r["ts_right"], r["rval_right"])
           for r in asof_join(ldf, rdf, on="ts", by="k",
                              direction="forward").collect()}
    assert fwd[("a", 10)] == (50, 101)
    assert fwd[("a", None)] == (None, None)


def test_asof_join_unorderable_right_payload(spark):
    """A right side carrying a map column (this repo's tags) must still
    work: the tiebreak falls back to a hash surrogate instead of trying
    to sort the struct."""
    ldf = spark.createDataFrame(
        [("a", 10, 1)], "k string, ts long, lval long")
    rdf = spark.createDataFrame(
        [("a", 7, {"hw": "yes"})], "k string, ts long, tags map<string,string>")
    rows = asof_join(ldf, rdf, on="ts", by="k").collect()
    assert rows[0]["ts_right"] == 7
    assert dict(rows[0]["tags_right"]) == {"hw": "yes"}


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("by", ["k", None])
def test_asof_ranged_equals_window_path(frames, direction, by):
    """range_buckets is a pure execution-strategy switch: full-payload
    results (including duplicate-ts tiebreaks) must be IDENTICAL to the
    window path, keyed and global, both directions."""
    ldf, rdf, _, _ = frames
    cols = lambda r: (r["k"], r["ts"], r["lval"], r["ts_right"],
                      r["rval_right"])
    want = sorted(map(cols, asof_join(
        ldf, rdf, on="ts", by=by, direction=direction).collect()))
    got = sorted(map(cols, asof_join(
        ldf, rdf, on="ts", by=by, direction=direction,
        range_buckets=8).collect()))
    assert got == want


def test_asof_ranged_sparse_right_buckets(spark):
    """Right data clustered at the START of the timeline: most buckets
    have no right rows, so matches for late left rows ride ONLY on the
    carried seeds (and must cross several empty buckets)."""
    ldf = spark.createDataFrame(
        [("g", t, t) for t in range(0, 1000, 7)], "k string, ts long, lval long")
    rdf = spark.createDataFrame(
        [("g", t, 100 + t) for t in range(0, 60, 11)],
        "k string, ts long, rval long")
    cols = lambda r: (r["ts"], r["ts_right"], r["rval_right"])
    want = sorted(map(cols, asof_join(ldf, rdf, on="ts", by="k").collect()))
    got = sorted(map(cols, asof_join(
        ldf, rdf, on="ts", by="k", range_buckets=16).collect()))
    assert got == want
    # spot-check the carry itself: the last left row matches the global
    # latest right row (ts=55) through ~15 right-empty buckets
    assert got[-1] == (994, 55, 155)


def test_asof_ranged_tolerance(frames):
    ldf, rdf, _, _ = frames
    cols = lambda r: (r["k"], r["ts"], r["lval"], r["ts_right"],
                      r["rval_right"])
    want = sorted(map(cols, asof_join(
        ldf, rdf, on="ts", by="k", tolerance=25).collect()))
    got = sorted(map(cols, asof_join(
        ldf, rdf, on="ts", by="k", tolerance=25,
        range_buckets=6).collect()))
    assert got == want


def test_asof_ranged_plan_partitions_by_bucket(frames):
    """The whole point: the merge window partitions on (by, __b), so one
    key's history no longer serializes through one task."""
    ldf, rdf, _, _ = frames
    out = asof_join(ldf, rdf, on="ts", by="k", range_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "__b" in plan, plan
    # window partition spec carries the bucket column
    import re
    wspecs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert any("__b" in s for s in wspecs), plan


def test_asof_suffix_collision_raises(frames):
    ldf, rdf, _, _ = frames
    bad_left = ldf.withColumnRenamed("lval", "rval_right")
    with pytest.raises(ValueError, match="suffix"):
        asof_join(bad_left, rdf, on="ts", by="k")
    with pytest.raises(ValueError, match="range_buckets"):
        asof_join(ldf, rdf, on="ts", by="k", range_buckets=1)


def test_asof_ranged_timestamp_on(spark):
    """Temporal `on` columns must work with range_buckets: Spark 4 refuses
    TIMESTAMP(_NTZ) -> double casts, so the bucket key routes through
    unix_micros (round-5 driver-row regression)."""
    ldf = spark.createDataFrame(
        [("g", f"2016-01-{d:02d} 12:00:00", d) for d in range(1, 25)],
        "k string, ts_s string, lval long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "lval")
    rdf = spark.createDataFrame(
        [("g", f"2016-01-{d:02d} 00:00:00", 100 + d) for d in range(1, 25, 5)],
        "k string, ts_s string, rval long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "rval")
    cols = lambda r: (r["lval"], r["rval_right"])
    want = sorted(map(cols, asof_join(ldf, rdf, on="ts", by="k").collect()))
    got = sorted(map(cols, asof_join(
        ldf, rdf, on="ts", by="k", range_buckets=6).collect()))
    assert got == want and want[-1] == (24, 121)


def test_sessionize_matches_duckdb(spark):
    """Batch sessionize vs an independent DuckDB window derivation on
    the real events table (30-min gap)."""
    import duckdb

    from osmspark.operators.temporal import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "ts")
    got = sorted(
        (r["event_id"], r["session_seq"])
        for r in sessionize(ev, gap=1800.0).select(
            "event_id", "session_seq").collect())
    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = sorted(map(tuple, con.execute("""
        SELECT event_id,
               sum(CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM (SELECT event_id, user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       AS prev_ts
              FROM ev)
    """).fetchall()))
    assert got == want


def test_sessionize_matches_native_session_window(spark):
    """session_stats sessions == Spark's own session_window aggregate
    (count and membership), including the exactly-gap boundary."""
    from osmspark.operators.temporal import session_stats

    rows = []
    for u in range(5):
        t = 1000 * (u + 1)
        for k in range(30):
            # gaps cycle through under / exactly-at / over the 60s gap
            t += [10, 60, 61, 59][k % 4]
            rows.append((u, t))
    ev = spark.createDataFrame(rows, "user_id long, tsec long")
    ev = ev.withColumn("ts", F.timestamp_seconds("tsec")).drop("tsec")

    ours = session_stats(ev, gap=60.0, ts_col="ts")
    native = (
        ev.groupBy(F.session_window("ts", "60 seconds").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("s.start").alias("session_start"),
                "n_events")
    )
    a = sorted((r["user_id"], r["session_start"], r["n_events"])
               for r in ours.select("user_id", "session_start",
                                    "n_events").collect())
    b = sorted((r["user_id"], r["session_start"], r["n_events"])
               for r in native.collect())
    assert a == b


def test_sessionize_edges(spark):
    from osmspark.operators.temporal import sessionize

    ev = spark.createDataFrame(
        [(1, 0, 10.0), (2, 0, 10.0), (3, 0, 15.0), (4, 0, None),
         (5, 1, 100.0)],
        "event_id long, user_id long, ts double")
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(ev, gap=20.0).collect()}
    # equal timestamps share a session; numeric ts works; null excluded
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[4] is None
    assert got[5] == 1
    with pytest.raises(ValueError, match="exists"):
        sessionize(ev.withColumn("session_seq", F.lit(1)), gap=20.0)
