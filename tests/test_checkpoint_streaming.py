"""B8 checkpoint/resume + lineage; Structured Streaming demo parity."""

import pytest
from pyspark.sql import functions as F

from osmspark.plans.checkpoint import SnapshotStore
from osmspark.streaming import events as ev


def test_save_load_roundtrip(tmp_path, spark, nodes):
    store = SnapshotStore(str(tmp_path / "snap"))
    df = nodes.select("id", "lat", "lon")
    m = store.save(df, "points", inputs=["fixture:docs300"])
    assert m["committed"] and m["n_rows"] == df.count()
    assert sum(p["rows"] for p in m["partitions"]) == m["n_rows"]
    assert len(m["partitions"]) >= 1
    back = store.load(spark, "points")
    assert back.count() == df.count()
    assert set(back.columns) == {"id", "lat", "lon"}


def test_run_stage_resumes_without_recompute(tmp_path, spark, nodes):
    store = SnapshotStore(str(tmp_path / "snap2"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return nodes.select("id", "lat")

    a = store.run_stage(spark, "s1", build)
    b = store.run_stage(spark, "s1", build)   # must load, not recompute
    assert calls["n"] == 1
    n_a = a.count()
    assert n_a == b.count()
    c = store.run_stage(spark, "s1", build, force=True)
    assert calls["n"] == 2 and c.count() == n_a


def test_uncommitted_stage_is_recomputed(tmp_path, spark, nodes):
    """Kill-mid-write simulation: stage dir exists but manifest absent."""
    store = SnapshotStore(str(tmp_path / "snap3"))
    # simulate a crashed write: data present, no manifest commit
    nodes.select("id").write.mode("overwrite").parquet(
        str(tmp_path / "snap3" / "crashy")
    )
    assert not store.is_complete("crashy")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return nodes.select("id")

    store.run_stage(spark, "crashy", build)
    assert calls["n"] == 1
    assert store.is_complete("crashy")


def test_lineage_report_orders_stages(tmp_path, spark, nodes):
    store = SnapshotStore(str(tmp_path / "snap4"))
    store.save(nodes.select("id"), "a")
    store.save(nodes.select("lat"), "b", inputs=["stage:a"])
    rep = store.lineage_report()
    assert [m["stage"] for m in rep] == ["a", "b"]
    assert rep[1]["inputs"] == ["stage:a"]
    assert all("wall_s" in m and "snapshot_id" in m for m in rep)


SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("mode", ["windowed", "sessions", "dedup"])
def test_streaming_matches_batch(spark, mode):
    stream = ev.read_events_stream(spark, SF)
    batch = spark.read.parquet(f"{SF}/events.parquet")
    if mode == "windowed":
        got = ev.run_to_memory(ev.windowed_counts(stream), "t_win",
                               output_mode="append").collect()
        exp = (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        # append mode emits only closed windows (watermark) — subset check
        gotc = {(r["window_start"], r["event_type"]): r["cnt"] for r in got}
        expc = {(r["w"]["start"], r["event_type"]): r["cnt"] for r in exp}
        assert gotc
        assert all(expc[k] == v for k, v in gotc.items())
    elif mode == "sessions":
        got = ev.run_to_memory(ev.sessionized(stream), "t_sess").collect()
        assert got
        assert all(r["n_events"] >= 1 for r in got)
    else:
        got = ev.run_to_memory(ev.deduped_stream(stream), "t_dedup").count()
        assert got == batch.select("event_id").distinct().count()


def test_stateful_running_totals_across_batches(tmp_path, spark):
    """applyInPandasWithState custom operator: state must ACCUMULATE across
    micro-batches (maxFilesPerTrigger=1 forces one batch per chunk file);
    the final running row per user equals the batch groupBy totals."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = src.filter(F.col("user_id") < 40).cache()
    d = str(tmp_path / "chunks")
    batch.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(d)
    batch.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(ev.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = ev.run_to_memory(
        ev.stateful_user_running_totals(stream),
        "stateful_totals", output_mode="update",
    )
    # update mode emits one row per (user, batch-it-appeared-in); the max
    # n_events per user is the final running state
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .collect()
    }
    exp = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == exp
    # state really crossed batches: users present in both chunks must have
    # TWO distinct emitted rows
    both = (
        batch.withColumn("p", F.col("event_id") % 2)
        .groupBy("user_id").agg(F.countDistinct("p").alias("np"))
        .filter(F.col("np") == 2).count()
    )
    assert both > 0
    multi = (
        out.groupBy("user_id").agg(F.countDistinct("n_events").alias("k"))
        .filter(F.col("k") >= 2).count()
    )
    assert multi >= both


def test_streaming_cell_and_tile_counts_match_batch(tmp_path, spark):
    """Streaming spatial rollups == the same plan run as a batch: the hex
    cell / tile assignment is stateless and shared with the batch path, so
    an availableNow pass over a bounded source must reproduce the batch
    groupBy exactly."""
    import numpy as np

    from osmspark.streaming import spatial as sp

    rng = np.random.default_rng(17)
    n = 4000
    lat = rng.uniform(1.13, 1.47, n)
    lon = rng.uniform(103.6, 104.1, n)
    rows = [
        (f"2016-03-01 {i % 24:02d}:{i % 60:02d}:00", float(lat[i]), float(lon[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "ts string, lat double, lon double") \
        .select(F.col("ts").cast("timestamp").alias("ts"), "lat", "lon")
    src = str(tmp_path / "pts")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, lat double, lon double").parquet(src)
    batch = spark.read.parquet(src)

    # complete mode: append would hold back windows the final watermark
    # has not passed (bounded input ends inside the watermark lag)
    got = {(r["window_start"], r["cell"]): r["cnt"] for r in ev.run_to_memory(
        sp.streaming_cell_counts(stream, res=7, window="1 hour"),
        "t_cells", output_mode="complete").collect()}
    exp = {(r["window_start"], r["cell"]): r["cnt"] for r in
           sp.streaming_cell_counts(batch, res=7, window="1 hour").collect()}
    assert got == exp and len(exp) > 10

    got_t = {(r["window_start"], r["tile_x"], r["tile_y"]): r["cnt"]
             for r in ev.run_to_memory(
                 sp.streaming_tile_counts(stream, zoom=10), "t_tiles",
                 output_mode="complete"
             ).collect()}
    exp_t = {(r["window_start"], r["tile_x"], r["tile_y"]): r["cnt"]
             for r in sp.streaming_tile_counts(batch, zoom=10).collect()}
    assert got_t == exp_t and len(exp_t) > 5


def test_streaming_geofence_equals_batch(spark, tmp_path):
    """The two-phase PIP join streams as-is (stateless projections +
    stream-static broadcast join + Arrow filter): hit set and windowed
    per-polygon counts must equal the batch join on the same input."""
    import numpy as np

    from osmspark.datagen import gen_polygons
    from osmspark.operators.spatial_join import spatial_join
    from osmspark.streaming import spatial as sp

    rng = np.random.default_rng(19)
    n = 3000
    lat = rng.uniform(1.13, 1.47, n)
    lon = rng.uniform(103.6, 104.1, n)
    rows = [
        (str(i), f"2016-03-01 {i % 24:02d}:{i % 60:02d}:00",
         float(lat[i]), float(lon[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id string, ts string, lat double, lon double"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"), "lat", "lon")
    src = str(tmp_path / "geo_pts")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "id string, ts timestamp, lat double, lon double").parquet(src)
    batch = spark.read.parquet(src)
    polys = gen_polygons(spark)

    got = {(r["id"], r["poly_id"]) for r in ev.run_to_memory(
        sp.streaming_geofence(stream, polys, res=7), "t_geo").collect()}
    exp = {(r["id"], r["poly_id"]) for r in
           spatial_join(batch.select("id", "lat", "lon"), polys,
                        res=7).collect()}
    assert got == exp and len(exp) > 500

    got_c = {(r["window_start"], r["poly_id"]): r["cnt"]
             for r in ev.run_to_memory(
                 sp.streaming_geofence_counts(stream, polys, res=7),
                 "t_geo_cnt", output_mode="complete").collect()}
    exp_c = {(r["window_start"], r["poly_id"]): r["cnt"]
             for r in sp.streaming_geofence_counts(batch, polys,
                                                   res=7).collect()}
    assert got_c == exp_c and len(exp_c) > 20


def test_streaming_radius_equals_batch(spark, tmp_path):
    """The B5b radius join streams as-is (stateless stream-side cell
    projection + stream-static equi-join against static disk cells): hit
    set and windowed per-site counts equal the batch join on the same
    input; the timestamp rides through as a carried column (no
    stream-stream re-join)."""
    import numpy as np

    from osmspark.operators.radius_join import within_distance_join
    from osmspark.streaming import spatial as sp

    rng = np.random.default_rng(23)
    n = 2000
    lat = rng.uniform(1.13, 1.47, n)
    lon = rng.uniform(103.6, 104.1, n)
    rows = [
        (str(i), f"2016-03-01 {i % 24:02d}:{i % 60:02d}:00",
         float(lat[i]), float(lon[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id string, ts string, lat double, lon double"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"), "lat", "lon")
    src = str(tmp_path / "rad_pts")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "id string, ts timestamp, lat double, lon double").parquet(src)
    batch = spark.read.parquet(src)
    sites = spark.createDataFrame(
        [("s0", 1.29, 103.85), ("s1", 1.35, 103.69), ("s2", 1.44, 103.79)],
        "query_id string, lat double, lon double")

    got = {(r["query_id"], r["point_id"]) for r in ev.run_to_memory(
        sp.streaming_radius_alerts(stream, sites, 8000.0), "t_rad").collect()}
    exp = {(r["query_id"], r["point_id"]) for r in within_distance_join(
        batch.select("id", "lat", "lon"), sites, 8000.0).collect()}
    assert got == exp and len(exp) > 100

    got_c = {(r["window_start"], r["query_id"]): r["cnt"]
             for r in ev.run_to_memory(
                 sp.streaming_radius_counts(stream, sites, 8000.0),
                 "t_rad_cnt", output_mode="complete").collect()}
    exp_rows = within_distance_join(
        batch, sites, 8000.0, carry_cols=("ts",))
    exp_c = {(r["w"]["start"], r["query_id"]): r["cnt"]
             for r in exp_rows.groupBy(
                 F.window("ts", "1 hour").alias("w"), "query_id")
             .agg(F.count("*").alias("cnt")).collect()}
    assert got_c == exp_c and len(exp_c) > 10


def test_streaming_radius_alerts_axis_rename(spark):
    """Mixed coordinate names (only one axis differs) must map cleanly,
    and a pre-existing default-named column alongside a custom mapping
    raises instead of silently feeding stale coordinates (round-5
    ADVICE: the old both-or-nothing drop deleted the real lat column)."""
    from osmspark.operators.radius_join import within_distance_join
    from osmspark.streaming import spatial as sp

    pts = spark.createDataFrame(
        [("p0", 1.2901, 103.8501), ("p1", 1.2905, 103.8507),
         ("p2", 1.4500, 104.0000)],
        "id string, lat double, lng double")
    sites = spark.createDataFrame(
        [("s0", 1.29, 103.85)], "query_id string, lat double, lon double")
    # conflict: lon mapped from 'lng' while the frame ALSO has... nothing
    # — but lat defaults while a custom lat source exists is fine; the
    # raise case is a leftover default-named column on the mapped axis
    bad = pts.withColumn("lon", F.lit(0.0))
    with pytest.raises(ValueError, match="conflicting"):
        sp.streaming_radius_alerts(bad, sites, 5000.0, lon="lng")
    got = {(r["query_id"], r["point_id"])
           for r in sp.streaming_radius_alerts(
               pts, sites, 5000.0, lon="lng").collect()}
    exp = {(r["query_id"], r["point_id"])
           for r in within_distance_join(
               pts.withColumnRenamed("lng", "lon"), sites, 5000.0).collect()}
    assert got == exp and ("s0", "p0") in got and ("s0", "p2") not in got


def test_pyramid_snapshot_stages_resume(spark, tmp_path):
    """materialize='snapshot' puts every pyramid level through the B8
    SnapshotStore: results match the localCheckpoint build, manifests
    carry per-level row counts + lineage, and a killed build resumes —
    committed levels LOAD (the base never rescans the points)."""
    import os

    from osmspark.operators.tiles import cell_rollup_pyramid
    from osmspark.plans.checkpoint import SnapshotStore

    pts = spark.range(3000).select(
        (F.lit(1.2) + (F.col("id") % 100) * F.lit(1e-3)).alias("lat"),
        (F.lit(103.7) + (F.col("id") % 77) * F.lit(1e-3)).alias("lon"))
    want = sorted((r["res"], r["cell"], r["cnt"])
                  for r in cell_rollup_pyramid(pts, 8, 6).collect())

    store = SnapshotStore(str(tmp_path / "pyr"))
    got = sorted((r["res"], r["cell"], r["cnt"])
                 for r in cell_rollup_pyramid(
                     pts, 8, 6, materialize="snapshot",
                     store=store).collect())
    assert got == want

    n_by_level = {r: sum(1 for x in want if x[0] == r) for r in (6, 7, 8)}
    for r in (6, 7, 8):
        m = store.manifest(f"pyramid_r{r}")
        assert m and m["committed"] and m["n_rows"] == n_by_level[r]
        assert sum(p["rows"] for p in m["partitions"]) == n_by_level[r]
    assert store.manifest("pyramid_r7")["inputs"] == ["pyramid_r8"]

    # kill-and-resume: wipe the two coarser levels, poison the points —
    # the committed base loads instead of rescanning, the rest rebuilds
    for r in (6, 7):
        os.remove(store._manifest_path(f"pyramid_r{r}"))

    def boom(_it):
        raise RuntimeError("points rescanned")
        yield  # pragma: no cover

    poisoned = pts.mapInPandas(boom, pts.schema)
    got2 = sorted((r["res"], r["cell"], r["cnt"])
                  for r in cell_rollup_pyramid(
                      poisoned, 8, 6, materialize="snapshot",
                      store=store).collect())
    assert got2 == want

    with pytest.raises(ValueError, match="SnapshotStore"):
        cell_rollup_pyramid(pts, 8, 6, materialize="snapshot")


def test_streaming_asof_enrich_matches_batch(tmp_path, spark):
    """streaming_asof_enrich == batch asof_join (backward) row-for-row on
    a CDC-ordered input: three aligned micro-batches per side
    (maxFilesPerTrigger=1), right updates landing mid-stream so matches
    cross batch boundaries AND resolve within a batch; keys with no right
    rows stay null-enriched; tolerance nulls out stale matches."""
    from osmspark.operators.temporal import asof_join
    from osmspark.streaming.temporal import streaming_asof_enrich

    lrows, rrows = [], []
    for k in range(8):
        for t in range(10, 201, 10):
            lrows.append((k, t, float(k * 1000 + t)))
        if k < 6:  # keys 6,7 never get a right row
            for t, price in ((15, 1.5), (95, 9.5), (155, 15.5)):
                rrows.append((k, t + k, price + k, f"tag{k}_{t}"))
    left = spark.createDataFrame(lrows, "user_id long, ts long, value double")
    right = spark.createDataFrame(
        rrows, "user_id long, ts long, price double, tag string")

    ld, rd = str(tmp_path / "asof_l"), str(tmp_path / "asof_r")
    for lo, hi in ((0, 70), (70, 140), (140, 10**9)):
        (left.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
         .coalesce(1).write.mode("append").parquet(ld))
        (right.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
         .coalesce(1).write.mode("append").parquet(rd))

    def run(tol):
        ls = (spark.readStream.schema(left.schema)
              .option("maxFilesPerTrigger", 1).parquet(ld))
        rs = (spark.readStream.schema(right.schema)
              .option("maxFilesPerTrigger", 1).parquet(rd))
        got = ev.run_to_memory(
            streaming_asof_enrich(ls, rs, on="ts", by="user_id",
                                  tolerance=tol),
            f"asof_enrich_{tol}")
        key = ["user_id", "ts"]
        g = sorted([tuple(r) for r in got.collect()])
        b = sorted([tuple(r) for r in asof_join(
            left, right, on="ts", by="user_id", direction="backward",
            tolerance=tol).select(*got.columns).collect()])
        assert g == b
        return got

    got = run(None)
    assert set(got.columns) == {"user_id", "ts", "value", "user_id_right",
                                "ts_right", "price_right", "tag_right"}
    # sanity on the semantics themselves, not just parity: key 0 at ts 100
    # saw the ts-95 update (same batch), at ts 90 the ts-15 one (carried
    # across a batch boundary), and key 7 never matches
    rows = {(r["user_id"], r["ts"]): r for r in got.collect()}
    assert rows[(0, 100)]["ts_right"] == 95
    assert rows[(0, 90)]["ts_right"] == 15
    assert rows[(7, 150)]["ts_right"] is None
    run(50)  # tolerance path, parity-checked inside

    with pytest.raises(ValueError, match="backward"):
        streaming_asof_enrich(left, right, direction="forward")
    with pytest.raises(ValueError, match="collide"):
        streaming_asof_enrich(
            left.withColumn("price_right", F.lit(1)), right)


def test_streaming_asof_enrich_duplicate_right_ts_tiebreak(tmp_path, spark):
    """Equal-timestamp RIGHT rows arriving in the SAME micro-batch resolve
    by the batch operator's field-wise struct tiebreak (greatest value
    row wins, nulls first), not by nondeterministic post-shuffle order —
    parity asserted against batch asof_join on an input that is ALL
    duplicate-ts collisions, including a null-valued contender."""
    from osmspark.operators.temporal import asof_join
    from osmspark.streaming.temporal import streaming_asof_enrich

    # per key: three right rows at the SAME ts with shuffled value order,
    # one of them null-priced (nulls-first => it must lose)
    lrows, rrows = [], []
    for k in range(6):
        lrows += [(k, 50, 1.0), (k, 10, 2.0)]  # one after, one before
        rrows += [(k, 20, 9.0 - k, "mid"), (k, 20, None, "nul"),
                  (k, 20, 20.0 + k, "top")]
    left = spark.createDataFrame(lrows, "user_id long, ts long, value double")
    right = spark.createDataFrame(
        rrows, "user_id long, ts long, price double, tag string")

    ld, rd = str(tmp_path / "dup_l"), str(tmp_path / "dup_r")
    # single file per side => all collisions land in one micro-batch
    left.coalesce(1).write.parquet(ld)
    # shuffle the rights across many partitions, then back to one file so
    # the within-batch order is whatever the exchange produced
    right.repartition(8).coalesce(1).write.parquet(rd)

    ls = spark.readStream.schema(left.schema).parquet(ld)
    rs = spark.readStream.schema(right.schema).parquet(rd)
    got = ev.run_to_memory(
        streaming_asof_enrich(ls, rs, on="ts", by="user_id"), "asof_dup")
    g = sorted([tuple(r) for r in got.collect()])
    b = sorted([tuple(r) for r in asof_join(
        left, right, on="ts", by="user_id", direction="backward")
        .select(*got.columns).collect()])
    assert g == b
    # and the pick is the value-greatest struct, concretely
    rows = {(r["user_id"], r["ts"]): r for r in got.collect()}
    for k in range(6):
        assert rows[(k, 50)]["price_right"] == 20.0 + k
        assert rows[(k, 50)]["tag_right"] == "top"
        assert rows[(k, 10)]["price_right"] is None  # no right at/before 10


def test_streaming_segment_crossings_equals_batch(spark, tmp_path):
    """The segment intersection join streams with a SINGLE native
    midpoint cell on the stream side (static cover buffered by the
    stream's max span): pair set equals the batch operator on the same
    input, with no dedup state; over-span stream segments raise."""
    import numpy as np
    import pytest as _pytest

    from osmspark.operators.intersect import segment_intersection_join
    from osmspark.streaming import spatial as sp

    rng = np.random.default_rng(29)

    def rand_segs(n, max_len):
        rows = []
        for i in range(n):
            la = 1.0 + rng.uniform(0, 0.2)
            lo = 103.0 + rng.uniform(0, 0.2)
            rows.append((f"s{i}", float(la), float(lo),
                         float(la + rng.uniform(-max_len, max_len)),
                         float(lo + rng.uniform(-max_len, max_len))))
        return rows

    schema = ("seg_id string, lat1 double, lon1 double, "
              "lat2 double, lon2 double")
    static_rows = rand_segs(400, 0.03)      # static side: any length
    stream_rows = rand_segs(400, 0.009)     # stream side: bounded span
    static = spark.createDataFrame(static_rows, schema=schema)
    src = str(tmp_path / "seg_stream")
    spark.createDataFrame(stream_rows, schema=schema) \
        .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)

    got = {(r["a_id"], r["b_id"], r["kind"]) for r in ev.run_to_memory(
        sp.streaming_segment_crossings(
            stream, static, res=9, max_stream_span_deg=0.01,
            include_touches=True),
        "t_segx").collect()}
    exp = {(r["a_id"], r["b_id"], r["kind"]) for r in
           segment_intersection_join(
               spark.read.parquet(src), static,
               include_touches=True, res=9).collect()}
    assert got == exp and len(exp) > 20

    # meet-at-most-once without dedup state: no pair appears twice
    raw = ev.run_to_memory(
        sp.streaming_segment_crossings(
            stream, static, res=9, max_stream_span_deg=0.01,
            include_touches=True),
        "t_segx2").groupBy("a_id", "b_id").count().collect()
    assert all(r["count"] == 1 for r in raw)

    # an over-span stream segment raises (riding a consumed column)
    bad_src = str(tmp_path / "seg_stream_bad")
    spark.createDataFrame(
        [("wide", 1.0, 103.0, 1.0, 103.5)], schema=schema
    ).write.mode("overwrite").parquet(bad_src)
    bad = spark.readStream.schema(schema).parquet(bad_src)
    with _pytest.raises(Exception, match="max_stream_span_deg"):
        ev.run_to_memory(
            sp.streaming_segment_crossings(
                bad, static, res=9, max_stream_span_deg=0.01),
            "t_segx_bad").collect()
