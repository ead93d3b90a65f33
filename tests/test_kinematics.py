"""traj_kinematics / spike_flags / despike: hand-built exact cases,
python-oracle equality on random walks (both metrics), NULL contracts,
determinism under equal timestamps, guards, plan shape."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from osmspark.operators.trajectory import (despike, spike_flags,
                                           traj_kinematics)

R = 6371008.8


def _hav(plat, plon, lat, lon):
    dlat = math.radians(lat - plat) / 2
    dlon = math.radians(lon - plon) / 2
    a = (math.sin(dlat) ** 2
         + math.cos(math.radians(plat)) * math.cos(math.radians(lat))
         * math.sin(dlon) ** 2)
    return 2 * R * math.asin(math.sqrt(a))


def _bearing(plat, plon, lat, lon):
    dlon = math.radians(lon - plon)
    y = math.sin(dlon) * math.cos(math.radians(lat))
    x = (math.cos(math.radians(plat)) * math.sin(math.radians(lat))
         - math.sin(math.radians(plat)) * math.cos(math.radians(lat))
         * math.cos(dlon))
    return math.degrees(math.atan2(y, x)) % 360.0


def _kin_oracle(rows, metric):
    """rows: [(traj, ts, lat, lon)] -> {(traj, ts, lat, lon): tuple}"""
    out = {}
    by = {}
    for r in rows:
        by.setdefault(r[0], []).append(r)
    for tid, rs in by.items():
        rs.sort(key=lambda r: (r[1], r[2], r[3]))
        for i, (t, ts, la, lo) in enumerate(rs):
            if i == 0:
                out[(t, ts, la, lo)] = (0, None, None, None, None)
                continue
            _, pts, pla, plo = rs[i - 1]
            dt = ts - pts
            if metric == "haversine":
                d = _hav(pla, plo, la, lo)
                b = _bearing(pla, plo, la, lo)
            else:
                d = math.sqrt((la - pla) ** 2 + (lo - plo) ** 2)
                b = math.degrees(math.atan2(lo - plo, la - pla)) % 360.0
            sp = d / dt if dt > 0 else None
            out[(t, ts, la, lo)] = (i, dt, d, sp, b)
    return out


def test_kinematics_hand_case_haversine(spark):
    # due-north then due-east moves at lat ~0: bearings 0 and 90
    rows = [("a", 0.0, 1.30, 103.80), ("a", 10.0, 1.301, 103.80),
            ("a", 30.0, 1.301, 103.801)]
    df = spark.createDataFrame(
        rows, "traj_id string, ts double, lat double, lon double")
    got = {r["seq"]: r for r in traj_kinematics(df).collect()}
    assert got[0]["dt_s"] is None and got[0]["speed"] is None \
        and got[0]["bearing_deg"] is None and got[0]["dist"] is None
    d1 = _hav(1.30, 103.80, 1.301, 103.80)
    assert abs(got[1]["dist"] - d1) < 1e-9
    assert abs(got[1]["dt_s"] - 10.0) < 1e-12
    assert abs(got[1]["speed"] - d1 / 10.0) < 1e-9
    assert abs(got[1]["bearing_deg"] - 0.0) < 1e-9
    assert abs(got[2]["bearing_deg"] - 90.0) < 1e-3  # east at lat 1.3
    assert abs(got[2]["dt_s"] - 20.0) < 1e-12


def test_kinematics_oracle_equality_both_metrics(spark):
    rng = random.Random(7)
    rows = []
    for tid in range(8):
        la, lo = 1.3 + rng.random() * 0.01, 103.8 + rng.random() * 0.01
        ts = 0.0
        for _ in range(40):
            rows.append((f"t{tid}", ts, round(la, 7), round(lo, 7)))
            ts += rng.randint(1, 30)
            la += (rng.random() - 0.5) * 1e-3
            lo += (rng.random() - 0.5) * 1e-3
    df = spark.createDataFrame(
        rows, "traj_id string, ts double, lat double, lon double")
    for metric in ("haversine", "sq_deg"):
        exp = _kin_oracle(rows, metric)
        for r in traj_kinematics(df, metric=metric).collect():
            e = exp[(r["traj_id"], r["ts"], r["lat"], r["lon"])]
            assert r["seq"] == e[0]
            for got_v, exp_v in zip(
                    (r["dt_s"], r["dist"], r["speed"], r["bearing_deg"]),
                    e[1:]):
                if exp_v is None:
                    assert got_v is None
                else:
                    assert abs(got_v - exp_v) <= 1e-9 * max(1.0, abs(exp_v))


def test_kinematics_dup_ts_and_zero_move(spark):
    rows = [("a", 0.0, 1.30, 103.80),
            ("a", 0.0, 1.31, 103.80),   # same ts, larger lat -> second
            ("a", 5.0, 1.31, 103.80)]   # zero displacement
    df = spark.createDataFrame(
        rows, "traj_id string, ts double, lat double, lon double")
    got = {r["seq"]: r for r in traj_kinematics(df).collect()}
    # (ts, lat, lon) order pins the dup-ts pair; dt 0 -> NULL speed
    assert got[1]["lat"] == 1.31 and got[1]["dt_s"] == 0.0
    assert got[1]["speed"] is None and got[1]["dist"] > 0
    # stationary: dist 0, speed 0, bearing 0 by the atan2(0,0) convention
    assert got[2]["dist"] == 0.0 and got[2]["speed"] == 0.0
    assert got[2]["bearing_deg"] == 0.0


def test_spike_flags_and_despike(spark):
    # steady ~1.1 m/s walk with one teleport in the middle
    rows = []
    for i in range(9):
        la = 1.30 + i * 1e-5
        if i == 4:
            la += 0.01  # ~1.1 km jump, there and back
        rows.append(("a", float(i * 10), la, 103.80))
    # a genuinely fast trajectory: every hop ~111 m / 10 s
    for i in range(5):
        rows.append(("b", float(i * 10), 1.30 + i * 1e-3, 103.80))
    df = spark.createDataFrame(
        rows, "traj_id string, ts double, lat double, lon double")
    got = {(r["traj_id"], r["ts"]): r["is_spike"]
           for r in spike_flags(df, max_speed=30.0).collect()}
    assert got[("a", 40.0)] is True
    assert sum(bool(v) for v in got.values()) == 1  # only the teleport
    assert not any(got[("b", float(i * 10))] for i in range(5))
    clean = despike(df, max_speed=30.0)
    assert clean.count() == len(rows) - 1
    assert clean.columns == df.columns
    assert clean.where("traj_id = 'a' AND ts = 40.0").count() == 0
    # edges are never spikes even when the hop is fast
    e = spark.createDataFrame(
        [("c", 0.0, 1.30, 103.80), ("c", 1.0, 1.40, 103.80)],
        "traj_id string, ts double, lat double, lon double")
    assert all(not r["is_spike"]
               for r in spike_flags(e, max_speed=1.0).collect())


def test_kinematics_guards_and_plan(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 1.3, 103.8)],
        "traj_id string, ts double, lat double, lon double")
    with pytest.raises(ValueError, match="unknown metric"):
        traj_kinematics(df, metric="euclid")
    with pytest.raises(ValueError, match="collide"):
        traj_kinematics(df.withColumn("speed", F.lit(1.0)))
    with pytest.raises(ValueError, match="max_speed"):
        spike_flags(df, max_speed=0.0)
    with pytest.raises(ValueError, match="is_spike"):
        spike_flags(df.withColumn("is_spike", F.lit(False)), 1.0)
    plan = traj_kinematics(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1  # one hash exchange for the window


# --- split_trips -------------------------------------------------------------

def _trips_oracle(rows, gap_s):
    """rows: [(traj, ts, lat, lon)] -> {(traj, ts, lat, lon): trip_seq}"""
    out, by = {}, {}
    for r in rows:
        by.setdefault(r[0], []).append(r)
    for tid, rs in by.items():
        rs.sort(key=lambda r: (r[1], r[2], r[3]))
        trip = 0
        for i, (t, ts, la, lo) in enumerate(rs):
            if i > 0 and ts - rs[i - 1][1] > gap_s:
                trip += 1
            out[(t, ts, la, lo)] = trip
    return out


def test_split_trips_hand_case(spark):
    from osmspark.operators.trajectory import split_trips

    rows = [
        ("a", 0.0, 1.0, 1.0), ("a", 10.0, 1.1, 1.0),   # trip 0
        ("a", 400.0, 1.2, 1.0),                         # gap 390 > 300: trip 1
        ("a", 400.0, 1.3, 1.0),                         # dup ts: same trip
        ("a", 701.0, 1.4, 1.0),                         # gap 301 > 300: trip 2
        ("b", 5.0, 2.0, 2.0),                           # new traj: trip 0
        ("b", 305.0, 2.1, 2.0),                         # gap == 300: NOT a break
    ]
    df = spark.createDataFrame(
        rows, "traj_id string, ts double, lat double, lon double")
    got = {(r["traj_id"], r["ts"], r["lat"], r["lon"]): r["trip_seq"]
           for r in split_trips(df, gap_s=300.0).collect()}
    assert got == _trips_oracle(rows, 300.0)
    assert got[("a", 701.0, 1.4, 1.0)] == 2
    assert got[("b", 305.0, 2.1, 2.0)] == 0  # strict >, not >=


def test_split_trips_vs_duckdb_and_python(spark):
    import duckdb

    from osmspark.operators.trajectory import split_trips

    rng = random.Random(11)
    rows, ts = [], 0.0
    for tid in range(12):
        ts = 0.0
        for _ in range(rng.randrange(1, 60)):
            ts += rng.choice([1.0, 5.0, 30.0, 120.0, 601.0, 3600.0])
            rows.append((f"t{tid}", ts,
                         round(rng.uniform(-1, 1), 6),
                         round(rng.uniform(-1, 1), 6)))
    df = spark.createDataFrame(
        rows, "traj_id string, ts double, lat double, lon double")
    got = {(r["traj_id"], r["ts"], r["lat"], r["lon"]): r["trip_seq"]
           for r in split_trips(df, gap_s=600.0).collect()}
    assert got == _trips_oracle(rows, 600.0)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE f(traj_id VARCHAR, ts DOUBLE, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO f VALUES (?,?,?,?)", rows)
    exp = con.execute("""
        WITH lagged AS (
          SELECT traj_id, ts, lat, lon,
                 ts - lag(ts) OVER w AS dt
          FROM f WINDOW w AS (PARTITION BY traj_id ORDER BY ts, lat, lon)
        )
        SELECT traj_id, ts, lat, lon,
               SUM(CASE WHEN dt > 600.0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY traj_id ORDER BY ts, lat, lon
                       ROWS UNBOUNDED PRECEDING) AS trip_seq
        FROM lagged
    """).fetchall()
    assert {tuple(r[:4]): int(r[4]) for r in exp} == got


def test_split_trips_guards_and_plan(spark):
    from osmspark.operators.trajectory import split_trips

    df = spark.createDataFrame(
        [("a", 0.0, 1.0, 1.0)],
        "traj_id string, ts double, lat double, lon double")
    with pytest.raises(ValueError, match="gap_s"):
        split_trips(df, gap_s=0.0)
    with pytest.raises(ValueError, match="trip_seq"):
        split_trips(df.withColumn("trip_seq", F.lit(1)))
    out = split_trips(df)
    assert out.columns == ["traj_id", "ts", "lat", "lon", "trip_seq"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Cartesian" not in plan
    # one hash exchange on the trajectory key; the running sum reuses
    # the lag window's sort rather than re-exchanging
    assert plan.count("Exchange hashpartitioning") == 1
