"""Stay-point detection vs a verbatim python oracle + crafted dwells."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmspark.functions.geo import haversine_np
from osmspark.operators import trajectory as tj


def _oracle(rows, dist, min_stay, metric):
    """Independent reimplementation of Li et al. per trajectory."""
    from collections import defaultdict
    by = defaultdict(list)
    for tid, ts, lat, lon in rows:
        by[tid].append((ts, lat, lon))
    out = []
    for tid, pts in by.items():
        pts.sort()
        n = len(pts)
        i = 0
        while i < n:
            j = i + 1
            while j < n:
                if metric == "haversine":
                    dd = float(haversine_np(pts[i][1], pts[i][2],
                                            pts[j][1], pts[j][2]))
                else:
                    dd = ((pts[i][1] - pts[j][1]) ** 2
                          + (pts[i][2] - pts[j][2]) ** 2) ** 0.5
                if dd > dist:
                    break
                j += 1
            if pts[j - 1][0] - pts[i][0] >= min_stay:
                seg = pts[i:j]
                out.append((tid,
                            sum(p[1] for p in seg) / len(seg),
                            sum(p[2] for p in seg) / len(seg),
                            float(pts[i][0]), float(pts[j - 1][0]),
                            len(seg)))
                i = j
            else:
                i += 1
    return out


def _key(rows):
    return sorted((t, round(a, 9), round(b, 9), s, e, n)
                  for t, a, b, s, e, n in rows)


def _run(spark, rows, dist, min_stay, metric="haversine"):
    df = spark.createDataFrame(
        rows, "traj_id long, ts double, lat double, lon double")
    got = [(r["traj_id"], r["sp_lat"], r["sp_lon"],
            r["t_start"], r["t_end"], r["n_points"])
           for r in tj.stay_points(df, dist, min_stay,
                                   metric=metric).collect()]
    assert _key(got) == _key(_oracle(rows, dist, min_stay, metric))
    return got


def test_crafted_two_dwells(spark):
    """Dwell 600 s at A, transit, dwell 300 s at B; min_stay 240 s."""
    rows = []
    for k in range(5):                                 # A: tight, 600 s
        rows.append((1, 100.0 + 150 * k, 1.3000 + 1e-5 * k, 103.8))
    rows.append((1, 800.0, 1.3200, 103.8))             # transit hop
    for k in range(4):                                 # B: tight, 300 s
        rows.append((1, 900.0 + 100 * k, 1.3400, 103.8 + 1e-5 * k))
    got = _run(spark, rows, 100.0, 240.0)
    assert len(got) == 2
    (a, b) = sorted(got, key=lambda r: r[3])
    assert a[3] == 100.0 and a[4] == 700.0 and a[5] == 5
    assert b[3] == 900.0 and b[4] == 1200.0 and b[5] == 4
    assert abs(a[1] - (1.3 + 2e-5)) < 1e-12            # mean of the 5 lats


def test_boundary_duration_inclusive(spark):
    rows = [(1, 0.0, 1.3, 103.8), (1, 240.0, 1.3, 103.8)]
    assert len(_run(spark, rows, 50.0, 240.0)) == 1    # == min_stay counts
    assert len(_run(spark, rows, 50.0, 240.001)) == 0


def test_random_walks_match_oracle(spark):
    """20 trajectories alternating dwell and move segments."""
    rng = np.random.default_rng(7)
    rows = []
    for tid in range(20):
        lat, lon, t = 1.3, 103.8, 0.0
        for seg in range(6):
            dwell = seg % 2 == 0
            for _ in range(rng.integers(3, 12)):
                t += float(rng.uniform(30, 120))
                step = 0.00005 if dwell else 0.01
                lat += float(rng.uniform(-step, step))
                lon += float(rng.uniform(-step, step))
                rows.append((tid, t, lat, lon))
            if not dwell:
                lat += 0.05                            # decisive relocation
    got = _run(spark, rows, 150.0, 180.0)
    assert len(got) > 10                               # non-vacuous
    _run(spark, rows, 0.002, 180.0, metric="sq_deg")   # sq_deg path too


def test_timestamp_column_casts(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.3, 103.8),
         (1, "2024-01-01 00:05:00", 1.3, 103.8)],
        "traj_id long, ts string, lat double, lon double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = tj.stay_points(df, 50.0, 240.0).collect()
    assert len(out) == 1 and out[0]["t_end"] - out[0]["t_start"] == 300.0


def test_guards(spark):
    df = spark.createDataFrame([(1, 0.0, 1.3, 103.8)],
                               "traj_id long, ts double, lat double, lon double")
    with pytest.raises(ValueError, match="dist"):
        tj.stay_points(df, 0.0, 60.0)
    with pytest.raises(ValueError, match="metric"):
        tj.stay_points(df, 10.0, 60.0, metric="nope")
    with pytest.raises(Exception, match="max_traj_rows"):
        big = spark.createDataFrame(
            [(1, float(i), 1.3, 103.8) for i in range(10)],
            "traj_id long, ts double, lat double, lon double")
        tj.stay_points(big, 10.0, 60.0, max_traj_rows=5).collect()


def test_plan_shape(spark):
    df = spark.createDataFrame([(1, 0.0, 1.3, 103.8)],
                               "traj_id long, ts double, lat double, lon double")
    plan = tj.stay_points(df, 10.0, 60.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan
