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


# --- route similarity -------------------------------------------------------


def test_route_cell_text_collapses_and_orders(spark):
    """A dwell (repeated same point) contributes ONE token; tokens follow
    timestamp order regardless of input row order."""
    rows = [
        (1, 3.0, 1.3002, 103.8002),   # deliberately out of ts order
        (1, 0.0, 1.3000, 103.8000),
        (1, 1.0, 1.3000, 103.8000),   # dwell: same point again
        (1, 2.0, 1.3001, 103.8001),
        (1, 4.0, 1.3000, 103.8000),   # revisit AFTER moving — kept
    ]
    df = spark.createDataFrame(
        rows, "traj_id long, ts double, lat double, lon double")
    txt = tj.route_cell_text(df, res=13).collect()
    assert len(txt) == 1
    toks = txt[0]["text"].split(" ")
    # the two t=0,1 dwell points collapse; the t=4 revisit survives
    # (consecutive-only dedup), so token count is 4 and tok0 == tok3
    # unless res-13 cells merge neighbors (they don't at ~10 m pitch)
    assert len(toks) == 4
    assert toks[0] == toks[3]
    assert toks[0] != toks[1]


def test_route_near_dup_pairs_composition(spark):
    """Same route jittered ~1 m pairs up; a different area does not; the
    REVERSED route shares cells but not bigrams and stays unpaired."""
    base = [(1.30 + 0.001 * i, 103.80 + 0.0015 * i) for i in range(25)]
    rows = []
    for i, (la, lo) in enumerate(base):
        rows.append((10, float(i), la, lo))                 # route A
        rows.append((11, float(i), la + 1e-5, lo - 1e-5))   # A jittered
        rows.append((12, float(i), la + 0.5, lo + 0.5))     # elsewhere
    for i, (la, lo) in enumerate(reversed(base)):
        rows.append((13, float(i), la, lo))                 # A reversed
    df = spark.createDataFrame(
        rows, "traj_id long, ts double, lat double, lon double")
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           tj.route_near_dup_pairs(df, jaccard_threshold=0.5,
                                   res=9).collect()}
    assert (10, 11) in got and got[(10, 11)] > 0.8
    assert all({a, b} == {10, 11} for a, b in got)


def test_hausdorff_matches_python_oracle(spark):
    import random

    rng = random.Random(5)
    rows, trajs = [], {}
    for t in range(6):
        pts = [(1.3 + rng.random() * 0.01, 103.8 + rng.random() * 0.01)
               for _ in range(rng.randint(3, 12))]
        trajs[t] = pts
        rows += [(t, float(i), la, lo) for i, (la, lo) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "traj_id long, ts double, lat double, lon double")
    pairs = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)],
        "a long, b long")

    def oracle(pa, pb, hav):
        def d(p, q):
            if hav:
                return float(haversine_np(
                    np.array([p[0]]), np.array([p[1]]),
                    np.array([q[0]]), np.array([q[1]]))[0])
            return ((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2) ** 0.5

        ab = max(min(d(p, q) for q in pb) for p in pa)
        ba = max(min(d(p, q) for q in pa) for p in pb)
        return max(ab, ba)

    for metric in ("haversine", "sq_deg"):
        got = {(r["a"], r["b"]): r["hausdorff"] for r in
               tj.hausdorff_pairs(df, pairs, metric=metric).collect()}
        assert len(got) == 15
        for (a, b), h in got.items():
            exp = oracle(trajs[a], trajs[b], metric == "haversine")
            assert abs(h - exp) < 1e-9 * max(1.0, exp)


def test_hausdorff_guard_and_metric(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 1.3, 103.8), (1, 1.0, 1.31, 103.81),
         (2, 0.0, 1.3, 103.8)],
        "traj_id long, ts double, lat double, lon double")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="metric"):
        tj.hausdorff_pairs(df, pairs, metric="euclid")
    with pytest.raises(Exception, match="max_traj_rows"):
        tj.hausdorff_pairs(df, pairs, max_traj_rows=1).collect()


# --- OD matrix --------------------------------------------------------------

def test_od_matrix_vs_python_oracle(spark):
    """Random-walk trajectories + crafted edge cases vs a python oracle
    that picks endpoints by the same (ts, lat, lon) ordering and maps
    them through the engine's (separately tested) cell function."""
    import numpy as np
    from osmspark.functions import hexgrid
    from osmspark.operators.trajectory import od_matrix

    rng = np.random.default_rng(31)
    rows = []
    for t in range(40):
        n = int(rng.integers(1, 12))   # incl. single-fix trips
        base_la = 1.0 + rng.uniform(0, 0.5)
        base_lo = 103.0 + rng.uniform(0, 0.5)
        for i in range(n):
            rows.append((f"t{t}", float(i // 3),  # duplicate timestamps
                         float(base_la + rng.uniform(-0.05, 0.05)),
                         float(base_lo + rng.uniform(-0.05, 0.05))))
    rows.append(("null_ts", None, 1.2, 103.2))   # excluded entirely
    rows.append(("null_ts", 5.0, 1.3, 103.3))    # its only real fix
    traj = spark.createDataFrame(
        rows, schema="traj_id string, ts double, lat double, lon double")
    got = {(r["origin_cell"], r["dest_cell"]): r["n_trips"]
           for r in od_matrix(traj, res=8).collect()}

    by_traj = {}
    for tid, ts, la, lo in rows:
        if ts is None:
            continue
        by_traj.setdefault(tid, []).append((ts, la, lo))
    exp = {}
    for tid, fixes in by_traj.items():
        o = min(fixes)
        d = max(fixes)
        oc = int(hexgrid.latlon_to_cell(
            np.array([o[1]]), np.array([o[2]]), 8)[0])
        dc = int(hexgrid.latlon_to_cell(
            np.array([d[1]]), np.array([d[2]]), 8)[0])
        exp[(oc, dc)] = exp.get((oc, dc), 0) + 1
    assert got == exp
    assert sum(got.values()) == len(by_traj)


def test_od_matrix_single_fix_diagonal_and_plan(spark):
    from osmspark.operators.trajectory import od_matrix

    traj = spark.createDataFrame(
        [("solo", 1.0, 1.25, 103.25)],
        schema="traj_id string, ts double, lat double, lon double")
    rows = od_matrix(traj, res=8).collect()
    assert len(rows) == 1
    assert rows[0]["origin_cell"] == rows[0]["dest_cell"]
    assert rows[0]["n_trips"] == 1
    plan = od_matrix(traj, res=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "HashAggregate" in plan
