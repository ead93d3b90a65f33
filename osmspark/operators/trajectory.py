"""Trajectory operators — stay-point (dwell) detection.

Stay points follow Li et al. (2008), "Mining user similarity based on
location history": scan a time-ordered trajectory; from an anchor point,
extend while every later point stays within `dist` of the ANCHOR; if the
covered time span reaches `min_stay_s`, the covered points collapse to
one stay point (their mean position and time interval) and the scan
resumes AFTER them, else the anchor advances one point.  The algorithm
is inherently sequential within a trajectory — exactly the case the
engine's conventions route through one `applyInPandas` per key: the
shuffle key is the trajectory id, per-task state is one trajectory
(loud `max_traj_rows` guard, never a silent spill), and the inner scan
is vectorized numpy (per-anchor distance slice + argmax, no python
per-point loop).

Determinism: points sort by (ts, lat, lon) inside the group, so equal
timestamps cannot make output depend on shuffle arrival order.  The
anchor rule itself is the paper's (distance to the anchor, not to the
running centroid); `t_end - t_start >= min_stay_s` is inclusive.

Scale shape at 10^9 trajectories: one exchange on traj_id, then
embarrassingly parallel; a single pathological mega-trajectory is the
documented limit (the as-of range-merge note applies — split by day
upstream if one key must exceed the guard).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.geo import haversine_np


def stay_points(
    traj: DataFrame,
    dist: float,
    min_stay_s: float,
    traj_col: str = "traj_id",
    ts_col: str = "ts",
    metric: str = "haversine",
    max_traj_rows: int = 2_000_000,
) -> DataFrame:
    """(traj_id, sp_lat, sp_lon, t_start, t_end, n_points) dwell rows.

    `dist` is meters for metric='haversine', degrees (euclidean on the
    lat/lon plane, the sq_deg convention) for 'sq_deg'.  `ts` may be a
    timestamp or numeric seconds — both compare and return as epoch-
    second doubles.  Boundaries are inclusive on both (<= dist,
    >= min_stay_s)."""
    if metric not in ("haversine", "sq_deg"):
        raise ValueError(f"unknown metric {metric!r}")
    if float(dist) <= 0:
        raise ValueError("dist must be positive")
    id_field = traj.schema[traj_col]
    out_schema = T.StructType([
        T.StructField(traj_col, id_field.dataType),
        T.StructField("sp_lat", T.DoubleType()),
        T.StructField("sp_lon", T.DoubleType()),
        T.StructField("t_start", T.DoubleType()),
        T.StructField("t_end", T.DoubleType()),
        T.StructField("n_points", T.IntegerType()),
    ])
    d = float(dist)
    min_stay = float(min_stay_s)
    use_haversine = metric == "haversine"

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_traj_rows:
            raise RuntimeError(
                f"stay_points: trajectory of {n} rows exceeds "
                f"max_traj_rows={max_traj_rows}; split the key upstream "
                "(e.g. by day) — one trajectory is one task's state"
            )
        pdf = pdf.sort_values([ts_col, "lat", "lon"], kind="mergesort")
        lat = pdf["lat"].to_numpy(dtype=np.float64)
        lon = pdf["lon"].to_numpy(dtype=np.float64)
        ts = pdf[ts_col].to_numpy(dtype=np.float64)
        out = []
        i = 0
        while i < n:
            if use_haversine:
                far = haversine_np(lat[i], lon[i],
                                   lat[i + 1:], lon[i + 1:]) > d
            else:
                far = np.hypot(lat[i + 1:] - lat[i],
                               lon[i + 1:] - lon[i]) > d
            k = int(np.argmax(far)) if far.any() else len(far)
            j = i + 1 + k          # first index OUTSIDE the disk (or n)
            if ts[j - 1] - ts[i] >= min_stay:
                out.append((
                    pdf[traj_col].iloc[0],
                    float(lat[i:j].mean()), float(lon[i:j].mean()),
                    float(ts[i]), float(ts[j - 1]), int(j - i),
                ))
                i = j
            else:
                i += 1
        return pd.DataFrame(
            out, columns=[traj_col, "sp_lat", "sp_lon",
                          "t_start", "t_end", "n_points"],
        ) if out else pd.DataFrame(
            {traj_col: pdf[traj_col].iloc[:0], "sp_lat": [], "sp_lon": [],
             "t_start": [], "t_end": [], "n_points": np.array([], "int32")}
        )

    prepared = traj.select(
        traj_col, F.col(ts_col).cast("double").alias(ts_col), "lat", "lon"
    )
    return prepared.groupBy(traj_col).applyInPandas(detect, out_schema)
