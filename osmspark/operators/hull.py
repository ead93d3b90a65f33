"""Per-group convex hulls over point sets — coverage footprints,
cluster outlines, dispatch regions.

Reference parity: the course project has no hull machinery (its
region-of-interest is one city's bounding box); this is the §2.6-class
geometry extension a geospatial engine needs the moment "which area do
these points cover" is asked at corpus scale.

Algorithm: Andrew's monotone chain (1979) per group, in numpy inside
applyInPandas.  The scale story is the TWO-PHASE decomposition, which
works because hulls are an algebraic aggregate — hull(A ∪ B) =
hull(hull(A) ∪ hull(B)):

  phase 1  points salt into `n_presplit` sub-groups per key; each
           sub-group reduces to ITS OWN hull vertices (a hull of m
           points has O(m^(1/3)) expected vertices for uniform clouds,
           and <= m always) — the one pass that touches every point is
           map-shaped and spreads over n_presplit tasks per key;
  phase 2  only the surviving vertices shuffle to the key's reducer,
           which runs the same chain on the tiny union.

So a 10^9-point group never serializes through one task and never
collect_list's raw points; what reaches the final task is bounded by
n_presplit x (phase-1 hull sizes).  Hot-key behavior is the salted
top-N/stratified-sample discipline (textstats.py) applied to geometry.

Float determinism: the chain's only predicate is the cross product of
coordinate differences — IEEE-exact for the orientation SIGN whenever
inputs are exactly representable; ordering is a total (x, y) sort, so
a fixed point set yields one fixed hull.  Two-phase == single-phase
EXACTLY for points in general position; points collinear ON a hull
edge may be kept or dropped depending on the split (both are valid
hulls of the same region — strictly convex vertices always agree).
`strict=True` (default) drops collinear boundary points in BOTH phases,
so the vertex set is the canonical minimal hull and the two-phase
equality is exact for exactly-representable inputs.

Output ring is counter-clockwise in (lon, lat) plane order, closed
(first vertex repeated last), starting from the lexicographically
smallest (lon, lat) vertex — a canonical form a test can compare
byte-for-byte.  Degenerate groups are honest: one point -> a 1-vertex
"ring" (closed form repeats it), collinear sets -> the 2-vertex
diameter segment; never a silent drop, never a fake triangle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _chain(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Monotone chain -> indices of hull vertices, CCW from the smallest
    (lon, lat), OPEN (no closing repeat).  Strictly convex: collinear
    boundary points are dropped (cross <= 0 rejected)."""
    pts = np.stack([lon, lat], axis=1)
    # unique sorted (lon, lat): duplicates break the chain's invariants
    pts = np.unique(pts, axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    def half(p):
        out = []
        for q in p:
            while len(out) >= 2:
                a, b = out[-2], out[-1]
                if (b[0] - a[0]) * (q[1] - a[1]) \
                        - (b[1] - a[1]) * (q[0] - a[0]) <= 0.0:
                    out.pop()
                else:
                    break
            out.append(q)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    if len(ring) < 3:          # all collinear: keep the diameter segment
        return np.array([pts[0], pts[-1]])
    return ring


_HULL_FIELDS = (
    "hull array<struct<lat:double,lon:double>>, n_vertices int, "
    "n_points bigint")


def convex_hull(points: DataFrame, by: str | None = None,
                lat: str = "lat", lon: str = "lon",
                n_presplit: int = 16) -> DataFrame:
    """(by?, hull, n_vertices, n_points): the convex hull ring of each
    group's points (CCW, closed, canonical start — see module doc),
    its open-vertex count, and the group's total point count.  With
    `by=None` the whole frame is one group (output has no key column).
    Null coordinates raise executor-side — a dropped point would make
    the hull silently wrong in the one way no downstream check catches.
    """
    if n_presplit < 1:
        raise ValueError("n_presplit must be >= 1")
    key = by
    guard = F.when(
        F.col(lat).isNull() | F.col(lon).isNull(),
        F.raise_error(F.lit(
            "convex_hull: null lat/lon — filter or repair upstream; a "
            "silently dropped point could change the hull")),
    ).otherwise(F.col(lat))
    base = points.select(
        *( [F.col(key).alias("__k")] if key else [F.lit(1).alias("__k")] ),
        guard.alias("__lat"), F.col(lon).alias("__lon"),
        F.pmod(F.xxhash64(F.col(lat), F.col(lon)), F.lit(n_presplit))
        .alias("__salt"),
    )

    ktype = dict(base.dtypes)["__k"]
    part_schema = f"__k {ktype}, __lat double, __lon double, __n bigint"

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        ring = _chain(pdf["__lon"].to_numpy(), pdf["__lat"].to_numpy())
        # the sub-group's point count rides on ONE row only — phase 2
        # sums the column, and every hull vertex repeating it would
        # multiply the total by the vertex count
        n = np.zeros(len(ring), dtype=np.int64)
        n[0] = len(pdf)
        return pd.DataFrame({
            "__k": pdf["__k"].iloc[0],
            "__lat": ring[:, 1], "__lon": ring[:, 0],
            "__n": n,
        })

    part = base.groupBy("__k", "__salt").applyInPandas(partial, part_schema)

    out_schema = f"__k {ktype}, {_HULL_FIELDS}"

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        ring = _chain(pdf["__lon"].to_numpy(), pdf["__lat"].to_numpy())
        closed = np.vstack([ring, ring[:1]])
        return pd.DataFrame({
            "__k": [pdf["__k"].iloc[0]],
            "hull": [[{"lat": float(la), "lon": float(lo)}
                      for lo, la in closed]],
            "n_vertices": [len(ring)],
            "n_points": [int(pdf["__n"].sum())],
        })

    res = part.groupBy("__k").applyInPandas(final, out_schema)
    if key:
        return res.withColumnRenamed("__k", key)
    return res.drop("__k")
