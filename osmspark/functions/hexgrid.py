"""H3-style hierarchical hexagonal index (B2, SURVEY §2.2) — from scratch.

Implements the published H3 algorithm *structure* — gnomonic projection onto
a face, aperture-7 hexagon grid per resolution with the ~19.1066° inter-
resolution rotation (atan(sqrt(3)/5)), axial-coordinate rounding, k-ring
neighborhoods, and approximate parent/child nesting — on the cube-face
gnomonic chart shared with the S2 module (instead of Uber's icosahedral
chart; no h3 library exists in this sandbox to match bit-identically, see
SURVEY §7.0/§7.2).  Cell ids are therefore self-consistent 64-bit keys with
H3-equivalent semantics (res 7-10, k-ring, parent), not Uber-bit-compatible.

Bit layout (id >= 0, high bit clear):
  [62:59] res (4b) | [58:56] face (3b) | [55:28] q+2^27 | [27:0] r+2^27

All math is numpy-vectorized; Spark surface = Arrow pandas UDFs.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .geo import latlon_to_xyz, xyz_to_latlon
from .s2 import face_uv_to_xyz, xyz_to_face_uv

# aperture-7 rotation between consecutive resolutions (published H3 constant)
ROT_PER_RES = math.atan2(math.sqrt(3.0), 5.0)  # ≈ 0.3334731722 rad = 19.1066°
SQRT7 = math.sqrt(7.0)
RES0_R = 0.35  # res-0 hex circumradius on the face uv plane ([-1,1]^2)
_OFF = 1 << 27
_SQRT3 = math.sqrt(3.0)


def _res_frame(res: int):
    """(hex circumradius, cos, sin of accumulated rotation) at `res`."""
    radius = RES0_R / (SQRT7 ** res)
    theta = ROT_PER_RES * res
    return radius, math.cos(theta), math.sin(theta)


def _xy_to_axial(x, y, res: int):
    """Face-plane xy -> fractional axial (q, r) in the res frame."""
    radius, c, s = _res_frame(res)
    xr = x * c + y * s
    yr = -x * s + y * c
    q = (_SQRT3 / 3.0 * xr - yr / 3.0) / radius
    r = (2.0 / 3.0 * yr) / radius
    return q, r


def _axial_to_xy(q, r, res: int):
    radius, c, s = _res_frame(res)
    xr = radius * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    yr = radius * (1.5 * r)
    # rotate back
    return xr * c - yr * s, xr * s + yr * c


def _axial_round(qf, rf):
    """Cube-coordinate rounding to the nearest hex center (vectorized)."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def pack(res, face, q, r):
    res = np.asarray(res, dtype=np.int64)
    face = np.asarray(face, dtype=np.int64)
    q = np.asarray(q, dtype=np.int64) + _OFF
    r = np.asarray(r, dtype=np.int64) + _OFF
    if np.any((q < 0) | (q >= (1 << 28)) | (r < 0) | (r >= (1 << 28))):
        raise ValueError("axial coordinate out of 28-bit range")
    return (res << 59) | (face << 56) | (q << 28) | r


def unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> 59) & 0xF
    face = (cell >> 56) & 0x7
    q = ((cell >> 28) & ((1 << 28) - 1)) - _OFF
    r = (cell & ((1 << 28) - 1)) - _OFF
    return res, face, q, r


def latlon_to_cell(lat, lon, res: int):
    """lat/lon arrays -> hex cell ids at `res` (vectorized)."""
    x, y, z = latlon_to_xyz(lat, lon)
    face, u, v = xyz_to_face_uv(x, y, z)
    qf, rf = _xy_to_axial(u, v, res)
    q, r = _axial_round(qf, rf)
    return pack(np.full_like(q, res), face, q, r)


def cell_center_latlon(cell):
    """Hex center back to lat/lon (vectorized) — used by parent() and tiles."""
    res, face, q, r = unpack(cell)
    out_lat = np.empty(len(np.atleast_1d(q)), dtype=np.float64)
    out_lon = np.empty_like(out_lat)
    res = np.atleast_1d(res)
    face = np.atleast_1d(face)
    q = np.atleast_1d(q)
    r = np.atleast_1d(r)
    for rv in np.unique(res):
        m = res == rv
        u, v = _axial_to_xy(q[m].astype(np.float64), r[m].astype(np.float64), int(rv))
        x, y, z = face_uv_to_xyz(face[m], u, v)
        la, lo = xyz_to_latlon(x, y, z)
        out_lat[m] = la
        out_lon[m] = lo
    return out_lat, out_lon


def parent_cell(cell, parent_res: int):
    """Approximate-containment parent (H3 semantics: aperture-7 nesting is
    approximate by construction): child center re-assigned at parent res."""
    lat, lon = cell_center_latlon(cell)
    return latlon_to_cell(lat, lon, parent_res)


@functools.lru_cache(maxsize=64)
def kring_offsets(k: int):
    """Axial offsets of the filled k-ring (1 + 3k(k+1) cells): self first,
    then ring by ring (standard hex-ring walk), vectorized for large k.
    Cached per k — callers must not mutate the returned list."""
    if k == 0:
        return [(0, 0)]
    qq, rr = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1),
                         indexing="ij")
    qq, rr = qq.ravel(), rr.ravel()
    dist = (np.abs(qq) + np.abs(rr) + np.abs(qq + rr)) // 2
    keep = dist <= k
    qq, rr, dist = qq[keep], rr[keep], dist[keep]
    # stable order: by ring, then angle-ish (q desc, r asc) — deterministic
    order = np.lexsort((rr, -qq, dist))
    return list(zip(qq[order].tolist(), rr[order].tolist()))


def kring(cell, k: int):
    """cells (n,) -> (n, 1+3k(k+1)) neighbor ids incl. self (vectorized).

    Neighbors are computed in axial space on the same face — exact away from
    face edges (the whole SG bbox sits inside one face)."""
    res, face, q, r = unpack(cell)
    offs = np.array(kring_offsets(k), dtype=np.int64)  # (m, 2)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    resb = np.broadcast_to(res[:, None], qq.shape)
    faceb = np.broadcast_to(face[:, None], qq.shape)
    return pack(resb, faceb, qq, rr)


# --- Spark surface ---------------------------------------------------------
def with_hex_cell_native(df, res: int, lat="lat", lon="lon", out_col=None):
    """Hex cell id via PURE NATIVE column expressions — the whole
    latlon -> xyz -> face/uv -> rotated axial -> cube-round -> pack chain in
    built-in functions, so cell assignment stays inside whole-stage codegen
    (no Python in the headline spatial path; round-2 perf item).

    STAGED on purpose: each step is a separate select() defining named
    intermediates, so every value is computed ONCE per row.  Building this
    as one nested Column expression duplicates each subtree at every
    reference (Catalyst expressions are trees, not DAGs) — measured 6x
    SLOWER than the Arrow UDF before staging.  CollapseProject keeps the
    stages separate because the intermediates are non-cheap and
    multiply-referenced; codegen pipelines them with local variables.

    Bit-parity with the numpy path (`latlon_to_cell`): same constants, same
    rounding (F.rint == np.rint, half-even); JVM-vs-numpy trig can differ by
    ~1 ulp, which can flip a point sitting EXACTLY on a cell boundary to the
    adjacent cell — harmless for the join/kNN contracts (covers pad by >=
    one circumradius; kNN bounds are metric) and asserted absent in tests."""
    if not 0 <= res <= 15:
        raise ValueError("res must be in [0, 15]")
    out_col = out_col or f"hex_r{res}"
    radius, c, s = _res_frame(res)
    C = F.col
    lat_r, lon_r = F.radians(C(lat)), F.radians(C(lon))
    cl = F.cos(lat_r)
    s1 = df.select(
        "*",
        (cl * F.cos(lon_r)).alias("__hx"),
        (cl * F.sin(lon_r)).alias("__hy"),
        F.sin(lat_r).alias("__hz"),
    )
    ax, ay, az = F.abs(C("__hx")), F.abs(C("__hy")), F.abs(C("__hz"))
    face0 = (
        F.when((ax >= ay) & (ax >= az), F.lit(0))
        .when(ay >= az, F.lit(1))
        .otherwise(F.lit(2))
    )
    s2 = s1.select("*", face0.alias("__hf0"))
    major = (
        F.when(C("__hf0") == 0, C("__hx"))
        .when(C("__hf0") == 1, C("__hy"))
        .otherwise(C("__hz"))
    )
    s3 = s2.select(
        "*",
        F.when(major < 0, C("__hf0") + F.lit(3))
        .otherwise(C("__hf0")).alias("__hface"),
    )
    u = (
        F.when(C("__hface") == 0, C("__hy") / C("__hx"))
        .when(C("__hface") == 1, -C("__hx") / C("__hy"))
        .when(C("__hface") == 2, -C("__hx") / C("__hz"))
        .when(C("__hface") == 3, C("__hz") / C("__hx"))
        .when(C("__hface") == 4, C("__hz") / C("__hy"))
        .otherwise(-C("__hy") / C("__hz"))
    )
    v = (
        F.when(C("__hface") == 0, C("__hz") / C("__hx"))
        .when(C("__hface") == 1, C("__hz") / C("__hy"))
        .when(C("__hface") == 2, -C("__hy") / C("__hz"))
        .when(C("__hface") == 3, C("__hy") / C("__hx"))
        .when(C("__hface") == 4, -C("__hx") / C("__hy"))
        .otherwise(-C("__hx") / C("__hz"))
    )
    s4 = s3.select("*", u.alias("__hu"), v.alias("__hv"))
    xr = C("__hu") * F.lit(c) + C("__hv") * F.lit(s)
    yr = -C("__hu") * F.lit(s) + C("__hv") * F.lit(c)
    s5 = s4.select("*", xr.alias("__hxr"), yr.alias("__hyr"))
    qf = (F.lit(_SQRT3 / 3.0) * C("__hxr") - C("__hyr") / F.lit(3.0)) / F.lit(radius)
    rf = (F.lit(2.0 / 3.0) * C("__hyr")) / F.lit(radius)
    s6 = s5.select("*", qf.alias("__hqf"), rf.alias("__hrf"),
                   (-qf - rf).alias("__hsf"))
    s7 = s6.select(
        "*",
        F.rint(C("__hqf")).alias("__hq0"),
        F.rint(C("__hrf")).alias("__hr0"),
        F.rint(C("__hsf")).alias("__hs0"),
    )
    dq = F.abs(C("__hq0") - C("__hqf"))
    dr = F.abs(C("__hr0") - C("__hrf"))
    ds = F.abs(C("__hs0") - C("__hsf"))
    s8 = s7.select("*", dq.alias("__hdq"), dr.alias("__hdr"), ds.alias("__hds"))
    fix_q = (C("__hdq") > C("__hdr")) & (C("__hdq") > C("__hds"))
    fix_r = ~fix_q & (C("__hdr") > C("__hds"))
    # when fix_r holds, fix_q is false, so the q in (-q - s) is still q0
    q = F.when(fix_q, -C("__hr0") - C("__hs0")).otherwise(C("__hq0")).cast("long")
    r = F.when(fix_r, -C("__hq0") - C("__hs0")).otherwise(C("__hr0")).cast("long")
    s9 = s8.select("*", q.alias("__hq"), r.alias("__hr"))
    packed = (
        F.shiftleft(F.lit(res).cast("long"), 59)
        .bitwiseOR(F.shiftleft(C("__hface").cast("long"), 56))
        .bitwiseOR(F.shiftleft(C("__hq") + F.lit(_OFF), 28))
        .bitwiseOR(C("__hr") + F.lit(_OFF))
    )
    # coalesce to a sentinel: (a) null coords -> -1, which matches no real
    # cell in any equi-join (inner joins drop them, same as the UDF path's
    # null); (b) the column becomes NON-NULLABLE, so joins on it generate
    # no isnotnull predicate — Catalyst pushes such predicates below the
    # staged projects by INLINING the whole expression tree into the
    # filter, which re-created the 6x duplication blowup this staging
    # exists to avoid (measured; see plan in EXPLAINS.md).
    packed = F.coalesce(packed, F.lit(-1).cast("long"))
    tmp = [col for col in s9.columns if col.startswith("__h")]
    return s9.select("*", packed.alias(out_col)).drop(*tmp)


def hex_cell_udf(res: int):
    if not 0 <= res <= 15:
        raise ValueError("res must be in [0, 15]")

    @F.pandas_udf(T.LongType())
    def hex_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(latlon_to_cell(lat.to_numpy(), lon.to_numpy(), res))

    return hex_cell


def with_hex_cell(df, res: int, lat="lat", lon="lon", out_col=None,
                  native: bool = True):
    """Adds the hex cell column.  native=True (default) uses the staged
    column-expression path (whole-stage codegen, zero Python);
    native=False keeps the Arrow pandas UDF (numpy) path — tested equal."""
    out_col = out_col or f"hex_r{res}"
    if native:
        return with_hex_cell_native(df, res, lat, lon, out_col)
    return df.withColumn(out_col, hex_cell_udf(res)(F.col(lat), F.col(lon)))


def kring_udf(k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def hex_kring(cell: pd.Series) -> pd.Series:
        arr = kring(cell.to_numpy(), k)
        return pd.Series(list(arr))

    return hex_kring


def parent_udf(parent_res: int):
    """Arrow pandas UDF: cell id -> approximate-containment parent id at
    `parent_res` (child center re-assigned, H3 aperture-7 semantics)."""

    @F.pandas_udf(T.LongType())
    def hex_parent(cell: pd.Series) -> pd.Series:
        return pd.Series(parent_cell(cell.to_numpy(), parent_res))

    return hex_parent
