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


def kring_offsets(k: int):
    """Axial offsets of the filled k-ring (1 + 3k(k+1) cells): self first,
    then ring by ring (standard hex-ring walk), vectorized for large k."""
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
def hex_cell_udf(res: int):
    if not 0 <= res <= 15:
        raise ValueError("res must be in [0, 15]")

    @F.pandas_udf(T.LongType())
    def hex_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(latlon_to_cell(lat.to_numpy(), lon.to_numpy(), res))

    return hex_cell


def with_hex_cell(df, res: int, lat="lat", lon="lon", out_col=None):
    out_col = out_col or f"hex_r{res}"
    return df.withColumn(out_col, hex_cell_udf(res)(F.col(lat), F.col(lon)))


def kring_udf(k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def hex_kring(cell: pd.Series) -> pd.Series:
        arr = kring(cell.to_numpy(), k)
        return pd.Series(list(arr))

    return hex_kring
