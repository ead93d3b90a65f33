"""Geodesic helpers — native-column haversine + numpy twin.

The native version keeps distance ranking inside whole-stage codegen (used
by the kNN operator B5); the numpy twin serves pandas-UDF internals and the
pytest brute-force oracles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import EARTH_RADIUS_M


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters, pure built-in functions (JVM-side)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def sq_deg_dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Squared equirectangular degree distance — monotone with true distance
    at city scale; exactly reproducible in ANSI SQL (oracle-friendly)."""
    return (lat1 - lat2) ** 2 + (lon1 - lon2) ** 2


def haversine_np(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, dtype=np.float64))
                              for x in (lat1, lon1, lat2, lon2))
    a = (np.sin((lat2 - lat1) / 2) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2)
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def latlon_to_xyz(lat_deg, lon_deg):
    """Unit-sphere cartesian (numpy)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def xyz_to_latlon(x, y, z):
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon
