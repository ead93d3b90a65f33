"""Way-geometry derivations — geodesic polyline length and bounding box
per way, reconstructed from the ordered `nd` node-ref chain (the A15
ordered-child invariant is what makes this well-defined; reference parity:
the course project stops at auditing tags — deriving geometry from the
node_refs it preserves (data.py:~L58 [C]) is the natural next query its
users run, e.g. "total road km per street type").

Scale shape (the 10^12-doc lens):
  * refs -> coords is ONE big-big equi-join on the node-ref key (both
    sides shuffle-hash on `ref`; no broadcast assumption — the node table
    is the big table);
  * per-way reassembly is ONE groupBy(way_id) with collect_list +
    array_sort(seq) — partition size is bounded by the longest single way
    (OSM caps ways at 2000 nodes), never by table size, so there is no
    window-over-millions skew;
  * the chain fold (haversine over adjacent resolved pairs) is a native
    aggregate() inside codegen — zero Python end to end.

Dangling refs are first-class: an OSM extract routinely references nodes
outside its bbox.  A missing endpoint BREAKS the chain (no bridging
segment across it — bridging would fabricate geometry); n_refs vs
n_resolved report the damage so audits can threshold on completeness.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_m


def _ref_coords(ways: DataFrame, nodes: DataFrame,
                way_id: str, node_id: str) -> DataFrame:
    """(way_id, seq, __ref, __lat, __lon): ordered nd refs left-joined to
    node coords — the shared reassembly input for way_geometry and
    simplify_ways (one implementation so dangling-ref / ordering
    semantics cannot diverge)."""
    refs = ways.select(
        F.col(way_id).alias("way_id"),
        F.posexplode_outer("nd").alias("seq", "__ref"),
    )
    pts = nodes.select(
        F.col(node_id).alias("__ref"),
        F.col("lat").alias("__lat"),
        F.col("lon").alias("__lon"),
    )
    return refs.join(pts, "__ref", "left")


def way_geometry(ways: DataFrame, nodes: DataFrame,
                 way_id: str = "id", node_id: str = "id") -> DataFrame:
    """Per-way (way_id, n_refs, n_resolved, n_segments, length_m,
    min_lat, max_lat, min_lon, max_lon).

    `ways` needs (way_id, nd array<string>); `nodes` needs
    (node_id, lat, lon).  length_m sums haversine over consecutive
    ref pairs where BOTH endpoints resolved; the bbox covers the
    resolved points."""
    j = _ref_coords(ways, nodes, way_id, node_id)
    agg = j.groupBy("way_id").agg(
        F.count("seq").alias("n_refs"),
        F.count("__lat").alias("n_resolved"),
        F.min("__lat").alias("min_lat"),
        F.max("__lat").alias("max_lat"),
        F.min("__lon").alias("min_lon"),
        F.max("__lon").alias("max_lon"),
        F.array_sort(
            F.collect_list(F.struct("seq", "__lat", "__lon"))
        ).alias("__chain"),
    )
    chain = F.col("__chain")
    # adjacent index pairs (1-based); sequence() counts DOWN when the stop
    # is below the start, so short chains guard to an empty index array
    idx = F.when(
        F.size(chain) >= 2,
        F.sequence(F.lit(1), F.size(chain) - 1),
    ).otherwise(F.array().cast("array<int>"))

    def seg(i):
        a = F.element_at(chain, i)
        b = F.element_at(chain, i + 1)
        d = haversine_m(a["__lat"], a["__lon"], b["__lat"], b["__lon"])
        # null if either endpoint unresolved -> contributes nothing
        return d

    length = F.aggregate(
        idx, F.lit(0.0),
        lambda acc, i: acc + F.coalesce(seg(i), F.lit(0.0)),
    )
    n_segments = F.aggregate(
        idx, F.lit(0),
        lambda acc, i: acc + F.when(seg(i).isNotNull(), 1).otherwise(0),
    )
    return agg.select(
        "way_id", "n_refs", "n_resolved",
        n_segments.alias("n_segments"),
        length.alias("length_m"),
        "min_lat", "max_lat", "min_lon", "max_lon",
    )


def length_by_street_type(ways: DataFrame, nodes: DataFrame,
                          way_id: str = "id") -> DataFrame:
    """Road-kilometers per normalized street type — the composed audit
    query way_geometry exists for: A8 street-type extraction x geometry.
    Ways without an addr:street tag are excluded."""
    from .audit import normalize_streets

    # filter BEFORE the geometry derivation: most ways carry no
    # addr:street tag, and the nd-explode + node join is the expensive
    # part — only ways that can reach the output pay for it
    tagged = ways.filter(F.col("tags")["addr:street"].isNotNull())
    geo = way_geometry(tagged, nodes, way_id=way_id)
    streets = tagged.select(
        F.col(way_id).alias("way_id"),
        F.col("tags")["addr:street"].alias("street"),
    )
    typed = normalize_streets(streets).select("way_id", "normalized_type")
    return (
        typed.join(geo, "way_id")
        .groupBy("normalized_type")
        .agg(
            F.count("*").alias("n_ways"),
            F.sum("length_m").alias("total_m"),
        )
    )


def simplify_ways(ways: DataFrame, nodes: DataFrame,
                  epsilon_m: float,
                  way_id: str = "id", node_id: str = "id") -> DataFrame:
    """Douglas-Peucker polyline simplification per way — the vector-side
    reduction feeding low-zoom tile rendering (render every way at full
    node count at zoom 8 and the raster stage drowns in points whose
    pixel distance is zero).

    Output: (way_id, n_points, n_kept, runs) where `runs` is an array of
    simplified sub-polylines (array<array<struct<lat,lon>>>) — one run
    per maximal RESOLVED stretch of the nd chain, split at dangling refs
    exactly like way_geometry (simplifying across a gap would fabricate
    a shortcut through unknown geometry).  DP guarantee per run: every
    dropped point lies within epsilon_m of the simplified polyline.

    Scale shape: the chain reassembly is the same join + bounded groupBy
    as way_geometry; DP itself is one Arrow pandas UDF over the chain
    column — per-row work is O(n^2) worst / O(n log n) typical in the
    way's OWN length (OSM caps ways at 2000 nodes), embarrassingly
    parallel across ways.  Distances use a per-run equirectangular frame
    (meters, cos-scaled at the run's mean latitude) — exact to ~0.1% at
    way scale, which is inside any sane epsilon."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..config import EARTH_RADIUS_M

    if epsilon_m < 0:
        raise ValueError("epsilon_m must be >= 0")

    chains = (
        _ref_coords(ways, nodes, way_id, node_id)
        .groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq", "__lat", "__lon"))
            ).alias("__chain")
        )
    )

    def _dp_mask(xy: "np.ndarray", eps: float) -> "np.ndarray":
        n = len(xy)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            seg = xy[b] - xy[a]
            L2 = float(seg @ seg)
            mid = xy[a + 1:b] - xy[a]
            if L2 == 0.0:
                d2 = (mid ** 2).sum(axis=1)
            else:
                t = np.clip((mid @ seg) / L2, 0.0, 1.0)
                proj = np.outer(t, seg)
                d2 = ((mid - proj) ** 2).sum(axis=1)
            i = int(np.argmax(d2))
            if d2[i] > eps * eps:
                k = a + 1 + i
                keep[k] = True
                stack.append((a, k))
                stack.append((k, b))
        return keep

    ret_type = T.StructType([
        T.StructField("n_points", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("runs", T.ArrayType(T.ArrayType(T.StructType([
            T.StructField("lat", T.DoubleType()),
            T.StructField("lon", T.DoubleType()),
        ])))),
    ])

    @F.pandas_udf(ret_type)
    def simplify(chain):  # pd.Series[list[dict]] -> pd.DataFrame (struct)
        n_pts, n_kept, runs_out = [], [], []
        for ch in chain:
            lats = np.array(
                [np.nan if c["__lat"] is None else c["__lat"] for c in ch],
                dtype=np.float64)
            lons = np.array(
                [np.nan if c["__lon"] is None else c["__lon"] for c in ch],
                dtype=np.float64)
            ok = ~np.isnan(lats)
            runs = []
            total = int(ok.sum())
            kept = 0
            # maximal resolved stretches
            edges = np.flatnonzero(np.diff(np.concatenate(([0], ok.view(np.int8), [0]))))
            for s, e in zip(edges[::2], edges[1::2]):
                la, lo = lats[s:e], lons[s:e]
                if len(la) == 1:
                    keep = np.array([True])
                else:
                    lat0 = math.radians(float(la.mean()))
                    x = np.radians(lo) * math.cos(lat0) * EARTH_RADIUS_M
                    y = np.radians(la) * EARTH_RADIUS_M
                    keep = _dp_mask(np.stack([x, y], axis=1), epsilon_m)
                kept += int(keep.sum())
                runs.append([{"lat": float(a), "lon": float(o)}
                             for a, o in zip(la[keep], lo[keep])])
            n_pts.append(total)
            n_kept.append(kept)
            runs_out.append(runs)
        return pd.DataFrame(
            {"n_points": n_pts, "n_kept": n_kept, "runs": runs_out})

    return chains.select(
        "way_id", simplify(F.col("__chain")).alias("__s")
    ).select(
        "way_id",
        F.col("__s.n_points").alias("n_points"),
        F.col("__s.n_kept").alias("n_kept"),
        F.col("__s.runs").alias("runs"),
    )
