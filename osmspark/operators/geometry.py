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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_m


def way_geometry(ways: DataFrame, nodes: DataFrame,
                 way_id: str = "id", node_id: str = "id") -> DataFrame:
    """Per-way (way_id, n_refs, n_resolved, n_segments, length_m,
    min_lat, max_lat, min_lon, max_lon).

    `ways` needs (way_id, nd array<string>); `nodes` needs
    (node_id, lat, lon).  length_m sums haversine over consecutive
    ref pairs where BOTH endpoints resolved; the bbox covers the
    resolved points."""
    refs = ways.select(
        F.col(way_id).alias("way_id"),
        F.posexplode_outer("nd").alias("seq", "__ref"),
    )
    pts = nodes.select(
        F.col(node_id).alias("__ref"),
        F.col("lat").alias("__lat"),
        F.col("lon").alias("__lon"),
    )
    j = refs.join(pts, "__ref", "left")
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

    geo = way_geometry(ways, nodes, way_id=way_id)
    streets = ways.filter(F.col("tags")["addr:street"].isNotNull()).select(
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
