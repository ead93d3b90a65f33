"""Multi-source shortest paths over the way graph — travel distance,
isochrone seeds, nearest-facility assignment.

Reference parity: the course project preserves the ordered nd chains
(data.py:~L58 [C]); `way_edges` turns them into the weighted node graph
(one ref equi-join + one bounded groupBy, exactly `geometry.way_geometry`'s
reassembly shape), and `shortest_paths` is the distributed Bellman-Ford
fixpoint over it — the graph-iteration loop discipline shared with
`pagerank` and the component engine:

  * per round: ONE equi-join (frontier onto the edge table) + ONE
    groupBy(dst) min + ONE full-outer merge with the settled distances;
  * the settled frame is localCheckpoint'd each round and the superseded
    round's blocks are unpersisted on swap (the lineage-leak class both
    other loop engines hit, fixed here from the start);
  * ONE driver action per round returning exactly one scalar (the
    improved-node count — the documented-scalar contract);
  * only the IMPROVED nodes re-propagate (delta frontier), so late
    rounds touch the settling frontier, not the whole graph.

Distances settle to the GLOBAL lexicographic minimum of
(dist, source id): ties on distance break toward the smaller source id
regardless of which round each path arrives in (the improvement
predicate accepts equal-distance/smaller-source), so the fixpoint is a
pure function of (edges, sources) — reproducible against an
independent Dijkstra oracle, never of round arrival order.

Scale shape at 10^9 edges: every round is an equi-join on the node key
— shuffle-partitioned, no broadcast assumption on either side; round
count is the HOP diameter of the graph (a continental road network is
a few thousand hops — the documented limit; delta-stepping bucketing
would trade rounds for per-round work and is noted, not implemented).
Non-convergence within max_rounds raises (strict=True), matching the
engine's loud-guard convention; negative or null edge weights raise
executor-side — silent acceptance would break the monotone-settling
argument.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_m
from .geometry import _ref_coords


def way_edges(ways: DataFrame, nodes: DataFrame,
              way_id: str = "id", node_id: str = "id",
              bidirectional: bool = True) -> DataFrame:
    """(src, dst, w_m): one edge per consecutive resolved nd pair (plus
    the reverse edge when bidirectional).  Dangling refs break the
    chain, as everywhere in the geometry family.  Parallel edges from
    overlapping ways are collapsed to the minimum weight (shortest
    paths only ever use the cheapest)."""
    j = _ref_coords(ways, nodes, way_id, node_id)
    agg = j.groupBy("way_id").agg(
        F.array_sort(
            F.collect_list(F.struct("seq", "__ref", "__lat", "__lon"))
        ).alias("__chain"),
    )
    chain = F.col("__chain")
    idx = F.when(
        F.size(chain) >= 2,
        F.sequence(F.lit(1), F.size(chain) - 1),
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(chain, i)["__ref"].alias("src"),
                F.element_at(chain, i + 1)["__ref"].alias("dst"),
                haversine_m(
                    F.element_at(chain, i)["__lat"],
                    F.element_at(chain, i)["__lon"],
                    F.element_at(chain, i + 1)["__lat"],
                    F.element_at(chain, i + 1)["__lon"],
                ).alias("w_m"),
            ),
        ),
        lambda s: s["w_m"].isNotNull(),
    )
    e = (
        agg.select(F.explode(pairs).alias("__e"))
        .select(F.col("__e")["src"].alias("src"),
                F.col("__e")["dst"].alias("dst"),
                F.col("__e")["w_m"].alias("w_m"))
    )
    if bidirectional:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "w_m"))
    return e.groupBy("src", "dst").agg(F.min("w_m").alias("w_m"))


def shortest_paths(edges: DataFrame, sources: DataFrame,
                   max_rounds: int = 200, strict: bool = True,
                   stats_out: dict | None = None) -> DataFrame:
    """(node, dist_m, source): distance to — and identity of — the
    nearest source, for every node REACHABLE from some source
    (unreachable nodes are absent, never rows with a sentinel).

    `edges` is (src, dst, w_m) directed (run `way_edges` for roads);
    `sources` needs a `node` column and optionally `source` (a label;
    defaults to the node itself).  Ties on distance settle toward the
    smaller source label, globally."""
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    ew = edges.select(
        "src", "dst",
        F.when(
            F.col("w_m").isNull() | (F.col("w_m") < 0),
            F.raise_error(F.concat(
                F.lit("shortest_paths: null/negative edge weight at src="),
                F.col("src").cast("string"),
                F.lit(" — monotone settling requires w_m >= 0"))),
        ).otherwise(F.col("w_m")).alias("w_m"),
    ).localCheckpoint(eager=True)

    src_col = ("source" if "source" in sources.columns else "node")
    dist = (
        sources.select("node", F.col(src_col).alias("source"))
        .groupBy("node")
        .agg(F.min("source").alias("source"))
        .select("node", F.lit(0.0).alias("dist_m"), "source")
        .localCheckpoint(eager=True)
    )
    frontier = dist
    prev_ck = dist   # the checkpointed frame whose blocks back dist/frontier

    converged = False
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        cand = (
            frontier.join(ew, frontier["node"] == ew["src"])
            .groupBy("dst")
            .agg(F.min(F.struct(
                (F.col("dist_m") + F.col("w_m")).alias("d"),
                F.col("source").alias("s"))).alias("__c"))
            .select(F.col("dst").alias("__cn"),
                    F.col("__c")["d"].alias("__cd"),
                    F.col("__c")["s"].alias("__cs"))
        )
        merged = (
            dist.join(cand, dist["node"] == cand["__cn"], "full_outer")
            .select(
                F.coalesce(F.col("node"), F.col("__cn")).alias("node"),
                F.col("dist_m"), F.col("source"),
                F.col("__cd"), F.col("__cs"),
            )
            .select(
                "node",
                # lexicographic improvement: strictly nearer, or equally
                # near from a smaller source label
                (F.col("__cd").isNotNull()
                 & (F.col("dist_m").isNull()
                    | (F.col("__cd") < F.col("dist_m"))
                    | ((F.col("__cd") == F.col("dist_m"))
                       & (F.col("__cs") < F.col("source"))))
                 ).alias("__imp"),
                "dist_m", "source", "__cd", "__cs",
            )
            .select(
                "node", "__imp",
                F.when(F.col("__imp"), F.col("__cd"))
                .otherwise(F.col("dist_m")).alias("dist_m"),
                F.when(F.col("__imp"), F.col("__cs"))
                .otherwise(F.col("source")).alias("source"),
            )
            .localCheckpoint(eager=True)
        )
        n_imp = merged.where("__imp").count()   # the one driver scalar
        # release the superseded round's checkpoint blocks — unpersist on
        # the CHECKPOINTED frame itself (a derived select's unpersist is a
        # no-op), the pagerank/component-engine discipline
        prev_ck.unpersist()
        prev_ck = merged
        dist = merged.select("node", "dist_m", "source")
        frontier = merged.where("__imp").select("node", "dist_m", "source")
        if n_imp == 0:
            converged = True
            break
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["converged"] = converged
    if not converged:
        msg = (f"shortest_paths did NOT settle within max_rounds="
               f"{max_rounds} (graph hop diameter exceeds the budget)")
        if strict:
            raise RuntimeError(msg)
        print(f"WARNING: {msg}")
    return dist


def isochrone_cells(edges: DataFrame, nodes: DataFrame, sources: DataFrame,
                    bands_m: Sequence[float], res: int, *,
                    node_id: str = "id", lat: str = "lat", lon: str = "lon",
                    by_source: bool = False, max_rounds: int = 200,
                    strict: bool = True,
                    stats_out: dict | None = None) -> DataFrame:
    """Reachability isochrones on the hex lattice: (cell, band_m,
    min_dist_m, n_nodes) — every res-`res` cell holding a graph node
    whose network distance from the nearest source is <= some band,
    labelled with the SMALLEST band that covers it (band boundaries are
    inclusive).  Cells whose nearest node sits beyond the outermost
    band are absent, as are graph nodes missing from `nodes` (no
    coordinates -> no cell; same inner-join stance as the geometry
    family).

    `by_source=True` adds the `source` column: the lattice partitioned
    by NEAREST source (network Voronoi), i.e. each node is attributed
    to the one source that settled it — NOT independent per-source
    isochrones, which would need one run per source (ties on distance
    settle toward the smaller source label, so the partition is
    deterministic).

    Composition, and the scale shape on top of `shortest_paths`: the
    settled distances (already the fixpoint's localCheckpoint) take ONE
    node-keyed equi-join onto the coordinate table, the native hex
    assignment (whole-stage codegen), a pre-aggregation filter to the
    outermost band — the min-per-cell is unchanged by it, because any
    cell whose true minimum survives keeps the minimizing node — and
    ONE groupBy(cell) with a map-side-combining min/count.  Banding is
    a native CASE chain.  Nothing here broadcasts or collects."""
    bands = [float(b) for b in bands_m]
    if not bands:
        raise ValueError("bands_m must name at least one band")
    if any(b <= 0 for b in bands) or sorted(set(bands)) != bands:
        raise ValueError(
            f"bands_m must be positive and strictly increasing: {bands_m!r}")
    from ..functions.hexgrid import with_hex_cell

    dist = shortest_paths(edges, sources, max_rounds=max_rounds,
                          strict=strict, stats_out=stats_out)
    pts = nodes.select(F.col(node_id).alias("node"),
                       F.col(lat).alias("__lat"), F.col(lon).alias("__lon"))
    keys = (["source", "cell"] if by_source else ["cell"])
    assigned = with_hex_cell(
        dist.join(pts, "node").where(F.col("dist_m") <= F.lit(bands[-1])),
        res, lat="__lat", lon="__lon", out_col="cell")
    per_cell = assigned.groupBy(*keys).agg(
        F.min("dist_m").alias("min_dist_m"),
        F.count("*").alias("n_nodes"))
    band = F.lit(None).cast("double")
    for b in reversed(bands):
        band = F.when(F.col("min_dist_m") <= F.lit(b), F.lit(b)) \
            .otherwise(band)
    return per_cell.select(*keys, band.alias("band_m"),
                           "min_dist_m", "n_nodes")
