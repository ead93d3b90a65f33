"""Graph statistics over extracted edge tables — triangle counting,
clustering coefficients, and k-core decomposition.

Complements the engine's other graph consumers (PageRank authority,
multi-source shortest paths, connected-component keep-lists): triangles
are the community-structure primitive — a road grid is triangle-poor, a
social/citation graph triangle-rich; the local clustering coefficient
flags near-clique neighborhoods (dedup families, link farms).

Algorithm: degree-ordered edge orientation (Cohen 2009 / Suri & Vassilvitskii
2011 "Counting Triangles and the Curse of the Last Reducer" — the
canonical MapReduce shape, re-expressed as two DataFrame joins):

1. canonicalize: drop self-loops, dedupe to undirected (lo, hi) pairs;
2. rank vertices by (degree, id) and orient every edge low -> high;
   each vertex's out-degree is then <= sqrt(2m), so
3. wedges = oriented JOIN oriented on the common LOW vertex (the pivot is
   always the triangle's lowest-rank vertex — each triangle forms exactly
   ONE wedge that can close), and
4. close = wedge JOIN oriented edges on the (v, w) pair.

Every counting step is a native equi-join/aggregate: two shuffles beyond
the degree count, no Python, no iteration (k_core, below, is the one
iterative member — the standard peel under the engine's graph-loop
discipline).  Skewed hubs are exactly what the
orientation neutralizes — the "last reducer" hub vertex becomes the HIGH
end of its edges and pivots almost nothing.

SQL-expressible: the pytest oracle runs the same joins in DuckDB on the
real way graph (plus closed-form fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected simple edge set as (lo, hi), lo < hi: self-loops dropped,
    duplicates and reverse duplicates collapsed."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("lo"),
        F.greatest(F.col(src), F.col(dst)).alias("hi"),
    ).filter(F.col("lo") != F.col("hi")).distinct()
    return e


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    per_vertex: bool = False,
    materialize: bool = True,
    broadcast_vertex_limit: int = 4_000_000,
    join_strategy: str = "shuffle_hash",
    _edges_canonical: bool = False,
    _deg: DataFrame | None = None,
) -> DataFrame:
    """Triangles in the undirected simple graph of `edges`.

    Returns a single row (n_triangles: long) — or, with per_vertex=True,
    (vertex, n_triangles) counting the triangles each vertex belongs to
    (isolated / triangle-free vertices are absent; inner semantics like
    the engine's other joins).

    Self-loops are ignored; parallel and reverse-duplicate edges collapse
    to one undirected edge.

    materialize=True (default) localCheckpoints the canonical edge set,
    the degree table, and the oriented edge set before they are reused —
    without it the plan tree references each of them from several
    branches and Spark RE-EXECUTES the shared subtrees per reference
    (measured on the 8M-edge scaling graph: the canonical DISTINCT ran
    ~7x — under both degree-union arms of both rank joins plus the
    closing probe — and the full two-join oriented subtree ran twice
    under the wedge self-join, with no runtime exchange reuse).  The
    checkpoints follow the engine's graph-loop discipline (superseded
    frames unpersisted as soon as their consumer is materialized); pass
    materialize=False to compose a pure plan when the caller checkpoints
    its own canonical edges.

    The degree-attach joins broadcast when the vertex count (measured on
    the checkpointed degree table, one in-memory scan) is at most
    `broadcast_vertex_limit` (~16 bytes/row for integral ids, default ≈
    the session's 64 MB broadcast budget; non-integral vertex ids build a
    fatter hash relation, so the limit is scaled down 8x for them — an
    explicit broadcast hint bypasses Spark's size-based safety, so the
    gate must be conservative); above it — e.g. web-scale vertex sets —
    they stay partitioned joins.

    join_strategy='shuffle_hash' (default) hints the wedge and closing
    joins to shuffled HASH joins: a sort-merge join must SORT the wedge
    set — ~sum(out-degree^2) rows, the largest frame the job touches —
    while a hash join builds on the edge side and streams the wedges
    unsorted.  Measured on the 8M-edge scaling graph (BENCH_TRI_JOIN_AB):
    ~1.3x faster at both 2 and 8 cores with slightly better 2->8 scaling
    (0.727 vs 0.693).  Per-partition build memory is the usual SHJ
    contract (edge bytes / shuffle partitions; AQE skew-split applies);
    pass 'sort_merge' to force the spill-safe plan."""
    if join_strategy not in ("shuffle_hash", "sort_merge"):
        raise ValueError(
            f"join_strategy must be 'shuffle_hash' or 'sort_merge', "
            f"got {join_strategy!r}")
    if _edges_canonical:
        # internal fast path (clustering_coefficient): caller guarantees a
        # canonical, already-materialized (lo, hi) edge set — skip the
        # redundant DISTINCT shuffle + checkpoint write
        e = edges
    else:
        e = _canonical_edges(edges, src, dst)
        if materialize:
            e = e.localCheckpoint()

    if _deg is not None:
        deg = _deg
    else:
        deg = e.select(
            F.explode(F.array(F.col("lo"), F.col("hi"))).alias("v")
        ).groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        if materialize:
            deg = deg.localCheckpoint()
    # rank = (deg, id): total order; orient edges rank-low -> rank-high
    small_deg = False
    if materialize:
        # the row-count gate assumes ~16 bytes/row (long id + long count);
        # string vertex ids build a far fatter hash relation, so scale the
        # limit down rather than force a broadcast past the session's
        # size-based safety (review catch: an explicit F.broadcast skips
        # autoBroadcastJoinThreshold entirely)
        limit = broadcast_vertex_limit
        if not isinstance(deg.schema["v"].dataType,
                          (T.LongType, T.IntegerType, T.ShortType)):
            limit //= 8
        small_deg = deg.count() <= limit
    dl = deg.select(F.col("v").alias("lo"), F.col("deg").alias("dlo"))
    dh = deg.select(F.col("v").alias("hi"), F.col("deg").alias("dhi"))
    if small_deg:
        dl, dh = F.broadcast(dl), F.broadcast(dh)
    ranked = e.join(dl, "lo").join(dh, "hi")
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("w"),
    )
    if materialize:
        oriented = oriented.localCheckpoint()
        if _deg is None:
            deg.unpersist()  # caller-supplied frames stay the caller's

    a = oriented.select(F.col("u"), F.col("w").alias("x"))
    b = oriented.select(F.col("u"), F.col("w").alias("y"))
    # one wedge per unordered (x, y) pair at pivot u — ordered by ID so
    # the closing probe against the canonical (lo < hi, also ID order)
    # edge set is a PLAIN equi-join (an OR-of-orientations condition
    # would fall off the hash-join path)
    if join_strategy == "shuffle_hash":
        b = b.hint("shuffle_hash")
    wedges = a.join(b, "u").filter(F.col("x") < F.col("y"))
    closing = e.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    if join_strategy == "shuffle_hash":
        closing = closing.hint("shuffle_hash")
    tri = wedges.join(closing, ["x", "y"], "inner").select("u", "x", "y")
    if not per_vertex:
        return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    # one explode pass credits all three corners — a union of three
    # selects over `tri` would re-execute the wedge+close joins 3x
    verts = tri.select(
        F.explode(F.array("u", "x", "y")).alias("vertex"))
    return verts.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(vertex, deg, n_triangles, coeff): local clustering coefficient
    2*T(v) / (deg(v) * (deg(v)-1)); degree-1 vertices get coeff 0.0,
    vertices in no triangle get n_triangles 0 (left semantics over the
    degree table — every non-isolated vertex appears)."""
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    deg = e.select(
        F.explode(F.array(F.col("lo"), F.col("hi"))).alias("vertex")
    ).groupBy("vertex").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    # hand the checkpointed degree table through so triangle_count does
    # not run the identical aggregate a second time (review catch)
    tri = triangle_count(
        e, src="lo", dst="hi", per_vertex=True, _edges_canonical=True,
        _deg=deg.select(F.col("vertex").alias("v"), "deg"))
    j = deg.join(tri, "vertex", "left").select(
        "vertex", "deg",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    )
    return j.withColumn(
        "coeff",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("n_triangles")
            / (F.col("deg") * (F.col("deg") - F.lit(1))),
        ).otherwise(F.lit(0.0)),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 500,
) -> DataFrame:
    """(vertex, deg): the k-core of the undirected simple graph — the
    maximal subgraph where every vertex keeps degree >= k — with each
    survivor's degree INSIDE the core.  The standard peel: repeatedly
    drop vertices of degree < k; the fixpoint is unique (independent of
    removal order), so the loop is a pure function of (edges, k).

    Loop discipline (the engine's graph-loop conventions): per round one
    degree aggregate per endpoint semi-join (two map-side passes over the
    checkpointed edge frame — measured cheaper than materializing the
    survivor list once, see the in-loop comment) + ONE semi-join pass
    filtering edges to surviving endpoints, the edge frame
    localCheckpointed each round with the superseded round's blocks
    released, and ONE scalar driver action (the surviving-edge count).
    Rounds needed = peel depth; on expander-like graphs that is tens,
    but a simultaneous peel removes only the current ENDPOINTS of a
    degree-2 chain each round, so road-like graphs with long dangling
    chains legitimately need hundreds of rounds — hence the generous
    default (round-5 ADVICE).  A graph still peeling at `max_iter`
    raises loudly rather than returning a non-core.

    k <= 1 returns every non-isolated vertex (isolated vertices never
    appear in an edge table); self-loops and duplicate/reverse edges
    collapse as in triangle_count."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    n_edges = e.count()
    prev = None
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("lo").alias("v"))
            .unionAll(e.select(F.col("hi").alias("v")))
            .groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        )
        # `keep` is referenced by both endpoint semi-joins, so its degree
        # aggregate executes twice per round (no runtime exchange reuse) —
        # MEASURED as the better trade here: both aggregates are map-side
        # passes over the checkpointed in-memory edge frame, while
        # materializing the survivor list added a blocking action per
        # round and benched 15% SLOWER (6.19 s vs 5.40 s, 1M edges, calm
        # windows both sides; the triangle_count fix does not generalize
        # to per-round frames this cheap)
        keep = deg.filter(F.col("deg") >= k).select("v")
        e2 = (
            e.join(keep.withColumnRenamed("v", "lo"), "lo", "left_semi")
             .join(keep.withColumnRenamed("v", "hi"), "hi", "left_semi")
        ).localCheckpoint()
        n2 = e2.count()
        e.unpersist()
        e, prev, n_edges = e2, n_edges, n2
        if n2 == prev:
            break
    else:
        raise RuntimeError(
            f"k_core: still peeling after max_iter={max_iter} rounds; "
            "raise max_iter for very deep peel sequences"
        )
    return (
        e.select(F.col("lo").alias("vertex"))
        .unionAll(e.select(F.col("hi").alias("vertex")))
        .groupBy("vertex").agg(F.count(F.lit(1)).alias("deg"))
    )
