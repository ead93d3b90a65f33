"""PageRank — domain-authority scoring over a link graph (Brin & Page
1998), the classic curation prior: weight a crawl corpus by the
authority of its source domain (compose with `urlstats.domain_stats` /
`sampling.weighted_sample`).

Distributed shape per iteration: ONE equi-join (ranks onto edges by
src) + ONE groupBy(dst) sum — both shuffles keyed on the node id, so a
cluster reuses the same hash partitioning round to round; ranks are
localCheckpoint'd each round (the component-engine loop discipline —
without it every round replays the whole lineage).  Dangling-node mass
(nodes with no out-edges) redistributes uniformly, the standard
stochastic-matrix completion.  Driver-side state per round is ONE
action returning two scalars (max |delta| for convergence, next
dangling mass) — the knn.py documented-scalar contract, nothing
row-shaped ever reaches the driver.

Determinism: pure function of (edges, damping, max_iter, tol) — no
randomness anywhere; ranks always sum to 1 (enforced by construction,
pinned by test).  Non-convergence within max_iter raises (strict=True)
or warns loudly — never silently returns a half-converged vector.
Default (max_iter=100, tol=1e-6 RELATIVE — see `pagerank`) is sized to
the contraction rate: the relative delta starts O(1) and shrinks ~0.85
per round, so ~85 rounds reach 1e-6 — tighter tol needs ~15 more
rounds per decade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             max_iter: int = 100, tol: float = 1e-6,
             src: str = "src", dst: str = "dst",
             strict: bool = True,
             stats_out: dict | None = None) -> DataFrame:
    """(node, rank) over the directed graph `edges` (duplicate edges are
    collapsed — this is the unweighted random surfer; pre-aggregate to
    weights and adapt the contribution if you need a weighted walk).
    Self-loops count as ordinary edges.  Pass a dict as `stats_out` to
    receive {'rounds', 'converged'} (bench/ops introspection).

    `tol` is RELATIVE to the uniform rank: convergence when
    max |delta| <= tol / n.  An absolute tolerance is a silent trap at
    scale — on a 10^8-node graph every rank is O(10^-8), so any fixed
    absolute tol "converges" after one round and returns garbage
    (observed on the 100k-node bench before this rule)."""
    if not 0 < damping < 1:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u").isNotNull() & F.col("v").isNotNull())
         .distinct())
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct())
    # the loop's new-rank select joins `nodes` EVERY round — without this
    # checkpoint each round replays the union+distinct over the raw edge
    # list (measured: ~3x the whole loop on the 1M-edge bench graph)
    nodes = nodes.localCheckpoint(eager=True)
    outdeg = e.groupBy("u").agg(F.count("*").alias("__deg"))
    # per-edge contribution weight 1/deg folded onto the edge list ONCE:
    # the loop then joins ranks to a static (u, v, __w) table
    ew = e.join(outdeg, "u").select(
        "u", "v", (F.lit(1.0) / F.col("__deg")).alias("__w"))
    ew = ew.localCheckpoint(eager=True)
    dangling = nodes.join(outdeg.withColumnRenamed("u", "node"),
                          "node", "anti").select("node")
    dangling = dangling.localCheckpoint(eager=True)

    n = nodes.count()
    if n == 0:
        # empty frame with the INPUT's node type (a hardcoded string
        # schema would make the empty case union/join-incompatible with
        # every non-empty result)
        if stats_out is not None:
            stats_out["rounds"] = 0
            stats_out["converged"] = True
        return nodes.withColumn("rank", F.lit(1.0))
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    # mass currently sitting on dangling nodes (starts uniform)
    d_mass = (dangling.count()) / n

    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        contrib = (
            ew.join(ranks, ew["u"] == ranks["node"])
            .groupBy("v")
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__c"))
        )
        new_ranks = (
            nodes.join(contrib, nodes["node"] == contrib["v"], "left")
            .select(
                "node",
                (F.lit(base)
                 + F.lit(damping) * (F.coalesce(F.col("__c"), F.lit(0.0))
                                     + F.lit(d_mass / n))).alias("rank"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        # ONE action -> (max |delta|, next dangling mass)
        stats = (
            new_ranks.join(
                ranks.select(F.col("node").alias("__on"),
                             F.col("rank").alias("__or")),
                new_ranks["node"] == F.col("__on"))
            .join(dangling.withColumn("__is_d", F.lit(1)), "node", "left")
            .agg(
                F.max(F.abs(F.col("rank") - F.col("__or"))).alias("d"),
                F.sum(F.when(F.col("__is_d") == 1, F.col("rank"))
                      .otherwise(F.lit(0.0))).alias("dm"),
            )
            .collect()[0]
        )
        # release the superseded round's checkpoint blocks — new_ranks is
        # already materialized (eager) with truncated lineage, so the old
        # blocks are unreachable; without this up to max_iter rank
        # vectors pin executor storage
        ranks.unpersist()
        ranks = new_ranks
        d_mass = float(stats["dm"] or 0.0)
        if float(stats["d"]) <= tol / n:
            converged = True
            break
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["converged"] = converged
    if not converged:
        msg = (f"pagerank did NOT converge to tol={tol} in {max_iter} "
               "iterations")
        if strict:
            raise RuntimeError(msg)
        print(f"WARNING: {msg}")
    return ranks


def domain_authority(docs: DataFrame, text_col: str = "text",
                     source_domain_col: str = "source_domain",
                     **pr_kwargs) -> DataFrame:
    """(node, rank) over the domain link graph extracted from a corpus:
    each document's `source_domain` links to the registered domain of
    every URL in its text (self-links dropped).  The whole-corpus
    extraction is map-side; the graph that iterates is domain-level —
    tiny relative to the corpus."""
    from .urlstats import extract_urls, registered_domain_col, url_parts

    # the source domain rides as the extraction id — (src, url) pairs
    # come out of the one map-side pass, no row-id bookkeeping.  The src
    # side folds through the SAME registered-domain rule as the URL dst
    # side: otherwise 'www.site.com' (src) and 'site.com' (dst) split one
    # site into two graph nodes and the self-link drop stops working.
    parts = url_parts(extract_urls(
        docs.select(
            registered_domain_col(
                F.lower(F.col(source_domain_col))).alias("__src"),
            F.col(text_col)),
        text_col=text_col, id_col="__src"))
    edges = (
        parts.where(F.col("registered_domain").isNotNull())
        .select(F.col("__src").alias("src"),
                F.col("registered_domain").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    return pagerank(edges, **pr_kwargs)
