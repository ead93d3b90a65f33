"""Weighted sampling without replacement — the corpus-mixing primitive
(sample documents proportional to a quality score; temperature-balance
languages/sources a la multilingual-pretraining mixing).

Efraimidis & Spirakis 2006: assign every row the key u^(1/w) for
u ~ Uniform(0,1) and keep the k largest keys — a one-pass, fully
distributed weighted sample without replacement.  The engine computes
the ORDER-EQUIVALENT key ln(u)/w (ln u < 0, so dividing by a larger
weight moves the key toward 0 = larger; avoids pow underflow for tiny
weights), and u is DERIVED from xxhash64(id, seed) rather than drawn —
the sample is a pure function of (ids, weights, seed): reproducible
across runs, partitionings, and cluster sizes, and re-derivable by any
oracle that can evaluate the same hash.

Scale shapes:
  * `weighted_sample` — global top-k on the key: TakeOrderedAndProject
    (per-partition heap + driver merge of k rows/partition).  Right for
    k up to ~10^6; beyond that use the stratified form (window path,
    never collects).
  * `weighted_stratified_sample` — per-stratum quotas through
    `textstats.stratified_sample`'s two-phase salted top-N (the
    dominant stratum spreads over n_presplit tasks), with the ES key as
    the ranking hash.
  * `temperature_weights` — per-stratum multinomial weights
    p_i^(1/tau) / sum_j p_j^(1/tau) from a counts table (tau > 1
    upsamples the tail — the standard low-resource-language rebalance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1 << 52  # 52 hash bits -> u ties are ~2^-52: at any realistic k the
# id-ascending tiebreak never decides a selection boundary (a coarse u
# would resolve boundary ties by doc_id, systematically biasing the
# sample toward early documents)


def es_key_col(weight_col: str, id_col: str = "doc_id",
               seed: int = 42):
    """The Efraimidis-Spirakis ranking key ln(u)/w as a Column, with
    u = ((xxhash64(id, seed) >>> 12) + 0.5) / 2^52 in (0, 1) — the top
    52 hash bits, exactly a double mantissa.  NULL or non-positive
    weights raise executor-side (loud-guard convention — a silent drop
    would skew the sample, a NULL key would sort nondeterministically)."""
    w = F.col(weight_col).cast("double")
    u = (F.shiftrightunsigned(
            F.xxhash64(F.col(id_col), F.lit(seed)), 12)
         + F.lit(0.5)) / F.lit(float(_M))
    return F.when(
        w.isNull() | (w <= 0),
        F.raise_error(F.concat(
            F.lit(f"es_key_col: weight {weight_col!r} must be > 0, got "),
            F.coalesce(w.cast("string"), F.lit("NULL")),
            F.lit(f" at {id_col}="), F.col(id_col).cast("string"))),
    ).otherwise(F.log(u) / w)


def weighted_sample(docs: DataFrame, k: int, weight_col: str,
                    seed: int = 42, id_col: str = "doc_id") -> DataFrame:
    """k-row weighted sample without replacement (largest ES keys; ties
    broken by ascending id for full determinism).  Compiles to
    TakeOrderedAndProject — no global sort, no shuffle of the corpus."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = es_key_col(weight_col, id_col, seed)
    return (
        docs.withColumn("__es", key)
        .orderBy(F.col("__es").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__es")
    )


def weighted_stratified_sample(docs: DataFrame, strata_col: str,
                               per_stratum: int, weight_col: str,
                               seed: int = 42, id_col: str = "doc_id",
                               n_presplit: int = 32) -> DataFrame:
    """Per-stratum weighted quotas: the ES key rides
    `stratified_sample`'s two-phase salted top-N as its ranking hash
    (negated — that path keeps the SMALLEST hash), so one dominant
    stratum still spreads over n_presplit tasks."""
    from .textstats import stratified_sample

    return stratified_sample(
        docs, strata_col, per_stratum=per_stratum, seed=seed,
        id_col=id_col, n_presplit=n_presplit,
        hash_expr=-es_key_col(weight_col, id_col, seed),
    )


def temperature_weights(counts: DataFrame, count_col: str = "n",
                        tau: float = 1.0) -> DataFrame:
    """Append `weight` = p_i^(1/tau) / sum_j p_j^(1/tau) to a per-stratum
    counts table (tau=1 -> proportional; tau>1 flattens toward uniform —
    the multilingual-rebalance knob; tau->inf -> uniform).  The counts
    table is aggregated (one row per stratum), so the total rides a
    broadcast single-row cross join — no window over the whole table."""
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    n = F.col(count_col).cast("double")
    # loud guard (es_key_col convention): a NULL/negative count would
    # silently NaN the total and every stratum's weight
    guarded = F.when(
        n.isNull() | (n < 0),
        F.raise_error(F.concat(
            F.lit(f"temperature_weights: count {count_col!r} must be "
                  ">= 0, got "),
            F.coalesce(n.cast("string"), F.lit("NULL")))),
    ).otherwise(n)
    powed = counts.withColumn("__pw", F.pow(guarded, F.lit(1.0 / tau)))
    total = powed.agg(F.sum("__pw").alias("__tot"))
    return (
        powed.crossJoin(F.broadcast(total))
        .withColumn("weight", F.col("__pw") / F.col("__tot"))
        .drop("__pw", "__tot")
    )
