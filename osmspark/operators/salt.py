"""B7 — explicit skew salting (SURVEY §2.2).

Hot cities concentrate ~40% of points into a handful of cells, which makes
any join/agg keyed by cell skewed.  Two mitigations, composable:

  * AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by default in
    osmspark.session) — the runtime backstop that splits oversized shuffle
    partitions.
  * Explicit salting here — deterministic fact-side salt (hash-mod, NOT
    rand(): reproducible across retries, a correctness requirement for
    resumable jobs B8) + dim-side replication via explode(sequence()).

`salted_join` is semantics-preserving: equal to a plain equi-join on `key`
for any nsalt (tested).  `salted_group_count` does a two-stage aggregation
(partial per (key, salt), final per key) — the classic hot-key combiner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, nsalt: int, from_cols: list[str]) -> DataFrame:
    """Deterministic salt in [0, nsalt): xxhash64 of stable columns."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in from_cols]), F.lit(nsalt)).cast("int")
    )


def replicate_dim(dim: DataFrame, nsalt: int) -> DataFrame:
    """Dim side replicated nsalt times with a matching __salt column."""
    return dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    nsalt: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on `key`, shuffle spread over (key, salt).

    salt_from defaults to all fact columns except the key (stable hash)."""
    salt_from = salt_from or [c for c in fact.columns if c != key]
    f = with_salt(fact, nsalt, salt_from)
    d = replicate_dim(dim, nsalt)
    return f.join(d, on=[key, "__salt"], how=how).drop("__salt")


def salted_group_count(df: DataFrame, key: str, nsalt: int = 8,
                       salt_from: list[str] | None = None) -> DataFrame:
    """groupBy(key).count() with an explicit two-stage salted combine."""
    salt_from = salt_from or [c for c in df.columns if c != key]
    partial = (
        with_salt(df, nsalt, salt_from)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("c"))
    )
    return partial.groupBy(key).agg(F.sum("c").alias("cnt"))
