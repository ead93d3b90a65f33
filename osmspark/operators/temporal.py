"""Temporal joins — as-of (nearest-prior / nearest-next) matching.

The reference is strictly batch-audit (SURVEY §2.3 lists joins as a
Tier-C no-op there); an as-of join is the standard temporal primitive an
events table needs (match each event to the latest prior reading per
key) and Spark has no builtin for it, so it is composed from the
union-tag + running-last window idiom:

  1. tag both sides, keep only (by, on) plus each side's row as ONE
     struct column (null on the other side);
  2. union, window per `by` key ordered by (on, side-tag, tiebreak):
     right rows sort BEFORE left rows at equal timestamps, so an exact-ts
     right row matches (<= semantics); duplicate-timestamp right rows are
     broken deterministically — by field-wise struct ordering when the
     right schema is orderable, else by an xxhash64-of-JSON surrogate
     (map columns cannot be sort keys);
  3. running last(right_struct, ignorenulls) carries the latest right
     row onto every left row; filter to left rows and flatten.

Scale shape: ONE shuffle on the `by` key, then a per-key ordered window
— partition size is the per-key event count, not the table; a key's
history must sort within one task (the same contract Spark's own
sessionization has).  No Python anywhere.

direction='backward' matches the greatest right.on <= left.on (the
default, pandas.merge_asof semantics); 'forward' the smallest right.on
>= left.on.  `tolerance` (same-type difference as `on`) nulls out
matches farther than the bound instead of dropping the left row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can use the type as a sort key (maps cannot)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Every left row, plus the as-of-matched right row's columns (each
    renamed with `suffix`; null when no match / outside tolerance)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_list = [by] if isinstance(by, str) else list(by or [])
    for c in by_list + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")

    l_struct = T.StructType(left.schema.fields)
    r_struct = T.StructType(right.schema.fields)
    lt = left.select(
        *[F.col(c) for c in by_list],
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    # a null-timestamp right row can never legitimately be "at or before"
    # anything — dropped here, NOT left to the window, where NULLS FIRST
    # ordering would carry it as a fabricated match for early left rows
    rt = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by_list],
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(l_struct).alias("__l"),
        F.struct(*right.columns).alias("__r"),
    )
    # deterministic tiebreak among right rows sharing a timestamp: whole-
    # struct ordering when the right schema is orderable (greatest struct
    # wins), else an xxhash64-of-JSON surrogate (maps and other unorderable
    # types cannot be sort keys) — deterministic, but WHICH equal-ts row
    # wins is then unspecified
    if _orderable(r_struct):
        tiebreak = F.col("__r").asc()
    else:
        tiebreak = F.xxhash64(F.to_json(F.col("__r"))).asc_nulls_first()
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*by_list)
        .orderBy(t_order, F.col("__is_l").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        lt.unionByName(rt)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_l") == 1)
        # a null-timestamp LEFT row matches nothing (in forward mode DESC
        # NULLS LAST would otherwise hand it the minimum-ts right row)
        .withColumn("__m", F.when(F.col("__t").isNotNull(), F.col("__m")))
    )
    if tolerance is not None:
        gap = (
            F.col("__t") - F.col(f"__m.{on}")
            if direction == "backward"
            else F.col(f"__m.{on}") - F.col("__t")
        )
        m = m.withColumn(
            "__m",
            F.when(gap <= F.lit(tolerance), F.col("__m")),
        )
    return m.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c + suffix) for c in right.columns],
    )
