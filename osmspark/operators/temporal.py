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

For LOW-CARDINALITY or global keys that contract is the bottleneck (one
key's whole history serializes through one task), so `range_buckets=B`
switches to a range-partitioned merge: the timeline is cut at quantile
boundaries of the left side's `on` column (a driver-side list of B-1
doubles — the only collect), every row lands in its time bucket, and
each bucket is seeded with the winning right row of the nearest earlier
bucket that has right data (carried via lead() over the per-key bucket
list plus a bounded sequence-explode — O(B) seed rows per key, never
O(B^2)).  The same union-window merge then runs partitioned by
(by, bucket): one global key spreads over B tasks and results are
IDENTICAL to the window path, including tie-breaks, because bucket
index is monotone in `on` (equal timestamps share a bucket) and each
seed sorts strictly before every row of its target bucket.

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
    range_buckets: int | None = None,
) -> DataFrame:
    """Every left row, plus the as-of-matched right row's columns (each
    renamed with `suffix`; null when no match / outside tolerance).
    `range_buckets=B` range-partitions the merge over B time buckets —
    use it when `by` is absent or low-cardinality, where the default
    per-key window would serialize a whole key through one task."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_list = [by] if isinstance(by, str) else list(by or [])
    for c in by_list + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    clash = {c + suffix for c in right.columns} & set(left.columns)
    if clash:
        raise ValueError(
            f"suffix {suffix!r} makes right column(s) {sorted(clash)} "
            "collide with left columns — pass a different suffix")
    if range_buckets is not None and range_buckets < 2:
        raise ValueError("range_buckets must be >= 2 (or None)")

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
        tie_expr = F.col("__r")
    else:
        tie_expr = F.xxhash64(F.to_json(F.col("__r")))
    tiebreak = tie_expr.asc_nulls_first()
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()

    part_cols = list(by_list)
    merged = lt.unionByName(rt)
    seed_tbl = None
    if range_buckets is not None:
        merged, seed_tbl = _range_bucketed(
            lt, rt, by_list, direction, tie_expr, range_buckets)
        if seed_tbl is not None:
            part_cols = by_list + ["__b"]

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(t_order, F.col("__is_l").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        merged
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_l") == 1)
    )
    if seed_tbl is not None:
        # rows whose bucket held no prior right row take the carried seed
        # from the (by, bucket) dim — broadcast: <= keys x buckets rows
        m = (
            m.join(F.broadcast(seed_tbl), on=part_cols, how="left")
            .withColumn("__m", F.coalesce(F.col("__m"), F.col("__seed")))
            .drop("__seed")
        )
    m = (
        m
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


def _range_bucketed(
    lt: DataFrame,
    rt: DataFrame,
    by_list: list,
    direction: str,
    tie_expr,
    nb: int,
):
    """(tagged union with a `__b` time-bucket column, seed dim table) —
    see the module docstring.  Bucket index is computed on SIGNED time
    (negated for forward mode) so lower bucket always means earlier in
    the window's processing order, and the per-bucket winner expression
    mirrors the running-last tiebreak exactly (max of (signed time,
    tiebreak)).  The seed dim holds, per (by, target bucket), the right
    row the running-last would carry INTO that bucket; it joins back
    broadcast, not unioned, so a bucket's left rows that precede its
    first right row still match."""
    sign = 1.0 if direction == "backward" else -1.0
    # temporal types refuse a direct double cast (TIMESTAMP_NTZ especially)
    # — route them through their integer epoch form; only MONOTONICITY in
    # __t matters for bucketing, not the unit
    t_dt = lt.schema["__t"].dataType.typeName()
    t = F.col("__t")
    if t_dt.startswith("timestamp"):
        t = F.unix_micros(t.cast("timestamp"))
    elif t_dt == "date":
        t = F.unix_date(t)
    key = t.cast("double") * F.lit(sign)
    # quantile boundaries of the left timeline: the ONLY driver-side
    # materialization, <= nb-1 doubles
    probs = [i / nb for i in range(1, nb)]
    vals = (
        lt.filter(F.col("__t").isNotNull())
        .select(key.alias("__d"))
        .approxQuantile("__d", probs, 0.001)
    )
    bounds = sorted(set(vals))
    if not bounds:
        # no usable left timeline — degenerate to the plain window path
        return lt.unionByName(rt), None
    # bucket = #bounds <= signed time, as a plain when-sum chain: a
    # higher-order F.filter(array, lambda) here trips a Catalyst bug —
    # Union constraint rewriting crashes on lambdas that capture aliased
    # attributes ("key not found: ts#N") once any join sits above the
    # union and asks for its constraints
    bidx = sum(
        (F.when(key >= F.lit(float(b)), 1).otherwise(0) for b in bounds),
        F.lit(0),
    )
    lt2 = lt.withColumn("__b", bidx)
    rt2 = rt.withColumn("__b", bidx)

    # per (key, data-bucket) winner — the exact right row running-last
    # would carry OUT of that bucket
    ordk = F.struct(key.alias("k"), tie_expr.alias("t"))
    winners = rt2.groupBy(*by_list, "__b").agg(
        F.max_by("__r", ordk).alias("__r"))
    # each winner seeds target buckets (its own + 1) through the NEXT
    # data bucket (inclusive: that bucket's left rows that precede its
    # first right row still need the carry), or through the last bucket
    # when none follows — O(nb) seed rows per key in total
    wb = Window.partitionBy(*by_list).orderBy(F.col("__b").asc())
    start = F.col("__b") + F.lit(1)
    stop = F.col("__stop")
    seed_tbl = (
        winners
        # a window function may not sit inside a generator — stage it
        .withColumn("__stop",
                    F.coalesce(F.lead("__b").over(wb), F.lit(len(bounds))))
        .withColumn(
            "__tb",
            F.explode(
                # F.sequence counts DOWN when stop < start — guard it
                F.when(start <= stop, F.sequence(start, stop))
                .otherwise(F.array().cast("array<int>"))))
        .select(*by_list, F.col("__tb").alias("__b"),
                F.col("__r").alias("__seed"))
    )
    return lt2.unionByName(rt2), seed_tbl


# --- gap-based sessionization (batch) ---------------------------------------


def sessionize(
    events: DataFrame,
    gap: float,
    ts_col: str = "ts",
    by: str = "user_id",
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign every event its per-key session number: a new session
    starts when the gap to the key's previous event STRICTLY exceeds
    `gap` — an exactly-`gap` pause continues the session, which is what
    Spark's native session_window does too (its docs describe the range
    as [start, last + gap), but the merge is inclusive: a 60 s pause
    under a 60 s gap MERGES, measured and pinned by the
    native-session_window equality test).

    The batch twin of streaming/events.sessionized: that one returns
    session AGGREGATES via the native session_window; this one labels
    the EVENT ROWS (the shape joins/filters need) as boundary-flag
    cumsum over one window — session_seq is 1-based and contiguous per
    key.  `gap` is SECONDS for timestamp columns, the column's own unit
    for numerics.

    Scale: one shuffle on the key; each key's timeline serializes
    through one task (inherent — the running sum is sequential), so a
    single global key is the same hazard the as-of join documents.
    Rows with NULL timestamps are excluded from numbering (returned
    with NULL session_seq).  Equal timestamps always share a session
    (gap 0), so the labeling is deterministic under any tie order."""
    if out_col in events.columns:
        raise ValueError(f"sessionize: output column {out_col!r} exists")
    dt = dict(events.dtypes)[ts_col]
    if dt.startswith("timestamp"):
        tnum = (F.unix_micros(F.col(ts_col).cast("timestamp"))
                .cast("double") / F.lit(1_000_000.0))
    else:
        tnum = F.col(ts_col).cast("double")
    # null-ts rows are EXCLUDED from the window before numbering — Spark
    # orders nulls first, so a null row would otherwise become the key's
    # "previous event" and shift every real session number
    nn = events.filter(F.col(ts_col).isNotNull())
    nulls = events.filter(F.col(ts_col).isNull()).withColumn(
        out_col, F.lit(None).cast("long"))
    w = Window.partitionBy(by).orderBy(F.col(ts_col).asc())
    prev = F.lag(tnum).over(w)
    boundary = F.when(prev.isNull() | ((tnum - prev) > F.lit(float(gap))),
                      F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy(by).orderBy(F.col(ts_col).asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labeled = nn.withColumn(out_col, F.sum(boundary).over(cum))
    return labeled.unionByName(nulls)


def session_stats(
    events: DataFrame,
    gap: float,
    ts_col: str = "ts",
    by: str = "user_id",
) -> DataFrame:
    """Per-session aggregates from `sessionize`: (by, session_seq,
    session_start, session_end, n_events) — session_end is the LAST
    EVENT's timestamp (not last + gap; add the gap for session_window
    parity)."""
    s = sessionize(events, gap, ts_col=ts_col, by=by)
    return (
        s.filter(F.col("session_seq").isNotNull())
        .groupBy(by, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
