"""Interval join — match point timestamps to validity ranges
(events x [start, end) windows: sessions, campaigns, rate schedules,
speed-limit validity periods).

This is the third temporal-join primitive alongside `temporal.asof_join`
(latest-at-or-before) and the streaming enrichment: here a point can
match MANY ranges and a range many points, and the predicate is
containment, not recency.  Spark has no native band/interval join — the
naive form is a cross join with a range filter, O(|E| x |R|).

Spark shape (the standard binning decomposition):
  * pick a bin width w; an event belongs to exactly ONE bin
    floor(ts / w), a range explodes to the bins it overlaps
    (native `sequence`, no Python).
  * equi-join on the bin key with the exact containment predicate in
    the SAME join condition — Catalyst plans a hash join on the bin and
    applies the band filter on matches, so candidates never materialize.
  * because the event side has exactly one bin per row and a range
    lists each bin once, every qualifying pair meets EXACTLY once:
    no post-join dedup, and left-outer semantics fall out of the same
    join.  (This one-sided explode is why events are not exploded —
    exploding both sides would need a distinct.)

Scale properties: the explode fanout is ceil(len/w) + 1 bins per range
— bounded by `max_bins_per_range`, enforced with a LOUD executor-side
error (the engine-wide rule: never silently explode or under-cover).
`bin_width=None` sizes w from the p90 range length (one documented
`approxQuantile` action on the ranges side — pass an explicit width in
pipelines that cannot afford it), so ~90% of ranges land in 1-2 bins.
Hot bins (a popular hour holding many events AND many ranges) degrade
the same way any equi-join skew does; AQE skew-join handles moderate
cases, and re-binning finer splits the hot key directly.

Exactness: the containment predicate and the empty-range filter compare
the ORIGINAL column types (timestamps as timestamps, int64 as int64 —
no rounding anywhere a match is decided).  Doubles appear only in BIN
ASSIGNMENT, where the epoch-seconds view is monotone, so an event's bin
always lands inside its range's covering-bin interval even when
rounding nudges values — bins affect candidate routing, never the
result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _numeric(col, dtype: str):
    """Monotone numeric view of a point/bound column — used ONLY for bin
    assignment (module docstring): timestamps -> epoch-seconds double,
    numerics unchanged.  ANSI mode forbids the direct timestamp->double
    cast, so this goes through unix_micros (NTZ is first reinterpreted
    in the session zone — consistently on both sides, so bins stay
    consistent)."""
    if dtype.startswith("timestamp"):
        return (F.unix_micros(col.cast("timestamp")).cast("double")
                / F.lit(1_000_000.0))
    return col


def interval_join(
    events: DataFrame,
    ranges: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width=None,
    max_bins_per_range: int = 4096,
    how: str = "inner",
    salt: int = 1,
) -> DataFrame:
    """Join each event to every range with start <= ts < end (half-open)
    -> all event columns + all range columns.  `how` is 'inner' or
    'left' (unmatched events kept with null range columns).  Ranges with
    end <= start match nothing and are dropped up front (a descending
    native `sequence` would otherwise fabricate candidates).  Column
    names must be disjoint across the two sides — collisions raise here
    rather than as a distant AMBIGUOUS_REFERENCE.

    `bin_width` is in the joined unit (epoch SECONDS for timestamp
    columns, the column's own unit for numerics); None sizes it from the
    p90 range length.  See the module docstring for the plan shape.

    `salt > 1` splits each hot bin across `salt` shuffle lanes: every
    event hashes into ONE lane, every range replicates into ALL lanes
    of each of its bins (x`salt` on the exploded range side — cheap,
    ranges are the small side), and the join key becomes (bin, lane).
    Correctness is lane-assignment-independent because ranges cover
    every lane, so the meets-once and left-outer properties are
    untouched; use it when one popular hour holds a large share of both
    sides and AQE's skew split is not enough."""
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how={how!r} (inner or left)")
    if salt < 1:
        raise ValueError("interval_join: salt must be >= 1")
    clash = set(events.columns) & set(ranges.columns)
    if clash:
        raise ValueError(
            f"interval_join: column(s) {sorted(clash)} exist on both "
            "sides — rename one side first")
    internal = {"__ij_bin", "__ij_salt"} & (
        set(events.columns) | set(ranges.columns))
    if internal:
        raise ValueError(
            f"interval_join: column(s) {sorted(internal)} collide with "
            "internal helper names — rename them first")
    e_dt = dict(events.dtypes)[ts_col]
    r_dt = dict(ranges.dtypes)
    # doubles are used ONLY for bin assignment (monotone, so an event's
    # bin provably lands inside its range's covering-bin interval even
    # when rounding moves values); the containment predicate and the
    # emptiness filter compare the ORIGINAL column types exactly, so
    # int64 keys beyond 2^53 (ns epochs, snowflake ids) never mis-join
    ts = _numeric(F.col(ts_col), e_dt).cast("double")
    lo = _numeric(F.col(start_col), r_dt[start_col]).cast("double")
    hi = _numeric(F.col(end_col), r_dt[end_col]).cast("double")

    rng = ranges.filter(F.col(end_col) > F.col(start_col))
    if bin_width is None:
        # one documented action: p90 range length sizes the bin so ~90%
        # of ranges explode to <= 2 bins
        q = rng.select((hi - lo).alias("__len")).approxQuantile(
            "__len", [0.9], 0.001)
        if not q or q[0] <= 0:
            raise ValueError(
                "interval_join: cannot infer bin_width from an empty "
                "ranges side — pass bin_width explicitly")
        bin_width = q[0]
    w = float(bin_width)
    if w <= 0:
        raise ValueError("interval_join: bin_width must be positive")

    b0 = F.floor(lo / F.lit(w)).cast("long")
    b1 = F.floor(hi / F.lit(w)).cast("long")
    nbins = b1 - b0 + F.lit(1)
    # the guard rides the sequence's own end bound — a separate
    # then-dropped guard column would be dead code Catalyst prunes away
    b1_guarded = F.when(
        nbins <= F.lit(int(max_bins_per_range)), b1
    ).otherwise(
        F.raise_error(F.concat(
            F.lit("interval_join: a range spans "), nbins.cast("string"),
            F.lit(f" bins > max_bins_per_range={max_bins_per_range} at "
                  f"bin_width={w!r} — widen the bins or split the range"),
        )).cast("long")
    )
    r_binned = rng.withColumn(
        "__ij_bin", F.explode(F.sequence(b0, b1_guarded)))
    e_binned = events.withColumn(
        "__ij_bin", F.floor(ts / F.lit(w)).cast("long"))
    if salt > 1:
        r_binned = r_binned.withColumn(
            "__ij_salt",
            F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1))))
        e_binned = e_binned.withColumn(
            "__ij_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in events.columns]),
                   F.lit(int(salt))).cast("long"))

    # containment rides the SAME join condition as the bin equi-key, so
    # Catalyst hash-joins on the bin and band-filters matches in place;
    # raw-type comparisons (exact — see note above)
    cond = ((e_binned["__ij_bin"] == r_binned["__ij_bin"])
            & (e_binned[ts_col] >= r_binned[start_col])
            & (e_binned[ts_col] < r_binned[end_col]))
    if salt > 1:
        cond = cond & (e_binned["__ij_salt"] == r_binned["__ij_salt"])
    joined = e_binned.join(r_binned, cond, how)
    return joined.select(
        *[e_binned[c] for c in events.columns],
        *[r_binned[c] for c in ranges.columns],
    )
