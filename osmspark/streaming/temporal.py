"""Streaming as-of enrichment — the streaming twin of
`operators.temporal.asof_join` (backward direction).

Shape: a LEFT event stream is enriched with the most recent RIGHT
(state/CDC) row per key at-or-before each event's timestamp.  Spark's
stream-stream joins can't express "latest row at or before" without a
bounded time-range condition, so this is a CUSTOM stateful operator
(applyInPandasWithState, the task-spec route): both streams are tagged
and unioned, grouped by key, and a per-key GroupState carries the latest
right row across micro-batches.  State is ONE right row per key —
bounded by key cardinality, not history length (the whole right history
never accumulates anywhere).

Semantics vs the batch operator (documented divergence, pinned by test):
  * backward direction only — forward as-of needs future rows, which a
    stream by definition has not seen; asking for it raises.
  * cross-batch correctness assumes each key's rows arrive in
    nondecreasing timestamp order ACROSS micro-batches (the CDC-log
    reality); within a batch, rows are processed in timestamp order
    regardless of arrival.
  * equal-timestamp tiebreak among right rows WITHIN a micro-batch is
    the batch operator's value-based (field-wise, nulls-first) ordering
    — arrival order within a batch is not recoverable after the
    groupBy shuffle, so "arrival order" would really be nondeterministic
    exchange order; pinning the struct tiebreak makes the pick
    deterministic AND batch-equivalent.  ACROSS micro-batches the
    carried state row loses ties to a new equal-ts right (CDC
    last-update-wins), which can differ from the batch operator run
    over the concatenated history.  Right value types pandas cannot
    compare (arrays/structs) fall back to exchange order for ties.

The kernel is vectorized: per (key, batch) one pandas sort plus one
numpy searchsorted — no per-row Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Enrich a streaming `left` with the as-of-latest `right` row per
    `by` key: output = left columns + right columns renamed with
    `suffix` (null when no right row at or before the event, or outside
    `tolerance`).  Append-mode output — each left row emits exactly once,
    in the micro-batch it arrives."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if direction != "backward":
        raise ValueError(
            "streaming_asof_enrich: only direction='backward' exists on a "
            "stream — 'forward' needs rows the stream has not seen yet; "
            "run the batch asof_join on the materialized table instead")
    for c in (by, on):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    clash = {c + suffix for c in right.columns} & set(left.columns)
    if clash:
        raise ValueError(
            f"suffix {suffix!r} makes right column(s) {sorted(clash)} "
            "collide with left columns — pass a different suffix")

    l_fields = [f for f in left.schema.fields]
    r_fields = [f for f in right.schema.fields]
    l_names = [f.name for f in l_fields]
    r_names = [f.name for f in r_fields]

    def _tag(df, is_l, own, other_fields, own_prefix, other_prefix):
        cols = [F.col(by).alias("__k"),
                F.col(on).alias("__t"),
                F.lit(is_l).alias("__is_l")]
        cols += [F.col(f.name).alias(f"{own_prefix}{f.name}") for f in own]
        cols += [F.lit(None).cast(f.dataType).alias(
            f"{other_prefix}{f.name}") for f in other_fields]
        return df.select(*cols)

    lt = _tag(left, 1, l_fields, r_fields, "__lc_", "__rc_")
    # a null-timestamp right row can never be "at or before" anything
    # (the batch operator's rule)
    rt = _tag(right.filter(F.col(on).isNotNull()), 0,
              r_fields, l_fields, "__rc_", "__lc_")
    # unionByName aligns the two column orders
    merged = lt.unionByName(rt.select(*lt.columns))

    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType) for f in l_fields]
        + [T.StructField(f.name + suffix, f.dataType) for f in r_fields]
    )
    state_schema = T.StructType(
        [T.StructField("__t", merged.schema["__t"].dataType)]
        + [T.StructField(f"__rc_{f.name}", f.dataType) for f in r_fields]
    )
    rc = [f"__rc_{n}" for n in r_names]
    lc = [f"__lc_{n}" for n in l_names]
    state_types = [merged.schema["__t"].dataType] + [f.dataType
                                                     for f in r_fields]
    _integral = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)

    def _clean(v, dt):
        """Coerce a pandas-promoted value back to its state field type:
        a LEFT row's nulls make the unioned right columns float64, and a
        float 15.0 written into a LongType STATE field round-trips as
        null (observed — the OUTPUT path safe-casts, the state path does
        not)."""
        import math

        if v is None:
            return None
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float) and math.isnan(v):
            return None
        if isinstance(dt, _integral) and isinstance(v, float):
            return int(v)
        return v

    def update(key, pdfs, state):
        batch = pd.concat(list(pdfs), ignore_index=True)
        # timestamp order; rights sort before lefts at the same ts
        # (backward-inclusive).  Equal-ts RIGHT ties are broken by
        # field-wise value order, nulls first — the batch operator's
        # struct tiebreak ("last right in window order wins"), so the
        # pick is deterministic across runs instead of inheriting
        # whatever order the exchange produced.  Right value types that
        # pandas cannot compare (arrays/structs) fall back to
        # post-shuffle order (documented divergence).
        try:
            batch = batch.sort_values(
                ["__t", "__is_l"] + rc, kind="stable", na_position="first")
        except TypeError:
            batch = batch.sort_values(["__t", "__is_l"], kind="stable")
        rights = batch[batch["__is_l"] == 0]
        lefts = batch[batch["__is_l"] == 1]

        carried = state.get if state.exists else None  # (__t, *right vals)

        if len(lefts):
            r_ts = rights["__t"].to_numpy()
            l_ts = lefts["__t"].to_numpy()
            # last right with ts <= left ts; -1 -> the carried state row
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            out = {}
            for name, col in zip(l_names, lc):
                out[name] = lefts[col].to_numpy()
            for j, (name, col) in enumerate(zip(r_names, rc)):
                vals = rights[col].to_numpy()
                fallback = carried[1 + j] if carried is not None else None
                picked = np.empty(len(l_ts), dtype=object)
                got = idx >= 0
                picked[got] = vals[idx[got]]
                picked[~got] = fallback
                out[name + suffix] = picked
            match_ts = np.empty(len(l_ts), dtype=object)
            got = idx >= 0
            match_ts[got] = r_ts[idx[got]]
            match_ts[~got] = carried[0] if carried is not None else None
            no_match = np.array([t is None for t in match_ts])
            # a null-timestamp LEFT row matches nothing (batch rule)
            null_left = pd.isna(lefts["__t"]).to_numpy()
            if tolerance is not None:
                with np.errstate(invalid="ignore"):
                    gaps = np.array(
                        [lt_ - mt if mt is not None else None
                         for lt_, mt in zip(l_ts, match_ts)], dtype=object)
                over = np.array([g is not None and g > tolerance
                                 for g in gaps])
            else:
                over = np.zeros(len(l_ts), dtype=bool)
            kill = no_match | null_left | over
            if kill.any():
                for name in r_names:
                    col = out[name + suffix]
                    col[kill] = None
                    out[name + suffix] = col
            yield pd.DataFrame(out)

        if len(rights):
            last = rights.iloc[-1]
            new_ts = last["__t"]
            # nondecreasing-arrival contract: the batch's last right wins
            # ties against carried state (CDC last-update-wins)
            if carried is None or not (carried[0] is not None
                                       and carried[0] > new_ts):
                state.update(tuple(
                    _clean(v, dt) for v, dt in
                    zip([new_ts] + [last[c] for c in rc], state_types)))

    return merged.groupBy("__k").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
