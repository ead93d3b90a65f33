"""Streaming heavy hitters with BOUNDED state — SpaceSaving (Metwally
et al. 2005) sharded by term hash.

The problem: "trending terms/domains over an unbounded stream" via a
plain streaming `groupBy(term).count()` keeps one state row per
DISTINCT term — unbounded on web text.  SpaceSaving keeps a fixed-size
summary of `capacity` counters per shard, evicting the minimum counter
when a new term arrives at a full summary (the evictee's count seeds
the newcomer; the inherited amount is tracked as `err`).

Sharding: term -> shard = pmod(xxhash64(term), n_shards).  Every
occurrence of a term lands in EXACTLY one shard, so each shard's
summary is an independent SpaceSaving over its own substream and the
union of shard summaries is a valid global summary — no cross-shard
merge step, and the shuffle key (`shard`) has bounded cardinality by
construction.  Total state = n_shards * capacity counters, period.

Guarantees (per shard, n_seen = terms routed to the shard so far):
  * every counter overestimates: true <= count, and count - err <= true;
  * any term with true shard-count > n_seen/capacity is IN the summary
    (the classic SpaceSaving frequent-items guarantee);
  * with fewer distinct terms than capacity, counts are EXACT (err 0).

Determinism: within a micro-batch, terms merge in (batch-count desc,
term asc) order and eviction picks the (count, term)-smallest counter —
summaries are a pure function of the batch partitioning, pinned by
test.

Output (update-style emission): each micro-batch, every shard re-emits
its full summary tagged with a monotone `seq` and the shard's running
`n_seen` — a consumer takes the max-`seq` rows per shard (the memory-
sink tests do exactly that) or just the latest micro-batch downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_CAPACITY = 100_000


def streaming_heavy_hitters(terms: DataFrame, term_col: str = "term",
                            capacity: int = 256,
                            n_shards: int = 32) -> DataFrame:
    """(shard, term, count, err, n_seen, seq) summary stream over a
    streaming DataFrame of term occurrences (one row = one occurrence;
    tokenize upstream — `functions.text.tokens_col` + explode).  NULL
    terms are dropped (an occurrence of nothing).  State per shard is
    exactly `capacity` counters; `capacity` is guarded against
    accidentally-unbounded requests."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not 1 <= capacity <= _MAX_CAPACITY:
        raise ValueError(
            f"capacity must be in [1, {_MAX_CAPACITY}], got {capacity} — "
            "state is n_shards * capacity counters and must stay bounded")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    routed = terms.select(
        F.col(term_col).cast("string").alias("__term")
    ).where(F.col("__term").isNotNull()).withColumn(
        "__shard", F.pmod(F.xxhash64("__term"), F.lit(n_shards))
    )

    out_schema = T.StructType([
        T.StructField("shard", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("err", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("seq", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
        T.StructField("seq", T.LongType()),
    ])

    def update(key, pdfs, state):
        shard = key[0]
        if state.exists:
            s_terms, s_counts, s_errs, n_seen, seq = state.get
            summary = {t: [c, e] for t, c, e in
                       zip(s_terms, s_counts, s_errs)}
        else:
            summary, n_seen, seq = {}, 0, 0

        batch = pd.concat(list(pdfs), ignore_index=True)
        vc = batch["__term"].value_counts()
        n_seen += int(vc.sum())
        # deterministic merge order: heaviest batch terms first, then
        # lexicographic — the summary becomes a pure function of the
        # batch split, not of pandas hash order
        items = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
        for t, c in items:
            c = int(c)
            if t in summary:
                summary[t][0] += c
            elif len(summary) < capacity:
                summary[t] = [c, 0]
            else:
                # evict the (count, term)-smallest counter; the newcomer
                # inherits its count as overestimation error
                evict_t, (evict_c, _evict_e) = min(
                    summary.items(), key=lambda kv: (kv[1][0], kv[0]))
                del summary[evict_t]
                summary[t] = [evict_c + c, evict_c]
        seq += 1

        ordered = sorted(summary.items(),
                         key=lambda kv: (-kv[1][0], kv[0]))
        state.update((
            [t for t, _ in ordered],
            [v[0] for _, v in ordered],
            [v[1] for _, v in ordered],
            n_seen, seq,
        ))
        yield pd.DataFrame({
            "shard": [shard] * len(ordered),
            "term": [t for t, _ in ordered],
            "count": [v[0] for _, v in ordered],
            "err": [v[1] for _, v in ordered],
            "n_seen": [n_seen] * len(ordered),
            "seq": [seq] * len(ordered),
        })

    return routed.groupBy("__shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
