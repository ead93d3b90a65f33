"""N-gram language-model perplexity scoring — the CCNet-style curation
signal (Wenzek et al. 2020 filter CommonCrawl by LM perplexity; C4 and
Gopher use related fluency proxies).

This is the one classic text-curation signal the heuristic tier
(`textstats`) and the learned gate (`quality_model`) don't cover: a
corpus-trained fluency score.  KenLM's Kneser-Ney is overkill to
re-derive here; we use add-k smoothing over raw n-gram counts — simple,
bit-matchable by an independent oracle, and monotone in the same signal
(gibberish scores high, fluent text low).

    P(w_i | ctx) = (c(ngram) + k) / (c(ctx) + k * V)
    perplexity(doc) = exp( - sum_g m_g * ln P_g / N )

where c(ctx) is the raw occurrence count of the (n-1)-gram (the standard
raw-count simplification: the final context of each training doc has no
continuation, so the denominator is >= the continuation mass — slightly
conservative, never divides by zero once k > 0), V is the training
vocabulary size (distinct unigrams; override for open-vocab UNK mass),
m_g the gram's multiplicity in the doc and N the doc's total n-grams.

Scale shape (the part that matters at 100 TB):
- training is ONE shuffle: both gram orders explode from a single
  tokenize pass and aggregate in one groupBy on (order, xxhash64(gram))
  — map-side partial aggregation applies, the LM never holds raw text
  (8-byte hash keys), and `min_count` prunes the heavy tail of the
  order-n table without touching denominators.
- scoring is two equi-joins on those 8-byte hashes (doc-gram
  multiplicities against each order) + one per-doc aggregate.  The LM
  side is left as a plain shuffle join by default — at real scale it
  does NOT fit a broadcast; hot grams ("the of and") are exactly the
  AQE skew-join case the session enables.  Pass `broadcast_lm=True`
  when the model is known-small.
- everything is native expressions over the shared engine tokenizer
  (`functions/text.tokens_col`) — zero Python in either plan; the
  tokenizer sits behind a `let_` barrier (functions/expr.py) so each
  row tokenizes ONCE, not once per gram-subtree reference (measured 4x
  on the score path).
- the gram explode is map-side, so its parallelism rides the INPUT's
  partitioning (correct at scale, where sources are many-partitioned);
  a pathological single-partition input — e.g. a small-file crossJoin —
  serializes the whole tokenize+explode through one task and should be
  repartitioned by the caller first (measured: the difference between
  minutes and seconds on a 200k-doc bench corpus).

Gram keys are xxhash64 of the space-joined token window (tokens are
whitespace-split, so the join is collision-free in the same sense as
the dedup/fingerprint modules that established the pattern).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from osmspark.functions.expr import let_
from osmspark.functions.text import tokens_col


def _grams(toks, n: int):
    """Space-joined n-gram array over a token-array column (empty for
    short docs — guarded against sequence(0, -1) descending).

    Callers MUST pass a leaf variable (a `let_`-bound lambda var or a
    materialized column), never the raw tokenizer expression: higher-order
    functions run interpreted with no CSE, so every textual reference to
    `toks` here re-evaluates it per row — measured 4x on the gram hot
    path before the barrier landed (see functions/expr.py).
    """
    m = F.size(toks) - F.lit(n - 1)
    return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), m - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def _gram_ctx_pairs(text_col: str, n: int):
    """array<struct<gh,ch>> of (xxhash64 of the order-n gram, xxhash64 of
    its order-(n-1) context) — ONE tokenize and ONE string build per
    window: the tokens sit behind a `let_` barrier, the gram string is
    let_-bound inside the window lambda (HOFs are interpreted, no CSE —
    an unbound reference would rebuild it per use), and the context is
    `substring_index(gram, ' ', n-1)` — the IDENTICAL string a second
    slice+concat produced (tokens are whitespace-split, so the first
    n-1 space-separated fields ARE the context), one scan instead of a
    second slice+concat (round-6: score-path gram build was ~a third of
    the scoring stage).  Hashing INSIDE the transform ships 16 bytes per
    window through the explode instead of two strings; the hash values
    are bit-identical to hashing the strings downstream, so every join
    against the trained LM — and the declared oracle row — is
    unchanged."""

    def body(tk):
        m = F.size(tk) - F.lit(n - 1)
        return F.when(
            m <= 0, F.array().cast("array<struct<gh:bigint,ch:bigint>>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), m - F.lit(1)),
                lambda i: let_(
                    F.concat_ws(" ", F.slice(tk, i + 1, n)),
                    lambda g: F.struct(
                        F.xxhash64(g).alias("gh"),
                        F.xxhash64(
                            F.substring_index(g, " ", n - 1)).alias("ch"),
                    ),
                ),
            )
        )

    return let_(tokens_col(text_col), body)


def train_ngram_lm(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    min_count: int = 1,
) -> Tuple[DataFrame, int]:
    """Count order-n grams and their order-(n-1) contexts.

    Returns (counts, vocab_size): counts has columns
    (order int, gram_hash long, cnt long) with order in {n, n-1}, and
    vocab_size is the number of distinct unigram tokens (ONE documented
    driver action — it is the scalar V in every score's denominator, so
    it cannot stay distributed).

    `min_count` prunes only the ORDER-N table (rare grams score as
    unseen); context counts are never pruned — pruning denominators
    would silently inflate every probability that shares the context.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2 (got {n}); unigram perplexity has no context")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = tokens_col(text_col)
    # both gram orders from ONE tokenize: the tokens are let_-bound (an
    # aliased projection would be CollapseProject-inlined into the
    # generator and re-evaluated per reference — see functions/expr.py)
    exploded = docs.select(
        F.explode(
            let_(
                toks,
                lambda tk: F.concat(
                    F.transform(
                        _grams(tk, n),
                        lambda g: F.struct(
                            F.lit(n).alias("order"), F.xxhash64(g).alias("gram_hash")
                        ),
                    ),
                    F.transform(
                        _grams(tk, n - 1),
                        lambda g: F.struct(
                            F.lit(n - 1).alias("order"),
                            F.xxhash64(g).alias("gram_hash"),
                        ),
                    ),
                ),
            )
        ).alias("g")
    )
    counts = (
        exploded.groupBy(F.col("g.order").alias("order"), F.col("g.gram_hash").alias("gram_hash"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        counts = counts.where(
            (F.col("order") == F.lit(n - 1)) | (F.col("cnt") >= F.lit(min_count))
        )
    vocab_size = (
        docs.select(F.explode(toks).alias("t")).agg(F.count_distinct("t")).collect()[0][0]
    )
    return counts, int(vocab_size)


def score_perplexity(
    docs: DataFrame,
    counts: DataFrame,
    vocab_size: int,
    n: int = 3,
    k: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """Append (lm_logprob, lm_ngrams, lm_perplexity) to `docs`.

    lm_logprob = sum over the doc's order-n grams of m * ln P(gram|ctx)
    (natural log), lm_ngrams = N (total gram occurrences), and
    lm_perplexity = exp(-lm_logprob / N) — NULL for docs with fewer
    than n tokens (nothing to score; a 0.0 would sort them as
    maximally fluent).

    Left join semantics throughout: grams/contexts absent from the LM
    score with c = 0 (pure add-k mass), so OOV text is scored, not
    dropped.
    """
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    pairs = _gram_ctx_pairs(text_col, n)
    doc_grams = (
        docs.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("p"))
        .groupBy(
            "__id",
            F.col("p.gh").alias("gram_hash"),
            F.col("p.ch").alias("ctx_hash"),
        )
        .agg(F.count(F.lit(1)).alias("m"))
    )
    lm_n = counts.where(F.col("order") == F.lit(n)).select(
        F.col("gram_hash"), F.col("cnt").alias("c_gram")
    )
    lm_c = counts.where(F.col("order") == F.lit(n - 1)).select(
        F.col("gram_hash").alias("ctx_hash"), F.col("cnt").alias("c_ctx")
    )
    if broadcast_lm:
        lm_n, lm_c = F.broadcast(lm_n), F.broadcast(lm_c)
    scored = (
        doc_grams.join(lm_n, "gram_hash", "left")
        .join(lm_c, "ctx_hash", "left")
        .withColumn(
            "__lp",
            F.col("m")
            * (
                F.log(F.coalesce(F.col("c_gram"), F.lit(0)) + F.lit(float(k)))
                - F.log(
                    F.coalesce(F.col("c_ctx"), F.lit(0))
                    + F.lit(float(k)) * F.lit(float(vocab_size))
                )
            ),
        )
        .groupBy("__id")
        .agg(F.sum("__lp").alias("lm_logprob"), F.sum("m").alias("lm_ngrams"))
        .withColumn(
            "lm_perplexity", F.exp(-F.col("lm_logprob") / F.col("lm_ngrams"))
        )
    )
    return docs.join(
        scored.withColumnRenamed("__id", id_col), id_col, "left"
    ).withColumn("lm_ngrams", F.coalesce(F.col("lm_ngrams"), F.lit(0)))
