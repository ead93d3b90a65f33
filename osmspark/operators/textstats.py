"""Text analysis operators (task spec: language-ID, quality scoring, token
counting, document fingerprinting) — all native expressions except the
rolling-hash fingerprint (Arrow pandas UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
                "that", "for", "on", "with", "as", "at", "by", "this"]


def token_count_col(text_col: str = "text"):
    """Whitespace token count (native)."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count_col(text_col: str = "text"):
    """BPE-ish sub-token count: word-piece regex split (letters runs, digit
    runs, single punctuation) — a deterministic proxy for tokenizer cost."""
    return F.size(
        F.filter(
            F.split(F.col(text_col), r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
            lambda s: F.trim(s) != "",
        )
    )


def stopword_count_col(text_col: str = "text", stopwords=None):
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
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
    fine at driver-check scale; at 10^12 docs call approx_percentile
    (percentile_approx) instead — same column, sketch-merged, no sort."""
    from pyspark.sql import Window

    stats = text_stats(docs, text_col, id_col).select(id_col, "n_tokens")
    w = Window.orderBy(F.asc("n_tokens"), F.asc(id_col))
    ranked = stats.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy())
    )
    parts = [
        ranked.filter(
            F.col("rn")
            == F.ceil(F.col("n") * F.lit(p) / F.lit(100.0)).cast("long")
        ).select(F.lit(p).alias("pct"), "n_tokens")
        for p in pcts
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def fingerprint_udf(window: int = 8):
    """Winnowing-style document fingerprint: min rolling hash over `window`-
    token windows (robust to small edits) — Arrow pandas UDF."""

    @F.pandas_udf(T.LongType())
    def fingerprint(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            toks = (t or "").lower().split()
            if not toks:
                out[i] = 0
                continue
            hs = np.empty(len(toks), dtype=np.uint64)
            for j, tok in enumerate(toks):
                h = np.uint64(0xCBF29CE484222325)
                for bch in tok.encode("utf-8"):
                    h = np.uint64((int(h) ^ bch) * 0x100000001B3
                                  & 0xFFFFFFFFFFFFFFFF)
                hs[j] = h
            if len(hs) < window:
                out[i] = int(np.int64(hs.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
                continue
            # rolling combine: xor of shifted token hashes per window
            idx = np.arange(len(hs) - window + 1)[:, None] + np.arange(window)
            wh = hs[idx]
            mix = np.zeros(len(idx), dtype=np.uint64)
            for k in range(window):
                mix ^= (wh[:, k] << np.uint64(k % 7))
            out[i] = int(np.int64(mix.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
        return pd.Series(out)

    return fingerprint
