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
