"""The engine-wide tokenizer expression, in ONE place.

Every text operator that must agree with a DuckDB oracle (dedup
shingles, textstats counts, BM25 postings, substring-dedup grams)
tokenizes with this exact expression; its DuckDB twin is

    list_filter(string_split_regex(lower(trim(coalesce(text, ''))),
                '\\s+'), t -> t <> '')

A convention change (e.g. unicode whitespace classes) must happen here
and in every oracle string together — a drifted copy silently breaks
bit-exact oracle parity, which is why the copies were folded into this
module.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def tokens_col(text_col: str = "text"):
    """array<string> of lowercased whitespace tokens; NULL text reads as
    empty, empty tokens (split artifacts) dropped."""
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    return F.filter(toks, lambda t: t != "")
