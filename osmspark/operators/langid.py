"""Character-trigram language identification — the CCNet/C4-style
corpus-curation signal the reference's audit family never needed (its
corpus is one city's OSM dump), re-expressed at training-pipeline
scale.

Method: Cavnar & Trenkle 1994 n-gram heuristic, reduced to a fixed
per-language profile of frequent character trigrams with rank-derived
log-weights.  A document scores, per language, the sum of its sampled
trigrams' profile weights (a floor penalty for out-of-profile grams);
the language is the argmax, or 'und' when the sample is too short to
say anything.  The profiles are deliberately tiny (~30 grams/language,
public-knowledge frequency lists) — this is a heuristic gate for
corpus routing, not a classifier with accuracy claims; the docstring
contract is exactly what the tests pin.

Plan shape — the 100 TB story: per document the work is bounded by
`sample_chars` (language-ID needs a sample, never the whole document),
so the explode fans out <= ~sample_chars rows per doc; the profile is
a few hundred rows PIVOTED to one column per language and broadcast,
so scoring is ONE broadcast hash join + ONE aggregate back to document
granularity — no shuffle of anything bigger than (doc, 6 doubles), no
Python anywhere.  Trigram extraction is a native transform over
substr, kept on the JVM codegen path.

Measured negative result (round 5, 200k docs / ~120M grams, 32
cores): folding the scores per row with F.aggregate over the gram
array + per-language F.create_map lookups — no explode, no agg — runs
10.2 s vs 6.8 s for this explode+join shape.  Higher-order functions
evaluate on the interpreted path, so six interpreted map probes per
element lose to whole-stage-codegen'd join probes even after paying
the 600x row fan-out; the explode rows never hit an exchange (the join
is broadcast, the aggregate combines map-side), so the fan-out costs
CPU only, and codegen CPU is the cheaper kind.

Determinism: scores are floating sums whose addend ORDER varies with
partitioning, so ulp-level score noise exists by construction; the
argmax is only trusted because real inter-language margins are orders
of magnitude above ulp (the driver row measures its corpus's minimum
margin before relying on it).  Ties break toward the LARGER language
code via the (score, lang) struct max — documented, tested.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~30 most-frequent character trigrams per language over lowercased
# [a-z ] text with single-space word boundaries (leading/trailing space
# added), rank-ordered.  Public-knowledge frequency lists; weights are
# rank-derived (Zipf-ish), not corpus-fit probabilities.
DEFAULT_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", "and", " an", "nd ", " of", "of ",
           "ing", "ng ", " to", "to ", "ed ", " in", "ion", "on ",
           "is ", " is", "ent", "nt ", " co", "es ", "er ", " be",
           "ith", " wi", "th ", " re", "at ", " ha"],
    "de": ["der", " de", "er ", "ie ", "die", " di", "und", " un",
           "nd ", "ein", " ei", "ne ", "ich", "ch ", "sch", " sc",
           "che", "en ", " ge", " be", "ung", "ng ", "cht", "ht ",
           "das", " da", "as ", " zu", "ten", "ine"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "nt ", " la",
           "la ", "ion", "on ", " pa", " qu", "que", "ue ", " et",
           "et ", " co", "re ", " re", " un", "un ", "les", "ais",
           "ons", "eur", "ant", "our", "ur ", "e d"],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", " co",
           "es ", " en", "en ", "ion", "on ", " qu", "que", "ue ",
           "as ", "ent", "nte", " es", "ado", "dos", " se", "ar ",
           "cio", "aci", "ien", "nto", "con", " po"],
    "it": [" di", "di ", "to ", " de", "del", "lla", " la", "la ",
           "ion", "one", "ne ", " co", "con", "re ", " pe", "per",
           "er ", " in", "che", " ch", "he ", "gli", " gl", "ell",
           "ato", " il", "il ", "nti", "ent", "e d"],
    "id": ["an ", "ang", "ng ", " me", "men", "eng", " di", "di ",
           "kan", " ke", "ber", " be", "nya", "ya ", " pe", "per",
           "ada", " pa", "ah ", " se", "lah", "dan", " da", "ata",
           " te", "ter", "ini", " in", "ari", "ara"],
}


def _rank_logp(rank: int) -> float:
    """Zipf-ish rank weight: -1 - ln(rank + 2); rank 0 -> -1.69,
    rank 29 -> -4.43 — all well above the out-of-profile floor."""
    return -1.0 - math.log(rank + 2)


def lang_id(docs: DataFrame, text_col: str = "text",
            profiles: dict[str, list[str]] | None = None,
            sample_chars: int = 600, min_grams: int = 8,
            floor_logp: float = -8.0) -> DataFrame:
    """All input columns except `text_col`, plus (lang, n_grams): the
    argmax-profile language of the first `sample_chars` characters, or
    'und' when fewer than `min_grams` trigrams survive normalization
    (empty, whitespace, or all-symbol text).

    Normalization: lowercase, every non-[a-z] run collapses to one
    space, one leading/trailing space so word-boundary trigrams fire.
    `n_grams` is the trigram count of the normalized sample — exact,
    engine-independent, and the denominator a caller needs to turn
    profile hits into a coverage ratio."""
    profiles = DEFAULT_PROFILES if profiles is None else profiles
    if not profiles:
        raise ValueError("profiles must name at least one language")
    if min_grams < 1:
        raise ValueError("min_grams must be >= 1")
    if sample_chars < 3:
        raise ValueError("sample_chars must be >= 3")
    langs = sorted(profiles)
    if "und" in langs:
        raise ValueError("'und' is the reserved undetermined label")
    pivot: dict[str, dict[str, float]] = {}
    for lang in langs:
        for rank, g in enumerate(profiles[lang]):
            if len(g) != 3:
                raise ValueError(
                    f"profile gram {g!r} for {lang!r} is not a trigram")
            pivot.setdefault(g, {})[lang] = _rank_logp(rank)

    spark = docs.sparkSession
    prof = spark.createDataFrame(
        [(g, *[m.get(lang) for lang in langs])
         for g, m in sorted(pivot.items())],
        ", ".join(["__g string"] + [f"__lp_{lang} double"
                                    for lang in langs]),
    )

    keep = [c for c in docs.columns if c != text_col]
    s = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(
            F.lower(F.substring(F.col(text_col), 1, int(sample_chars))),
            "[^a-z]+", " ")),
        F.lit(" "),
    )
    # let_-barrier the normalized sample: the transform runs on the
    # interpreted path where NO CSE exists, so an inline `s` would
    # re-run the regexp normalization per trigram (~sample_chars times
    # per row) — the ngram_lm tokenizer lesson (functions/expr.py)
    from ..functions.expr import let_

    grams = let_(s, lambda sv: F.when(
        F.length(sv) >= 3,
        F.transform(F.sequence(F.lit(1), F.length(sv) - 2),
                    lambda i: sv.substr(i, F.lit(3))),
    ).otherwise(F.array().cast("array<string>")))
    # explode_outer: a doc with zero grams must still emit its 'und' row
    g = docs.select(*keep, F.explode_outer(grams).alias("__g"))
    joined = g.join(F.broadcast(prof), "__g", "left")
    floor = F.lit(float(floor_logp))
    scored = joined.groupBy(*keep).agg(
        F.count("__g").alias("n_grams"),
        *[F.sum(F.coalesce(F.col(f"__lp_{lang}"), floor))
          .alias(f"__s_{lang}") for lang in langs],
    )
    best = F.array_max(F.array(*[
        F.struct(F.col(f"__s_{lang}").alias("s"), F.lit(lang).alias("l"))
        for lang in langs
    ]))["l"]
    return scored.select(
        *keep,
        F.when(F.col("n_grams") >= min_grams, best)
        .otherwise(F.lit("und")).alias("lang"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )
