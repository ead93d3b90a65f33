"""Tests for the char-trigram language identifier (operators/langid.py).

Oracle strategy: hand-built multilingual sentences pin the headline
behavior; a pure-Python replay of the scoring rule (same profiles, same
floor, same tie-break) pins the arithmetic on arbitrary text; a DuckDB
replay of the full pipeline (normalize -> trigrams -> profile join ->
argmax) is the cross-engine twin of the driver's `lang_trigram` row so
the parity contract is testable off-driver too.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from osmspark.operators.langid import DEFAULT_PROFILES, _rank_logp, lang_id

SENTENCES = {
    "en": "The quick brown fox jumps over the lazy dog and the cat is "
          "in the house with the other animals of the farm.",
    "de": "Der schnelle braune Fuchs springt ueber den faulen Hund und "
          "die Katze ist in dem Haus mit den anderen Tieren.",
    "fr": "Le renard brun rapide saute par dessus le chien paresseux et "
          "le chat est dans la maison avec les autres animaux.",
    "es": "El rapido zorro marron salta sobre el perro perezoso y el "
          "gato esta en la casa con los otros animales de la granja.",
    "it": "La volpe marrone veloce salta sopra il cane pigro e il gatto "
          "e nella casa con gli altri animali della fattoria.",
    "id": "Rubah coklat yang cepat melompat di atas anjing yang malas "
          "dan kucing itu ada di dalam rumah dengan hewan yang lain.",
}


def _py_lang_id(text, profiles=None, sample_chars=600, min_grams=8,
                floor=-8.0):
    """Row-at-a-time Python oracle of the documented contract."""
    import re

    profiles = profiles or DEFAULT_PROFILES
    if text is None:
        text = ""
    s = " " + re.sub("[^a-z]+", " ", text[:sample_chars].lower()).strip() + " "
    grams = [s[i:i + 3] for i in range(len(s) - 2)] if len(s) >= 3 else []
    n = len(grams)
    if n < min_grams:
        return "und", n
    weights = {
        lang: {g: _rank_logp(r) for r, g in enumerate(gs)}
        for lang, gs in profiles.items()
    }
    scores = {
        lang: sum(weights[lang].get(g, floor) for g in grams)
        for lang in profiles
    }
    # (score, lang) struct max == max score, ties toward larger code
    best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    return best[0], n


def test_six_languages(spark):
    rows = [(lang, s) for lang, s in sorted(SENTENCES.items())]
    df = spark.createDataFrame(rows, "expected string, text string")
    out = {r["expected"]: r["lang"] for r in lang_id(df).collect()}
    assert out == {lang: lang for lang in SENTENCES}


def test_und_cases(spark):
    rows = [(1, ""), (2, None), (3, "12345 !!! ??? 67"), (4, "ab"),
            (5, "   \t  "), (6, "xy zq")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = lang_id(df).collect()
    assert all(r["lang"] == "und" for r in out)
    assert len(out) == 6  # zero-gram docs still emit their row


def test_n_grams_exact(spark):
    # "abc def" normalizes to " abc def " (9 chars) -> 7 trigrams
    df = spark.createDataFrame([(1, "Abc, DEF!")], "doc_id int, text string")
    r = lang_id(df).first()
    assert r["n_grams"] == 7 and r["lang"] == "und"  # 7 < min_grams=8


def test_sample_cap_bounds_work(spark):
    # identical prefixes, wildly different tails: sample_chars must make
    # the tail invisible (per-doc work is bounded by the sample)
    base = SENTENCES["en"]
    df = spark.createDataFrame(
        [(1, base), (2, base + " zzz" * 5000)], "doc_id int, text string")
    out = lang_id(df, sample_chars=len(base)).orderBy("doc_id").collect()
    assert out[0]["lang"] == out[1]["lang"] == "en"
    assert out[0]["n_grams"] == out[1]["n_grams"]


def test_matches_python_oracle_on_corpus(spark):
    """Arbitrary word-soup text: engine argmax == Python replay, doc by
    doc, including the exact-tie tie-break paths."""
    import random

    rng = random.Random(77)
    words = ("the und der die le la el dan yang di che gli zzz qqq foo "
             "bar lorem ipsum dolor sit amet via rue strasse jalan "
             "calle 123 !!!").split()
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randrange(0, 40))))
            for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["lang"], r["n_grams"])
           for r in lang_id(df).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _py_lang_id(text), (doc_id, text)


def test_duckdb_twin(spark):
    """The exact SQL shape the driver's lang_trigram oracle row uses,
    replayed here so the cross-engine contract is pinned off-driver."""
    from __spark_entry__ import _lang_trigram_sql

    rows = [(i, s) for i, s in enumerate(SENTENCES.values())] + [
        (100, ""), (101, None), (102, "999"), (103, "the " * 50)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(tuple(r) for r in
                 lang_id(df).select("doc_id", "lang", "n_grams").collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = sorted(tuple(r) for r in
                  con.sql(_lang_trigram_sql()).fetchall())
    assert got == want


def test_margins_dominate_float_noise(spark):
    """The determinism contract: cross-engine ulp noise is ~n*ulp(|s|)
    (< 1e-8 here); every non-exact-tie inter-language margin must sit
    orders of magnitude above that, else argmax parity is luck."""
    langs = sorted(DEFAULT_PROFILES)
    rows = [(i, s) for i, s in enumerate(SENTENCES.values())] + [
        (10 + i, f"doc {i} lorem zz {'the der le el il di ' * i}")
        for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # replay scoring in Python and inspect the top-2 gap
    for _, text in rows:
        import re
        s = " " + re.sub("[^a-z]+", " ", text[:600].lower()).strip() + " "
        grams = [s[i:i + 3] for i in range(len(s) - 2)] if len(s) >= 3 else []
        if len(grams) < 8:
            continue
        weights = {
            lang: {g: _rank_logp(r)
                   for r, g in enumerate(DEFAULT_PROFILES[lang])}
            for lang in langs
        }
        scores = sorted(
            (sum(weights[lang].get(g, -8.0) for g in grams) for lang in langs),
            reverse=True)
        gap = scores[0] - scores[1]
        assert gap == 0.0 or gap > 1e-6, (text, gap)


def test_native_plan(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    plan = lang_id(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one broadcast join against the pivoted profile, no shuffle join
    assert "BroadcastHashJoin" in plan


def test_carry_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "x", SENTENCES["en"])], "doc_id int, tag string, text string")
    r = lang_id(df).first()
    assert r["doc_id"] == 1 and r["tag"] == "x" and r["lang"] == "en"


def test_custom_profiles_and_validation(spark):
    df = spark.createDataFrame([(1, "aaa bbb aaa bbb aaa bbb")],
                               "doc_id int, text string")
    out = lang_id(df, profiles={"aa": ["aaa", "aa ", " aa"],
                                "bb": ["bbb", "bb ", " bb"]}).first()
    assert out["lang"] in ("aa", "bb")
    with pytest.raises(ValueError, match="at least one"):
        lang_id(df, profiles={})
    with pytest.raises(ValueError, match="not a trigram"):
        lang_id(df, profiles={"xx": ["toolong"]})
    with pytest.raises(ValueError, match="reserved"):
        lang_id(df, profiles={"und": ["abc"], "en": ["def"]})
    with pytest.raises(ValueError, match="min_grams"):
        lang_id(df, min_grams=0)
    with pytest.raises(ValueError, match="sample_chars"):
        lang_id(df, sample_chars=2)


def test_rank_logp_above_floor():
    # every profile weight must beat the out-of-profile floor, else a
    # profile hit could LOWER a language's score
    worst = _rank_logp(max(len(g) for g in DEFAULT_PROFILES.values()) - 1)
    assert worst > -8.0
    assert _rank_logp(0) == -1.0 - math.log(2)
