"""Weighted sampling (Efraimidis-Spirakis) vs a python oracle on the
selection math, statistical proportionality, determinism, plan shape,
stratified-path equality, and guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osmspark.operators.sampling import (
    es_key_col,
    temperature_weights,
    weighted_sample,
    weighted_stratified_sample,
)

_M = 1 << 52  # mirrors es_key_col: u = top 52 unsigned hash bits


@pytest.fixture(scope="module")
def corpus(spark):
    """2000 docs, weight 10 for even ids, 1 for odd — the 10:1 mixing
    fixture every test here reuses."""
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(10.0)).otherwise(
            F.lit(1.0)).alias("w"),
    ).persist()
    df.count()
    return df


def test_selection_matches_python_oracle(spark, corpus):
    """Collect (id, hash) once from the trusted builtin, recompute the ES
    key + top-k entirely in python, and demand EXACT id-set equality with
    the operator.  Pins the key formula, the tie order, and the limit."""
    hashes = {r["doc_id"]: r["h"] for r in corpus.select(
        "doc_id", F.xxhash64("doc_id", F.lit(7)).alias("h")).collect()}
    weights = {r["doc_id"]: r["w"] for r in corpus.collect()}

    def key(i):
        u = (((hashes[i] & 0xFFFFFFFFFFFFFFFF) >> 12) + 0.5) / _M
        return math.log(u) / weights[i]

    exp = sorted(hashes, key=lambda i: (-key(i), i))[:150]
    got = [r["doc_id"] for r in
           weighted_sample(corpus, 150, "w", seed=7).collect()]
    assert sorted(got) == sorted(exp)
    assert len(got) == 150


def test_heavy_weights_oversampled(spark, corpus):
    """Weight-10 docs must dominate the sample roughly in proportion:
    with k=200 of 2000 and a 10:1 weight ratio the heavy class's share
    must sit far above its 50% population share (loose deterministic
    band — the sample is a pure function of the seed)."""
    got = weighted_sample(corpus, 200, "w", seed=3).collect()
    heavy = sum(1 for r in got if r["w"] == 10.0)
    assert 150 <= heavy <= 200


def test_deterministic_and_seed_sensitive(spark, corpus):
    a = {r["doc_id"] for r in weighted_sample(corpus, 100, "w").collect()}
    b = {r["doc_id"] for r in weighted_sample(corpus, 100, "w").collect()}
    c = {r["doc_id"] for r in
         weighted_sample(corpus, 100, "w", seed=99).collect()}
    assert a == b
    assert a != c


def test_plan_is_take_ordered(spark, corpus):
    df = weighted_sample(corpus, 50, "w")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_stratified_equals_direct_window(spark):
    """The two-phase salted path must pick EXACTLY the per-stratum ES
    top-N that a direct single-window ranking picks."""
    from pyspark.sql import Window

    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
        (F.pmod(F.xxhash64("id"), F.lit(9)) + 1).cast("double").alias("w"),
    )
    got = sorted(r["doc_id"] for r in weighted_stratified_sample(
        docs, "src", per_stratum=40, weight_col="w", seed=5).collect())
    w = Window.partitionBy("src").orderBy(
        (-es_key_col("w", "doc_id", 5)).asc(), F.col("doc_id").asc())
    exp = sorted(r["doc_id"] for r in docs.withColumn(
        "__rn", F.row_number().over(w)).filter(F.col("__rn") <= 40)
        .collect())
    assert got == exp
    assert len(got) == 120


def test_temperature_weights(spark):
    counts = spark.createDataFrame(
        [("en", 900.0), ("de", 90.0), ("yo", 10.0)], "lang string, n double")
    w1 = {r["lang"]: r["weight"] for r in
          temperature_weights(counts, tau=1.0).collect()}
    assert abs(w1["en"] - 0.9) < 1e-12
    # tau -> large flattens toward uniform
    w5 = {r["lang"]: r["weight"] for r in
          temperature_weights(counts, tau=100.0).collect()}
    assert abs(w5["yo"] - 1 / 3) < 0.02
    # weights always sum to 1
    assert abs(sum(w5.values()) - 1.0) < 1e-12
    with pytest.raises(ValueError, match="tau"):
        temperature_weights(counts, tau=0.0)


def test_bad_weight_raises(spark):
    docs = spark.createDataFrame(
        [(1, 2.0), (2, 0.0)], "doc_id long, w double")
    with pytest.raises(Exception, match="must be > 0"):
        weighted_sample(docs, 1, "w").collect()
    docs_null = spark.createDataFrame(
        [(1, 2.0), (2, None)], "doc_id long, w double")
    with pytest.raises(Exception, match="must be > 0"):
        weighted_sample(docs_null, 1, "w").collect()
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(docs, 0, "w")
