"""Model-based quality filtering (CCNet/fastText-style pyspark.ml
pipeline): held-out accuracy on a separable corpus, weak-label
bootstrap from the heuristic tier, JVM-only scoring plan, save/load,
guards."""

import random

import pytest
from pyspark.sql import functions as F

from osmspark.operators import quality_model as qm
from osmspark.operators.textstats import quality_score_col

_STOP = ("the a of and to in is was for on with as by at from".split())
_CONTENT = [f"word{i}" for i in range(200)]


def _good(rng):
    toks = []
    for _ in range(rng.randrange(30, 60)):
        toks.append(rng.choice(_STOP) if rng.random() < 0.4
                    else rng.choice(_CONTENT))
    return " ".join(toks) + "."


def _bad(rng):
    if rng.random() < 0.5:   # gibberish
        return " ".join(
            "".join(rng.choice("qxzjvw#$%@!") for _ in range(8))
            for _ in range(rng.randrange(5, 15)))
    tok = rng.choice(_CONTENT)  # degenerate repetition
    return " ".join([tok] * rng.randrange(30, 60))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    rows = [(i, _good(rng) if i % 2 == 0 else _bad(rng), float(1 - i % 2))
            for i in range(400)]
    rows.append((9001, None, 0.0))          # null text trains/scores as ""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, truth double").cache()
    df.count()
    return df


def _accuracy(scored, thresh=0.5):
    return (scored.withColumn(
        "ok", ((F.col("model_quality") >= thresh).cast("double")
               == F.col("truth")).cast("int"))
        .agg(F.avg("ok")).first()[0])


def test_supervised_accuracy_and_jvm_plan(corpus, tmp_path):
    train = corpus.filter(F.xxhash64("doc_id") % 10 < 7)
    test = corpus.filter(F.xxhash64("doc_id") % 10 >= 7)
    model = qm.train_quality_model(train, label_col="truth",
                                   n_features=1 << 14, max_iter=10)
    # the training summary must be gone: it holds the SparkSession, and a
    # fresh model captured in a task closure is otherwise
    # TaskNotSerializable (order-dependent in the full suite)
    assert not model.stages[-1]._java_obj.hasSummary()
    scored = qm.score_quality(test, model)
    acc = _accuracy(scored)
    assert acc >= 0.95, acc     # measured 1.0 on this separable corpus
    # scoring stays JVM-side: no Python eval in the plan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    # save/load roundtrip scores identically
    from pyspark.ml import PipelineModel

    p = str(tmp_path / "qmodel")
    model.save(p)
    re_scored = qm.score_quality(test, PipelineModel.load(p))
    a = {r["doc_id"]: round(r["model_quality"], 9)
         for r in scored.collect()}
    b = {r["doc_id"]: round(r["model_quality"], 9)
         for r in re_scored.collect()}
    assert a == b


def test_weak_label_bootstrap(corpus):
    """No human labels: heuristic-quantile weak labels train a model
    that still recovers the TRUE labels on held-out docs (the CCNet
    bootstrap).  Measured 0.98 held-out; pinned with slack."""
    with_q = corpus.withColumn("quality", quality_score_col("text"))
    weak = qm.weak_labels_from_heuristics(with_q)
    # the confident tails must be mostly truthful, else the test corpus
    # is not doing its job
    agree = weak.withColumn(
        "ok", (F.col("label") == F.col("truth")).cast("int")
    ).agg(F.avg("ok")).first()[0]
    assert agree >= 0.9, agree
    train = weak.filter(F.xxhash64("doc_id") % 10 < 7)
    test = corpus.filter(F.xxhash64("doc_id") % 10 >= 7)
    model = qm.train_quality_model(train, n_features=1 << 14, max_iter=10)
    acc = _accuracy(qm.score_quality(test, model))
    assert acc >= 0.9, acc


def test_guards(corpus):
    model = None
    with pytest.raises(ValueError, match="quantile"):
        qm.weak_labels_from_heuristics(
            corpus.withColumn("quality", F.lit(1.0)),
            pos_quantile=0.2, neg_quantile=0.5)
    m = qm.train_quality_model(
        corpus.limit(50), label_col="truth", n_features=1 << 10, max_iter=2)
    with pytest.raises(ValueError, match="exists"):
        qm.score_quality(corpus.withColumn("model_quality", F.lit(0)), m)
