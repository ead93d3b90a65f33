"""Native Bloom sketch (functions/bloom.py) + decontaminate_bloom.

The load-bearing claims: zero false negatives (exhaustively checked),
measured false-positive rate near the sizing target, and EXACT frame
equality between the bloom-filtered decontamination plan and the
broadcast-exact one — the sketch may only change the plan.
"""

import pytest
from pyspark.sql import functions as F

from osmspark.functions import bloom
from osmspark.operators import dedup


@pytest.fixture(scope="module")
def texts(spark):
    """The dedup suite's corpus shape: 4 bases x 40 variants + an exact
    dup + an empty doc — enough shared shingles for real contamination."""
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a slow green turtle walks under the busy bridge in the town",
        "spark shuffles data between executors during wide transformations",
        "columnar formats like parquet enable predicate pushdown and pruning",
    ]
    rows = [(i, base[i % 4] + (" extra" if i % 8 == 4 else ""))
            for i in range(40)]
    rows.append((100, base[0]))
    rows.append((101, ""))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_params_guard_and_shape():
    with pytest.raises(ValueError, match="fpp"):
        bloom.bloom_params(100, 0.0)
    with pytest.raises(ValueError, match="fpp"):
        bloom.bloom_params(100, 1.0)
    m, k = bloom.bloom_params(10_000, 0.01)
    assert m % 64 == 0 and m >= 10_000 * 9 and 5 <= k <= 10


def test_no_false_negatives_and_fp_rate(spark):
    n, fpp = 5_000, 0.01
    keys = spark.range(n).select(F.col("id").alias("h"))
    m, k = bloom.bloom_params(n, fpp)
    words = bloom.bloom_build(keys, "h", m, k)
    carrier = bloom.bloom_carrier(spark, words)
    probe = bloom.bloom_probe(F.col("__bf"), F.col("h"), m, k)

    members = keys.crossJoin(F.broadcast(carrier)).where(probe)
    assert members.count() == n                     # NO false negatives

    outside = spark.range(1_000_000, 1_020_000).select(
        F.col("id").alias("h")
    ).crossJoin(F.broadcast(carrier))
    fp = outside.where(probe).count() / 20_000
    assert fp < 3 * fpp, fp                         # near the sizing target
    assert fp > 0 or True                           # (rate may be tiny)


def test_decontaminate_bloom_hand_case(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),
         (1, "alpha beta gamma nope nope2"),
         (2, "totally unrelated text here now"),
         (3, "ab")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.decontaminate_bloom(docs, bench, n=3,
                                     threshold=0.5).collect()}
    assert out[0]["overlap"] == 1.0 and out[0]["contaminated"]
    assert abs(out[1]["overlap"] - 1 / 3) < 1e-9
    assert out[2]["overlap"] == 0.0
    assert out[3]["n_sh"] == 0 and out[3]["overlap"] == 0.0


def test_decontaminate_bloom_equals_exact(spark, texts):
    """Full frame equality on the real corpus — the sketch must not
    change a single row, with real hits present (benchmark = every 7th
    doc's text)."""
    bench = texts.where(F.col("doc_id") % 7 == 0)
    want = {r["doc_id"]: (r["n_sh"], r["n_match"], r["overlap"],
                          r["contaminated"])
            for r in dedup.decontaminate(texts, bench, n=3,
                                         threshold=0.3).collect()}
    got = {r["doc_id"]: (r["n_sh"], r["n_match"], r["overlap"],
                         r["contaminated"])
           for r in dedup.decontaminate_bloom(texts, bench, n=3,
                                              threshold=0.3).collect()}
    assert got == want
    assert any(c for _, _, _, c in want.values())   # real contamination

    # count-hint path: identical again, without the sizing action
    hint = bench.select(F.explode(F.array_distinct(
        dedup.shingle_hashes_col(3, "text"))).alias("h")
    ).distinct().count()
    got_h = {r["doc_id"]: (r["n_sh"], r["n_match"], r["overlap"],
                           r["contaminated"])
             for r in dedup.decontaminate_bloom(
                 texts, bench, n=3, threshold=0.3,
                 n_bench_hint=hint).collect()}
    assert got_h == want


def test_probe_plan_is_native(spark, texts):
    bench = texts.where(F.col("doc_id") % 7 == 0)
    out = dedup.decontaminate_bloom(texts, bench, n=3, threshold=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan        # the one-row carrier
