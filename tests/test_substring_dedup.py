"""Exact-substring dedup via duplicated n-gram spans (Lee et al. ACL 2022
shape): planted-duplicate recovery, full python-oracle equality, interval
merge semantics, removal reconstruction, second-pass convergence, native
plan."""

import pytest
from pyspark.sql import functions as F

from osmspark.operators import dedup


def _words(rng, k, vocab=5000):
    return [f"w{rng.randrange(vocab)}" for _ in range(k)]


def _python_spans(corpus, n, min_count=2):
    """Oracle: duplicated n-gram positions merged into maximal spans
    (gap <= 1 token merges), per doc."""
    from collections import Counter

    toks = {d: (t or "").lower().split() for d, t in corpus}
    toks = {d: [x for x in t if x] for d, t in toks.items()}
    cnt = Counter()
    for t in toks.values():
        for i in range(max(0, len(t) - n + 1)):
            cnt[tuple(t[i:i + n])] += 1
    out = {}
    for d, t in toks.items():
        pos = [i for i in range(max(0, len(t) - n + 1))
               if cnt[tuple(t[i:i + n])] >= min_count]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n - 1),
                             spans[-1][2] + 1)
            else:
                spans.append((p, p + n - 1, 1))
        if spans:
            out[d] = spans
    return out


@pytest.fixture(scope="module")
def planted(spark):
    """60 distinct random docs; a 60-token passage shared by docs 1 (at
    token 20) and 2 (at token 0); a 12-token block repeated twice inside
    doc 3 (far apart); doc 50 shorter than n; empty and null docs."""
    import random

    rng = random.Random(13)
    passage = _words(rng, 60, vocab=10**9)      # unique words, no accident
    block = _words(rng, 12, vocab=10**9)
    rows = []
    for i in range(60):
        body = _words(rng, 80)
        if i == 1:
            body = body[:20] + passage + body[20:]
        if i == 2:
            body = passage + body
        if i == 3:
            body = block + _words(rng, 40, vocab=10**9) + block + body
        rows.append((i, " ".join(body)))
    rows.append((50_001, " ".join(_words(rng, 5))))   # shorter than n
    rows.append((50_002, ""))
    rows.append((50_003, None))
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df, rows


def test_planted_passage_recovered_exactly(planted):
    df, rows = planted
    spans = {(r["doc_id"]): (r["start_tok"], r["end_tok"], r["n_dup_grams"])
             for r in dedup.duplicated_ngram_spans(df, n=50).collect()}
    # doc 1: passage occupies tokens [20, 79]; doc 2: [0, 59]
    assert spans[1] == (20, 79, 11)    # 60-token region -> 11 dup 50-grams
    assert spans[2] == (0, 59, 11)
    assert set(spans) == {1, 2}        # nothing else dupes at n=50


def test_python_oracle_equality_small_n(planted):
    """Full frame equality vs the python oracle at n=12 (catches the
    within-doc repeat in doc 3 plus every incidental vocab-5000 collision
    the random bodies produce)."""
    df, rows = planted
    got = {}
    for r in dedup.duplicated_ngram_spans(df, n=12).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["end_tok"], r["n_dup_grams"]))
    for d in got:
        got[d].sort()
    exp = _python_spans(rows, n=12)
    assert got == exp
    assert 3 in got and len(got[3]) == 2   # within-doc repeat, two spans


def test_remove_spans_reconstruction(planted):
    df, rows = planted
    spans = dedup.duplicated_ngram_spans(df, n=50)
    out = {r["doc_id"]: (r["text_deduped"], r["n_tokens_removed"])
           for r in dedup.remove_spans(df, spans).collect()}
    toks1 = [x for x in dict(rows)[1].lower().split() if x]
    exp1 = " ".join(toks1[:20] + toks1[80:])
    assert out[1] == (exp1, 60)
    toks2 = [x for x in dict(rows)[2].lower().split() if x]
    assert out[2] == (" ".join(toks2[60:]), 60)
    # untouched docs: normalized passthrough, zero removed
    assert out[0] == (" ".join(dict(rows)[0].lower().split()), 0)
    assert out[50_002] == ("", 0)
    assert out[50_003] == ("", 0)      # null text -> empty, not a crash


def test_second_pass_finds_nothing(planted):
    """After cutting every occurrence, a second pass at the same n is
    empty — the policy converges in one step."""
    df, _ = planted
    deduped = dedup.dedup_substrings(df, n=50).select(
        "doc_id", F.col("text_deduped").alias("text"))
    assert dedup.duplicated_ngram_spans(deduped, n=50).count() == 0


def test_adjacent_regions_merge(spark):
    """Two back-to-back duplicated regions merge into one span (gap <= 1
    rule), and a 2-token gap keeps them separate."""
    a = " ".join(f"a{i}" for i in range(12))
    b = " ".join(f"b{i}" for i in range(12))
    rows = [
        (1, a), (2, b),
        (3, a + " " + b),                       # adjacent -> one span
        (4, a + " x1 x2 " + b),                 # 2-token gap -> two spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in dedup.duplicated_ngram_spans(df, n=12).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["end_tok"]))
    for d in got:
        got[d].sort()
    assert got[3] == [(0, 23)]
    assert got[4] == [(0, 11), (14, 25)]


def test_guards_and_native_plan(planted):
    df, _ = planted
    with pytest.raises(ValueError, match="min_count"):
        dedup.duplicated_ngram_spans(df, n=5, min_count=1)
    with pytest.raises(ValueError, match="n must be"):
        dedup.duplicated_ngram_spans(df, n=0)
    with pytest.raises(ValueError, match="exists"):
        dedup.remove_spans(df.withColumn("text_deduped", F.lit("x")),
                           dedup.duplicated_ngram_spans(df))
    out = dedup.dedup_substrings(df, n=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan      # zero Python end to end
