"""N-gram LM perplexity tests: verbatim python add-k oracle on the real
documents table, pruning semantics, fluency ordering, edges, plan purity.
"""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from osmspark.operators import ngram_lm

SF = "/root/testdata/sf0.001"


def _toks(t):
    # python twin of functions/text.tokens_col
    return [w for w in (t or "").strip().lower().split() if w]


def _oracle(train_texts, score_items, n, k, min_count=1, vocab_size=None):
    cn, cc = Counter(), Counter()
    vocab = set()
    for t in train_texts:
        ts = _toks(t)
        vocab.update(ts)
        for i in range(len(ts) - n + 1):
            cn[" ".join(ts[i : i + n])] += 1
        for i in range(len(ts) - n + 2):
            cc[" ".join(ts[i : i + n - 1])] += 1
    if min_count > 1:
        cn = Counter({g: c for g, c in cn.items() if c >= min_count})
    V = vocab_size if vocab_size is not None else len(vocab)
    out = {}
    for d, t in score_items:
        ts = _toks(t)
        N = len(ts) - n + 1
        if N <= 0:
            out[d] = (None, 0, None)
            continue
        lp = 0.0
        for i in range(N):
            g = " ".join(ts[i : i + n])
            c = " ".join(ts[i : i + n - 1])
            lp += math.log((cn.get(g, 0) + k) / (cc.get(c, 0) + k * V))
        out[d] = (lp, N, math.exp(-lp / N))
    return V, out


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .cache()
    )


def test_matches_python_oracle_on_documents(spark, corpus):
    n, k = 3, 1.0
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want_V, want = _oracle([t for _, t in rows], rows, n, k)
    counts, V = ngram_lm.train_ngram_lm(corpus, n=n)
    assert V == want_V
    got = ngram_lm.score_perplexity(corpus, counts, V, n=n, k=k).collect()
    assert len(got) == len(rows)
    for r in got:
        wlp, wn, wppl = want[r["doc_id"]]
        assert r["lm_ngrams"] == wn
        if wn == 0:
            assert r["lm_perplexity"] is None
        else:
            assert r["lm_logprob"] == pytest.approx(wlp, rel=1e-9)
            assert r["lm_perplexity"] == pytest.approx(wppl, rel=1e-9)


def test_min_count_pruning_matches_oracle(spark, corpus):
    n, k, mc = 2, 0.5, 3
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    _, want = _oracle([t for _, t in rows], rows, n, k, min_count=mc)
    counts, V = ngram_lm.train_ngram_lm(corpus, n=n, min_count=mc)
    # pruning only shrinks the order-n table; contexts stay intact
    unpruned, _ = ngram_lm.train_ngram_lm(corpus, n=n)
    sizes = lambda df: {  # noqa: E731
        r["order"]: r["rows"]
        for r in df.groupBy("order").agg(F.count(F.lit(1)).alias("rows")).collect()
    }
    s_pruned, s_full = sizes(counts), sizes(unpruned)
    assert s_pruned[n] < s_full[n]
    assert s_pruned[n - 1] == s_full[n - 1]
    assert counts.where(
        (F.col("order") == n) & (F.col("cnt") < mc)
    ).count() == 0
    got = ngram_lm.score_perplexity(corpus, counts, V, n=n, k=k).collect()
    for r in got:
        wlp, wn, _ = want[r["doc_id"]]
        if wn:
            assert r["lm_logprob"] == pytest.approx(wlp, rel=1e-9)


def test_edges_short_null_empty(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta"),  # < n tokens: nothing to score
            (3, None),
            (4, "   "),
            (5, "alpha beta gamma alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    counts, V = ngram_lm.train_ngram_lm(docs, n=3)
    got = {
        r["doc_id"]: r
        for r in ngram_lm.score_perplexity(docs, counts, V, n=3).collect()
    }
    assert len(got) == 5  # left join keeps unscoreable docs
    for d in (2, 3, 4):
        assert got[d]["lm_ngrams"] == 0 and got[d]["lm_perplexity"] is None
    assert got[1]["lm_ngrams"] == 2 and got[1]["lm_perplexity"] > 0
    assert got[5]["lm_ngrams"] == 4
    rows = [(r, t) for r, t in [(1, "alpha beta gamma delta"), (5, "alpha beta gamma alpha beta gamma")]]
    _, want = _oracle(
        ["alpha beta gamma delta", "alpha beta", None, "   ",
         "alpha beta gamma alpha beta gamma"],
        rows, 3, 1.0,
    )
    for d, _ in rows:
        assert got[d]["lm_logprob"] == pytest.approx(want[d][0], rel=1e-9)


def test_fluent_text_scores_lower_than_gibberish(spark):
    clean = "the quick brown fox jumps over the lazy dog"
    train = spark.createDataFrame(
        [(i, clean) for i in range(50)], "doc_id long, text string"
    )
    counts, V = ngram_lm.train_ngram_lm(train, n=2)
    probe = spark.createDataFrame(
        [(0, clean), (1, "dog the over fox lazy quick jumps brown the")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lm_perplexity"]
        for r in ngram_lm.score_perplexity(probe, counts, V, n=2).collect()
    }
    assert got[0] < got[1]


def test_guards():
    with pytest.raises(ValueError, match="n must be >= 2"):
        ngram_lm.train_ngram_lm(None, n=1)
    with pytest.raises(ValueError, match="min_count"):
        ngram_lm.train_ngram_lm(None, n=2, min_count=0)
    with pytest.raises(ValueError, match="k > 0"):
        ngram_lm.score_perplexity(None, None, 10, k=0.0)
    with pytest.raises(ValueError, match="vocab_size"):
        ngram_lm.score_perplexity(None, None, 0)


def test_plan_native_and_broadcast_knob(spark, corpus):
    counts, V = ngram_lm.train_ngram_lm(corpus, n=2)
    out = ngram_lm.score_perplexity(
        corpus, counts, V, n=2, broadcast_lm=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # training plan is native too, with map-side partial aggregation
    tplan = counts._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in tplan and "ArrowEvalPython" not in tplan
    assert "HashAggregate" in tplan
