"""Full-text relevance search — BM25 top-k over an inverted index, built
with native DataFrame ops only (no Python in any plan).

Why this operator: the task-spec LLM-data tier (SURVEY.md SS2.6) already
filters and dedups the `documents` table; retrieving from it is the
natural next surface (benchmark decontamination and RAG-style corpus
audits are both "find the docs that score highest for these terms").

Spark shape, sized for 10^12 docs:
  * `build_postings` is the WRITE-ONCE index: one tokenize pass, one
    explode, one groupBy (term, doc_id) -> rows (term, doc_id, tf, dl).
    The document length dl is DENORMALIZED into each posting
    (Lucene's norm-in-posting trick) so scoring never joins back to the
    corpus — the only big join in a query is postings x query-terms.
    At scale the postings table persists partitioned/bucketed by term;
    every query then prunes to its terms' buckets.
  * query terms are exploded from the (tiny) queries frame and
    BROADCAST; the postings side streams.  Per-term document
    frequencies come from the same pruned postings (group by term), so
    a query touches only its own terms' rows end to end.
  * stop-term skew is the known hazard (a term in half the corpus makes
    one huge join partition).  `prune_hot_terms` drops terms above a
    document-frequency cap from the index — the standard IR fix, and
    the hot-term list is small by construction, so it broadcasts.

Scoring: BM25 with a RATIONAL idf, idf = (N - df + 0.5) / (df + 0.5)
(the classic Robertson-Sparck Jones form without the log).  Dropping
the log keeps every arithmetic op an exact-input IEEE +,-,*,/ — which
is what makes the DuckDB oracle row possible: both engines compute
bit-identical per-term scores from the same expression tree.  The log
only compresses the idf scale; rankings for same-length conjunctive
queries are ordinally close, and the variant is documented at the API.

Determinism: a per-(query, doc) score is a SUM over matched terms, and
float addition is not associative — plain groupBy().sum() is
partition-order-dependent in the last ulp.  `reproducible=True` pins
the fold: collect the per-term scores, sort by term, and fold-add in
term order (one native higher-order `aggregate`), making the score
bit-stable across runs AND engines (the oracle SQL mirrors it with
DuckDB's ordered-aggregate `sum(sc ORDER BY term)`).  The default
(False) is the plain partial-aggregating sum — the right choice at
scale, where ulp-stability is not worth forfeiting map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from ..functions.text import tokens_col as _tokens  # engine-wide tokenizer


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted index: (term, doc_id, tf, dl) — tf = term count in doc,
    dl = doc token length (denormalized; see module docstring).  Docs
    with no tokens produce no postings and do not count toward corpus
    stats (mirrored by the oracle)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens(text_col).alias("__toks"),
    ).withColumn("dl", F.size("__toks"))
    return (
        toks.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )


def prune_hot_terms(postings: DataFrame, max_df: int) -> DataFrame:
    """Drop terms present in more than `max_df` documents (stop-term
    skew cap).  The hot-term list is small by construction (few terms
    exceed any useful cap), so it broadcasts into an anti-join; the
    postings side never shuffles."""
    hot = (postings.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
           .filter(F.col("__df") > max_df).select("term"))
    return postings.join(F.broadcast(hot), "term", "left_anti")


def corpus_stats(postings: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) frame from the index.  avgdl is computed
    as CAST(exact integer sum AS DOUBLE) / n_docs — NOT avg(), whose
    accumulation order is engine- and partition-dependent; the integer
    sum is exact, so the single division is bit-deterministic.  At
    scale this is computed once at index-build time and persisted."""
    dls = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return dls.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )


def bm25_topk_indexed(
    postings: DataFrame,
    queries: DataFrame,
    k: int,
    stats: DataFrame | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    reproducible: bool = False,
) -> DataFrame:
    """BM25 top-k over a `build_postings` index -> (query_id, rank,
    doc_id, score), rank 1..k per query, ties broken by doc_id.

    Repeated query terms are deduplicated (each term scores once).
    `stats` accepts a precomputed `corpus_stats` frame (the index-time
    artifact); None derives it from `postings`.  See the module
    docstring for the rational-idf variant and `reproducible`."""
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    if stats is None:
        stats = corpus_stats(postings)

    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(F.array_distinct(_tokens(qtext_col))).alias("term"),
    )
    # df per matched term, from the postings pruned to query terms only
    dfs = (
        postings.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
    )
    # round 6 (guide §1.2 "don't compute things you throw away"): the
    # per-term score depends only on (term, doc, df, stats) — never on the
    # query — so it is evaluated ONCE per matched POSTING, and only then
    # fanned out to the queries sharing the term.  The old shape attached
    # queries first and ran the BM25 arithmetic per (query, posting) row:
    # ~(queries per term)x more FLOPs, and tf/dl/df/avgdl all rode the
    # fan-out join instead of one double.  Row multiset and every score
    # bit are unchanged (same expression tree over the same inputs).
    matched = (
        postings.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
    )
    # expression tree mirrored EXACTLY by the oracle SQL — do not
    # reassociate (IEEE ops are deterministic only for the same tree)
    k1l, bl = F.lit(float(k1)), F.lit(float(b))
    n_docs = F.col("n_docs").cast("double")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    idf = (n_docs - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    sc = idf * (
        (tf * (k1l + F.lit(1.0)))
        / (tf + k1l * ((F.lit(1.0) - bl) + bl * (dl / F.col("avgdl"))))
    )
    per_term = (
        matched.select("term", "doc_id", sc.alias("__sc"))
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", "term", "__sc")
    )

    if reproducible:
        scores = (
            per_term.groupBy("query_id", "doc_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("term", "__sc"))).alias("__ts"))
            .select(
                "query_id", "doc_id",
                F.aggregate(
                    "__ts", F.lit(0.0),
                    lambda acc, x: acc + x["__sc"]).alias("score"),
            )
        )
    else:
        scores = (
            per_term.groupBy("query_id", "doc_id")
            .agg(F.sum("__sc").alias("score"))
        )

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    reproducible: bool = False,
) -> DataFrame:
    """One-shot BM25 top-k straight from a documents frame (builds the
    index inline).  For repeated querying, `build_postings` once and
    call `bm25_topk_indexed` — the index is the expensive pass."""
    return bm25_topk_indexed(
        build_postings(docs, text_col=text_col, id_col=id_col),
        queries, k, stats=None, k1=k1, b=b,
        qid_col=qid_col, qtext_col=qtext_col, reproducible=reproducible,
    )
