"""BM25 inverted-index search vs a DuckDB SQL oracle (independent
engine), plus plan-shape and edge-case checks."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from osmspark.operators import search

SF = "/root/testdata/sf0.01"

# the oracle twin of bm25_topk(reproducible=True): same tokenizer, same
# rational idf, same expression tree, ordered-aggregate sum in term order
ORACLE = r"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM docs, UNNEST(list_filter(
        string_split_regex(lower(trim(coalesce(text, ''))), '\s+'),
        x -> x <> '')) AS t(term)
),
posts AS (
  SELECT term, doc_id, CAST(count(*) AS DOUBLE) AS tf
  FROM toks GROUP BY 1, 2
),
dls AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dls
),
qterms AS (
  SELECT query_id, t.term
  FROM queries, UNNEST(list_distinct(list_filter(
        string_split_regex(lower(trim(coalesce(query_text, ''))), '\s+'),
        x -> x <> ''))) AS t(term)
),
dfs AS (
  SELECT p.term, CAST(count(*) AS DOUBLE) AS df
  FROM posts p
  WHERE p.term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY 1
),
per_term AS (
  SELECT q.query_id, p.doc_id, p.term,
         ((s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * ((p.tf * (1.2 + 1.0))
              / (p.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (l.dl / s.avgdl))))
           AS sc
  FROM qterms q
  JOIN posts p ON p.term = q.term
  JOIN dfs f ON f.term = p.term
  JOIN dls l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, sum(sc ORDER BY term) AS score
  FROM per_term GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scores
) WHERE rank <= {k}
"""

QUERIES = [
    (0, "hash join table"),
    (1, "window agg"),
    (2, "spark data value value"),   # repeated term dedups
    (3, "zzz-nonexistent-term"),     # matches nothing
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")


def _duck(docs_rows, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs_rows)
    con.execute("CREATE TABLE queries (query_id BIGINT, query_text VARCHAR)")
    con.executemany("INSERT INTO queries VALUES (?, ?)", QUERIES)
    return con.execute(ORACLE.format(k=k)).fetchall()


def test_bm25_matches_duckdb_bit_exact(spark, docs):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    got = sorted(tuple(r) for r in search.bm25_topk(
        docs, qdf, k=12, reproducible=True).collect())
    want = sorted(tuple(r) for r in _duck(
        [(r["doc_id"], r["text"]) for r in docs.collect()], 12))
    # bit-exact: scores included, no rounding
    assert got == want
    assert len(got) > 20  # three real queries x 12 docs, minus misses


def test_bm25_fast_path_matches_reproducible_to_float_noise(spark, docs):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    post = search.build_postings(docs)
    a = {(r["query_id"], r["doc_id"]): r["score"]
         for r in search.bm25_topk_indexed(post, qdf, k=500).collect()}
    b = {(r["query_id"], r["doc_id"]): r["score"]
         for r in search.bm25_topk_indexed(
             post, qdf, k=500, reproducible=True).collect()}
    assert set(a) == set(b)
    for key, sa in a.items():
        assert sa == pytest.approx(b[key], rel=1e-12)


def test_bm25_plan_shape(spark, docs):
    """No Python anywhere; the postings-side join broadcasts the QUERY
    side (the corpus must stream)."""
    qdf = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    plan = search.bm25_topk(docs, qdf, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_edges(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa aa aa"), (3, ""), (4, None),
         (5, "  aa\t bb  ")],
        "doc_id long, text string")
    qdf = spark.createDataFrame([(0, "aa")], "query_id long, query_text string")
    got = search.bm25_topk(docs, qdf, k=10).collect()
    # empty and null docs never match; all three aa-docs do
    assert sorted(r["doc_id"] for r in got) == [1, 2, 5]
    # tf saturation: doc 2 (aa x3, dl 3) outranks doc 1 (aa x1 of 3 tokens)
    ranks = {r["doc_id"]: r["rank"] for r in got}
    assert ranks[2] < ranks[1]
    with pytest.raises(ValueError, match="k must be"):
        search.bm25_topk(docs, qdf, k=0)


def test_prune_hot_terms(spark):
    docs = spark.createDataFrame(
        [(i, f"the w{i}") for i in range(10)], "doc_id long, text string")
    post = search.build_postings(docs)
    pruned = search.prune_hot_terms(post, max_df=5)
    terms = {r["term"] for r in pruned.select("term").distinct().collect()}
    assert "the" not in terms and "w3" in terms
    # anti-join side is broadcast
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
