"""URL extraction / domain stats vs a DuckDB oracle + crafted-case pins.

The extraction oracle reuses the ENGINE's own URL_PATTERN string inside
DuckDB (both regex dialects are RE2-compatible for this pattern), so the
extractor's semantics are pinned cross-engine, not just self-consistent.
The domain oracle re-derives host / registered-domain / tld / path-depth
from plain SQL string functions — an independent derivation, not a port
of the Spark expressions."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from osmspark.datagen import gen_url_corpus
from osmspark.operators.urlstats import (
    TWO_LEVEL_SUFFIXES,
    URL_PATTERN,
    domain_stats,
    extract_urls,
    filter_by_domain,
    url_parts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    df = gen_url_corpus(spark, 3000).persist()
    df.count()
    return df


def test_crafted_parts_pinned(spark):
    """Every parser edge case pinned to exact expected values: two-level
    public suffix + port + subdomain case-folding, IPv4 host, single-label
    host, trailing-punctuation strip, userinfo, unparsable host -> NULL
    (kept, not dropped), multi-dot trailing strip."""
    df = spark.createDataFrame(
        [
            (1, "see https://WWW.News.co.uk:8080/a/b/c?x=1 and "
                "http://10.0.0.1/z plus https://localhost/p."),
            (2, "no links"),
            (3, "userinfo http://bob@evil.com/x trail https://wiki.org/t..."),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["url"]): (
            r["protocol"], r["host"], r["registered_domain"], r["tld"],
            r["path_depth"], r["has_query"],
        )
        for r in url_parts(extract_urls(df)).collect()
    }
    assert rows[(1, "https://WWW.News.co.uk:8080/a/b/c?x=1")] == (
        "https", "www.news.co.uk", "news.co.uk", "uk", 3, True)
    assert rows[(1, "http://10.0.0.1/z")] == (
        "http", "10.0.0.1", "10.0.0.1", None, 1, False)
    assert rows[(1, "https://localhost/p")] == (
        "https", "localhost", "localhost", "localhost", 1, False)
    assert rows[(3, "http://bob@evil.com/x")] == (
        "http", "evil.com", "evil.com", "com", 1, False)
    assert rows[(3, "https://wiki.org/t")] == (
        "https", "wiki.org", "wiki.org", "org", 1, False)
    assert 2 not in {d for d, _ in rows}
    assert len(rows) == 5


def test_extraction_matches_duckdb(spark, corpus):
    """Full multiset parity of (doc_id, url) between the engine extractor
    and DuckDB running the SAME pattern + trailing-punct strip."""
    got = sorted(
        (r["doc_id"], r["url"]) for r in extract_urls(corpus).collect())
    con = duckdb.connect()
    con.register("docs", corpus.toPandas())
    exp = sorted(con.execute(
        """
        SELECT doc_id, regexp_replace(url, '[.,;:!?]+$', '') AS url
        FROM (
          SELECT doc_id,
                 unnest(regexp_extract_all(coalesce(text, ''), ?)) AS url
          FROM docs)
        """, [URL_PATTERN]).fetchall())
    assert got == exp
    assert len(got) > 4000  # the corpus genuinely exercises the extractor


def test_domain_stats_matches_duckdb(spark, corpus):
    """domain_stats vs an independent SQL derivation of host/registered
    domain/path depth/query flag from string functions."""
    got = {
        r["registered_domain"]: (
            r["n_urls"], r["n_docs"], r["n_hosts"],
            round(r["avg_path_depth"], 9), round(r["query_frac"], 9),
        )
        for r in domain_stats(corpus).collect()
    }
    con = duckdb.connect()
    con.register("docs", corpus.toPandas())
    sufs = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    exp_rows = con.execute(
        f"""
        WITH urls AS (
          SELECT doc_id, regexp_replace(url, '[.,;:!?]+$', '') AS url
          FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(coalesce(text, ''), ?)) AS url
            FROM docs)
        ), parts AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)',
                   1)) AS host,
                 regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)
                   AS path,
                 url LIKE '%?%' AS has_query
          FROM urls
        ), dom AS (
          SELECT *,
                 string_split(host, '.') AS labels,
                 len(string_split(host, '.')) AS n
          FROM parts
        ), reg AS (
          SELECT doc_id, host, has_query,
                 len(list_filter(string_split(coalesce(path, ''), '/'),
                                 x -> x != '')) AS path_depth,
                 CASE
                   WHEN regexp_matches(host,
                        '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
                        OR n <= 1 THEN host
                   WHEN n >= 3 AND
                        array_to_string(labels[n-1:n], '.') IN ({sufs})
                     THEN array_to_string(labels[n-2:n], '.')
                   ELSE array_to_string(labels[n-1:n], '.')
                 END AS registered_domain
          FROM dom
        )
        SELECT registered_domain,
               count(*) AS n_urls,
               count(DISTINCT doc_id) AS n_docs,
               count(DISTINCT host) AS n_hosts,
               avg(path_depth) AS avg_path_depth,
               avg(CASE WHEN has_query THEN 1.0 ELSE 0.0 END) AS query_frac
        FROM reg
        WHERE registered_domain IS NOT NULL AND registered_domain != ''
        GROUP BY 1
        """, [URL_PATTERN]).fetchall()
    exp = {r[0]: (r[1], r[2], r[3], round(r[4], 9), round(r[5], 9))
           for r in exp_rows}
    assert got == exp
    # the corpus hot domain is genuinely hot (skew knob sanity): strictly
    # more URLs than any other domain, by at least 2x
    others_max = max(v[0] for k, v in got.items() if k != "bigportal.com")
    assert got["bigportal.com"][0] >= 2 * others_max


def test_domain_stats_sketch_mode(spark, corpus):
    """exact=False swaps the distinct counts for HLL sketches: every
    domain's estimate within 8% of exact (rsd
    pinned at 0.02 -> ~4 sigma headroom), and the plan loses the
    multi-distinct Expand (one exchange total — the web-scale shape)."""
    exact = {r["registered_domain"]: (r["n_docs"], r["n_hosts"])
             for r in domain_stats(corpus, exact=True).collect()}
    approx_df = domain_stats(corpus, exact=False)
    approx = {r["registered_domain"]: (r["n_docs"], r["n_hosts"])
              for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for dom, (nd, nh) in exact.items():
        assert abs(approx[dom][0] - nd) <= max(3, 0.08 * nd)
        assert abs(approx[dom][1] - nh) <= max(3, 0.08 * nh)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    # AQE's toString appends the pre-adaptive "Initial Plan" — count
    # exchanges in the final plan section only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1


def test_filter_by_domain_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "fine https://wiki.org/a"),
            (2, "mixed https://wiki.org/a and https://spam.bad.com/x"),
            (3, "no links at all"),
            (4, "only https://www.bad.com/y"),
        ],
        "doc_id long, text string",
    )
    dim = spark.createDataFrame([("bad.com",)], "registered_domain string")
    blocked = {r["doc_id"] for r in
               filter_by_domain(docs, dim, mode="block").collect()}
    # block: any listed domain kills the doc; URL-less docs pass
    assert blocked == {1, 3}
    allowed = {r["doc_id"] for r in
               filter_by_domain(docs, dim, mode="allow").collect()}
    # allow: at least one listed domain keeps the doc; URL-less dropped
    assert allowed == {2, 4}
    with pytest.raises(ValueError, match="mode"):
        filter_by_domain(docs, dim, mode="deny")


def test_plan_is_pure_native(spark, corpus):
    out = domain_stats(corpus)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    gate = filter_by_domain(
        corpus,
        corpus.sparkSession.createDataFrame(
            [("blog.net",)], "registered_domain string"),
    )
    gplan = gate._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in gplan and "ArrowEvalPython" not in gplan
    assert "BroadcastHashJoin" in gplan  # the list side is broadcast
