"""Driver-contract smoke: entry() + queries()/oracle_sql() wiring."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    assert df.count() > 0
    assert "normalized_type" in df.columns and "cnt" in df.columns


def test_every_oracle_has_a_query():
    q, o = em.queries(), em.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 15


def test_sampled_queries_run(spark):
    q = em.queries()
    # exact_dedup_stats + street_norm_counts retired from the budget round
    # 4; exact_dedup_keep / street_norm_counts_engine gate the same
    # semantics through the engine operators
    for name in ["street_norm_counts_engine", "tpch_q1", "exact_dedup_keep"]:
        df = q[name](spark, "/root/testdata/sf0.001")
        assert df.count() > 0
