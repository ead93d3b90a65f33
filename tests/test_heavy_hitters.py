"""Streaming SpaceSaving heavy hitters: exactness under capacity, the
classic invariants under eviction, determinism, and guards.

The invariant tests deliberately avoid re-implementing the merge as an
oracle (that would just mirror the code): they check the PUBLISHED
SpaceSaving properties — overestimation bracket, counter-mass
conservation, the n/k frequent-items recall guarantee — against exact
batch counts, which hold for ANY correct implementation regardless of
eviction tie-breaking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmspark.streaming.events import run_to_memory
from osmspark.streaming.frequency import streaming_heavy_hitters


def _write_batches(spark, tmp_path, rows, n_batches=3):
    """rows: list of term strings -> n_batches parquet files (one file =
    one micro-batch under maxFilesPerTrigger=1), split round-robin."""
    path = str(tmp_path / "terms")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "i long, term string")
    for b in range(n_batches):
        (df.filter(F.col("i") % n_batches == b).select("term")
         .coalesce(1).write.mode("append").parquet(path))
    return path


def _run(spark, path, name, **kw):
    ts = (spark.readStream.schema("term string")
          .option("maxFilesPerTrigger", 1).parquet(path))
    got = run_to_memory(streaming_heavy_hitters(ts, **kw), name,
                        output_mode="update")
    # update-mode memory sink keeps every batch's emission: the live
    # summary is the max-seq row set per shard
    rows = got.collect()
    maxseq = {}
    for r in rows:
        maxseq[r["shard"]] = max(maxseq.get(r["shard"], -1), r["seq"])
    return [r for r in rows if r["seq"] == maxseq[r["shard"]]]


def _true_shard_counts(spark, rows, n_shards):
    df = spark.createDataFrame([(t,) for t in rows], "term string")
    out = df.groupBy(
        F.pmod(F.xxhash64("term"), F.lit(n_shards)).alias("shard"), "term"
    ).count().collect()
    true = {}
    for r in out:
        true.setdefault(r["shard"], {})[r["term"]] = r["count"]
    return true


def test_exact_under_capacity(spark, tmp_path):
    """Fewer distinct terms than capacity -> zero evictions: the final
    summary IS the exact multi-batch term count, err 0 everywhere."""
    rows = [f"w{i % 20}" for i in range(400)] + ["rare"]
    path = _write_batches(spark, tmp_path, rows)
    got = _run(spark, path, "hh_exact", capacity=64, n_shards=4)
    flat = {r["term"]: (r["count"], r["err"]) for r in got}
    from collections import Counter
    exact = Counter(rows)
    assert {t: c for t, (c, _) in flat.items()} == dict(exact)
    assert all(e == 0 for _, e in flat.values())


def test_invariants_under_eviction(spark, tmp_path):
    """Zipf-ish corpus through a deliberately tiny summary: published
    SpaceSaving properties hold per shard."""
    rows = []
    for i in range(1500):
        rows.append(f"hot{i % 3}")            # 3 heavy terms, ~500 each
        rows.append(f"tail{i}")               # 1500 singletons
    path = _write_batches(spark, tmp_path, rows, n_batches=4)
    n_shards, capacity = 4, 16
    got = _run(spark, path, "hh_evict", capacity=capacity,
               n_shards=n_shards)
    true = _true_shard_counts(spark, rows, n_shards)
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(true)
    for shard, summ in by_shard.items():
        n_seen = summ[0]["n_seen"]
        assert n_seen == sum(true[shard].values())
        # bounded summary + counter-mass conservation
        assert len(summ) <= capacity
        assert sum(r["count"] for r in summ) == n_seen
        for r in summ:
            t = true[shard].get(r["term"], 0)
            # overestimation bracket: true <= count <= true + err
            assert t <= r["count"] <= t + r["err"]
        # frequent-items guarantee: true count > n_seen/capacity -> present
        present = {r["term"] for r in summ}
        for term, cnt in true[shard].items():
            if cnt > n_seen / capacity:
                assert term in present, (shard, term, cnt)
        # and the hot terms genuinely dominated their shards
        hots = [r for r in summ if r["term"].startswith("hot")]
        if any(t.startswith("hot") for t in true[shard]):
            assert hots and max(r["count"] for r in hots) >= 300


def test_deterministic(spark, tmp_path):
    rows = [f"t{(i * 7) % 50}" for i in range(600)]
    path = _write_batches(spark, tmp_path, rows)
    a = sorted(map(tuple, _run(spark, path, "hh_det_a",
                               capacity=8, n_shards=2)))
    b = sorted(map(tuple, _run(spark, path, "hh_det_b",
                               capacity=8, n_shards=2)))
    assert a == b


def test_null_terms_dropped_and_guards(spark, tmp_path):
    path = str(tmp_path / "withnull")
    spark.createDataFrame(
        [("a",), (None,), ("a",)], "term string"
    ).coalesce(1).write.parquet(path)
    ts = (spark.readStream.schema("term string")
          .option("maxFilesPerTrigger", 1).parquet(path))
    got = run_to_memory(streaming_heavy_hitters(ts, capacity=4),
                        "hh_null", output_mode="update")
    rows = got.collect()
    assert {r["term"] for r in rows} == {"a"}
    assert rows[0]["count"] == 2 and rows[0]["n_seen"] == 2

    batch = spark.createDataFrame([("a",)], "term string")
    with pytest.raises(ValueError, match="capacity"):
        streaming_heavy_hitters(batch, capacity=0)
    with pytest.raises(ValueError, match="capacity"):
        streaming_heavy_hitters(batch, capacity=10**9)
    with pytest.raises(ValueError, match="n_shards"):
        streaming_heavy_hitters(batch, n_shards=0)
