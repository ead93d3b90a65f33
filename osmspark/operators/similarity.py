"""Similarity search over an embedding column (array<float>) — the ANN tier
of the training-data pipeline (task spec).

  * `cosine_topk_bruteforce`: exact top-k per query — native expressions
    (zip_with dot product + window), the correctness baseline.
  * `ivf_topk`: IVF-style scale path — k-means-lite centroids (deterministic
    seeding, few Lloyd iterations via DataFrame aggregation), vectors
    bucketed by nearest centroid, queries probe `nprobe` buckets.  Recall<1
    by design; tested against brute force for recall >= threshold.
  * `embedding_near_dup_pairs`: cosine >= threshold pairs within LSH-ish
    blocks (random-hyperplane sign bits) — embedding near-dup dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim_col(a, b):
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, sim) — exact cosine top-k.

    queries broadcast; one pass over the vectors; TakeOrdered per query.
    Ties break on vec_id asc. Self-matches (same id) are not excluded."""
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vv"))
    joined = v.crossJoin(F.broadcast(q)).withColumn(
        "sim", cosine_sim_col(F.col("qv"), F.col("vv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# --- IVF -------------------------------------------------------------------


def _assign_udf(centroids: np.ndarray):
    """pandas UDF: embedding -> nearest centroid id (cosine), vectorized."""
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(T.IntegerType())
    def assign(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

    return assign


def train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_mod: int = 997,
) -> np.ndarray:
    """k-means-lite: deterministic seeds (hash-sampled rows), Lloyd updates
    via groupBy mean aggregation — distributed, no data collected except the
    centroid matrix itself."""
    seeds = (
        vectors.withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h")             # deterministic hash-order sample,
        .limit(n_centroids)         # TakeOrdered — no full sort
        .select(vec_col)
        .collect()
    )
    if len(seeds) < n_centroids:
        raise ValueError("not enough seed vectors; lower n_centroids")
    cents = np.stack([np.array(r[0], dtype=np.float64) for r in seeds])
    dim = cents.shape[1]
    for _ in range(iters):
        assigned = vectors.withColumn("cid", _assign_udf(cents)(F.col(vec_col)))
        agg = assigned.groupBy("cid").agg(
            *[
                F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c{i}")
                for i in range(dim)
            ]
        )
        rows = {r["cid"]: [r[f"c{i}"] for i in range(dim)] for r in agg.collect()}
        cents = np.stack(
            [np.array(rows.get(i, cents[i]), dtype=np.float64)
             for i in range(n_centroids)]
        )
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "embedding",
) -> DataFrame:
    """IVF search: vectors bucketed by nearest centroid (one pandas-UDF
    pass, then an equi-join on bucket), queries probe their nprobe nearest
    buckets.  The scan per query touches ~nprobe/n_centroids of the data."""
    spark = vectors.sparkSession
    v = vectors.withColumn("cid", _assign_udf(centroids)(F.col(vec_col))).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vv"), "cid"
    )
    qrows = queries.select(qid_col, qvec_col).collect()
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe_rows = []
    for r in qrows:
        qv = np.array(r[qvec_col], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(c @ qn))[:nprobe]
        for cid in order:
            probe_rows.append((r[qid_col], [float(x) for x in qv], int(cid)))
    probes = spark.createDataFrame(
        probe_rows, schema=f"query_id long, qv array<double>, cid int"
    )
    joined = v.join(F.broadcast(probes), "cid").withColumn(
        "sim", cosine_sim_col(F.col("qv"), F.col("vv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# --- random-hyperplane blocking for embedding near-dup ---------------------


def hyperplane_sig_udf(n_bits: int = 16, seed: int = 42, dim: int = 64):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))

    @F.pandas_udf(T.IntegerType())
    def sig(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        bits = (m @ planes.T) > 0  # (n, n_bits)
        vals = bits @ (1 << np.arange(n_bits))
        return pd.Series(vals.astype(np.int32))

    return sig


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.8,
    n_bits: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """cosine >= threshold pairs, blocked by random-hyperplane signature
    (exact within-block verify; near-dups rarely straddle all blocks at
    high threshold — recall tested in the suite)."""
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_sig_udf(n_bits, dim=dim)(F.col(vec_col)).alias("blk"),
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")))
        .withColumn("sim", cosine_sim_col(F.col("l.v"), F.col("r.v")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), "sim")
    )
