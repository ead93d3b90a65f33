"""IVF-PQ (product quantization): exact-identity oracle vs reconstructed
vectors, measured recall vs the float corpus, geometry/type guards,
storage shape, train determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmspark.operators import pq, similarity


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


@pytest.fixture(scope="module")
def coarse(embeddings):
    return similarity.train_centroids(embeddings, n_centroids=8, iters=2)


@pytest.fixture(scope="module")
def flat_books(embeddings):
    return pq.train_pq(embeddings, m=8, n_codes=16, iters=2)


@pytest.fixture(scope="module")
def resid_books(embeddings, coarse):
    with_cid = embeddings.withColumn(
        "cid", similarity._assign_udf(coarse)(F.col("embedding")))
    return pq.train_pq(with_cid, m=8, n_codes=16, iters=2,
                       centroids=coarse, cid_col="cid")


def _np_hat(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _oracle_topk(encoded_rows, cb, coarse, residual, queries, k):
    """numpy: exact cosine(q_hat, reconstructed vector) top-k, ties on
    vec_id asc — ivf_pq_topk at full probe must match this EXACTLY
    (the ADC score is an identity, not an approximation)."""
    m, K, dsub = cb.shape
    ids = np.array([r["vec_id"] for r in encoded_rows])
    order = np.argsort(ids)
    ids = ids[order]
    codes = np.stack([np.frombuffer(r["pq_code"], np.uint8)
                      for r in encoded_rows])[order]
    cids = np.array([r["cid"] for r in encoded_rows])[order]
    recon = cb[np.arange(m)[None, :], codes].reshape(len(codes), m * dsub)
    if residual:
        recon = recon + _np_hat(np.asarray(coarse, dtype=np.float64))[cids]
    rn = np.maximum(np.linalg.norm(recon, axis=1), 1e-12)
    out = {}
    for qid, qv in queries:
        qh = np.asarray(qv, dtype=np.float64)
        qh = qh / max(np.linalg.norm(qh), 1e-12)
        sims = recon @ qh / rn
        top = sorted(zip(ids, sims), key=lambda t: (-t[1], t[0]))[:k]
        out[qid] = top
    return out


def _check_full_probe_equivalence(embeddings, coarse, books, residual):
    enc = pq.ivf_pq_index(embeddings, coarse, books, residual=residual)
    queries = embeddings.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = pq.ivf_pq_topk(enc, queries, k=5, centroids=coarse,
                         codebooks=books, nprobe=len(coarse),
                         residual=residual).collect()
    oracle = _oracle_topk(
        enc.collect(), books, coarse, residual,
        [(r["query_id"], r["embedding"]) for r in queries.collect()], k=5)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(oracle)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == [t[0] for t in oracle[qid]]
        np.testing.assert_allclose(
            [r["sim"] for r in rows], [t[1] for t in oracle[qid]],
            rtol=0, atol=1e-9)


def test_full_probe_equivalence_flat(embeddings, coarse, flat_books):
    _check_full_probe_equivalence(embeddings, coarse, flat_books,
                                  residual=False)


def test_full_probe_equivalence_residual(embeddings, coarse, resid_books):
    _check_full_probe_equivalence(embeddings, coarse, resid_books,
                                  residual=True)


@pytest.fixture(scope="module")
def clustered(spark):
    """Corpus with REAL neighbor structure: 8 planted clusters aligned
    with the 8 coarse centroids, so the residual is pure within-cluster
    detail — the case residual encoding exists for.  (The sf0.001
    embeddings table is isotropic random — intra-label cosine ==
    inter-label == ~0 — where ANY 8-byte code is
    information-theoretically blind; measured 0.48 recall@10 there, a
    property of the data, not the index.)"""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 64))
    rows = []
    for i in range(600):
        v = centers[i % 8] + 0.15 * rng.standard_normal(64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    coarse = similarity.train_centroids(emb, n_centroids=8, iters=3)
    return emb, coarse


def test_recall_vs_float_corpus(clustered):
    """Quantization cost measured against the float brute force at full
    probe (isolates PQ loss from IVF probe loss).

    Measured on the deterministic clustered corpus (seed 7, 600 x 64,
    m=8 K=32): residual recall@10 = 0.504, 1-recall@10 (true NN found in
    top-10, the standard PQ headline metric) = 0.72; flat = 0.42 / 0.36.
    Pinned with slack; the residual-beats-flat ORDERING is the point of
    the IVF-PQ composition."""
    emb, coarse = clustered
    queries = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding")
    bf = {}
    for r in similarity.cosine_topk_bruteforce(emb, queries, k=11).collect():
        bf.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    truth10 = {q: {v for rk, v in rs if rk <= 10} for q, rs in bf.items()}
    nn = {q: sorted(rs)[1][1] for q, rs in bf.items()}   # rank-1 is self

    def run(residual):
        if residual:
            wc = emb.withColumn(
                "cid", similarity._assign_udf(coarse)(F.col("embedding")))
            books = pq.train_pq(wc, m=8, n_codes=32, iters=3,
                                centroids=coarse, cid_col="cid")
        else:
            books = pq.train_pq(emb, m=8, n_codes=32, iters=3)
        enc = pq.ivf_pq_index(emb, coarse, books, residual=residual)
        got = {}
        for r in pq.ivf_pq_topk(enc, queries, k=11, centroids=coarse,
                                codebooks=books, nprobe=len(coarse),
                                residual=residual).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        r10 = np.mean([len(got[q] & truth10[q]) / 10 for q in truth10])
        nn10 = np.mean([1.0 if nn[q] in got[q] else 0.0 for q in nn])
        return r10, nn10

    r10_resid, nn10_resid = run(True)
    r10_flat, nn10_flat = run(False)
    assert r10_resid >= 0.45, r10_resid
    assert nn10_resid >= 0.6, nn10_resid
    assert nn10_resid >= nn10_flat + 0.15, (nn10_resid, nn10_flat)


def test_partial_probe_recall_and_plan(embeddings, coarse, resid_books):
    """nprobe=3 of 8 keeps most of the recall (clustered corpus) and the
    plan is the cogroup shape: FlatMapCoGroupsInPandas, no LocalTableScan
    (no driver-built rows), corpus scan carries codes not floats."""
    enc = pq.ivf_pq_index(embeddings, coarse, resid_books).cache()
    queries = embeddings.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = pq.ivf_pq_topk(enc, queries, k=10, centroids=coarse,
                         codebooks=resid_books, nprobe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "LocalTableScan" not in plan, plan
    full = {}
    for r in pq.ivf_pq_topk(enc, queries, k=10, centroids=coarse,
                            codebooks=resid_books,
                            nprobe=len(coarse)).collect():
        full.setdefault(r["query_id"], set()).add(r["vec_id"])
    part = {}
    for r in out.collect():
        part.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = np.mean([len(part[q] & full[q]) / 10 for q in full])
    assert rec >= 0.8, rec
    enc.unpersist()


def test_code_is_m_bytes_binary(embeddings, coarse, resid_books):
    enc = pq.ivf_pq_index(embeddings, coarse, resid_books)
    assert dict(enc.dtypes) == {"vec_id": "bigint", "cid": "int",
                                "pq_code": "binary"}
    rows = enc.limit(5).collect()
    assert all(len(r["pq_code"]) == 8 for r in rows)   # m=8 bytes/vector


def test_decode_roundtrip_error_bounded(clustered):
    """decode(encode(v)) approximates the NORMALIZED vector.  On the
    clustered corpus the within-cluster noise is ~0.15 of the vector
    norm, so a working residual codebook must reconstruct to well under
    that ceiling's unit-norm budget (measured: 0.115 mean; the
    all-zero-residual baseline — centroid only — sits at 0.277, and the
    isotropic sf0.001 corpus sits at 0.86, which is the data refusing
    compression, not a code bug)."""
    emb, coarse = clustered
    wc = emb.withColumn(
        "cid", similarity._assign_udf(coarse)(F.col("embedding")))
    books = pq.train_pq(wc, m=8, n_codes=32, iters=3,
                        centroids=coarse, cid_col="cid")
    enc = pq.ivf_pq_index(emb, coarse, books)
    dec = pq.pq_decode(enc, books, centroids=coarse, cid_col="cid")
    joined = dec.join(emb.select("vec_id", "embedding"), "vec_id").collect()
    errs = []
    for r in joined:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        errs.append(np.linalg.norm(v - np.asarray(r["pq_recon"])))
    assert np.mean(errs) < 0.15, np.mean(errs)  # unit vectors: 0 = perfect


def test_train_determinism(embeddings):
    a = pq.train_pq(embeddings, m=4, n_codes=8, iters=1)
    b = pq.train_pq(embeddings, m=4, n_codes=8, iters=1)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_geometry_and_type_guards(embeddings, coarse, resid_books, spark):
    with pytest.raises(ValueError, match="not divisible"):
        pq.train_pq(embeddings, m=7, n_codes=8, iters=1)
    with pytest.raises(ValueError, match="n_codes"):
        pq._check_geometry(64, 8, 257)
    with pytest.raises(ValueError, match="cid_col"):
        pq.train_pq(embeddings, m=8, n_codes=8, centroids=coarse)
    with pytest.raises(ValueError, match="go together"):
        pq.pq_encode(embeddings, resid_books, centroids=coarse)
    enc = pq.ivf_pq_index(embeddings, coarse, resid_books)
    with pytest.raises(ValueError, match="exists"):
        pq.pq_encode(enc.withColumnRenamed("pq_code", "x")
                        .withColumn("embedding", F.array(F.lit(1.0))),
                     resid_books, out_col="x")
    bad = enc.withColumn("pq_code", F.col("vec_id"))   # not binary
    q = embeddings.limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="binary"):
        pq.ivf_pq_topk(bad, q, 3, coarse, resid_books)
