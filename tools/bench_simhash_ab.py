"""A/B evidence for the round-3 SimHash/fingerprint rewrite (round-2
VERDICT item 2 'Done' criterion: a bench entry showing >=10x on 200k docs).

Side A: the round-3 PURE NATIVE SimHash / fingerprint (xxhash64 token
hashing + aggregate folds, zero Python).
Side B: the retired round-2 implementation — per-token FNV-1a hashed byte
by byte inside a pandas UDF — reproduced here verbatim as the baseline
(it no longer exists in the engine).

Both sides hash over the SAME text column of the bench documents table
(200k docs at sf0.1 scale, text spans extracted once and cached); B runs
on a deterministic 1/16 hash-sample when the full set would take minutes,
and per-doc throughput is compared.  Writes BENCH_SIMHASH_AB.json.

Usage: python tools/bench_simhash_ab.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def _legacy_simhash_udf():
    """The retired round-2 implementation, verbatim (baseline side B)."""

    def _hash_tokens_to_u64(tokens):
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            h = np.uint64(0xCBF29CE484222325)
            for b in t.encode("utf-8"):
                h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            out[i] = h
        return out

    @F.pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            toks = (t or "").lower().split()
            if not toks:
                out[i] = 0
                continue
            hv = _hash_tokens_to_u64(toks)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            word = 0
            for bit in np.nonzero(v > 0)[0]:
                word |= 1 << int(bit)
            out[i] = word - (1 << 64) if word >= (1 << 63) else word
        return pd.Series(out)

    return simhash


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from bench import ensure_docs  # reuse the cached bench corpus

    from osmspark.operators.dedup import with_simhash
    from osmspark.operators.textstats import with_fingerprint
    from osmspark.session import build_session
    from osmspark.sources.spans import explode_spans

    spark = build_session("simhash-ab", cores=32)
    docs = spark.read.parquet(ensure_docs(spark, n_docs))
    texts = (
        explode_spans(docs, kinds=["text", "node", "way"])
        .select(F.concat_ws("-", "doc_id", "pos").alias("doc_id"), "text")
    )
    texts.write.mode("overwrite").parquet("/tmp/osmspark-ab-texts")
    texts = spark.read.parquet("/tmp/osmspark-ab-texts")
    n_rows = texts.count()

    # warm both paths on a small sample (JIT / Arrow startup, unmeasured)
    samp = texts.filter(F.pmod(F.xxhash64("doc_id"), F.lit(64)) == 0)
    with_simhash(samp).agg(F.count("sh")).collect()
    samp.select(_legacy_simhash_udf()(F.col("text"))).agg(
        F.count("*")).collect()
    with_fingerprint(samp, 8).agg(F.count("fp")).collect()

    def timed(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    t_native = timed(lambda: with_simhash(texts).agg(
        F.sum(F.bit_count("sh"))).collect())
    t_fp_native = timed(lambda: with_fingerprint(texts, 8).agg(
        F.sum(F.bit_count("fp"))).collect())

    frac = 16
    sampled = texts.filter(F.pmod(F.xxhash64("doc_id"), F.lit(frac)) == 0)
    n_sampled = sampled.count()
    t_legacy_sample = timed(lambda: sampled.select(
        _legacy_simhash_udf()(F.col("text")).alias("sh")
    ).agg(F.sum(F.bit_count("sh"))).collect())

    native_rps = round(n_rows / t_native, 1)
    legacy_rps = round(n_sampled / t_legacy_sample, 1)
    result = {
        "n_docs": n_docs,
        "n_text_rows": n_rows,
        "simhash_native_sec": t_native,
        "simhash_native_rows_per_sec": native_rps,
        "fingerprint_native_sec": t_fp_native,
        "legacy_pyudf_sample_rows": n_sampled,
        "legacy_pyudf_sample_sec": t_legacy_sample,
        "legacy_pyudf_rows_per_sec": legacy_rps,
        "native_vs_legacy_speedup": round(native_rps / max(legacy_rps, 1e-9), 1),
        "note": "legacy = retired round-2 per-byte FNV pandas UDF, "
                "reproduced verbatim; measured on a deterministic "
                f"1/{frac} hash-sample; both sides warmed",
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SIMHASH_AB.json"), "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
