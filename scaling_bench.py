"""Two-cluster-size scaling evidence (BASELINE.json:north_rule).

No real cluster exists in this sandbox, so per the driver protocol the SAME
spatial-join + tile-assignment job runs at two parallelism levels —
local[8] (N) and local[32] (4N) — on the same cached input, in fresh JVMs.
Reports docs/sec at both and the scaling efficiency
  eff = (throughput@4N / throughput@N) / 4,
appended to BENCH_SCALING.json and summarized in BASELINE.md by hand.

Usage: python scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osmspark.session import build_session
from osmspark.datagen import gen_polygons
from osmspark.operators.spatial_join import spatial_join
from osmspark.operators.tiles import tile_counts
from osmspark.sources import parse_nodes

cores = int(sys.argv[1]); docs_path = sys.argv[2]; n_docs = int(sys.argv[3])
spark = build_session(f"scale-{{cores}}", cores=cores)
docs = spark.read.parquet(docs_path)
polys = gen_polygons(spark)
docs.select("doc_id").limit(10).count()  # warm-up, unmeasured
t0 = time.time()
nodes = parse_nodes(docs).select("id", "lat", "lon")
joined = spatial_join(nodes, polys, res=7)
n_pairs = joined.count()
n_tiles = tile_counts(parse_nodes(docs).select("lat", "lon"), zoom=12).count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "sec": round(dt, 3),
                   "docs_per_sec": round(n_docs / dt, 1),
                   "n_pairs": n_pairs, "n_tiles": n_tiles}}))
spark.stop()
"""


def run_at(cores: int, docs_path: str, n_docs: int) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), docs_path, str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    # reuse bench.py's cache
    from bench import CACHE_ROOT, ensure_docs
    from osmspark.session import build_session

    spark = build_session("scale-gen", cores=8)
    docs_path = ensure_docs(spark, n_docs)
    spark.stop()

    r8 = run_at(8, docs_path, n_docs)
    r32 = run_at(32, docs_path, n_docs)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    result = {
        "n_docs": n_docs,
        "N_cores": 8,
        "fourN_cores": 32,
        "run_N": r8,
        "run_4N": r32,
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency >= 0.8 between N and 4N (north_rule)",
        "note": "local[N] threads stand in for executors (no cluster in sandbox)",
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
