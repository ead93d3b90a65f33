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
# JIT/Arrow warm-up on a small slice, unmeasured (same code paths)
warm = parse_nodes(docs.limit(2000)).select("id", "lat", "lon").persist()
warm.count()
spatial_join(warm, polys, res=8).count()
tile_counts(warm.select("lat", "lon"), zoom=12).count()
warm.unpersist()
t0 = time.time()
nodes = parse_nodes(docs).select("id", "lat", "lon").persist()
nodes.count()  # extraction materialized once (E2' staging), inside the clock
joined = spatial_join(nodes, polys, res=8)
n_pairs = joined.count()
n_tiles = tile_counts(nodes.select("lat", "lon"), zoom=12).count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "sec": round(dt, 3),
                   "docs_per_sec": round(n_docs / dt, 1),
                   "n_pairs": n_pairs, "n_tiles": n_tiles}}))
spark.stop()
"""


def _cpu_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    total = sum(int(x) for x in parts[1:])
    steal = int(parts[8])
    return total, steal


def run_at(cores: int, docs_path: str, n_docs: int) -> dict:
    script = CHILD.format(repo=REPO)
    t0, s0 = _cpu_sample()
    # taskset hard-caps the WHOLE process tree (JVM task threads + python
    # UDF workers + GC) to exactly `cores` CPUs — local[N] alone lets
    # pandas-UDF worker processes burn CPU outside the N task threads,
    # which inflates the small-N baseline and understates scaling.
    cpu_list = ",".join(str(i) for i in range(cores))
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c", script,
         str(cores), docs_path, str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    t1, s1 = _cpu_sample()
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    r = json.loads(line)
    r["hypervisor_steal_pct"] = round(100 * (s1 - s0) / max(t1 - t0, 1), 1)
    return r


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    # reuse bench.py's cache
    from bench import CACHE_ROOT, ensure_docs
    from osmspark.session import build_session

    spark = build_session("scale-gen", cores=8)
    docs_path = ensure_docs(spark, n_docs)
    spark.stop()

    # N=2 vs 4N=8: measured /proc/stat steal shows the hypervisor delivers
    # only ~8 effective cores to this VM (30-90% steal when 32 threads run),
    # so 8 threads is the largest honest "cluster size" here.  Two trials
    # per size, best-of (min wall time is the noise-robust estimator).
    n_cores, four_n = 2, 8
    # interleave trials: hypervisor capacity swings minute-to-minute, so
    # alternating sizes exposes both to the same windows; low-parallelism
    # runs measure stably, high-parallelism runs need a calm window -> min.
    trials_n, trials_4n = [], []
    for _ in range(3):
        trials_n.append(run_at(n_cores, docs_path, n_docs))
        trials_4n.append(run_at(four_n, docs_path, n_docs))
    rn = min(trials_n, key=lambda r: r["sec"])
    r4n = min(trials_4n, key=lambda r: r["sec"])
    eff = (r4n["docs_per_sec"] / rn["docs_per_sec"]) / 4.0
    result = {
        "n_docs": n_docs,
        "N_cores": n_cores,
        "fourN_cores": four_n,
        "run_N": rn,
        "run_4N": r4n,
        "all_trials_N": [r["sec"] for r in trials_n],
        "all_trials_4N": [r["sec"] for r in trials_4n],
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency >= 0.8 between N and 4N (north_rule)",
        "note": "local[N] threads stand in for executors (no cluster in sandbox); N=2 vs 4N=8 because /proc/stat steal shows the hypervisor caps this VM at ~8 effective cores (32-thread runs see 30-90% steal)",
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
