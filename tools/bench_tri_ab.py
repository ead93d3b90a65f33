"""A/B the triangle-count join strategy for the N-vs-4N scaling protocol.

BENCH_SCALING_TRI (round 5) reported an honest raw-efficiency MISS
(0.64) for the join-bound triangle job, with the diagnosis pointing at
the cascade of wide sort-merge joins: each SMJ sorts BOTH sides of the
exchange in memory, and on this single-socket VM per-core memory
bandwidth degrades as cores activate — sorts are the most
bandwidth-hungry stage in the job.  Hypothesis: preferring shuffled
HASH joins (build one side, stream the other — no sort passes) lowers
bytes-per-flop and should lift both absolute throughput and the 2->8
core efficiency.

Usage: python tools/bench_tri_ab.py [n_edges]
Writes BENCH_TRI_JOIN_AB.json with both variants at both core counts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osmspark.session import build_session
from osmspark.operators.graph import triangle_count

cores = int(sys.argv[1]); edges_path = sys.argv[2]; variant = sys.argv[3]
# the operator now DEFAULTS to shuffle_hash (this A/B motivated that), so
# the smj variant must force join_strategy='sort_merge' explicitly — a
# session-conf preferSortMergeJoin toggle alone would compare two
# identical hinted plans (review catch after the default landed)
strategy = "shuffle_hash" if variant == "hash" else "sort_merge"
spark = build_session(f"tri-ab-{{cores}}-{{variant}}", cores=cores)
e = spark.read.parquet(edges_path).persist()
e.count()
triangle_count(e.filter(F.col("src") < 5000),
               join_strategy=strategy).collect()  # JIT warm-up
t0 = time.time()
n = triangle_count(e, join_strategy=strategy).collect()[0]["n_triangles"]
dt = time.time() - t0
print(json.dumps({{"cores": cores, "variant": variant,
                   "sec": round(dt, 3), "n_triangles": n}}))
spark.stop()
"""


def _cpu_sample():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return sum(int(x) for x in parts[1:]), int(parts[8])


def run(cores: int, edges_path: str, variant: str) -> dict:
    t0, s0 = _cpu_sample()
    cpu_list = ",".join(str(i) for i in range(cores))
    out = subprocess.run(
        ["taskset", "-c", cpu_list, sys.executable, "-c",
         CHILD.format(repo=REPO), str(cores), edges_path, variant],
        capture_output=True, text=True, check=True, cwd=REPO)
    t1, s1 = _cpu_sample()
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    r = json.loads(line)
    r["hypervisor_steal_pct"] = round(100 * (s1 - s0) / max(t1 - t0, 1), 1)
    print(r, flush=True)
    return r


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from bench import CACHE_ROOT
    edges_path = f"{CACHE_ROOT}/tri_edges_{n_edges}"
    if not os.path.exists(f"{edges_path}/_SUCCESS"):
        from pyspark.sql import functions as F
        from osmspark.session import build_session
        spark = build_session("tri-ab-gen", cores=8)
        spark.range(n_edges).select(
            F.pmod(F.xxhash64("id"), F.lit(n_edges // 10)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 1_234_567),
                   F.lit(n_edges // 10)).alias("dst"),
        ).write.mode("overwrite").parquet(edges_path)
        spark.stop()

    results = {}
    # interleave variants at each core count so machine weather hits both
    for cores in (8, 2):
        for variant in ("smj", "hash", "smj", "hash"):
            r = run(cores, edges_path, variant)
            results.setdefault(f"{variant}_{cores}c", []).append(r)

    summary = {
        k: {"best_sec": min(x["sec"] for x in v),
            "all_sec": [x["sec"] for x in v],
            "steal_pct": [x["hypervisor_steal_pct"] for x in v]}
        for k, v in results.items()
    }
    for variant in ("smj", "hash"):
        n2 = summary[f"{variant}_2c"]["best_sec"]
        n8 = summary[f"{variant}_8c"]["best_sec"]
        summary[f"{variant}_efficiency_2to8"] = round((n2 / n8) / 4.0, 3)
    out = {
        "job": "triangle count join-strategy A/B (SMJ vs shuffled hash), "
               "same 2->8 core pinned protocol as BENCH_SCALING_TRI",
        "n_edges": n_edges,
        "results": summary,
    }
    with open(os.path.join(REPO, "BENCH_TRI_JOIN_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
