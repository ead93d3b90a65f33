"""B8 — resumable snapshot checkpoints with per-partition lineage + metrics.

Design (SURVEY §7.0): no Iceberg runtime jar ships in this sandbox, so this
is an Iceberg-shaped snapshot-manifest layer over Parquet — append-only
stage snapshots, an atomically-committed JSON manifest per stage (write to
tmp + rename), per-output-file row counts read back from parquet footers
(the lineage), and wall-time/row-count metrics captured via df.observe().
`run_stage` gives kill-and-resume semantics: a stage whose manifest commit
exists is loaded, not recomputed.  Swappable for real Iceberg snapshots
(`VERSION AS OF`) when the runtime jar is present — the interface
(save/load/resume) is what the engine depends on, not the format.

The reference has no checkpointing of any kind (single-pass scripts [C]);
this is mandated by BASELINE.json:north_rule ("resumable from checkpoint
with per-partition lineage + metrics") [D].
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    # -- manifest -----------------------------------------------------------
    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("committed"))

    def _commit_manifest(self, stage: str, manifest: dict) -> None:
        """Atomic: full write to a tmp name, then rename (POSIX atomic)."""
        p = self._manifest_path(stage)
        tmp = f"{p}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, p)

    # -- lineage ------------------------------------------------------------
    @staticmethod
    def _file_lineage(stage_dir: str) -> list[dict]:
        """Per-output-file row counts from parquet footers — the partition
        lineage record (which task wrote how many rows into which file)."""
        import pyarrow.parquet as pq

        out = []
        for name in sorted(os.listdir(stage_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(stage_dir, name)
            md = pq.ParquetFile(path).metadata
            out.append({"file": name, "rows": md.num_rows,
                        "bytes": os.path.getsize(path)})
        return out

    # -- save / load ----------------------------------------------------------
    def save(self, df: DataFrame, stage: str,
             inputs: list[str] | None = None) -> dict:
        """Write df as the stage snapshot; commit manifest last (so a crash
        mid-write leaves an uncommitted, resumable stage)."""
        t0 = time.time()
        obs = Observation(f"osmspark_{stage}")
        df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        stage_dir = self._stage_dir(stage)
        df.write.mode("overwrite").parquet(stage_dir)
        n_rows = obs.get["n_rows"]
        manifest = {
            "stage": stage,
            "snapshot_id": uuid.uuid4().hex,
            "committed": True,
            "created_at": time.time(),
            "wall_s": round(time.time() - t0, 3),
            "n_rows": n_rows,
            "schema": df.schema.simpleString(),
            "inputs": inputs or [],
            "partitions": self._file_lineage(stage_dir),
        }
        self._commit_manifest(stage, manifest)
        return manifest

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        if not self.is_complete(stage):
            raise FileNotFoundError(f"stage '{stage}' has no committed snapshot")
        return spark.read.parquet(self._stage_dir(stage))

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        fn: Callable[[], DataFrame],
        inputs: list[str] | None = None,
        force: bool = False,
    ) -> DataFrame:
        """Resume-or-compute: the checkpoint/resume primitive.

        fn() is only invoked when no committed snapshot exists."""
        if not force and self.is_complete(stage):
            return self.load(spark, stage)
        self.save(fn(), stage, inputs=inputs)
        return self.load(spark, stage)

    def lineage_report(self) -> list[dict]:
        """All committed stage manifests, oldest first — the job lineage."""
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.endswith(".manifest.json"):
                with open(os.path.join(self.root, name)) as f:
                    out.append(json.load(f))
        out.sort(key=lambda m: m.get("created_at", 0))
        return out
