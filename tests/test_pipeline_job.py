"""M7: spark-submit pipeline job — end-to-end run + kill-and-resume."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir: str):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--n-docs", "500", "--out", out_dir, "--cores", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )


def test_pipeline_runs_and_resumes(tmp_path):
    out = str(tmp_path / "stages")
    r1 = _run(out)
    assert r1.returncode == 0, r1.stderr[-2000:]
    line = [ln for ln in r1.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert set(res["stages"]) >= {
        "extract", "cells", "pip", "tiles", "tile_rasters",
        "audit_street_norm", "audit_postcodes",
    }
    assert res["total_rows"] > 0

    # resume: delete ONE stage's manifest (simulated partial failure);
    # rerun must recompute only that stage and leave the others' snapshot
    # ids untouched (proof of no recompute).
    ids_before = {}
    for m in os.listdir(out):
        if m.endswith(".manifest.json"):
            with open(os.path.join(out, m)) as f:
                j = json.load(f)
            ids_before[j["stage"]] = j["snapshot_id"]
    os.remove(os.path.join(out, "tiles.manifest.json"))

    r2 = _run(out)
    assert r2.returncode == 0, r2.stderr[-2000:]
    ids_after = {}
    for m in os.listdir(out):
        if m.endswith(".manifest.json"):
            with open(os.path.join(out, m)) as f:
                j = json.load(f)
            ids_after[j["stage"]] = j["snapshot_id"]
    assert ids_after["tiles"] != ids_before["tiles"]          # recomputed
    for st in ("extract", "cells", "pip", "audit_street_norm"):
        assert ids_after[st] == ids_before[st]                 # resumed


def test_package_zip_contains_engine(tmp_path):
    r = subprocess.run([sys.executable, os.path.join(REPO, "package.py")],
                       capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0
    import zipfile

    names = zipfile.ZipFile(os.path.join(REPO, "dist", "osmspark.zip")).namelist()
    assert "osmspark/__init__.py" in names
    assert "osmspark/operators/spatial_join.py" in names
    assert not any(n.endswith(".pyc") for n in names)
