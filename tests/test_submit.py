"""Pin the spark-submit --py-files submission contract.

The north rule (BASELINE.json) requires the job to be "submitted via
spark-submit --py-files"; scripts/submit_pipeline.py is that entry
point and the verify recipe drives it by hand.  This test pins it in
the suite: build the --py-files zip exactly as the module docstring
says, launch a REAL spark-submit subprocess (separate JVM from the
session fixture) against sf0.001, and assert the documented contract —
exit 0, the known 3,773-tile output (same count the golden pipeline
tests pin), and the per-stage metrics + per-partition lineage files
the resumability story depends on.

Reference parity: tilemaker is a CLI binary (src/tilemaker.cpp main);
this is the cluster-submission analog of invoking it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no sf0.001 testdata")
def test_spark_submit_py_files_pipeline(tmp_path):
    zip_base = tmp_path / "tilemaker_spark"
    shutil.make_archive(str(zip_base), "zip", root_dir=REPO,
                        base_dir="tilemaker_spark")
    workdir = tmp_path / "submit_run"

    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    # keep the subprocess JVM small and off the session fixture's ports
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", f"{zip_base}.zip",
         os.path.join(REPO, "scripts", "submit_pipeline.py"),
         "--input", SF_DIR, "--workdir", str(workdir), "--force"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]

    # the entry point prints the metrics JSON as its last stdout line
    last = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()][-1]
    printed = json.loads(last)
    assert printed["tiles"] == 3773
    assert printed["tiles_per_sec"] > 0

    # checkpoint workdir carries the on-disk metrics + lineage contract
    metrics = json.loads((workdir / "metrics.json").read_text())
    assert metrics["tiles"] == 3773
    assert set(metrics["stages"]) == {"features", "feature_tiles", "tiles"}
    for stage in ("features", "feature_tiles", "tiles"):
        lineage = json.loads(
            (workdir / f"{stage}.lineage.json").read_text())
        assert lineage["rows"] > 0
        assert lineage["partitions"] >= 1
        # per-partition lineage: one entry per output file with rows+bytes
        assert len(lineage["files"]) == lineage["partitions"]
        assert all(f["rows"] >= 0 and f["bytes"] > 0
                   for f in lineage["files"])
    total_file_rows = sum(f["rows"]
                          for f in metrics["stages"]["tiles"]["files"])
    assert total_file_rows == 3773

    # resume half of the contract: re-submitting the SAME workdir
    # without --force must resume from the checkpoints (every stage
    # reports resumed=true) and still account for the same tiles
    proc2 = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", f"{zip_base}.zip",
         os.path.join(REPO, "scripts", "submit_pipeline.py"),
         "--input", SF_DIR, "--workdir", str(workdir)],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path))
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    last2 = [ln for ln in proc2.stdout.strip().splitlines()
             if ln.strip()][-1]
    printed2 = json.loads(last2)
    assert printed2["tiles"] == 3773
    assert all(st.get("resumed") for st in printed2["stages"].values())
