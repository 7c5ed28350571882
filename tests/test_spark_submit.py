"""Ship-mode check (north_rule: "run via spark-submit --py-files"): zip
the package, submit run_job.py from a NEUTRAL cwd so imports can only
resolve from the --py-files zip, and validate the committed output.

Runs a real JVM-spawning spark-submit (~2-3 min, dominated by session
startup); set SPARK_GRAFT_SKIP_SUBMIT=1 to skip locally."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_SUBMIT") == "1"
    or shutil.which("spark-submit") is None,
    reason="spark-submit unavailable or skipped",
)
def test_spark_submit_py_files_ships_and_commits(tmp_path):
    pkg = REPO + "/d1_log_aggregation_spark"
    zip_path = str(tmp_path / "d1pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[8]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "run_job.py"),
            SF,
            out_dir,
        ],
        cwd=str(tmp_path),  # neutral cwd: the repo dir is NOT importable
        capture_output=True,
        text=True,
        timeout=540,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_routed"] == 1000
    assert report["metrics"]["retrieved"] == 1000
    assert {s["sink"] for s in report["sink_counts"]} == {
        "dlq", "role_assistant", "role_system", "role_tool", "role_user"
    }
    # the commit is readable through the sink reader
    assert os.path.isdir(os.path.join(out_dir, "_commits"))
