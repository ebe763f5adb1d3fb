"""Ship-path smoke: the north_rule's packaging claim ("ships as a
spark-submit --py-files job") must actually work — build dist/engine.zip,
launch spark-submit from a NEUTRAL working directory (so the package can
only come from the shipped zip, not from cwd), and check the job's JSON
status plus the materialized tables on disk."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_job(tmp_path):
    build = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py")],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert build.returncode == 0, build.stderr
    zip_path = os.path.join(REPO, "dist", "engine.zip")
    assert os.path.exists(zip_path)

    out_dir = str(tmp_path / "kg_out")
    run = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_kg_job.py"),
            "--pages", "500", "--out", out_dir,
        ],
        capture_output=True, text=True,
        cwd=str(tmp_path),  # neutral cwd: the zip must carry the package
        timeout=420,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    status = json.loads(
        [l for l in run.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert status["status"] == "ok"
    assert status["edges"] > 0 and status["entities"] > 0 and status["predicates"] > 0
    # bucketed tables actually on disk
    for table in ("edges", "entities", "predicates"):
        assert os.path.isdir(os.path.join(out_dir, table)), table
