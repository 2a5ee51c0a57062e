"""spark-submit --py-files packaging test (north rule).

Builds the zip, submits jobs/extract_job.py in synthetic mode against a
temp output, and re-submits to prove checkpoint-resume idempotency.
Skipped when no spark-submit binary is on PATH/installed.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit") else None)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit binary")
def test_submit_and_resume(tmp_path):
    from tools.make_pyfiles_zip import build

    zp = build(str(tmp_path / "pkg.zip"))
    out, lineage = str(tmp_path / "out"), str(tmp_path / "lineage")

    def submit(run_id):
        r = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zp, os.path.join(REPO, "jobs", "extract_job.py"),
             "--synth-from", "/root/testdata/sf0.001",
             "--output", out, "--lineage", lineage,
             "--run-id", run_id, "--checkpoint-resume"],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        line = [l for l in r.stdout.splitlines() if l.startswith("extract-job")]
        return line[-1]

    first = submit("t1")
    assert "committed=500" in first and "rate=1.000000" in first
    second = submit("t2")  # nothing new to do; output unchanged
    assert "committed=500" in second


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
