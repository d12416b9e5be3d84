"""North-rule deployment shape: the engine runs via spark-submit with the
package shipped through --py-files (no installed module, clean cwd) —
the path a real N/4N-executor cluster takes."""

import json
import os
import subprocess

import pytest


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = str(tmp_path / "geoglue_spark.zip")
    subprocess.run(
        ["python", "/root/repo/scripts/make_pyfiles_zip.py", zip_path],
        check=True, capture_output=True,
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--driver-memory", "6g",
            "--py-files", zip_path,
            "/root/repo/scripts/submit_job.py", "--rows", "200000",
        ],
        cwd="/tmp", env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["admins"] == 100 and out["rows"] == 200000
    assert out["minhash_pairs"] == 25  # same answer as the oracle-checked query
