"""Real spark-submit --py-files launch (north-rule launch requirement):
package the engine into the dist zip, run the flagship pipeline job in a
FRESH spark-submit process whose only access to the package is the zip,
and check the job's summary + written outputs."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from jobs.make_dist import main as make_dist

    zip_path = make_dist()
    assert os.path.exists(zip_path)

    spark_submit = shutil.which("spark-submit")
    assert spark_submit, "spark-submit not on PATH (pyspark provides it)"

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    # the zip must be the ONLY way the job finds the package
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_spatial_join.py"),
            "--n-synth", "5000",
            "--out", out_dir,
            "--res", "10",
            "--run-id", "submit-test",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root — no accidental package import
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [line for line in proc.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert summary["run_id"] == "submit-test"
    assert summary["n_parcels"] == 24
    assert summary["n_errors"] == 0
    assert summary["n_join_rows"] > 0
    assert summary["n_tiles"] > 0
    # checkpointed outputs + the finalized attrs table landed on disk
    for sub in ("join/data", "join/_lineage", "tiles/data", "parcels_attrs"):
        assert os.path.exists(os.path.join(out_dir, sub)), sub
