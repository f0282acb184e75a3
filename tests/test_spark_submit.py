"""Real spark-submit --py-files smoke test (the north rule's mandated
deployment path): launch the pipeline exactly as a cluster would —
separate JVM via the spark-submit launcher, package shipped as a zip —
and assert the staged outputs + lineage manifests land."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit")


@pytest.mark.skipif(spark_submit is None, reason="no spark-submit binary")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    import sys

    sys.path.insert(0, REPO)
    from kawa_spark.session import package_zip

    out = str(tmp_path / "er_out")
    env = dict(os.environ)
    # the launcher JVM is the driver in local mode; keep its heap modest
    env["KAWA_SPARK_DRIVER_MEM"] = "4g"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", package_zip(),
            os.path.join(REPO, "scripts", "submit_pipeline.py"),
            "--input", "/root/testdata/sf0.001",
            "--out", out,
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # staged outputs with lineage manifests
    for stage in ("mentions", "surfaces", "clusters"):
        mp = os.path.join(out, stage, "_MANIFEST.json")
        assert os.path.exists(mp), f"missing manifest for {stage}"
        with open(mp) as f:
            m = json.load(f)
        assert m["completed"] and m["rows"] > 0
        assert sum(m["partitions"].values()) == m["rows"]
