"""North-rule launch path: spark-submit --py-files <zip> runs the flagship
pipeline with the engine imported ONLY from the shipped artifact."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, os.path.join(REPO, "tools"))
from make_dist import make_dist  # noqa: E402

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this machine"
)
def test_spark_submit_pyfiles(tmp_path):
    zip_path = make_dist(str(tmp_path / "afe.zip"))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: import must come from --py-files
        env=env,
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["rows"] > 0 and result["tokens"] > 0
