"""The north rule's deployment shape: spark-submit --py-files with the
built zip must run the pipeline with NO repo on sys.path — executors and
driver import lib_gdal_spark from the artifact alone."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_submit_with_py_files_zip(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_submit_zip.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"), "20000"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),  # not the repo dir either
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    res = json.loads(line)
    assert res["pages"] == 20000
    assert res["pip_hits"] > 0 and res["distinct_tiles"] > 0
