"""North-rule packaging: the engine must ship as a spark-submit
``--py-files`` package. This test builds dist/btrblocks_spark.zip, then
runs a REAL ``spark-submit`` from a scratch cwd with the repo stripped
from PYTHONPATH — the only source of the package is the zip."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_describe(spark, tmp_path):
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "subtbl")
    df = spark.createDataFrame(image_caption_table(80, seed=3))
    BtrTable.create(spark, root, df, num_files=2, job_id="sub0")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles

        zip_path = make_pyfiles.main()
    finally:
        sys.path.pop(0)

    workdir = str(tmp_path / "cwd")
    os.makedirs(workdir)
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), workdir)
    shutil.copy(zip_path, workdir)

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # package must come from --py-files only
    env["SPARK_SUBMIT_MODE"] = "1"
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    out = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", "btrblocks_spark.zip",
            "submit_job.py",
            "describe", "--table", root,
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    payload = [
        l for l in out.stdout.strip().splitlines() if l.startswith("{")
    ]
    assert payload, out.stdout[-2000:]
    desc = json.loads(payload[-1])
    assert desc["rows"] == 80 and desc["files"] >= 1, desc
