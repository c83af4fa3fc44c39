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


def test_spark_submit_pyfiles_over_real_s3(spark, tmp_path):
    """The north rule end-to-end: spark-submit --py-files jobs against
    an OBJECT STORE — create + compact + describe on an s3:// root
    served by the wire-protocol server (tools/mini_s3.py), engine
    shipped only via the zip, every byte through the real AWS SDK."""
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    import pyarrow.parquet as pq

    from btrblocks_spark.fixtures import image_caption_table

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_pyfiles
        from mini_s3 import MiniS3

        zip_path = make_pyfiles.main()

        inp = str(tmp_path / "input.parquet")
        pq.write_table(image_caption_table(60, seed=5), inp)
        workdir = str(tmp_path / "cwd")
        os.makedirs(workdir)
        shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), workdir)
        shutil.copy(zip_path, workdir)

        host, port = os.environ["BTRSPARK_S3_ENDPOINT"].rsplit(":", 1)
        with MiniS3(port=int(port)) as server:
            from btrblocks_spark.sources import fs

            fs._FS_CACHE.pop(("s3", "subbkt"), None)
            client, _ = fs.resolve("s3://subbkt/x")
            client.create_dir("subbkt", recursive=True)
            root = "s3://subbkt/wh/t"

            env = dict(os.environ)
            env["PYTHONPATH"] = ""
            env["SPARK_SUBMIT_MODE"] = "1"
            env["SPARK_LOCAL_IP"] = "127.0.0.1"
            env["BTRSPARK_S3_ENDPOINT"] = server.endpoint

            def run(*args):
                out = subprocess.run(
                    [
                        submit,
                        "--master", "local[2]",
                        "--conf", "spark.ui.enabled=false",
                        "--conf", "spark.sql.shuffle.partitions=4",
                        "--py-files", "btrblocks_spark.zip",
                        "submit_job.py", *args,
                    ],
                    cwd=workdir,
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=300,
                )
                assert out.returncode == 0, out.stderr[-3000:]
                payload = [
                    l
                    for l in out.stdout.strip().splitlines()
                    if l.startswith("{")
                ]
                assert payload, out.stdout[-2000:]
                return json.loads(payload[-1])

            run(
                "create", "--table", root, "--input", inp,
                "--num-files", "3",
            )
            run("compact", "--table", root)
            desc = run("describe", "--table", root)
            assert desc["rows"] == 60 and desc["files"] >= 1, desc
            fs._FS_CACHE.pop(("s3", "subbkt"), None)
    finally:
        sys.path.pop(0)
