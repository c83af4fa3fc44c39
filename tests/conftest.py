import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
# route mem:// through LocalFileSystem in every process (see sources/fs.py);
# must be set before the JVM starts so executor workers inherit it
os.environ.setdefault("BTRSPARK_FS_SCHEME_MAP", '{"mem": "local", "s3like": "s3like"}')
# endpoint of the in-process S3 wire-protocol server (tools/mini_s3) —
# must be in the env BEFORE the JVM starts so executor-side Python
# workers inherit it; the s3 tests bind the server to this fixed port.
# Only consulted when an s3:// path is actually resolved. Fixed port =
# serial-pytest assumption; two concurrent sessions on one host would
# collide on the bind (accepted: the suite runs serially here).
os.environ.setdefault("BTRSPARK_S3_ENDPOINT", "127.0.0.1:39411")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("btrblocks-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()
