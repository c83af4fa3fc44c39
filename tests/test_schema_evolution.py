"""Schema evolution: add-column with old files scanning as NULLs."""

import pyspark.sql.functions as F
import pytest

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.compact import compact
from btrblocks_spark.sources.table import BtrTable


@pytest.fixture(scope="module")
def evolved(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("evo"))
    df = spark.createDataFrame(image_caption_table(200, seed=17))
    t = BtrTable.create(spark, root, df, num_files=2,
                        max_rows_per_file=60, job_id="e0")
    t.add_column("quality", "double")
    new = (
        spark.createDataFrame(image_caption_table(50, seed=18))
        .withColumn("quality", F.lit(0.5))
    )
    t.append(new, job_id="e1")
    return t


def test_old_files_scan_null_new_column(spark, evolved):
    out = evolved.scan()
    assert out.columns[-1] == "quality"
    assert out.count() == 250
    assert out.filter(F.col("quality").isNull()).count() == 200
    assert out.filter(F.col("quality") == 0.5).count() == 50


def test_pruned_scan_of_only_new_column(evolved):
    # selecting JUST the evolved column still sizes null blocks correctly
    out = evolved.scan(columns=["quality"])
    assert out.count() == 250
    assert out.filter(F.col("quality").isNotNull()).count() == 50


def test_compact_mixed_schema_files(spark, evolved):
    before = evolved.scan().count()
    res = compact(evolved, target_file_bytes=64 * 1024 * 1024, job_id="ec")
    assert res["bins"] >= 1
    out = evolved.scan()
    assert out.count() == before
    assert out.filter(F.col("quality").isNull()).count() == 200


def test_add_column_snapshot_logged(evolved):
    ops = [s["operation"] for s in evolved.snapshots()]
    assert "add-column" in ops


def test_duplicate_column_rejected(evolved):
    with pytest.raises(ValueError, match="already exists"):
        evolved.add_column("quality", "double")
