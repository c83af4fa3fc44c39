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


def test_backfill_derived_column(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.compute as pc

    from btrblocks_spark.operators.backfill import backfill
    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "bf")
    df = spark.createDataFrame(image_caption_table(200, seed=19))
    t = BtrTable.create(spark, root, df, partition_by=["fmt"],
                        num_files=2, max_rows_per_file=60, job_id="b0")

    def caption_len(tbl: pa.Table) -> pa.Array:
        return pc.utf8_length(tbl.column("caption").combine_chunks())

    res = backfill(t, "caption_len", "int", caption_len, job_id="bf1")
    assert res["rewritten_files"] >= 1
    out = t.scan(columns=["caption", "caption_len"])
    assert out.count() == 200
    bad = out.filter(F.length("caption") != F.col("caption_len")).count()
    assert bad == 0
    # stats for the new column exist in the manifest (prunable)
    import json as _json
    stats = [_json.loads(r["stats"]) for r in t.data_files()]
    assert all("caption_len" in s and s["caption_len"]["min"] is not None
               for s in stats)
