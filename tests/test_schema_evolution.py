"""Schema evolution: rename/drop column over files that keep their old
physical blob names, and convergence through rewrites.

Iceberg-style metadata-only evolution re-expressed over the manifest
commit protocol; the reference format has no schema evolution at all
(fixed per-file metadata, ``/root/reference/btrblocks/storage/``).
"""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.sources.table import BtrTable

N = 240


@pytest.fixture()
def table(spark, tmp_path):
    t = image_caption_table(N, seed=13)
    df = spark.createDataFrame(t)
    return BtrTable.create(
        spark,
        str(tmp_path / "t"),
        df,
        partition_by=["fmt"],
        num_files=2,
        job_id="e0",
    )


def _more(spark, n, seed, caption_col="caption"):
    d = spark.createDataFrame(image_caption_table(n, seed=seed))
    d = d.withColumn(
        "image_id", F.concat(F.lit(f"s{seed}-"), F.col("image_id"))
    )
    if caption_col != "caption":
        d = d.withColumnRenamed("caption", caption_col)
    return d


def test_rename_reads_old_and_new_files(spark, table):
    before = {
        r["caption"]
        for r in table.scan(columns=["caption"]).collect()
    }
    table.rename_column("caption", "text")
    # old files decode through the alias
    out = table.scan(columns=["image_id", "text"])
    assert out.columns == ["image_id", "text"]
    got = {r["text"] for r in out.collect()}
    assert got == before
    # appends after the rename write the new name; both generations scan
    table.append(_more(spark, 40, 21, caption_col="text"), job_id="e1")
    assert table.scan(columns=["text"]).count() == N + 40
    assert (
        table.scan(columns=["text"])
        .filter(F.col("text").isNull())
        .count()
        == 0
    )


def test_rename_chain_and_conflicts(spark, table):
    table.rename_column("caption", "text")
    table.rename_column("text", "body")
    assert table.metadata()["renames"]["body"] == ["text", "caption"]
    assert (
        table.scan(columns=["body"])
        .filter(F.col("body").isNull())
        .count()
        == 0
    )
    with pytest.raises(KeyError):
        table.rename_column("caption", "x")  # old name is gone
    with pytest.raises(ValueError):
        table.rename_column("w", "body")  # target exists
    with pytest.raises(ValueError):
        table.rename_column("h", "caption")  # retired name
    with pytest.raises(ValueError):
        table.add_column("text", "string")  # retired name
    with pytest.raises(ValueError):
        table.rename_column("fmt", "kind")  # partition column


def test_compaction_converges_renamed_column(spark, table):
    from btrblocks_spark.operators.compact import compact

    before = {
        r["caption"]
        for r in table.scan(columns=["caption"]).collect()
    }
    table.rename_column("caption", "text")
    compact(table, job_id="e2")
    # rewritten files must carry b_text physically
    from btrblocks_spark.sources import fs

    for r in table.data_files():
        names = fs.read_parquet_schema(r["file_path"]).names
        assert "b_text" in names and "b_caption" not in names
    got = {r["text"] for r in table.scan(columns=["text"]).collect()}
    assert got == before


def test_drop_column(spark, table):
    table.drop_column("phash")
    assert "phash" not in table.scan().columns
    assert table.scan().count() == N
    with pytest.raises(ValueError):
        table.add_column("phash", "long")  # retired
    # appends without the dropped column work
    nxt = _more(spark, 30, 22).drop("phash")
    table.append(nxt, job_id="e3")
    assert table.scan().count() == N + 30


def test_drop_then_changelog_and_guards(spark, table):
    base = table.current_snapshot_id()
    table.drop_column("phash")
    table.append(_more(spark, 25, 23).drop("phash"), job_id="e4")
    changes = table.scan_changes(base)
    assert changes.count() == 25
    assert "phash" not in [
        c for c in changes.columns if not c.startswith("_change")
    ]
    with pytest.raises(ValueError):
        table.drop_column("fmt")  # partition column
    with pytest.raises(KeyError):
        table.drop_column("nope")


def test_rename_scan_via_datasource(spark, table):
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableDataSource,
    )

    try:
        spark.dataSource.register(BtrTableDataSource)
    except Exception:
        pass
    table.rename_column("caption", "text")
    df = spark.read.format("btrtable").load(table.root)
    assert "text" in df.columns
    assert df.filter(F.col("text").isNull()).count() == 0
    assert df.count() == N
