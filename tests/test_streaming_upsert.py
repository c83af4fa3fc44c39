"""Streaming upsert through the btrtable sink + CDC tail of upserts.

``writeStream.format("btrtable").option("upsertKey", k)`` turns every
microbatch into ONE equality-delete upsert commit (the streaming form of
``operators/upsert.upsert_eq``): keys overwritten by a later microbatch
show only the newest version at scan time, with O(change) written bytes
and exactly-once replay via the stream (writer, batchId) marker. The CDC
stream reader represents each upsert commit as inserts + key-matched
old-image deletes."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.sources.spark_datasource import BtrTableDataSource
from btrblocks_spark.sources.table import BtrTable


@pytest.fixture()
def registered(spark):
    try:
        spark.dataSource.register(BtrTableDataSource)
    except Exception:
        pass
    return spark


def _run_sink(spark, src_dir, ckpt, root):
    stream = spark.readStream.schema("id long, val string").parquet(src_dir)
    q = (
        stream.writeStream.format("btrtable")
        .option("checkpointLocation", ckpt)
        .option("upsertKey", "id")
        .trigger(availableNow=True)
        .start(root)
    )
    q.awaitTermination(120)


def test_streaming_upsert_sink(registered, tmp_path):
    spark = registered
    src_dir = str(tmp_path / "src")
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")

    spark.range(50).select(
        F.col("id"), F.concat(F.lit("v1-"), F.col("id")).alias("val")
    ).write.parquet(src_dir)
    _run_sink(spark, src_dir, ckpt, root)

    # microbatch 2: overwrite ids 0..19, add 50..59
    spark.range(20).union(spark.range(50, 60)).select(
        F.col("id"), F.concat(F.lit("v2-"), F.col("id")).alias("val")
    ).write.mode("append").parquet(src_dir)
    _run_sink(spark, src_dir, ckpt, root)

    t = BtrTable.load(spark, root)
    got = {r.id: r.val for r in t.scan().collect()}
    assert len(got) == 60  # 50 originals, 20 overwritten in place, 10 new
    assert got[3] == "v2-3" and got[55] == "v2-55" and got[30] == "v1-30"
    ops = [s["operation"] for s in t.snapshots()]
    assert ops.count("upsert_eq") == 2
    # O(change): upsert commits replace nothing
    for s in t.snapshots():
        if s["operation"] == "upsert_eq":
            assert s["summary"]["removed_files"] == 0
            assert "stream_batch_id" in s["summary"]
    assert len(t.eq_delete_files()) >= 2

    # compaction absorbs, result unchanged
    from btrblocks_spark.operators.compact import compact

    compact(t, job_id="cx", min_input_files=99)
    assert t.eq_delete_files() == []
    assert {r.id: r.val for r in t.scan().collect()} == got


def test_batch_write_upsert_option(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "b")
    spark.range(30).select(
        F.col("id"), F.lit("old").alias("val")
    ).write.format("btrtable").mode("append").save(root)
    spark.range(10, 40).select(
        F.col("id"), F.lit("new").alias("val")
    ).write.format("btrtable").mode("append").option(
        "upsertKey", "id"
    ).save(root)
    t = BtrTable.load(spark, root)
    got = {r.id: r.val for r in t.scan().collect()}
    assert len(got) == 40
    assert got[5] == "old" and got[15] == "new" and got[35] == "new"


def test_cdc_tail_of_upsert_commits(registered, tmp_path):
    spark = registered
    src_dir = str(tmp_path / "src")
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")

    spark.range(40).select(
        F.col("id"), F.concat(F.lit("v1-"), F.col("id")).alias("val")
    ).write.parquet(src_dir)
    _run_sink(spark, src_dir, ckpt, root)
    spark.range(8).select(
        F.col("id"), F.concat(F.lit("v2-"), F.col("id")).alias("val")
    ).write.mode("append").parquet(src_dir)
    _run_sink(spark, src_dir, ckpt, root)

    q = (
        spark.readStream.format("btrtable")
        .option("cdc", "true")
        .option("startingSnapshotId", "0")
        .load(root)
        .writeStream.format("memory")
        .queryName("ups_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ups_cdc").collect()
    ins = [r for r in rows if r._change_type == "insert"]
    dels = [r for r in rows if r._change_type == "delete"]
    assert len(ins) == 48  # 40 + 8 new versions
    assert len(dels) == 8  # old images of the overwritten keys
    assert all(r.val.startswith("v1-") for r in dels)
    assert {r.id for r in dels} == set(range(8))
    # materialized view of the change stream == the table
    final = {}
    for r in sorted(rows, key=lambda r: r._change_snapshot_id):
        if r._change_type == "insert":
            final[r.id] = r.val
        # deletes precede the same batch's inserts keyed identically —
        # replay order within a snapshot: apply deletes first
    t = BtrTable.load(spark, root)
    got = {r.id: r.val for r in t.scan().collect()}
    assert final == got

    # plain tail refuses (deletes are not representable)
    with pytest.raises(Exception, match="cdc|delete"):
        q2 = (
            spark.readStream.format("btrtable")
            .option("startingSnapshotId", "0")
            .load(root)
            .writeStream.format("memory")
            .queryName("ups_plain")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        raise RuntimeError("unreachable: stream should have failed")
