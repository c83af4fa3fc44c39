"""format("btrtable") Python DataSource: batch read + streaming CDC tail."""

import pytest

from pyspark.sql import functions as F

from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.sources.spark_datasource import BtrTableDataSource
from btrblocks_spark.sources.table import BtrTable


@pytest.fixture()
def registered(spark):
    try:
        spark.dataSource.register(BtrTableDataSource)
    except Exception:
        pass  # already registered in this session
    return spark


def _mk(spark, root, n=300):
    df = spark.range(n).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    return BtrTable.create(spark, root, df, num_files=3, job_id="c0")


def test_batch_read_matches_scan(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "ds1")
    t = _mk(spark, root)
    src = spark.createDataFrame(
        [(5, "N5"), (400, "N400")], "id long, val string"
    )
    merge_into(t, src, on="id", strategy="mor", job_id="m1")

    via_ds = spark.read.format("btrtable").load(root)
    got = {r.id: r.val for r in via_ds.collect()}
    want = {r.id: r.val for r in t.scan().collect()}
    assert got == want  # deletes merged identically
    assert got[5] == "N5" and got[400] == "N400" and len(got) == 301


def test_stream_cdc_tail(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "ds2")
    t = _mk(spark, root, n=200)
    t.append(
        spark.range(200, 250).select(
            F.col("id"), F.concat(F.lit("a"), F.col("id")).alias("val")
        ),
        num_files=1,
        job_id="a1",
    )
    src = spark.createDataFrame([(7, "U7")], "id long, val string")
    merge_into(t, src, on="id", strategy="mor", job_id="m1")

    q = (
        spark.readStream.format("btrtable")
        .option("cdc", "true")
        .option("startingSnapshotId", "0")
        .load(root)
        .writeStream.format("memory")
        .queryName("btr_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from btr_cdc").collect()
    ins = [r for r in rows if r._change_type == "insert"]
    dels = [r for r in rows if r._change_type == "delete"]
    # 200 create + 50 append + 1 update-new-image inserts, 1 old image
    assert len(ins) == 251
    assert sorted(r.val for r in ins if r.id == 7) == ["U7", "v7"]
    assert len(dels) == 1 and dels[0].id == 7 and dels[0].val == "v7"
    assert {r._change_snapshot_id for r in rows} == {1, 2, 3}


def test_stream_without_cdc_raises_on_deletes(spark, tmp_path):
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableStreamReader,
    )

    root = str(tmp_path / "ds3")
    t = _mk(spark, root, n=100)
    src = spark.createDataFrame([(3, "X")], "id long, val string")
    merge_into(t, src, on="id", strategy="mor", job_id="m1")
    rd = BtrTableStreamReader(root, {}, cdc=False)
    with pytest.raises(NotImplementedError, match="cdc"):
        rd.partitions(
            {"snapshot_id": 0},
            {"snapshot_id": t.current_snapshot_id()},
        )


def test_stream_append_only_without_cdc(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "ds4")
    t = _mk(spark, root, n=120)
    t.append(
        spark.range(120, 150).select(
            F.col("id"), F.concat(F.lit("a"), F.col("id")).alias("val")
        ),
        num_files=1,
        job_id="a1",
    )
    q = (
        spark.readStream.format("btrtable")
        .option("startingSnapshotId", "0")
        .load(root)
        .writeStream.format("memory")
        .queryName("btr_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from btr_tail").collect()
    assert len(rows) == 150
    assert "_change_type" not in rows[0].asDict()


def test_batch_writer_create_append_overwrite(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "dsw")
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val"),
        (F.col("id") % 3).alias("grp"),
    )
    # create via the writer (partitioned, with a key bloom)
    (
        df.write.format("btrtable")
        .option("partitionBy", "grp")
        .option("bloomCols", "id")
        .mode("append")
        .save(root)
    )
    t = BtrTable.load(spark, root)
    assert t.partition_by() == ["grp"] and t.bloom_cols() == ["id"]
    got = {r.id: r.val for r in t.scan().collect()}
    assert len(got) == 100 and got[7] == "v7"
    # round trip through the reader too
    assert spark.read.format("btrtable").load(root).count() == 100

    # append
    df2 = spark.range(100, 130).select(
        F.col("id"), F.concat(F.lit("a"), F.col("id")).alias("val"),
        (F.col("id") % 3).alias("grp"),
    )
    df2.write.format("btrtable").mode("append").save(root)
    assert spark.read.format("btrtable").load(root).count() == 130
    # the writer honors the table's bloom config
    import json as _json

    assert any(
        "bloom" in _json.loads(r["stats"]).get("id", {})
        for r in BtrTable.load(spark, root).data_files()
        if r["job_id"].startswith("dsw-")
    )

    # overwrite replaces everything in one atomic commit
    df3 = spark.range(5).select(
        F.col("id"), F.lit("o").alias("val"), F.lit(0).alias("grp")
    )
    df3.write.format("btrtable").mode("overwrite").save(root)
    t = BtrTable.load(spark, root)
    assert t.scan().count() == 5
    # history preserved: the pre-overwrite snapshot still scans
    snaps = [s["snapshot_id"] for s in t.snapshots()]
    assert t.scan(snapshot_id=snaps[-2]).count() == 130


def test_stream_writer_sink(registered, tmp_path):
    """writeStream.format('btrtable'): each microbatch is one atomic
    snapshot commit (stream-append), exactly-once via (writer, batchId)
    in the snapshot summary."""
    import time

    spark = registered
    src_dir = str(tmp_path / "stream_src")
    root = str(tmp_path / "dss")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(40).select(
        F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("val")
    )
    df.write.parquet(src_dir)

    stream = (
        spark.readStream.schema("id long, val string").parquet(src_dir)
    )
    q = (
        stream.writeStream.format("btrtable")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(root)
    )
    q.awaitTermination(120)
    t = BtrTable.load(spark, root)
    got = {r.id: r.val for r in t.scan().collect()}
    assert len(got) == 40 and got[3] == "s3"
    ops = [s["operation"] for s in t.snapshots()]
    assert "stream-append" in ops
    # the stream-append snapshots carry the exactly-once marker
    sm = [
        s["summary"]
        for s in t.snapshots()
        if s["operation"] == "stream-append"
    ]
    assert all("stream_batch_id" in m for m in sm)

    # second batch of files -> another microbatch -> appended atomically
    spark.range(40, 55).select(
        F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("val")
    ).write.mode("append").parquet(src_dir)
    q = (
        stream.writeStream.format("btrtable")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(root)
    )
    q.awaitTermination(120)
    assert BtrTable.load(spark, root).scan().count() == 55


def test_reader_filter_pushdown_prunes_and_stays_correct(
    registered, tmp_path
):
    """Catalyst filters reach the reader: files drop via manifest stats,
    blocks via zone maps — and results equal the unpruned filter."""
    from btrblocks_spark.sources import spark_datasource as sd

    spark = registered
    root = str(tmp_path / "dspf")
    df = spark.range(8000).select(
        F.col("id"), (F.col("id") % 13).alias("v")
    )
    # one writer task over sorted input, split into 4 sequential files
    # -> tight disjoint per-file ranges (round-robin fan-out would give
    # every file the full range and nothing could prune)
    BtrTable.create(
        spark, root, df.orderBy("id").coalesce(1), num_files=1,
        max_rows_per_file=2000, block_rows=512, job_id="c0",
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ds_df = (
        spark.read.format("btrtable").option("pushdown", "true").load(root)
    )
    got = (
        ds_df.filter((F.col("id") >= 2100) & (F.col("id") < 2300))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )
    exp = (
        df.filter((F.col("id") >= 2100) & (F.col("id") < 2300))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )
    assert (got.n, got.s) == (exp.n, exp.s) == (200, exp.s)

    # the pushdown actually reduces partitions: drive the reader API
    # directly with the same filter shapes Catalyst would push
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    rd = sd.BtrTablePushdownReader(root)
    n_all = len(rd.partitions())
    leftover = list(
        rd.pushFilters(
            [GreaterThanOrEqual(("id",), 2100), LessThan(("id",), 2300)]
        )
    )
    assert len(leftover) == 2  # advisory: Spark re-applies both
    n_pruned = len(rd.partitions())
    assert 0 < n_pruned < n_all

    # equality pushdown takes the in-set path
    rd2 = sd.BtrTablePushdownReader(root)
    from pyspark.sql.datasource import EqualTo

    list(rd2.pushFilters([EqualTo(("id",), 7)]))
    assert len(rd2.partitions()) == 1
    one = {r.id for r in ds_df.filter(F.col("id") == 7).collect()}
    assert one == {7}


def test_batch_read_time_travel(registered, tmp_path):
    """.option('snapshotId', N) plans files AND deletes as of that
    snapshot — equal to BtrTable.scan(snapshot_id=N)."""
    spark = registered
    root = str(tmp_path / "ds_tt")
    t = _mk(spark, root, n=100)
    sid0 = t.current_snapshot_id()
    src = spark.createDataFrame(
        [(5, "N5"), (400, "N400")], "id long, val string"
    )
    merge_into(t, src, on="id", strategy="mor", job_id="tt1")

    old = spark.read.format("btrtable").option("snapshotId", sid0).load(root)
    got = {r.id: r.val for r in old.collect()}
    assert len(got) == 100 and got[5] == "v5" and 400 not in got
    now = {r.id: r.val for r in
           spark.read.format("btrtable").load(root).collect()}
    assert now[5] == "N5" and now[400] == "N400" and len(now) == 101
