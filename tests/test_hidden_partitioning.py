"""Hidden-partitioning transforms (Iceberg analog): bucket/truncate/days
entries in partition_by become derived _p_* columns computed on every
write, invisible in scan output, and pruned from predicates on the
SOURCE column."""

import datetime

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.sources.table import (
    BtrTable,
    _transform_literal,
)


@pytest.fixture(scope="module")
def btable(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hp") / "t")
    df = spark.range(400).select(
        F.col("id").alias("k"),
        F.concat(F.lit("user"), F.col("id")).alias("name"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(days=(F.col("id") % 20).cast("int"))
        ).alias("ts"),
        (F.col("id") * 3).alias("val"),
    )
    t = BtrTable.create(spark, root, df, partition_by=["bucket(4, k)"])
    return t, df


def test_bucket_roundtrip_and_hidden_schema(spark, btable):
    t, df = btable
    got = t.scan()
    assert got.count() == 400
    assert not [c for c in got.columns if c.startswith("_p_")]
    assert sorted(r.k for r in got.collect()) == list(range(400))


def test_bucket_equality_prunes_files(spark, btable):
    t, df = btable
    all_files = (
        t.scan(with_file=True).select("_file").distinct().count()
    )
    probe = (
        t.scan(prune={"k": [123]}, with_file=True)
        .select("_file")
        .distinct()
        .count()
    )
    # 4 buckets: an equality probe must open roughly a quarter of files
    assert probe < all_files
    assert probe <= max(1, all_files // 2)
    # and the probed scan still contains the row (prune is advisory)
    assert (
        t.scan(prune={"k": [123]}).filter(F.col("k") == 123).count() == 1
    )


def test_bucket_range_does_not_mistranslate(spark, btable):
    t, _ = btable
    # a RANGE on the bucket source cannot prune buckets (non-monotone):
    # the scan must stay complete
    got = t.scan(prune={"k": (100, 200)})
    assert got.filter((F.col("k") >= 100) & (F.col("k") <= 200)).count() == 101


def test_days_and_truncate_transforms(spark, tmp_path):
    root = str(tmp_path / "t2")
    df = spark.range(300).select(
        F.col("id").alias("k"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("aa")).otherwise(F.lit("zz")),
            F.col("id"),
        ).alias("name"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(days=(F.col("id") % 10).cast("int"))
        ).alias("ts"),
    )
    t = BtrTable.create(
        spark, root, df,
        partition_by=["days(ts)", "truncate(2, name)"],
        num_files=8,
    )
    assert t.scan().count() == 300

    all_files = t.scan(with_file=True).select("_file").distinct().count()
    # date-range prune on the raw ts column
    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 2)
    pruned = (
        t.scan(prune={"ts": (lo, hi)}, with_file=True)
        .select("_file").distinct().count()
    )
    assert pruned < all_files
    # string-prefix prune (set form)
    pf = (
        t.scan(prune={"name": ["aa42"]}, with_file=True)
        .select("_file").distinct().count()
    )
    assert pf < all_files
    assert t.scan(prune={"name": ["aa42"]}).filter(
        F.col("name") == "aa42"
    ).count() == 1


def test_transforms_survive_rewrites(spark, btable, tmp_path):
    from btrblocks_spark.operators.compact import compact

    t, df = btable
    t.append(df.filter(F.col("k") < 50).select(
        "k", "name", "ts", (F.col("val") + 1).alias("val")
    ))
    compact(t, 1 << 30)
    probe = t.scan(prune={"k": [7]}).filter(F.col("k") == 7)
    assert probe.count() == 2  # original + appended copy
    all_files = t.scan(with_file=True).select("_file").distinct().count()
    opened = (
        t.scan(prune={"k": [7]}, with_file=True)
        .select("_file").distinct().count()
    )
    assert opened < all_files


def test_rename_guard_protects_transform_source(spark, btable):
    t, _ = btable
    with pytest.raises(ValueError):
        t.rename_column("k", "kk")


def test_transform_literal_parity(spark):
    import zlib

    assert _transform_literal(
        {"kind": "bucket", "param": 4, "col": "k"}, 123
    ) == zlib.crc32(b"123") % 4
    assert _transform_literal(
        {"kind": "days", "param": None, "col": "ts"},
        datetime.datetime(2024, 1, 3, 15, 0),
    ) == (datetime.date(2024, 1, 3) - datetime.date(1970, 1, 1)).days
    assert _transform_literal(
        {"kind": "truncate", "param": 2, "col": "name"}, "abcdef"
    ) == "ab"
    assert _transform_literal(
        {"kind": "truncate", "param": 10, "col": "v"}, -7
    ) == -10  # floor semantics on both engines


def test_cli_create_with_transform_spec(spark, tmp_path, capsys):
    import json as _json

    from btrblocks_spark import jobs

    inp = str(tmp_path / "in.parquet")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).write.parquet(inp)
    root = str(tmp_path / "t")
    assert jobs.main(
        ["create", "--table", root, "--input", inp,
         "--partition-by", "bucket(4,k)"]
    ) == 0
    _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = BtrTable.load(spark, root)
    assert t.metadata()["partition_transforms"][0]["kind"] == "bucket"
    assert t.scan().count() == 100


def test_upsert_eq_on_bucketed_table_keeps_pruning(spark, tmp_path):
    """Equality-delete upsert on a transform-partitioned table: the new
    data files recompute the derived column, and bucket pruning still
    holds after compaction absorbs the deletes."""
    from btrblocks_spark.operators.compact import compact
    from btrblocks_spark.operators.upsert import upsert_eq

    root = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = BtrTable.create(spark, root, df, partition_by=["bucket(4, k)"])
    src = spark.range(10).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    upsert_eq(t, src, on=["k"])
    got = t.scan().filter(F.col("k") < 10)
    assert got.count() == 10
    assert all(r.v == -1 for r in got.collect())

    compact(t, 1 << 30)
    assert t.scan().count() == 200
    all_files = t.scan(with_file=True).select("_file").distinct().count()
    opened = (
        t.scan(prune={"k": [5]}, with_file=True)
        .select("_file").distinct().count()
    )
    assert opened < all_files
    assert t.scan(prune={"k": [5]}).filter(F.col("k") == 5).first().v == -1


def test_merge_and_rowops_on_bucketed_table(spark, tmp_path):
    """MOR MERGE, delete_where and update_where all run on a
    transform-partitioned table (source frames never carry _p_*)."""
    from btrblocks_spark.operators.merge import merge_into
    from btrblocks_spark.operators.rowops import delete_where, update_where

    root = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = BtrTable.create(spark, root, df, partition_by=["bucket(4, k)"])

    src = spark.range(5).select(
        F.col("id").alias("k"), F.lit(-5).cast("long").alias("v")
    )
    merge_into(t, src, on="k", strategy="mor")
    assert t.scan().filter(F.col("k") < 5).agg(
        F.sum("v")
    ).first()[0] == -25

    # the STAGED copy-on-write path splices full-schema replacement
    # rows — the source Arrow table must gain the derived columns
    src2 = spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit(-7).cast("long").alias("v")
    )
    merge_into(t, src2, on="k", strategy="staged")
    got = t.scan().filter((F.col("k") >= 5) & (F.col("k") < 8))
    assert got.agg(F.sum("v")).first()[0] == -21

    update_where(t, {"v": "999"}, "k = 100", strategy="cow")
    assert t.scan().filter(F.col("k") == 100).first().v == 999

    delete_where(t, "k >= 190", strategy="cow")
    assert t.scan().count() == 190
    # pruning still intact after the CoW rewrites
    all_files = t.scan(with_file=True).select("_file").distinct().count()
    opened = (
        t.scan(prune={"k": [100]}, with_file=True)
        .select("_file").distinct().count()
    )
    assert opened < all_files


def test_datasource_write_computes_transforms(spark, tmp_path):
    """The Python DataSource batch writer encodes Arrow directly
    (no _write_files): it must derive the _p_* columns itself, with
    values identical to the Spark expression path."""
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableDataSource,
    )

    spark.dataSource.register(BtrTableDataSource)
    root = str(tmp_path / "t")
    df = spark.range(120).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v")
    )
    t = BtrTable.create(spark, root, df, partition_by=["bucket(4, k)"])
    df2 = spark.range(120, 160).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v")
    )
    df2.write.format("btrtable").mode("append").save(root)
    assert t.scan().count() == 160
    # written _p_ values must agree with the Spark-expression path
    import zlib

    stored = t.scan(columns=["k", "_p_bucket_k"]).filter(
        F.col("k") >= 120
    )
    for r in stored.collect():
        assert r._p_bucket_k == zlib.crc32(str(r.k).encode()) % 4
    # and pruning covers the datasource-written files too
    all_files = t.scan(with_file=True).select("_file").distinct().count()
    opened = (
        t.scan(prune={"k": [150]}, with_file=True)
        .select("_file").distinct().count()
    )
    assert opened < all_files


def test_partitions_df_summary(spark, btable):
    t, _ = btable
    rows = t.partitions_df().collect()
    assert len(rows) >= 4  # one row per bucket value (at least)
    assert sum(r.row_count for r in rows) == t.scan().count()
    assert all(r.file_count >= 1 and r.ratio > 0 for r in rows)


def test_datasource_read_hides_derived_columns(spark, tmp_path):
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableDataSource,
    )

    spark.dataSource.register(BtrTableDataSource)
    root = str(tmp_path / "t")
    df = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    BtrTable.create(spark, root, df, partition_by=["bucket(4, k)"])
    got = spark.read.format("btrtable").load(root)
    assert not [c for c in got.columns if c.startswith("_p_")]
    assert got.count() == 60
    assert got.agg(F.sum("k")).first()[0] == sum(range(60))


def test_pushdown_reader_translates_bucket_filters(spark, tmp_path):
    """A pushed equality filter on the bucket source column prunes the
    derived layout: fewer files are decoded, result identical."""
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableDataSource,
    )

    spark.dataSource.register(BtrTableDataSource)
    root = str(tmp_path / "t")
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    BtrTable.create(spark, root, df, partition_by=["bucket(4, k)"])
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("btrtable")
            .option("pushdown", "true")
            .load(root)
            .filter(F.col("k") == 123)
            .collect()
        )
        assert len(got) == 1 and got[0].v == 861
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_transform_type_validation_and_reserved_prefix(spark, tmp_path):
    import pytest as _pt

    df_bool = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("flag")
    )
    with _pt.raises(TypeError):
        BtrTable.create(
            spark, str(tmp_path / "a"), df_bool,
            partition_by=["bucket(4, flag)"],
        )
    df_float = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    with _pt.raises(TypeError):
        BtrTable.create(
            spark, str(tmp_path / "b"), df_float,
            partition_by=["truncate(2, v)"],
        )
    with _pt.raises(TypeError):
        BtrTable.create(
            spark, str(tmp_path / "c"), df_float,
            partition_by=["days(k)"],
        )
    df_res = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("_p_score")
    )
    with _pt.raises(ValueError):
        BtrTable.create(spark, str(tmp_path / "d"), df_res)


def test_datasource_create_with_transform_spec(spark, tmp_path):
    """Creating a NEW transform-partitioned table straight through the
    DataSource writer: paren-aware partitionby parsing, derived columns
    in the written files, pruning works on the result."""
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableDataSource,
    )

    spark.dataSource.register(BtrTableDataSource)
    root = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    (
        df.write.format("btrtable")
        .option("partitionby", "bucket(4,k)")
        .mode("append")
        .save(root)
    )
    t = BtrTable.load(spark, root)
    assert t.metadata()["partition_transforms"][0]["kind"] == "bucket"
    assert t.scan().count() == 200
    all_files = t.scan(with_file=True).select("_file").distinct().count()
    opened = (
        t.scan(prune={"k": [77]}, with_file=True)
        .select("_file").distinct().count()
    )
    assert opened < all_files
    assert t.scan(prune={"k": [77]}).filter(F.col("k") == 77).first().v == 231
