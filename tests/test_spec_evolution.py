"""Partition-spec evolution (Iceberg analog): add / change / drop
hidden-partitioning transforms on an EXISTING table without rewriting
data. Old-spec files keep pruning through their own _p_* stats; new
writes use the new spec; compaction migrates opportunistically."""

import datetime

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.sources.table import BtrTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
        (F.col("id") * 3).alias("val"),
    )


def _files_opened(t, prune):
    return (
        t.scan(prune=prune, with_file=True)
        .select("_file").distinct().count()
    )


def test_unpartitioned_to_bucket(spark, tmp_path):
    root = str(tmp_path / "t1")
    t = BtrTable.create(spark, root, _df(spark, 0, 400), num_files=4,
                        job_id="e0")
    res = t.evolve_partition_spec(["bucket(8, k)"])
    assert res["spec_id"] == 1
    # new writes land bucketed; old files stay put
    t.append(_df(spark, 400, 800), num_files=4, job_id="e1")
    assert t.scan().count() == 800
    all_files = _files_opened(t, None)
    probe = _files_opened(t, {"k": [500]})
    # the 4 old files can only be pruned by their k range (3 of 4 drop);
    # new files prune to their bucket
    assert probe < all_files
    got = t.scan(prune={"k": [500]}).filter(F.col("k") == 500).collect()
    assert len(got) == 1 and got[0].val == 1500
    # pre-evolution rows still found (old files lack _p_* => kept)
    got0 = t.scan(prune={"k": [123]}).filter(F.col("k") == 123).collect()
    assert len(got0) == 1 and got0[0].val == 369


def test_bucket_reparameterize_gets_fresh_column(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = BtrTable.create(
        spark, root, _df(spark, 0, 200), num_files=4, job_id="r0",
        partition_by=["bucket(4, k)"],
    )
    res = t.evolve_partition_spec(["bucket(16, k)"])
    dests = [tf["dest"] for tf in t.metadata()["partition_transforms"]]
    assert dests == ["_p_bucket_k_s1"]  # fresh column, old keeps meaning
    hist = [tf["dest"] for tf in t.all_partition_transforms()]
    assert set(hist) == {"_p_bucket_k", "_p_bucket_k_s1"}
    t.append(_df(spark, 200, 400), num_files=8, job_id="r1")
    # equality probe prunes through BOTH specs (old files via bucket(4),
    # new files via bucket(16))
    assert t.scan(prune={"k": [10]}).filter(F.col("k") == 10).count() == 1
    assert t.scan(prune={"k": [300]}).filter(F.col("k") == 300).count() == 1
    probe = _files_opened(t, {"k": [300]})
    assert probe < _files_opened(t, None)


def test_compaction_migrates_and_keeps_stats_truthful(spark, tmp_path):
    root = str(tmp_path / "t3")
    t = BtrTable.create(spark, root, _df(spark, 0, 300), num_files=3,
                        job_id="c0")
    t.evolve_partition_spec(["bucket(8, k)"])
    t.append(_df(spark, 300, 600), num_files=3, job_id="c1")
    compact(t, job_id="c2", target_file_bytes=1 << 30)
    # after compaction every row must still be found via a pruned scan
    for k in (0, 150, 299, 300, 599):
        assert (
            t.scan(prune={"k": [k]}).filter(F.col("k") == k).count() == 1
        ), k
    assert t.scan().count() == 600


def test_merge_into_evolved_table(spark, tmp_path):
    root = str(tmp_path / "t4")
    t = BtrTable.create(spark, root, _df(spark, 0, 300), num_files=3,
                        job_id="m0")
    t.evolve_partition_spec(["bucket(4, k)"])
    t.append(_df(spark, 300, 500), num_files=2, job_id="m1")
    src = spark.createDataFrame(
        [(50, "UPD", -1), (350, "UPD", -2), (900, "NEW", -3)],
        "k long, name string, val long",
    )
    merge_into(t, src, on="k", job_id="m2")
    got = {r.k: (r.name, r.val) for r in t.scan().collect()}
    assert len(got) == 501
    assert got[50] == ("UPD", -1) and got[350] == ("UPD", -2)
    assert got[900] == ("NEW", -3)
    # pruned probes stay correct after the CoW splice into mixed specs
    assert t.scan(prune={"k": [50]}).filter(F.col("k") == 50).count() == 1
    assert t.scan(prune={"k": [350]}).filter(
        F.col("k") == 350).count() == 1


def test_evolve_to_unpartitioned_and_validation(spark, tmp_path):
    root = str(tmp_path / "t5")
    t = BtrTable.create(
        spark, root, _df(spark, 0, 100), num_files=2, job_id="v0",
        partition_by=["bucket(4, k)"],
    )
    t.evolve_partition_spec(None)  # drop partitioning
    assert t.metadata()["partition_transforms"] == []
    t.append(_df(spark, 100, 200), num_files=2, job_id="v1")
    # old files still prune on their stored bucket layout
    assert t.scan(prune={"k": [7]}).filter(F.col("k") == 7).count() == 1
    assert t.scan().count() == 200
    with pytest.raises(KeyError):
        t.evolve_partition_spec(["nope"])
    with pytest.raises(TypeError):
        t.evolve_partition_spec(["days(k)"])  # k is not a date


def test_datasource_read_after_evolution(spark, tmp_path):
    root = str(tmp_path / "t6")
    t = BtrTable.create(spark, root, _df(spark, 0, 100), num_files=2,
                        job_id="d0")
    t.evolve_partition_spec(["bucket(4, k)"])
    t.append(_df(spark, 100, 200), num_files=2, job_id="d1")
    from btrblocks_spark.sources.spark_datasource import (
        BtrTableDataSource,
    )

    spark.dataSource.register(BtrTableDataSource)
    df = spark.read.format("btrtable").load(root)
    assert df.count() == 200
    assert not [c for c in df.columns if c.startswith("_p_")]
