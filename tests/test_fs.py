"""Filesystem facade + object-store table lifecycle.

The reference reads straight from S3 with its own client
(``/root/reference/tools/conversion/decompression-speed-s3.cpp``); here the
whole engine — metadata, manifests, block files, checkpoints — runs through
``sources/fs.py``. Tests:

1. facade unit behavior on local paths and on pyarrow's in-memory mock FS;
2. a full table lifecycle (create → scan → compact → expire) over a
   ``mem://`` root, which `is_local()` treats as remote — so every byte
   goes through the facade and scans take the native-IO path (executors
   opening files via pyarrow.fs, not Spark's JVM parquet reader).
"""

import pyarrow as pa
import pytest

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.compact import compact
from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable


def test_local_roundtrip(tmp_path):
    p = f"{tmp_path}/sub/x.json"
    fs.mkdirs(f"{tmp_path}/sub")
    fs.write_json_atomic(p, {"a": 1})
    assert fs.read_json(p) == {"a": 1}
    assert fs.exists(p)
    assert fs.file_size(p) > 0
    assert fs.list_files(f"{tmp_path}/sub") == ["x.json"]
    fs.delete_file(p)
    assert not fs.exists(p)
    assert fs.list_files(f"{tmp_path}/nope") == []


def test_local_parquet_atomic(tmp_path):
    t = pa.table({"a": [1, 2, 3]})
    size = fs.write_parquet_atomic(t, f"{tmp_path}/t.parquet")
    assert size == fs.file_size(f"{tmp_path}/t.parquet")
    back = fs.read_parquet(f"{tmp_path}/t.parquet")
    assert back.equals(t)
    # no temp litter left behind
    assert fs.list_files(str(tmp_path)) == ["t.parquet"]


def test_exclusive_create(tmp_path):
    lock = f"{tmp_path}/LOCK"
    assert fs.create_exclusive(lock)
    assert not fs.create_exclusive(lock)
    fs.delete_file(lock)
    assert fs.create_exclusive(lock)


def test_mock_scheme_registration():
    from pyarrow.fs import _MockFileSystem

    mock = _MockFileSystem()
    fs.register_scheme("mocktest", lambda: mock)
    try:
        root = "mocktest://tbl"
        assert not fs.is_local(root)
        fs.mkdirs(fs.join(root, "data"))
        fs.write_json_atomic(fs.join(root, "metadata.json"), {"v": 2})
        assert fs.read_json(fs.join(root, "metadata.json")) == {"v": 2}
        t = pa.table({"a": [1, 2]})
        fs.write_parquet_atomic(t, fs.join(root, "data", "f.parquet"))
        assert fs.read_parquet(fs.join(root, "data", "f.parquet")).equals(t)
        assert fs.list_files(fs.join(root, "data")) == ["f.parquet"]
        # object-store lock emulation
        assert fs.create_exclusive(fs.join(root, "_commit.lock"))
        assert not fs.create_exclusive(fs.join(root, "_commit.lock"))
    finally:
        fs._SCHEMES.pop("mocktest", None)


N = 300


@pytest.fixture(scope="module")
def mem_table(spark, tmp_path_factory):
    local_root = str(tmp_path_factory.mktemp("memtbl"))
    root = f"mem://{local_root.lstrip('/')}"
    df = spark.createDataFrame(image_caption_table(N, seed=11))
    table = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=6, job_id="mem0"
    )
    return table, df


def test_mem_scheme_create_and_scan(mem_table):
    table, df = mem_table
    assert table.root.startswith("mem://")
    for r in table.data_files():
        assert r["file_path"].startswith("mem://")
    out = table.scan()  # native_io auto-on for non-local roots
    assert out.count() == N
    assert df.exceptAll(out).count() == 0
    assert out.exceptAll(df).count() == 0


def test_mem_scheme_native_scan_prune_and_file(mem_table):
    table, _ = mem_table
    out = table.scan(columns=["image_id", "w"], with_file=True)
    rows = out.limit(5).collect()
    assert rows and all(r._file.startswith("mem://") for r in rows)
    assert out.columns == ["image_id", "w", "_file"]


def test_mem_scheme_compact_and_expire(spark, mem_table):
    table, df = mem_table
    before = df.count()
    res = compact(table, target_file_bytes=64 * 1024 * 1024, job_id="memc")
    assert res["bins"] >= 1
    out = table.scan()
    assert out.count() == before
    assert df.exceptAll(out).count() == 0
    exp = table.expire_snapshots(keep_last=1)
    assert exp["expired_snapshots"] >= 1
    assert table.scan().count() == before


def test_s3like_no_rename_full_lifecycle(spark, tmp_path_factory):
    """Full table lifecycle against a store that FORBIDS rename (S3
    semantics — any engine path relying on an atomic move raises
    NotImplementedError mid-job): create -> append -> merge -> compact
    -> cluster -> rewrite manifests -> expire -> orphan cleanup ->
    scan. The commit protocol's write-then-single-metadata-swap must
    carry the whole run."""
    from pyspark.sql import functions as F

    from btrblocks_spark.operators.cluster import cluster
    from btrblocks_spark.operators.merge import merge_into

    local_root = str(tmp_path_factory.mktemp("s3like"))
    root = f"s3like://{local_root.lstrip('/')}"
    df = spark.createDataFrame(image_caption_table(240, seed=17))
    table = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=4,
        max_rows_per_file=60, job_id="s0",
    )
    assert table.scan().count() == 240

    extra = spark.createDataFrame(image_caption_table(30, seed=18)).withColumn(
        "image_id", F.concat(F.lit("x-"), F.col("image_id"))
    )
    table.append(extra, job_id="s1")
    assert table.scan().count() == 270

    cols = table.schema_arrow().names
    upd = (
        table.scan(columns=cols).limit(10)
        .withColumn("caption", F.lit("S3 EDIT"))
    )
    merge_into(table, upd, on="image_id", job_id="s2")
    assert table.scan().filter(F.col("caption") == "S3 EDIT").count() == 10

    res = compact(table, target_file_bytes=64 * 1024 * 1024, job_id="s3c")
    assert res["bins"] >= 1
    res = cluster(table, job_id="s4", max_rows_per_file=100)
    assert res["new_files"] >= 1
    res = table.rewrite_manifests()
    assert res["manifests_after"] >= 1
    res = table.expire_snapshots(keep_last=1)
    assert res["expired_snapshots"] >= 1
    res = table.remove_orphan_files(older_than_seconds=0.0, dry_run=True)
    assert table.scan().count() == 270
    assert table.scan().filter(F.col("caption") == "S3 EDIT").count() == 10
    # every surviving path is remote-schemed; nothing leaked to os.* paths
    for r in table.data_files():
        assert r["file_path"].startswith("s3like://")
