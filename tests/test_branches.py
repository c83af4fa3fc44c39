"""Branches — mutable named refs with fast-forward adoption."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable, CommitConflict

N = 100


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(image_caption_table(N, seed=41))
    return BtrTable.create(
        spark, str(tmp_path / "t"), df, num_files=2, job_id="b0"
    )


def test_branch_writes_isolated_until_fast_forward(spark, table):
    table.create_branch("dev")
    more = spark.createDataFrame(image_caption_table(30, seed=42))
    more = more.withColumn(
        "image_id", F.concat(F.lit("dev-"), F.col("image_id"))
    )
    sid = table.append(more, num_files=1, job_id="b1", branch="dev")
    # main readers untouched; branch readers see the append
    assert table.scan().count() == N
    assert table.scan(snapshot_id="dev").count() == N + 30
    assert table.refs()["dev"]["snapshot_id"] == sid
    # fast-forward adopts
    res = table.fast_forward("dev")
    assert res["adopted_snapshots"] == 1
    assert table.scan().count() == N + 30
    assert table.current_snapshot_id() == sid


def test_branch_upsert_and_chain(spark, table):
    table.create_branch("fix")
    ups = (
        table.scan()
        .orderBy("image_id")
        .limit(10)
        .withColumn("caption", F.lit("fixed"))
    )
    upsert_eq(table, ups, on="image_id", job_id="b2", branch="fix")
    ups2 = (
        table.scan(snapshot_id="fix")
        .orderBy("image_id")
        .limit(5)
        .withColumn("caption", F.lit("fixed2"))
    )
    upsert_eq(table, ups2, on="image_id", job_id="b3", branch="fix")
    assert table.scan().filter(F.col("caption") == "fixed").count() == 0
    got = table.scan(snapshot_id="fix")
    assert got.filter(F.col("caption") == "fixed2").count() == 5
    assert got.filter(F.col("caption") == "fixed").count() == 5
    assert got.count() == N
    table.fast_forward("fix")
    assert table.scan().filter(F.col("caption") == "fixed2").count() == 5


def test_fast_forward_refuses_diverged_main(spark, table):
    table.create_branch("dev")
    table.append(
        spark.createDataFrame(image_caption_table(5, seed=43)),
        num_files=1,
        job_id="b4",
        branch="dev",
    )
    # main moves on independently -> no longer an ancestor of the head
    table.append(
        spark.createDataFrame(image_caption_table(5, seed=44)),
        num_files=1,
        job_id="b5",
    )
    with pytest.raises(CommitConflict, match="fast-forward"):
        table.fast_forward("dev")


def test_branch_commits_hidden_from_changelog(spark, table):
    sid0 = table.current_snapshot_id()
    table.create_branch("dev")
    table.append(
        spark.createDataFrame(image_caption_table(7, seed=45)),
        num_files=1,
        job_id="b6",
        branch="dev",
    )
    assert table.scan_changes(sid0).count() == 0
    table.fast_forward("dev")
    assert table.scan_changes(sid0).count() == 7


def test_branch_survives_expiry_and_drop(spark, table):
    table.create_branch("dev")
    table.append(
        spark.createDataFrame(image_caption_table(5, seed=46)),
        num_files=1,
        job_id="b7",
        branch="dev",
    )
    for i in range(3):
        table.append(
            spark.createDataFrame(image_caption_table(4, seed=47 + i)),
            num_files=1,
            job_id=f"b8{i}",
        )
    table.expire_snapshots(keep_last=1)
    # branch still scannable and adoptable? main moved on -> refuses,
    # but the branch chain itself must remain intact and readable
    assert table.scan(snapshot_id="dev").count() == N + 5
    table.drop_branch("dev")
    with pytest.raises(KeyError):
        table.scan(snapshot_id="dev")
    with pytest.raises(KeyError):
        table.drop_branch("dev")


def test_tag_is_not_a_branch(table):
    table.tag("v1")
    with pytest.raises(KeyError):
        table.append(
            table.scan().limit(1), num_files=1, job_id="b9", branch="v1"
        )
    with pytest.raises(KeyError):
        table.drop_branch("v1")
    with pytest.raises(KeyError):
        table.fast_forward("v1")
