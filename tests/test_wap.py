"""Write-audit-publish (staged commits), snapshot tags, and their
interplay with expire/orphan/changelog.

Reference parity note: the reference engine has no snapshot layer at
all — this is the lakehouse extension layer (Iceberg WAP / tag
semantics re-expressed over the manifest-list commit protocol in
``sources/table.py``).
"""

import pytest

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.sources.table import BtrTable, CommitConflict

N = 240


@pytest.fixture()
def table(spark, tmp_path):
    t = image_caption_table(N, seed=7)
    df = spark.createDataFrame(t)
    return BtrTable.create(
        spark, str(tmp_path / "t"), df, num_files=2, job_id="w0"
    )


def _more(spark, n, seed):
    t = image_caption_table(n, seed=seed)
    df = spark.createDataFrame(t)
    # distinct ids so appended batches don't collide with the base rows
    from pyspark.sql import functions as F

    return df.withColumn(
        "image_id", F.concat(F.lit(f"s{seed}-"), F.col("image_id"))
    )


# ------------------------------------------------------------------ tags

def test_tag_scan_and_time_travel(spark, table):
    v1 = table.current_snapshot_id()
    table.tag("v1")
    table.append(_more(spark, 60, 2), job_id="w1")
    assert table.scan().count() == N + 60
    assert table.scan(snapshot_id="v1").count() == N
    assert table.refs()["v1"]["snapshot_id"] == v1
    with pytest.raises(ValueError):
        table.tag("v1")
    with pytest.raises(KeyError):
        table.scan(snapshot_id="nope")


def test_expire_retains_tagged_snapshot(spark, table):
    table.tag("pinned")
    table.append(_more(spark, 50, 3), job_id="w1")
    table.append(_more(spark, 50, 4), job_id="w2")
    res = table.expire_snapshots(keep_last=1)
    assert res["expired_snapshots"] > 0
    # the tagged snapshot survived and still scans completely
    assert table.scan(snapshot_id="pinned").count() == N
    assert table.scan().count() == N + 100
    # dropping the tag makes it expirable
    table.drop_tag("pinned")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(KeyError):
        table.scan(snapshot_id="pinned")


# ------------------------------------------------------------------- WAP

def test_stage_audit_publish_fast_path(spark, table):
    base_sid = table.current_snapshot_id()
    staged = table.append(_more(spark, 80, 5), job_id="wap1", stage=True)
    # invisible to default readers until published
    assert table.current_snapshot_id() == base_sid
    assert table.scan().count() == N
    # auditors scan the staged snapshot id directly
    assert table.scan(snapshot_id=staged).count() == N + 80
    assert [s["snapshot_id"] for s in table.staged_snapshots()] == [staged]
    out = table.publish(staged)
    assert out == {"snapshot_id": staged, "rebased": False}
    assert table.current_snapshot_id() == staged
    assert table.scan().count() == N + 80
    assert table.staged_snapshots() == []


def test_publish_rebases_append_after_interleaved_commit(spark, table):
    staged = table.append(_more(spark, 40, 6), job_id="wap1", stage=True)
    table.append(_more(spark, 30, 7), job_id="other")  # table moves on
    out = table.publish(staged)
    assert out["rebased"] is True
    assert table.scan().count() == N + 30 + 40
    # the rebased publish is a normal snapshot with the added rows;
    # the private staged entry is gone
    assert table.staged_snapshots() == []
    assert table._snapshot(out["snapshot_id"])["summary"][
        "published_from"
    ] == staged


def test_publish_conflicts_for_non_append_stage(spark, table):
    # stage a compaction-shaped commit (replaces files), then move the
    # table: rebase is unsafe and must conflict
    rows = table.all_files()
    staged = table._commit(
        rows,
        operation="compact",
        replaced={r["file_path"] for r in rows},
        stage=True,
    )
    table.append(_more(spark, 20, 8), job_id="other")
    with pytest.raises(CommitConflict):
        table.publish(staged)


def test_abandon_then_orphan_cleanup(spark, table):
    before_files = {r["file_path"] for r in table.all_files()}
    staged = table.append(_more(spark, 40, 9), job_id="wap1", stage=True)
    staged_files = {
        r["file_path"] for r in table.all_files(staged)
    } - before_files
    assert staged_files
    table.abandon(staged)
    assert table.staged_snapshots() == []
    assert table.scan().count() == N
    # abandoned files are orphans now; cleanup reclaims them
    res = table.remove_orphan_files(older_than_seconds=0.0)
    from btrblocks_spark.sources import fs

    assert all(not fs.exists(p) for p in staged_files)
    assert res["removed"] >= len(staged_files)


def test_expire_retains_unpublished_stage(spark, table):
    staged = table.append(_more(spark, 40, 10), job_id="wap1", stage=True)
    table.append(_more(spark, 30, 11), job_id="w1")
    table.expire_snapshots(keep_last=1)
    # the staged snapshot must survive expiry and still publish cleanly
    out = table.publish(staged)
    assert out["rebased"] is True
    assert table.scan().count() == N + 30 + 40


def test_snapshot_ids_unique_with_stage_interleaving(spark, table):
    staged = table.append(_more(spark, 10, 12), job_id="wap1", stage=True)
    table.append(_more(spark, 10, 13), job_id="w1")
    sids = [s["snapshot_id"] for s in table.snapshots()]
    assert len(sids) == len(set(sids))
    assert table.current_snapshot_id() != staged


def test_changelog_skips_unpublished_stage(spark, table):
    base = table.current_snapshot_id()
    table.append(_more(spark, 25, 14), job_id="w1")
    staged = table.append(_more(spark, 40, 15), job_id="wap1", stage=True)
    changes = table.scan_changes(base)
    assert changes.count() == 25  # staged rows absent
    table.publish(staged)
    changes = table.scan_changes(base)
    assert changes.count() == 25 + 40


def test_rollback_after_publish(spark, table):
    v1 = table.current_snapshot_id()
    staged = table.append(_more(spark, 30, 16), job_id="wap1", stage=True)
    table.publish(staged)
    assert table.scan().count() == N + 30
    table.rollback(v1)
    assert table.scan().count() == N
