"""Auto-maintenance planner: metadata-only diagnosis, ordered actions."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.maintain import maintain, plan_maintenance
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(image_caption_table(120, seed=61))
    return BtrTable.create(
        spark, str(tmp_path / "m"), df, num_files=2, job_id="m0"
    )


def _no_data_reads(monkeypatch):
    real = fs.read_parquet

    def guard(path, *a, **k):
        if "/data/" in path:
            raise AssertionError(f"data file opened: {path}")
        return real(path, *a, **k)

    monkeypatch.setattr(fs, "read_parquet", guard)


def test_healthy_table_empty_plan_zero_io(table, monkeypatch):
    _no_data_reads(monkeypatch)
    assert plan_maintenance(table) == []


def test_small_files_trigger_compact(spark, table):
    for i in range(3):
        table.append(
            spark.createDataFrame(image_caption_table(30, seed=70 + i)),
            num_files=4,
            job_id=f"s{i}",
        )
    plan = plan_maintenance(table, min_small_files=8)
    assert [s["action"] for s in plan] == ["compact"]
    assert "small files" in plan[0]["reason"]
    res = maintain(table, min_small_files=8)
    assert res["results"]["compact"]["bins"] >= 1
    assert plan_maintenance(table, min_small_files=8) == []


def test_deletes_trigger_absorbing_compact(spark, table, monkeypatch):
    ups = (
        table.scan()
        .orderBy("image_id")
        .limit(10)
        .withColumn("caption", F.lit("v2"))
    )
    upsert_eq(table, ups, on="image_id", job_id="u1")
    _no_data_reads(monkeypatch)
    plan = plan_maintenance(table)
    assert plan[0]["action"] == "compact"
    assert "equality" in plan[0]["reason"]
    monkeypatch.undo()
    maintain(table)
    assert table.eq_delete_files() == []
    assert (
        table.scan().filter(F.col("caption") == "v2").count() == 10
    )
    assert plan_maintenance(table) == []


def test_cluster_dilution_recommends_recluster(spark, table):
    from btrblocks_spark.operators.cluster import cluster

    cluster(table, job_id="z1")
    assert plan_maintenance(table, min_small_files=999) == []
    # dilute: append 3x the clustered rows, unsorted
    table.append(
        spark.createDataFrame(image_caption_table(400, seed=81)),
        num_files=2,
        job_id="d1",
    )
    plan = plan_maintenance(table, min_small_files=999)
    acts = [s["action"] for s in plan]
    assert "cluster" in acts
    step = plan[acts.index("cluster")]
    assert step["curve"] == "zorder"
    assert step["by"] == ["phash", "w", "h"]
    res = maintain(table, min_small_files=999)
    assert "cluster" in res["results"]
    assert plan_maintenance(table, min_small_files=999) == []


def test_snapshot_retention(spark, table):
    for i in range(4):
        table.append(
            spark.createDataFrame(image_caption_table(10, seed=90 + i)),
            num_files=1,
            job_id=f"r{i}",
        )
    plan = plan_maintenance(
        table, keep_snapshots=3, min_small_files=999
    )
    assert [s["action"] for s in plan] == ["expire_snapshots"]
    res = maintain(table, keep_snapshots=3, min_small_files=999)
    assert len(table.snapshots()) <= 3 + 1  # expire commits a snapshot
    assert "expire_snapshots" in res["results"]


def test_plan_only_mode_changes_nothing(spark, table):
    table.append(
        spark.createDataFrame(image_caption_table(10, seed=99)),
        num_files=6,
        job_id="p1",
    )
    sid = table.current_snapshot_id()
    res = maintain(table, apply=False, min_small_files=4)
    assert res["plan"] and res["results"] == {}
    assert table.current_snapshot_id() == sid


def test_sorted_run_count_triggers_full_remerge(spark, tmp_path, monkeypatch):
    """Incremental (only_new) clustering keeps the clustered fraction
    high but accumulates overlapping sorted runs; past max_sorted_runs
    the planner asks for a FULL re-merge even with zero dilution."""
    from btrblocks_spark.operators.cluster import cluster

    df = spark.createDataFrame(image_caption_table(150, seed=81))
    t = BtrTable.create(
        spark, str(tmp_path / "runs"), df, num_files=1, job_id="r0"
    )
    cluster(t, job_id="rz0", max_rows_per_file=200)
    for i in range(2):
        t.append(
            spark.createDataFrame(image_caption_table(60, seed=90 + i)),
            job_id=f"ra{i}",
        )
        cluster(t, job_id=f"rz{i + 1}", only_new=True,
                max_rows_per_file=200)
    _no_data_reads(monkeypatch)
    # 3 sorted runs, 100% clustered: under the default threshold no
    # cluster action; with max_sorted_runs=2 a full re-merge is planned
    assert not any(
        s["action"] == "cluster" for s in plan_maintenance(t)
    )
    plan = plan_maintenance(t, max_sorted_runs=2)
    step = next(s for s in plan if s["action"] == "cluster")
    assert step["mode"] == "full" and "sorted runs" in step["reason"]
    monkeypatch.undo()
    maintain(t, max_sorted_runs=2)
    runs = {r["job_id"] for r in t.data_files() if r["sort_key"]}
    assert len(runs) == 1  # one merged run again
