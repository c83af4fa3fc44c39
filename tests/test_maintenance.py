"""Maintenance jobs E2E: compact, Z-order cluster, MERGE INTO, verify.

Mirrors SURVEY.md §5.5: synthesize the image+caption table fragmented,
run each maintenance job, assert row-set equality / PSNR invariants and
snapshot isolation after every job.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.cluster import cluster, morton3
from btrblocks_spark.operators.compact import compact, plan_bins
from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.operators.verify import verify_images, verify_snapshots_equal
from btrblocks_spark.sources.table import BtrTable

N = 1200


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("maint"))
    df = spark.createDataFrame(image_caption_table(N, seed=11))
    # fragment: many tiny files so compaction has real work
    return BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=8,
        max_rows_per_file=100, job_id="m0",
    )


def test_compact_preserves_rows(spark, table):
    sid0 = table.current_snapshot_id()
    files_before = len(table.data_files())
    res = compact(table, target_file_bytes=64 * 1024 * 1024, job_id="c1")
    assert res["bins"] >= 1
    files_after = len(table.data_files())
    assert files_after < files_before
    chk = verify_snapshots_equal(table, sid0, None)
    assert chk["ok"], chk
    # snapshot isolation: pre-compaction snapshot still scans
    assert table.scan(snapshot_id=sid0).count() == N
    # lineage recorded
    src = [
        json.loads(r["source_files"])
        for r in table.data_files()
        if r["job_id"] == "c1"
    ]
    assert all(len(s) >= 2 for s in src)


def test_compact_resume_idempotent(spark, table):
    # second run with same job id: markers say done; no new snapshot needed
    before = table.current_snapshot_id()
    res = compact(table, target_file_bytes=64 * 1024 * 1024, job_id="c2")
    after_files = {r["file_path"] for r in table.data_files()}
    res2_files = {r["file_path"] for r in table.data_files()}
    assert after_files == res2_files
    assert table.scan().count() == N


def test_cluster_zorder(spark, table):
    sid0 = table.current_snapshot_id()
    res = cluster(table, job_id="z1", max_rows_per_file=300)
    assert res["rewritten_files"] >= 1
    chk = verify_snapshots_equal(table, sid0, None)
    assert chk["ok"], chk
    # clustered files carry the sort key in the manifest
    keys = {r["sort_key"] for r in table.data_files()}
    assert "zorder(phash,w,h)" in keys
    # stats-pruned scan on phash returns exactly the right rows
    hot_lo = 0x7FFF_0000_0000_0000
    pruned = table.scan(columns=["phash"], prune={"phash": (hot_lo, None)})
    full = table.scan(columns=["phash"])
    want = full.filter(F.col("phash") >= hot_lo).count()
    got = pruned.filter(F.col("phash") >= hot_lo).count()
    assert got == want


def test_morton_key_orders_locality():
    import numpy as np

    a = np.array([0, 0, 1, 2**21 - 1], np.uint64)
    b = np.array([0, 1, 0, 2**21 - 1], np.uint64)
    c = np.array([0, 0, 0, 2**21 - 1], np.uint64)
    z = morton3(a, b, c)
    assert z[0] == 0
    assert z[3] == 2**63 - 1
    assert len(set(z.tolist())) == 4


def test_merge_update_and_insert(spark, table):
    sid0 = table.current_snapshot_id()
    base = table.scan(columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
    # update 30 rows' captions + insert 20 brand-new rows
    upd = (
        base.limit(30)
        .withColumn("caption", F.lit("UPDATED CAPTION"))
    )
    new = spark.createDataFrame(image_caption_table(20, seed=99)).withColumn(
        "image_id", F.concat(F.lit("new-"), F.col("image_id"))
    )
    source = upd.unionByName(new)
    res = merge_into(table, source, on="image_id", job_id="mg1")
    assert res["touched_files"] >= 1
    cur = table.scan()
    assert cur.count() == N + 20
    assert cur.filter(F.col("caption") == "UPDATED CAPTION").count() == 30
    assert cur.filter(F.col("image_id").startswith("new-")).count() == 20
    # old snapshot untouched
    old = table.scan(snapshot_id=sid0)
    assert old.count() == N
    assert old.filter(F.col("caption") == "UPDATED CAPTION").count() == 0


def test_merge_delete(spark, table):
    n_before = table.scan().count()
    victims = table.scan().filter(F.col("image_id").startswith("new-"))
    res = merge_into(table, victims, on="image_id", when_matched="delete",
                     when_not_matched="ignore", job_id="mg2")
    assert table.scan().count() == n_before - 20
    assert table.scan().filter(F.col("image_id").startswith("new-")).count() == 0


def test_images_psnr_invariant(spark, table):
    res = verify_images(table)
    assert res["ok"], res
    assert res["min_psnr"] >= 40.0


def test_expire_keeps_current(spark, table):
    n = table.scan().count()
    res = table.expire_snapshots(keep_last=1)
    assert res["expired_snapshots"] >= 1
    assert table.scan().count() == n
    # all remaining files referenced
    for r in table.data_files():
        assert os.path.exists(r["file_path"])


def test_plan_bins_first_fit():
    files = [
        {"file_path": f"f{i}", "partition": "{}", "file_bytes": b}
        for i, b in enumerate([10, 20, 30, 40, 90])
    ]
    bins = plan_bins(files, target_file_bytes=100, small_file_bytes=95)
    packed = sorted(sorted(m["file_bytes"] for m in b) for b in bins)
    assert sum(len(b) for b in bins) == 5
    for b in bins:
        assert sum(m["file_bytes"] for m in b) <= 100


def test_cluster_staged_resume_after_commit_crash(spark, tmp_path_factory, monkeypatch):
    """Kill the job at the commit step; a rerun with the same job id must
    resume from phase markers (no task re-executes against missing state)
    and land the same result."""
    root = str(tmp_path_factory.mktemp("clusresume"))
    df = spark.createDataFrame(image_caption_table(400, seed=23))
    t = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=4,
        max_rows_per_file=100, job_id="r0",
    )
    before = t.scan().count()
    real_commit = BtrTable._commit
    calls = {"n": 0}

    def crashing_commit(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated driver death at commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(BtrTable, "_commit", crashing_commit)
    with pytest.raises(RuntimeError, match="simulated"):
        cluster(t, job_id="zres", max_rows_per_file=200)
    # table unchanged (no snapshot landed), staged artifacts remain
    assert t.scan().count() == before
    res = cluster(t, job_id="zres", max_rows_per_file=200)  # resume
    assert res["new_files"] >= 1
    assert t.scan().count() == before
    assert {r["sort_key"] for r in t.data_files()} == {"zorder(phash,w,h)"}


def test_merge_update_changing_partition_column(spark, tmp_path_factory):
    """An update that moves a row to another partition value must leave a
    truthful manifest: every rewritten file's partition field matches the
    fmt values actually inside it."""
    root = str(tmp_path_factory.mktemp("mergepart"))
    df = spark.createDataFrame(image_caption_table(300, seed=31))
    t = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=3,
        max_rows_per_file=100, job_id="p0",
    )
    cols = t.schema_arrow().names
    src = (
        t.scan()
        .filter(F.pmod(F.xxhash64("image_id"), F.lit(10)) == 0)
        .withColumn("fmt", F.lit("bmp"))  # move every updated row to bmp
        .select(*cols)
    )
    n_upd = src.count()
    assert n_upd > 0
    res = merge_into(t, src, on="image_id", job_id="pmerge")
    assert res["touched_files"] >= 1
    # row count preserved, all updated rows now bmp
    assert t.scan().count() == 300
    assert t.scan().filter(F.col("fmt") == "bmp").count() >= n_upd
    # manifest truthfulness: each merged file's rows match its partition
    for r in t.data_files():
        if r["job_id"] != "pmerge":
            continue
        part = json.loads(r["partition"])
        got = (
            t.scan(files=[r["file_path"]], columns=["fmt"])
            .select("fmt").distinct().collect()
        )
        assert {x.fmt for x in got} == {part["fmt"]}, r["file_path"]


def test_estimate_df_bytes_nested(spark):
    """The staged-merge size gate must not underestimate nested columns
    (an array<string>-heavy source underestimated 10x could be fully
    collected on the driver despite exceeding the cap)."""
    from btrblocks_spark.operators.merge import _estimate_df_bytes

    rows = [
        (i, ["x" * 200, "y" * 300], {"a": "z" * 150, "b": i})
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "id long, tags array<string>, meta struct<a:string,b:long>"
    )
    est = _estimate_df_bytes(df)
    actual = df.toArrow().nbytes
    assert est >= actual * 0.5, (est, actual)
    assert est <= actual * 4, (est, actual)


def test_cluster_staged_null_partition_values(spark, tmp_path_factory):
    """A null partition-column value must survive staged clustering:
    the split kernel fills nulls with the shared sentinel and maps it
    back to JSON null in the manifest (an unfilled None crashed
    np.unique mid-job)."""
    root = str(tmp_path_factory.mktemp("clusnull"))
    pdf = image_caption_table(200, seed=41)
    df = spark.createDataFrame(pdf).withColumn(
        "fmt",
        F.when(F.col("phash") % 3 == 0, F.lit(None)).otherwise(
            F.col("fmt")
        ),
    )
    n_null = df.filter(F.col("fmt").isNull()).count()
    assert n_null > 0
    t = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=2,
        max_rows_per_file=50, job_id="n0",
    )
    res = cluster(t, job_id="zn", max_rows_per_file=80)
    assert res["new_files"] >= 1
    assert t.scan().count() == 200
    assert t.scan().filter(F.col("fmt").isNull()).count() == n_null
    # manifests carry JSON null, not the sentinel or "None"
    parts = {r["partition"] for r in t.data_files()}
    assert any('"fmt": null' in p for p in parts), parts
    assert not any("__null__" in p or '"None"' in p for p in parts)


def test_merge_staged_resume_after_commit_crash(spark, tmp_path_factory, monkeypatch):
    """Kill MERGE at the commit step; a rerun with the same job id must
    resume from the per-bin rewrite markers (files already rewritten are
    not re-encoded) and land the same result exactly once."""
    root = str(tmp_path_factory.mktemp("mergeresume"))
    df = spark.createDataFrame(image_caption_table(300, seed=53))
    t = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=3,
        max_rows_per_file=100, job_id="mr0",
    )
    before = t.scan().count()
    cols = t.schema_arrow().names
    src = (
        t.scan(columns=cols).limit(20)
        .withColumn("caption", F.lit("RESUMED EDIT"))
    )
    real_commit = BtrTable._commit
    calls = {"n": 0}

    def crashing_commit(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated driver death at commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(BtrTable, "_commit", crashing_commit)
    with pytest.raises(RuntimeError, match="simulated"):
        merge_into(t, src, on="image_id", job_id="mres")
    # no snapshot landed; table unchanged
    assert t.scan().count() == before
    assert t.scan().filter(F.col("caption") == "RESUMED EDIT").count() == 0
    res = merge_into(t, src, on="image_id", job_id="mres")  # resume
    assert res["touched_files"] >= 1
    assert t.scan().count() == before
    assert t.scan().filter(F.col("caption") == "RESUMED EDIT").count() == 20


def test_commit_lock_conflict(spark, tmp_path_factory):
    """A held commit lock makes a second committer fail fast with
    CommitConflict instead of corrupting metadata."""
    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.table import CommitConflict

    root = str(tmp_path_factory.mktemp("lockconf"))
    df = spark.createDataFrame(image_caption_table(60, seed=57))
    t = BtrTable.create(spark, root, df, num_files=1, job_id="lk0")
    t.COMMIT_LOCK_WAIT = 0  # fail fast for this test (default: wait 30s)
    lock = fs.join(root, "_commit.lock")
    assert fs.create_exclusive(lock)
    try:
        with pytest.raises(CommitConflict):
            t.rewrite_manifests()
        with pytest.raises(CommitConflict):
            t._commit([], operation="noop", replaced=set())
    finally:
        fs.delete_file(lock)
    # lock released -> commits work again
    t.rewrite_manifests()
    assert t.scan().count() == 60


def test_cluster_only_new_incremental(spark, tmp_path_factory):
    """only_new=True rewrites just the files appended since the last
    cluster into a fresh sorted run; already-sorted files stay
    byte-identical and the full row set is preserved."""
    root = str(tmp_path_factory.mktemp("inc_cluster"))
    df = spark.createDataFrame(image_caption_table(400, seed=71))
    t = BtrTable.create(spark, root, df, num_files=4, job_id="ic0")
    cluster(t, job_id="icz1", max_rows_per_file=200)
    sorted_before = {
        r["file_path"]
        for r in t.data_files()
        if r["sort_key"] == "zorder(phash,w,h)"
    }
    assert sorted_before
    t.append(
        spark.createDataFrame(image_caption_table(150, seed=72)),
        job_id="ic_app",
    )
    sid_mid = t.current_snapshot_id()
    res = cluster(t, job_id="icz2", only_new=True, max_rows_per_file=200)
    assert res["rewritten_files"] >= 1
    after = {r["file_path"]: r for r in t.data_files()}
    # old sorted run untouched, appended files rewritten sorted
    assert sorted_before <= set(after)
    assert all(
        r["sort_key"] == "zorder(phash,w,h)" for r in after.values()
    )
    chk = verify_snapshots_equal(t, sid_mid, None)
    assert chk["ok"], chk
    # converged: a second incremental run is a no-op
    res2 = cluster(t, job_id="icz3", only_new=True)
    assert res2["rewritten_files"] == 0
    with pytest.raises(ValueError, match="only_new"):
        cluster(t, only_new=True, strategy="shuffle")
