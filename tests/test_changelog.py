"""Snapshot-diff changelog (scan_changes) and O(batch) scan planning."""

import json
import time as _time

import pyarrow as pa
import pytest

from pyspark.sql import functions as F

from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable


def _df(spark, lo, n, tag="v"):
    return spark.range(lo, lo + n).select(
        F.col("id"), F.concat(F.lit(tag), F.col("id")).alias("val")
    )


def test_append_compact_append_diff_is_net_new(spark, tmp_path):
    root = str(tmp_path / "cdc1")
    t = BtrTable.create(spark, root, _df(spark, 0, 600), num_files=4,
                        job_id="c0")
    s1 = t.current_snapshot_id()
    t.append(_df(spark, 600, 200), num_files=2, job_id="a1")
    s2 = t.current_snapshot_id()
    compact(t, job_id="cp1")
    s3 = t.current_snapshot_id()
    assert s3 == s2 + 1  # compaction really committed
    t.append(_df(spark, 800, 100), num_files=1, job_id="a2")
    s4 = t.current_snapshot_id()

    ch = t.scan_changes(s1, s4)
    rows = ch.collect()
    assert all(r._change_type == "insert" for r in rows)
    ids = sorted(r.id for r in rows)
    assert ids == list(range(600, 900))  # compaction contributed nothing
    by_snap = {r.id: r._change_snapshot_id for r in rows}
    assert by_snap[600] == s2 and by_snap[850] == s4

    # full-history diff covers the initial create too
    assert t.scan_changes(0).count() == 900


def test_mor_merge_diff_emits_delete_and_insert(spark, tmp_path):
    root = str(tmp_path / "cdc2")
    t = BtrTable.create(spark, root, _df(spark, 0, 300), num_files=2,
                        job_id="c0")
    s1 = t.current_snapshot_id()
    src = _df(spark, 0, 0).sparkSession.createDataFrame(
        [(5, "N5"), (7, "N7"), (400, "N400")], "id long, val string"
    )
    merge_into(t, src, on="id", strategy="mor", job_id="m1")
    s2 = t.current_snapshot_id()

    ch = t.scan_changes(s1, s2).collect()
    dels = {r.id: r.val for r in ch if r._change_type == "delete"}
    ins = {r.id: r.val for r in ch if r._change_type == "insert"}
    # old images of the updated keys, new images + the true insert
    assert dels == {5: "v5", 7: "v7"}
    assert ins == {5: "N5", 7: "N7", 400: "N400"}


def test_cow_merge_in_window_raises(spark, tmp_path):
    root = str(tmp_path / "cdc3")
    t = BtrTable.create(spark, root, _df(spark, 0, 200), num_files=2,
                        job_id="c0")
    s1 = t.current_snapshot_id()
    src = spark.createDataFrame([(3, "X3")], "id long, val string")
    merge_into(t, src, on="id", job_id="m1")  # staged copy-on-write
    with pytest.raises(NotImplementedError, match="copy-on-write"):
        t.scan_changes(s1).collect()


def test_diff_fallback_when_manifest_merged_away(spark, tmp_path):
    root = str(tmp_path / "cdc4")
    t = BtrTable.create(spark, root, _df(spark, 0, 100), num_files=2,
                        job_id="c0")
    s1 = t.current_snapshot_id()
    old_max = BtrTable.MANIFEST_LIST_MAX
    BtrTable.MANIFEST_LIST_MAX = 1  # force every commit to bin-pack
    try:
        t.append(_df(spark, 100, 50), num_files=2, job_id="a1")
        s2 = t.current_snapshot_id()
        names = {e["name"] for e in t._manifest_list(s2)}
        assert f"manifest-{s2}-a.parquet" not in names  # fast path gone
        ch = t.scan_changes(s1, s2)
        ids = sorted(r.id for r in ch.collect())
        assert ids == list(range(100, 150))
    finally:
        BtrTable.MANIFEST_LIST_MAX = old_max


def test_scan_planning_never_materializes_big_path_lists(spark, tmp_path):
    """10^5-file table: scan planning keeps the surviving paths as a
    DataFrame; the driver never builds a createDataFrame list of them."""
    root = str(tmp_path / "bigplan")
    t = BtrTable.create(spark, root, _df(spark, 0, 50), num_files=1,
                        job_id="b0")
    n_fake = 100_000
    rows = [
        {
            "file_path": f"{root}/data/fake-{i:07d}.parquet",
            "partition": "{}",
            "row_count": 1,
            "block_count": 1,
            "file_bytes": 10,
            "raw_bytes": 10,
            "stats": json.dumps(
                {"id": {"min": str(i), "max": str(i)}}
            ),
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
            "manifests": t._manifest_list(cur) + [entry],
            "summary": {},
        }
    )
    meta["current_snapshot_id"] = cur + 1
    fs.write_json_atomic(t._meta_path, meta)
    t = BtrTable.load(spark, root)

    sizes = []
    real_create = spark.createDataFrame

    def probe(data, *a, **kw):
        if isinstance(data, list):
            sizes.append(len(data))
        return real_create(data, *a, **kw)

    spark.createDataFrame = probe
    try:
        # pruned AND unpruned planning on the 10^5-file snapshot
        df1 = t.scan(prune={"id": (5, 10)})
        df2 = t.scan()
    finally:
        spark.createDataFrame = real_create
    assert df1 is not None and df2 is not None
    assert max(sizes, default=0) < 10_000


def test_net_changes_collapses_to_last_effect(spark, tmp_path):
    """A key touched by several commits nets to its final state;
    applying the net view equals applying the ordered changelog."""
    root = str(tmp_path / "net1")
    t = BtrTable.create(spark, root, _df(spark, 0, 300), num_files=2,
                        job_id="n0")
    s0 = t.current_snapshot_id()
    # commit 1: update ids 5, 6 (MOR -> delete old + insert new)
    merge_into(t, _df(spark, 5, 2, tag="u1_"), on="id", strategy="mor",
               job_id="n1")
    # commit 2: update id 5 again, insert id 400
    src2 = _df(spark, 5, 1, tag="u2_").unionByName(
        _df(spark, 400, 1, tag="new_")
    )
    merge_into(t, src2, on="id", strategy="mor", job_id="n2")
    # commit 3: delete id 6
    merge_into(t, _df(spark, 6, 1), on="id", strategy="mor",
               when_matched="delete", when_not_matched="ignore",
               job_id="n3")
    net = {
        r.id: (r._change_type, r.val)
        for r in t.net_changes(s0, keys="id").collect()
    }
    assert net[5] == ("insert", "u2_5")      # last of three events
    assert net[6][0] == "delete"             # updated then deleted
    assert net[400] == ("insert", "new_400")
    assert set(net) == {5, 6, 400}
    # apply net view to a copy at s0 == current state
    base = {r.id: r.val for r in t.scan(snapshot_id=s0).collect()}
    for k, (op, val) in net.items():
        if op == "delete":
            base.pop(k, None)
        else:
            base[k] = val
    now = {r.id: r.val for r in t.scan().collect()}
    assert base == now
    with pytest.raises(ValueError, match="key column"):
        t.net_changes(s0)


def test_snapshots_and_history_df(spark, tmp_path):
    root = str(tmp_path / "meta1")
    t = BtrTable.create(spark, root, _df(spark, 0, 100), num_files=1,
                        job_id="h0")
    t.append(_df(spark, 100, 50), job_id="h1")
    sid_keep = t.current_snapshot_id()
    # a staged (write-audit-publish) snapshot that is never published
    # stays OFF the current parent chain
    t.append(_df(spark, 150, 50), job_id="h2", stage=True)
    abandoned = t.staged_snapshots()[-1]["snapshot_id"]
    t.append(_df(spark, 200, 50), job_id="h3")
    sdf = t.snapshots_df()
    rows = {r.snapshot_id: r for r in sdf.collect()}
    assert rows[sid_keep].operation == "append"
    assert rows[sid_keep].parent_id == sid_keep - 1
    assert int(rows[sid_keep].summary["added_files"]) >= 1
    hist = {r.snapshot_id: r for r in t.history_df().collect()}
    assert hist[sid_keep].is_current_ancestor
    assert hist[t.current_snapshot_id()].is_current_ancestor
    assert not hist[abandoned].is_current_ancestor


def test_net_changes_keeps_sibling_rows_per_key(spark, tmp_path):
    """Keys need not be unique: a key with several live rows keeps ALL
    its winning-snapshot insert events instead of a row_number()==1
    pick silently dropping siblings (ADVICE r5)."""
    root = str(tmp_path / "net2")
    t = BtrTable.create(spark, root, _df(spark, 0, 10), num_files=1,
                        job_id="m0")
    s0 = t.current_snapshot_id()
    # one commit appends THREE rows sharing key 7 (plain appends do not
    # enforce uniqueness)
    sib = _df(spark, 7, 1, tag="a_").unionByName(
        _df(spark, 7, 1, tag="b_")
    ).unionByName(_df(spark, 7, 1, tag="c_"))
    t.append(sib, job_id="m1")
    net = t.net_changes(s0, keys="id").collect()
    vals = sorted(r.val for r in net if r.id == 7)
    assert vals == ["a_7", "b_7", "c_7"]
    assert all(r._change_type == "insert" for r in net)
