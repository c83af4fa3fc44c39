"""Optimistic concurrent commits: lock wait, dead-lock breaking, and
true-conflict detection (two writers replacing the same file)."""

import os
import threading
import time

import pytest

from pyspark.sql import functions as F

from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable, CommitConflict


def _mk(spark, root, n=200):
    df = spark.range(n).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    return BtrTable.create(spark, root, df, num_files=2, job_id="base")


def test_concurrent_appends_both_commit(spark, tmp_path):
    """Two writers appending at once: the lock serializes them, both
    snapshots land, no rows lost."""
    t = _mk(spark, str(tmp_path / "t"))
    errs = []

    def append(tag, lo):
        try:
            df = spark.range(lo, lo + 50).select(
                F.col("id"), F.concat(F.lit(tag), F.col("id")).alias("val")
            )
            t.append(df, job_id=tag)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th1 = threading.Thread(target=append, args=("a", 1000))
    th2 = threading.Thread(target=append, args=("b", 2000))
    th1.start()
    th2.start()
    th1.join()
    th2.join()
    assert errs == []
    # create-empty(0) + initial append(1) + the two concurrent appends
    assert t.current_snapshot_id() == 3
    assert t.scan().count() == 300
    vals = {r.val for r in t.scan().filter(F.col("id") >= 1000).collect()}
    assert "a1000" in vals and "b2000" in vals


def test_lock_wait_then_proceed(spark, tmp_path):
    """A held lock released mid-wait lets the waiter commit (no raise)."""
    t = _mk(spark, str(tmp_path / "t"))
    t.COMMIT_LOCK_WAIT = 10.0
    lock = fs.join(t.root, "_commit.lock")
    assert fs.create_exclusive(lock)

    def release():
        time.sleep(1.0)
        fs.delete_file(lock)

    th = threading.Thread(target=release)
    th.start()
    sid0 = t.current_snapshot_id()
    t0 = time.time()
    t._commit([], operation="noop", replaced=set())
    th.join()
    assert time.time() - t0 >= 0.9  # actually waited
    assert t.current_snapshot_id() == sid0 + 1


def test_stale_lock_broken(spark, tmp_path):
    """A lock older than COMMIT_LOCK_TTL is a dead writer: broken."""
    t = _mk(spark, str(tmp_path / "t"))
    t.COMMIT_LOCK_WAIT = 5.0
    lock = fs.join(t.root, "_commit.lock")
    assert fs.create_exclusive(lock)
    old = time.time() - t.COMMIT_LOCK_TTL - 60
    os.utime(lock, (old, old))
    sid0 = t.current_snapshot_id()
    t._commit([], operation="noop", replaced=set())  # breaks + commits
    assert t.current_snapshot_id() == sid0 + 1
    assert not os.path.exists(lock)


def test_true_conflict_still_raises(spark, tmp_path):
    """Two commits replacing the SAME file: the second (serialized)
    committer sees the file gone from the manifest and raises."""
    t = _mk(spark, str(tmp_path / "t"))
    victim = t.data_files()[0]["file_path"]
    t._commit([], operation="rewrite", replaced={victim})
    with pytest.raises(CommitConflict, match="vanished"):
        t._commit([], operation="rewrite", replaced={victim})


def test_append_rebases_without_blocking(spark, tmp_path, monkeypatch):
    """Optimistic append rebase: another writer lands a full commit
    BETWEEN this append's optimistic manifest read and its lock — the
    append must rebase onto the new head (both snapshots live, no
    retry, no conflict)."""
    t = _mk(spark, str(tmp_path / "t"))
    other = spark.range(500, 550).select(
        F.col("id"), F.concat(F.lit("x"), F.col("id")).alias("val")
    )
    orig = BtrTable._acquire_commit_lock
    fired = []

    def hooked(self, lock):
        if not fired:
            fired.append(1)
            # a competing append commits while we are pre-lock
            t.append(other, job_id="race")
        orig(self, lock)

    monkeypatch.setattr(BtrTable, "_acquire_commit_lock", hooked)
    mine = spark.range(900, 930).select(
        F.col("id"), F.concat(F.lit("y"), F.col("id")).alias("val")
    )
    t.append(mine, job_id="mine")
    assert t.scan().count() == 200 + 50 + 30
    snaps = t.snapshots()
    # mine's parent must be the racer's snapshot (rebased, not lost)
    assert snaps[-1]["parent"] == snaps[-2]["snapshot_id"]


def test_replace_retries_then_conflicts(spark, tmp_path, monkeypatch):
    """A REPLACE commit whose head moves retries against the new head;
    when the new head no longer has its file (a racer replaced it), it
    raises CommitConflict instead of clobbering."""
    t = _mk(spark, str(tmp_path / "t"))
    victim = t.data_files()[0]["file_path"]
    orig = BtrTable._acquire_commit_lock
    fired = []

    def hooked(self, lock):
        if not fired:
            fired.append(1)
            orig2 = BtrTable._acquire_commit_lock
            monkeypatch.setattr(BtrTable, "_acquire_commit_lock", orig)
            t._commit([], operation="rewrite", replaced={victim})
            monkeypatch.setattr(BtrTable, "_acquire_commit_lock", hooked)
        orig(self, lock)

    monkeypatch.setattr(BtrTable, "_acquire_commit_lock", hooked)
    with pytest.raises(CommitConflict, match="vanished"):
        t._commit([], operation="rewrite", replaced={victim})


def test_replace_rebases_over_disjoint_commit(spark, tmp_path, monkeypatch):
    """A REPLACE commit whose head moves by a DISJOINT commit (an
    append) retries and lands cleanly."""
    t = _mk(spark, str(tmp_path / "t"))
    vrow = t.data_files()[0]
    victim, victim_rows = vrow["file_path"], vrow["row_count"]
    other = spark.range(700, 720).select(
        F.col("id"), F.concat(F.lit("z"), F.col("id")).alias("val")
    )
    orig = BtrTable._acquire_commit_lock
    fired = []

    def hooked(self, lock):
        if not fired:
            fired.append(1)
            monkeypatch.setattr(BtrTable, "_acquire_commit_lock", orig)
            t.append(other, job_id="race2")
            monkeypatch.setattr(BtrTable, "_acquire_commit_lock", hooked)
        orig(self, lock)

    monkeypatch.setattr(BtrTable, "_acquire_commit_lock", hooked)
    sid = t._commit([], operation="rewrite", replaced={victim})
    assert sid == t.current_snapshot_id()
    live = {r["file_path"] for r in t.data_files()}
    assert victim not in live
    assert t.scan().count() == 200 - victim_rows + 20
