"""Merge-on-read MERGE (positional delete files, Iceberg v2 semantics),
delete-aware scans/compaction, and bloom-digest touched-file discovery."""

import pytest

from pyspark.sql import functions as F

from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.sources.table import BtrTable


def _mk_table(spark, root, n=1000, num_files=4, bloom=False):
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") % 13).alias("grp2"),
    )
    return BtrTable.create(
        spark,
        root,
        df,
        num_files=num_files,
        job_id="base",
        bloom_cols=["id"] if bloom else None,
    )


def _source(spark, ids, tag="NEW"):
    return (
        spark.createDataFrame([(i,) for i in ids], "id long")
        .select(
            "id",
            F.concat(F.lit(tag), F.col("id")).alias("val"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") % 13).alias("grp2"),
        )
    )


def test_mor_update_insert_scan(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t1"))
    src = _source(spark, [5, 17, 423, 1500, 1501])  # 3 updates, 2 inserts
    res = merge_into(t, src, on="id", strategy="mor", job_id="m1")
    assert res["strategy"] == "mor"
    assert res["delete_rows"] == 3
    assert res["delete_files"] >= 1
    assert res["new_files"] >= 1

    got = {r.id: r.val for r in t.scan().collect()}
    assert len(got) == 1002
    assert got[5] == "NEW5" and got[423] == "NEW423"
    assert got[1500] == "NEW1500" and got[1501] == "NEW1501"
    assert got[6] == "v6"  # untouched


def test_mor_delete_only(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t2"), n=500)
    src = _source(spark, [0, 100, 499])
    res = merge_into(
        t, src, on="id", strategy="mor",
        when_matched="delete", when_not_matched="ignore", job_id="m2",
    )
    assert res["delete_rows"] == 3 and res["new_files"] == 0
    ids = {r.id for r in t.scan(columns=["id"]).collect()}
    assert len(ids) == 497 and ids.isdisjoint({0, 100, 499})


def test_mor_stacked_merges_and_cow_after_mor(spark, tmp_path):
    """Second MOR merge on top of existing deletes, then a staged CoW
    merge — deleted rows must never resurrect."""
    t = _mk_table(spark, str(tmp_path / "t3"), n=400)
    merge_into(
        t, _source(spark, [1, 2, 3]), on="id", strategy="mor",
        when_matched="delete", when_not_matched="ignore", job_id="m3a",
    )
    # re-insert id=2 via MOR (now unmatched -> insert), update id=4
    merge_into(
        t, _source(spark, [2, 4], tag="R"), on="id", strategy="mor",
        job_id="m3b",
    )
    got = {r.id: r.val for r in t.scan().collect()}
    assert 1 not in got and 3 not in got
    assert got[2] == "R2" and got[4] == "R4"
    assert len(got) == 398  # 400 - 3 deleted + 1 reinserted (update adds no key)

    # CoW staged merge afterwards: rewrites files physically; earlier
    # delete positions must be honored by its read kernel
    merge_into(t, _source(spark, [5, 6], tag="C"), on="id", job_id="m3c")
    got2 = {r.id: r.val for r in t.scan().collect()}
    assert 1 not in got2 and 3 not in got2
    assert got2[2] == "R2" and got2[5] == "C5" and got2[6] == "C6"
    assert len(got2) == 398


def test_compact_absorbs_deletes(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t4"), n=600)
    merge_into(
        t, _source(spark, [10, 11, 300]), on="id", strategy="mor",
        job_id="m4",
    )
    assert len(t.delete_files()) >= 1
    before = {r.id: r.val for r in t.scan().collect()}
    res = compact(t, job_id="c4")
    assert res["absorbed_delete_files"] >= 1
    assert t.delete_files() == []
    after = {r.id: r.val for r in t.scan().collect()}
    assert after == before
    # physical rows are clean now: raw scan without delete merge matches too
    raw = {r.id: r.val for r in t.scan(apply_deletes=False).collect()}
    assert raw == before


def test_mor_positions_survive_zone_skip_keyscan(spark, tmp_path):
    """Keyscan uses prune + block skip; positions must stay file-global
    so the delete files point at the right rows."""
    df = spark.range(4000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val"),
        (F.col("id") % 7).alias("grp"),
    )
    t = BtrTable.create(
        spark, str(tmp_path / "t5"), df.orderBy("id").coalesce(1),
        num_files=2, block_rows=512, job_id="base",
    )
    src = _source(spark, [3777])
    merge_into(t, src, on="id", strategy="mor", job_id="m5")
    got = {r.id: r.val for r in t.scan().collect()}
    assert got[3777] == "NEW3777" and len(got) == 4000


def test_bloom_skips_unmatched_files(spark, tmp_path):
    """Files whose key bloom rejects every source key are dropped from
    the keyscan candidate list without being opened."""
    # two disjoint key populations with OVERLAPPING ranges: evens and
    # odds — a range prune alone cannot separate them
    even = spark.range(500).select(
        (F.col("id") * 2).alias("id"),
        F.lit("e").alias("val"), F.lit(0).alias("grp"),
    )
    odd = spark.range(500).select(
        (F.col("id") * 2 + 1).alias("id"),
        F.lit("o").alias("val"), F.lit(0).alias("grp"),
    )
    root = str(tmp_path / "t6")
    t = BtrTable.create(
        spark, root, even, num_files=2, job_id="ev", bloom_cols=["id"]
    )
    t.append(odd, num_files=2, job_id="od")
    assert len(t.data_files()) == 4

    src = _source(spark, [100, 200, 320])  # even keys only
    res = merge_into(t, src, on="id", job_id="m6")
    assert res["bloom_skipped_files"] >= 1  # odd files never opened
    got = {r.id: r.val for r in t.scan().collect()}
    assert got[100] == "NEW100" and got[101] == "o"
    assert len(got) == 1000

    # same discovery works for MOR
    src2 = _source(spark, [101, 321], tag="M")  # odd keys only
    res2 = merge_into(t, src2, on="id", strategy="mor", job_id="m7")
    assert res2["bloom_skipped_files"] >= 1
    got2 = {r.id: r.val for r in t.scan().collect()}
    assert got2[101] == "M101" and got2[100] == "NEW100"


def test_cluster_refuses_deletes_until_compacted(spark, tmp_path):
    from btrblocks_spark.operators.cluster import cluster

    t = _mk_table(spark, str(tmp_path / "t7"), n=300)
    merge_into(
        t, _source(spark, [7]), on="id", strategy="mor", job_id="m8"
    )
    with pytest.raises(RuntimeError, match="delete files"):
        cluster(t, by=("id", "grp", "grp2"), job_id="z8")
    compact(t, job_id="c8")
    res = cluster(t, by=("id", "grp", "grp2"), job_id="z9", max_rows_per_file=200)
    assert res["rewritten_files"] >= 1


def test_string_key_blooms_skip_files(spark, tmp_path):
    """The north-rule merge key (image_id) is a STRING: string keys get
    crc-folded blooms and MERGE discovery skips files the same way."""
    # interleaved zero-padded ids: the two populations' LEXICAL ranges
    # overlap completely, so only the blooms can separate them
    a = spark.range(400).select(
        F.concat(F.lit("img-"), F.lpad(F.col("id") * 2, 6, "0"))
        .alias("image_id"),
        F.lit("A").alias("val"), F.lit(0).alias("grp"),
        F.lit(0).alias("grp2"),
    )
    b = spark.range(400).select(
        F.concat(F.lit("img-"), F.lpad(F.col("id") * 2 + 1, 6, "0"))
        .alias("image_id"),
        F.lit("B").alias("val"), F.lit(0).alias("grp"),
        F.lit(0).alias("grp2"),
    )
    root = str(tmp_path / "sb")
    t = BtrTable.create(
        spark, root, a, num_files=2, job_id="fa", bloom_cols=["image_id"]
    )
    t.append(b, num_files=2, job_id="fb")

    src = spark.createDataFrame(
        [("img-000014", "N", 0, 0), ("img-000500", "N", 0, 0)],
        "image_id string, val string, grp long, grp2 long",
    )  # even keys only -> the odd-population files never open
    res = merge_into(t, src, on="image_id", job_id="sm1")
    assert res["bloom_skipped_files"] >= 1
    got = {r.image_id: r.val for r in t.scan().collect()}
    assert got["img-000014"] == "N" and got["img-000015"] == "B"
    assert len(got) == 800
    # string lookup rides the same blooms
    row = t.lookup("image_id", "img-000123").collect()
    assert len(row) == 1 and row[0].val == "B"


def test_rewrite_position_deletes_merges_files(spark, tmp_path):
    """Three MOR merges -> three+ delete files; the rewrite job unions
    them into the minimal sorted set (dupes and dead references dropped)
    without touching data, and the scan result is unchanged."""
    from pyspark.sql import functions as F

    from btrblocks_spark.operators.merge import (
        merge_into,
        rewrite_position_deletes,
    )
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    df = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = BtrTable.create(spark, root, df, num_files=6)
    for lo in (0, 10, 10):  # third merge re-deletes the same positions
        src = spark.range(lo, lo + 20).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        )
        merge_into(t, src, on="k", strategy="mor")
    before = t.delete_files()
    assert len(before) >= 3
    want = {(r.k, r.v) for r in t.scan().collect()}

    out = rewrite_position_deletes(t)
    assert out["delete_files_after"] < out["delete_files_before"]
    after = t.delete_files()
    assert len(after) == out["delete_files_after"]
    got = {(r.k, r.v) for r in t.scan().collect()}
    assert got == want
    # duplicate (file, pos) rows from the re-delete collapsed
    assert out["delete_rows"] <= sum(r["row_count"] for r in before)


def test_rewrite_position_deletes_noop_below_threshold(spark, tmp_path):
    from pyspark.sql import functions as F

    from btrblocks_spark.operators.merge import rewrite_position_deletes
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    t = BtrTable.create(
        spark, root,
        spark.range(50).select(F.col("id").alias("k")),
    )
    assert rewrite_position_deletes(t)["noop"] is True


def test_big_table_scan_branch_applies_deletes(spark, tmp_path, monkeypatch):
    """Above SCAN_PLAN_DF_MIN files the scan plans through the manifest
    DataFrame and positional-delete association becomes a Spark-side
    lineage join (explode source_files -> per-file _dels lists) — the
    driver must not collect delete rows, and results must equal the
    small-table branch exactly (incl. a pruned scan and _file/_pos)."""
    t = _mk_table(spark, str(tmp_path / "tb"), n=500, num_files=5)
    merge_into(
        t, _source(spark, [7, 120, 488]), on="id", strategy="mor",
        when_matched="delete", when_not_matched="ignore", job_id="d1",
    )
    merge_into(t, _source(spark, [8, 9], tag="U"), on="id", job_id="u1",
               strategy="mor")
    small = sorted(
        (r.id, r.val) for r in t.scan(columns=["id", "val"]).collect()
    )
    small_pruned = sorted(
        r.id for r in t.scan(
            columns=["id"], prune={"id": (100, 130)}
        ).collect()
    )
    monkeypatch.setattr(BtrTable, "SCAN_PLAN_DF_MIN", 1)
    big = sorted(
        (r.id, r.val) for r in t.scan(columns=["id", "val"]).collect()
    )
    assert big == small and 7 not in {i for i, _ in big}
    assert ("U8" in {v for _, v in big})
    big_pruned = sorted(
        r.id for r in t.scan(
            columns=["id"], prune={"id": (100, 130)}
        ).collect()
    )
    assert big_pruned == small_pruned and 120 not in big_pruned
    # JVM batch path must still refuse delete-bearing snapshots on the
    # big branch (delete discovery is join-side there, not a closure)
    with pytest.raises(ValueError, match="delete files"):
        t.scan(columns=["id"], native_io=False).collect()
