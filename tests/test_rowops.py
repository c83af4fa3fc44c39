"""DELETE WHERE / UPDATE WHERE row-level ops (MOR + CoW strategies)."""

from pyspark.sql import functions as F

from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.rowops import (
    _stats_prune_from_predicate,
    delete_where,
    update_where,
)
from btrblocks_spark.sources.table import BtrTable


def _mk_table(spark, root, n=1000, num_files=4):
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
        (F.col("id") % 7).alias("grp"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("score"),
    )
    return BtrTable.create(spark, root, df, num_files=num_files, job_id="base")


def test_delete_where_mor(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    res = delete_where(t, "grp = 3", strategy="mor")
    assert res["strategy"] == "mor"
    assert res["deleted_rows"] == len([i for i in range(1000) if i % 7 == 3])
    got = t.scan().select("id").collect()
    assert len(got) == 1000 - res["deleted_rows"]
    assert all(r.id % 7 != 3 for r in got)
    # nothing rewritten: data files unchanged, only delete files added
    assert all(
        r["job_id"] == "base" for r in t.data_files()
    )


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    # score is NULL for id%10==0; "score < 100" is NULL there -> keep
    t = _mk_table(spark, str(tmp_path / "t"))
    res = delete_where(t, "score < 100", strategy="mor")
    # score = 2*id < 100 and not null -> id < 50 and id%10 != 0 (45 rows)
    assert res["deleted_rows"] == 45
    ids = {r.id for r in t.scan().select("id").collect()}
    assert 0 in ids and 10 in ids  # NULL-score rows kept
    assert 1 not in ids and 49 not in ids


def test_delete_where_cow(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    res = delete_where(t, "id >= 900", strategy="cow")
    assert res["strategy"] == "cow"
    assert res["deleted_rows"] == 100
    assert t.delete_files() == []  # CoW leaves no delete files
    got = t.scan().select("id").collect()
    assert len(got) == 900 and max(r.id for r in got) == 899


def test_delete_where_noop(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n=100)
    sid = t.current_snapshot_id()
    res = delete_where(t, "id > 10000", strategy="mor")
    assert res.get("noop") and t.current_snapshot_id() == sid


def test_update_where_mor(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    res = update_where(
        t,
        {"val": "concat('UPD', id)", "score": "score + 1"},
        "id % 100 = 7",
        strategy="mor",
    )
    assert res["strategy"] == "mor" and res["updated_rows"] == 10
    got = {r.id: (r.val, r.score) for r in t.scan().collect()}
    assert len(got) == 1000
    assert got[7] == ("UPD7", 15) and got[907] == ("UPD907", 1815)
    assert got[8] == ("v8", 16)  # untouched


def test_update_where_cow(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n=500)
    res = update_where(
        t, {"grp": "grp + 100"}, "grp = 0", strategy="cow"
    )
    assert res["strategy"] == "cow"
    assert res["updated_rows"] == len([i for i in range(500) if i % 7 == 0])
    got = {r.id: r.grp for r in t.scan().collect()}
    assert len(got) == 500
    assert got[0] == 100 and got[7] == 100 and got[1] == 1


def test_delete_then_compact_absorbs(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    delete_where(t, "id < 100", strategy="mor")
    assert t.delete_files()
    compact(t, job_id="c1")
    assert t.delete_files() == []
    got = t.scan().select("id").collect()
    assert len(got) == 900 and min(r.id for r in got) == 100


def test_cow_after_mor_absorbs_covered_deletes(spark, tmp_path):
    # MOR delete shadows some rows; a later CoW delete that rewrites the
    # same files must drop the now-covered delete files from the manifest
    t = _mk_table(spark, str(tmp_path / "t"))
    delete_where(t, "id % 2 = 0", strategy="mor")
    n_del_files = len(t.delete_files())
    assert n_del_files > 0
    res = delete_where(t, "id < 500", strategy="cow")
    assert res["deleted_rows"] == 250  # odd ids below 500
    assert t.delete_files() == []
    got = sorted(r.id for r in t.scan().select("id").collect())
    assert got[0] == 501 and len(got) == 250
    assert all(i % 2 == 1 for i in got)


def test_stats_prune_extraction(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"), n=10)
    assert _stats_prune_from_predicate(t, "id >= 5 AND id < 9") == {
        "id": (5, 9)
    }
    assert _stats_prune_from_predicate(t, "grp = 3") == {"grp": (3, 3)}
    # OR disables pruning entirely (disjunction can't narrow a range)
    assert _stats_prune_from_predicate(t, "id < 5 OR grp = 3") is None
    # function-wrapped columns must NOT prune (abs(score) > 10 admits
    # score < -10 too — the bare-identifier regex correctly misses it)
    assert _stats_prune_from_predicate(t, "abs(score) > 10") is None


def test_delete_prunes_files(spark, tmp_path):
    # range-sliced files: a selective predicate must not rescan all files
    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    t = BtrTable.create(
        spark,
        str(tmp_path / "t"),
        df.orderBy("id").coalesce(1),
        num_files=1,
        max_rows_per_file=250,
        job_id="base",
    )
    assert len(t.data_files()) == 4
    res = delete_where(t, "id >= 990", strategy="cow")
    assert res["rewritten_files"] == 1  # only the [750,1000) slice
    assert t.scan().count() == 990
