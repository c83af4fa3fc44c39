"""Incremental rollup maintenance: refresh == full recompute, always."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.operators.rollup import (
    create_rollup,
    refresh_rollup,
    rollup_watermark,
)
from btrblocks_spark.operators.rowops import delete_where
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable

AGGS = {"total": ("sum", "value"), "n_rows": "count"}
KEYS = ["grp"]


def _src_df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp long, value long")


@pytest.fixture()
def src(spark, tmp_path):
    df = _src_df(spark, [(i, i % 5, i * 10) for i in range(50)])
    return BtrTable.create(
        spark, str(tmp_path / "src"), df, num_files=3, job_id="rs0"
    )


def _expected(src):
    return {
        r.grp: (r.total, r.n_rows)
        for r in src.scan()
        .groupBy("grp")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n_rows"))
        .collect()
    }


def _actual(dst):
    return {r.grp: (r.total, r.n_rows) for r in dst.scan().collect()}


def test_create_then_append_refresh(spark, src, tmp_path):
    dst = create_rollup(src, str(tmp_path / "dst"), KEYS, AGGS, job_id="r0")
    assert _actual(dst) == _expected(src)
    assert rollup_watermark(dst) == src.current_snapshot_id()

    src.append(_src_df(spark, [(100, 1, 7), (101, 9, 3)]), job_id="a1")
    res = refresh_rollup(src, dst, KEYS, AGGS, job_id="r1")
    assert not res["noop"]
    got = _actual(dst)
    assert got == _expected(src)
    assert got[9] == (3, 1)  # brand-new group appears
    assert rollup_watermark(dst) == src.current_snapshot_id()


def test_refresh_is_noop_when_unchanged(spark, src, tmp_path):
    dst = create_rollup(src, str(tmp_path / "dst"), KEYS, AGGS, job_id="r0")
    before = dst.current_snapshot_id()
    res = refresh_rollup(src, dst, KEYS, AGGS, job_id="r1")
    assert res["noop"] and dst.current_snapshot_id() == before


def test_upsert_and_delete_refresh(spark, src, tmp_path):
    dst = create_rollup(src, str(tmp_path / "dst"), KEYS, AGGS, job_id="r0")
    # update some rows (changes group sums via delete old + insert new)
    upsert_eq(
        src,
        _src_df(spark, [(0, 0, 999), (1, 1, 999)]),
        on="id",
        job_id="u1",
    )
    # wipe out group 2 entirely -> its rollup row must vanish
    delete_where(src, "grp = 2", strategy="mor", job_id="d1")
    refresh_rollup(src, dst, KEYS, AGGS, job_id="r1")
    got = _actual(dst)
    assert got == _expected(src)
    assert 2 not in got
    assert got[0][0] == sum(i * 10 for i in range(5, 50, 5)) + 999


def test_multiple_windows_accumulate(spark, src, tmp_path):
    dst = create_rollup(src, str(tmp_path / "dst"), KEYS, AGGS, job_id="r0")
    src.append(_src_df(spark, [(200, 3, 1)]), job_id="a1")
    src.append(_src_df(spark, [(201, 3, 2)]), job_id="a2")
    refresh_rollup(src, dst, KEYS, AGGS, job_id="r1")  # folds both commits
    src.append(_src_df(spark, [(202, 3, 4)]), job_id="a3")
    refresh_rollup(src, dst, KEYS, AGGS, job_id="r2")
    assert _actual(dst) == _expected(src)


def test_rejects_unsupported_aggs(spark, src, tmp_path):
    with pytest.raises(ValueError, match="sum/count/min/max"):
        create_rollup(
            src, str(tmp_path / "dst"), KEYS, {"m": ("avg", "value")}
        )


MM_AGGS = {
    "total": ("sum", "value"),
    "lo": ("min", "value"),
    "hi": ("max", "value"),
}


def _mm_expected(src):
    return {
        r.grp: (r.total, r.lo, r.hi, r.n_rows)
        for r in src.scan()
        .groupBy("grp")
        .agg(
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }


def _mm_actual(dst):
    return {
        r.grp: (r.total, r.lo, r.hi, r.n_rows)
        for r in dst.scan().collect()
    }


def test_minmax_insert_only_folds(spark, src, tmp_path):
    dst = create_rollup(src, str(tmp_path / "dst"), KEYS, MM_AGGS,
                        job_id="m0")
    assert _mm_actual(dst) == _mm_expected(src)
    src.append(_src_df(spark, [(100, 1, -5), (101, 9, 999)]), job_id="a1")
    refresh_rollup(src, dst, KEYS, MM_AGGS, job_id="m1")
    got = _mm_actual(dst)
    assert got == _mm_expected(src)
    assert got[1][1] == -5 and got[9] == (999, 999, 999, 1)


def test_minmax_delete_recomputes_group(spark, src, tmp_path):
    """Deleting the extremum row must surface the runner-up (exact
    per-group recompute), while untouched groups fold incrementally."""
    dst = create_rollup(src, str(tmp_path / "dst"), KEYS, MM_AGGS,
                        job_id="m0")
    # grp 4 holds ids 4,9,...,49: max value 490 (id 49), min 40 (id 4)
    delete_where(src, "id = 49", strategy="mor", job_id="d1")
    src.append(_src_df(spark, [(200, 0, 123)]), job_id="a2")
    refresh_rollup(src, dst, KEYS, MM_AGGS, job_id="m2")
    got = _mm_actual(dst)
    assert got == _mm_expected(src)
    assert got[4][2] == 440  # runner-up max after deleting id 49
    # update (delete+insert) of a min row: new extremum exact
    upsert_eq(
        src, _src_df(spark, [(4, 4, 9999)]).withColumn(
            "id", F.col("id")
        ), on="id", job_id="u1",
    )
    refresh_rollup(src, dst, KEYS, MM_AGGS, job_id="m3")
    got = _mm_actual(dst)
    assert got == _mm_expected(src)
    assert got[4][1] == 90  # old min 40 replaced; next-lowest is 90
    # vanished group removal still works with mm aggs
    delete_where(src, "grp = 9", strategy="mor", job_id="d2")
    refresh_rollup(src, dst, KEYS, MM_AGGS, job_id="m4")
    assert 9 not in _mm_actual(dst)
    assert _mm_actual(dst) == _mm_expected(src)


def test_watermark_requires_rollup_table(spark, src):
    with pytest.raises(KeyError, match="watermark"):
        rollup_watermark(src)


def test_null_group_key_refresh(spark, tmp_path):
    """NULL is a legitimate grouping key (groupBy emits it): the rollup
    must fold into it (null-safe join), and empty it via the null=null
    equality-delete path when the group vanishes."""
    df = _src_df(spark, [(0, None, 5), (1, None, 7), (2, 1, 3)])
    src = BtrTable.create(spark, str(tmp_path / "nsrc"), df, job_id="ns0")
    dst = create_rollup(src, str(tmp_path / "ndst"), KEYS, AGGS, job_id="nr0")
    assert _actual(dst)[None] == (12, 2)

    src.append(_src_df(spark, [(3, None, 8), (4, 1, 1)]), job_id="na1")
    refresh_rollup(src, dst, KEYS, AGGS, job_id="nr1")
    got = _actual(dst)
    assert got == _expected(src)
    assert got[None] == (20, 3)

    delete_where(src, "grp IS NULL", strategy="mor", job_id="nd1")
    refresh_rollup(src, dst, KEYS, AGGS, job_id="nr2")
    got = _actual(dst)
    assert None not in got
    assert got == _expected(src)


def test_minmax_multikey_delete(spark, tmp_path):
    """Multi-key rollups skip the advisory prune (semijoin-only path);
    extremum deletes still recompute exactly per composite group."""
    df = spark.createDataFrame(
        [(i, i % 2, i % 3, i * 10) for i in range(30)],
        "id long, a long, b long, value long",
    )
    src = BtrTable.create(
        spark, str(tmp_path / "src"), df, num_files=2, job_id="mk0"
    )
    keys = ["a", "b"]
    aggs = {"hi": ("max", "value"), "n_rows": "count"}
    dst = create_rollup(src, str(tmp_path / "dst"), keys, aggs,
                        job_id="mk1")

    def expected():
        return {
            (r.a, r.b): (r.hi, r.n_rows)
            for r in src.scan()
            .groupBy("a", "b")
            .agg(F.max("value").alias("hi"), F.count("*").alias("n_rows"))
            .collect()
        }

    # id 29 holds the max of group (a=1, b=2): value 290
    delete_where(src, "id = 29", strategy="mor", job_id="mkd")
    refresh_rollup(src, dst, keys, aggs, job_id="mk2")
    got = {(r.a, r.b): (r.hi, r.n_rows) for r in dst.scan().collect()}
    assert got == expected()
    assert got[(1, 2)][0] == 230  # runner-up in that composite group


def test_approx_distinct_insert_fold_and_delete_recompute(
    spark, tmp_path
):
    """approx_distinct keeps a mergeable bottom-k KMV sketch per group:
    insert-only refreshes union sketches; a delete dirties the group
    and recomputes its sketch exactly — refresh == full recompute on
    both the estimate and the state array."""
    from btrblocks_spark.operators.merge import merge_into

    df = _src_df(
        spark, [(i, i % 3, (i * 7) % 11) for i in range(60)]
    )
    src = BtrTable.create(
        spark, str(tmp_path / "asrc"), df, num_files=2, job_id="ks0"
    )
    aggs = {
        "total": ("sum", "value"),
        "uniq_vals": ("approx_distinct", "value"),
    }
    dst = create_rollup(src, str(tmp_path / "adst"), KEYS, aggs,
                        job_id="kr0")

    def expected():
        return {
            r.grp: (r.uniq, r.n)
            for r in src.scan()
            .groupBy("grp")
            .agg(
                F.countDistinct("value").alias("uniq"),
                F.count("*").alias("n"),
            )
            .collect()
        }

    def got():
        return {
            r.grp: (r.uniq_vals, r.n_rows)
            for r in dst.scan().collect()
        }

    # below k=256 distinct per group the KMV estimate is EXACT
    assert got() == expected()

    # window 1: inserts with new + overlapping values -> sketch union
    src.append(
        _src_df(spark, [(100 + i, i % 3, 50 + i) for i in range(20)]),
        job_id="ks1",
    )
    refresh_rollup(src, dst, KEYS, aggs, job_id="kr1")
    assert got() == expected()

    # window 2: delete rows (MOR) -> dirty groups recompute exactly
    dels = src.scan(columns=["id", "grp", "value"]).filter(
        F.col("id") % 4 == 0
    )
    merge_into(src, dels, on="id", strategy="mor",
               when_matched="delete", when_not_matched="ignore",
               job_id="ks2")
    refresh_rollup(src, dst, KEYS, aggs, job_id="kr2")
    assert got() == expected()

    # state parity with a from-scratch rollup at the same snapshot
    fresh = create_rollup(src, str(tmp_path / "afresh"), KEYS, aggs,
                          job_id="kr3")
    inc_state = {
        r.grp: list(r["_kmv_uniq_vals"])
        for r in dst.scan(
            columns=["grp", "_kmv_uniq_vals"]
        ).collect()
    }
    full_state = {
        r.grp: list(r["_kmv_uniq_vals"])
        for r in fresh.scan(
            columns=["grp", "_kmv_uniq_vals"]
        ).collect()
    }
    assert inc_state == full_state
