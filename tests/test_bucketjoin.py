"""Storage-partitioned bucket join: shuffle-free, delete-aware, and
refusing inputs it cannot join correctly."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.operators.bucketjoin import bucket_join
from btrblocks_spark.sources.table import BtrTable


def _orders(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("okey"),
        (F.col("id") % 37).alias("custkey"),
        (F.col("id") * 1.5).alias("total"),
    )


def _custs(spark, n=37):
    return spark.range(n).select(
        F.col("id").alias("ckey"),
        F.concat(F.lit("cust_"), F.col("id")).alias("cname"),
        (F.col("id") % 5).alias("segment"),
    )


@pytest.fixture()
def tables(spark, tmp_path):
    ta = BtrTable.create(
        spark, str(tmp_path / "a"), _orders(spark),
        partition_by=["bucket(8, custkey)"], num_files=2, job_id="bja",
    )
    tb = BtrTable.create(
        spark, str(tmp_path / "b"), _custs(spark),
        partition_by=["bucket(8, ckey)"], num_files=2, job_id="bjb",
    )
    return ta, tb


def test_inner_matches_spark_join(spark, tables):
    ta, tb = tables
    got = bucket_join(ta, tb, on=("custkey", "ckey")).toPandas()
    exp = (
        _orders(spark)
        .join(_custs(spark), F.col("custkey") == F.col("ckey"), "inner")
        .drop("ckey")
        .toPandas()
    )
    cols = sorted(exp.columns)
    key = ["okey"]
    got_s = got[cols].sort_values(key).reset_index(drop=True)
    exp_s = exp[cols].sort_values(key).reset_index(drop=True)
    assert got_s.equals(exp_s.astype(got_s.dtypes.to_dict()))


def test_left_join_and_column_projection(spark, tables):
    ta, tb = tables
    # drop some customers so left rows go unmatched
    small = _custs(spark).filter(F.col("ckey") < 20)
    tb2 = BtrTable.create(
        spark, tb.root + "2", small,
        partition_by=["bucket(8, ckey)"], num_files=1, job_id="bjc",
    )
    got = bucket_join(
        ta, tb2, on=("custkey", "ckey"), how="left",
        columns=["okey", "custkey"], columns_b=["cname"],
    ).toPandas()
    assert len(got) == 400
    assert set(got.columns) == {"okey", "custkey", "cname"}
    unmatched = got[got["custkey"] >= 20]
    assert len(unmatched) > 0 and unmatched["cname"].isna().all()
    matched = got[got["custkey"] < 20]
    assert (matched["cname"] == "cust_" + matched["custkey"].astype(str)).all()


def test_no_join_or_data_shuffle_in_plan(spark, tables):
    ta, tb = tables
    df = bucket_join(ta, tb, on=("custkey", "ckey"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the join happens inside mapInArrow: Catalyst sees NO join operator
    # and the only exchange moves the N spec rows, never data
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "PythonMapInArrow" in plan


def test_mor_deletes_are_applied(spark, tables):
    ta, tb = tables
    from btrblocks_spark.operators.rowops import delete_where

    delete_where(ta, "okey < 50", strategy="mor", job_id="bjd")
    got = bucket_join(ta, tb, on=("custkey", "ckey")).toPandas()
    assert (got["okey"] >= 50).all()
    assert len(got) == 350


def test_refusals(spark, tables, tmp_path):
    ta, tb = tables
    # bucket-count mismatch
    tb16 = BtrTable.create(
        spark, str(tmp_path / "b16"), _custs(spark),
        partition_by=["bucket(16, ckey)"], num_files=1, job_id="bje",
    )
    with pytest.raises(ValueError, match="transforms differ"):
        bucket_join(ta, tb16, on=("custkey", "ckey"))
    # unbucketed side
    plain = BtrTable.create(
        spark, str(tmp_path / "plain"), _custs(spark), job_id="bjf",
    )
    with pytest.raises(ValueError, match="no active partition transform"):
        bucket_join(ta, plain, on=("custkey", "ckey"))
    # pre-spec files must be migrated first
    pre = BtrTable.create(
        spark, str(tmp_path / "pre"), _custs(spark), job_id="bjg",
    )
    pre.evolve_partition_spec(["bucket(8, ckey)"])
    with pytest.raises(ValueError, match="predate the"):
        bucket_join(ta, pre, on=("custkey", "ckey"))


def test_same_key_name_and_suffix(spark, tmp_path):
    a = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    b = spark.range(80).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    ta = BtrTable.create(
        spark, str(tmp_path / "sa"), a,
        partition_by=["bucket(4, k)"], num_files=1, job_id="bjh",
    )
    tb = BtrTable.create(
        spark, str(tmp_path / "sb"), b,
        partition_by=["bucket(4, k)"], num_files=1, job_id="bji",
    )
    got = bucket_join(ta, tb, on="k").toPandas()
    assert set(got.columns) == {"k", "v", "v_r"}
    assert len(got) == 80
    assert (got["v_r"] == got["k"] * 3).all()


def test_hot_bucket_splits_across_tasks(spark, tmp_path):
    """A skewed bucket (many A files) is split into several spec rows
    (each re-reading the bucket's small B side) so one hot bucket never
    pins a single task; results are unchanged."""
    a = spark.range(300).select(
        F.lit(5).alias("k"), F.col("id").alias("v")  # ONE hot key
    )
    b = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("p")
    )
    ta = BtrTable.create(
        spark, str(tmp_path / "hot_a"), a,
        partition_by=["bucket(4, k)"], num_files=6, job_id="bjs0",
    )
    tb = BtrTable.create(
        spark, str(tmp_path / "hot_b"), b,
        partition_by=["bucket(4, k)"], num_files=1, job_id="bjs1",
    )
    got = bucket_join(
        ta, tb, on="k", max_files_per_task=2
    ).toPandas()
    assert len(got) == 300
    assert (got["p"] == 35).all()
    # left join across chunks keeps every A row exactly once
    left = bucket_join(
        ta, tb, on="k", how="left", max_files_per_task=2
    ).toPandas()
    assert len(left) == 300


def test_renamed_payload_column_decodes_from_old_files(spark, tables):
    """Files written before a rename store the column under its OLD
    name; the kernel resolves the same alias chains scan() uses, so
    pre-rename files must not decode the renamed column as NULL."""
    ta, tb = tables
    tb.rename_column("cname", "display_name")
    got = bucket_join(
        ta, tb, on=("custkey", "ckey"),
        columns=["okey", "custkey"], columns_b=["display_name"],
    ).toPandas()
    assert len(got) == 400
    assert got["display_name"].notna().all()
    assert (
        got["display_name"] == "cust_" + got["custkey"].astype(str)
    ).all()


def test_days_copartition_join(spark, tmp_path):
    """Any matching transform co-locates: two days(ts)-partitioned
    event tables join day-by-day with zero shuffle (the time-series
    case; truncate() works identically)."""
    import datetime as dt

    rows_a = [
        (i, dt.datetime(2024, 1, 1 + i % 5, 10, 0), i * 1.0)
        for i in range(200)
    ]
    rows_b = [
        (dt.datetime(2024, 1, 1 + d, 10, 0), f"day{d}")
        for d in range(5)
    ]
    a = spark.createDataFrame(rows_a, "eid long, ts timestamp, v double")
    b = spark.createDataFrame(rows_b, "ts timestamp, label string")
    ta = BtrTable.create(
        spark, str(tmp_path / "da"), a,
        partition_by=["days(ts)"], num_files=2, job_id="dj0",
    )
    tb = BtrTable.create(
        spark, str(tmp_path / "db"), b,
        partition_by=["days(ts)"], num_files=1, job_id="dj1",
    )
    got = bucket_join(ta, tb, on="ts").toPandas()
    assert len(got) == 200
    assert (
        got["label"] == "day" + (got["eid"] % 5).astype(str)
    ).all()


def test_semi_and_anti_membership(spark, tmp_path):
    """leftsemi keeps A rows whose key exists in B, leftanti drops them
    — including A buckets with NO B files at all (anti keeps them
    whole) — with zero shuffle."""
    a = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    b = spark.range(30).select((F.col("id") * 3).alias("k"))
    ta = BtrTable.create(
        spark, str(tmp_path / "ma"), a,
        partition_by=["bucket(4, k)"], num_files=2, job_id="sm0",
    )
    tb = BtrTable.create(
        spark, str(tmp_path / "mb"), b,
        partition_by=["bucket(4, k)"], num_files=1, job_id="sm1",
    )
    semi = bucket_join(ta, tb, on="k", how="leftsemi").toPandas()
    anti = bucket_join(ta, tb, on="k", how="leftanti").toPandas()
    member = {i * 3 for i in range(30)}
    assert set(semi["k"]) == {k for k in range(100) if k in member}
    assert set(anti["k"]) == {k for k in range(100) if k not in member}
    assert len(semi) + len(anti) == 100
    assert set(semi.columns) == set(anti.columns) == {"k", "v"}
    # anti with an entirely absent B table side
    empty_b = BtrTable.create(
        spark, str(tmp_path / "me"),
        spark.range(0).select(F.col("id").alias("k")),
        partition_by=["bucket(4, k)"], num_files=1, job_id="sm2",
    )
    anti_all = bucket_join(
        ta, empty_b, on="k", how="leftanti"
    ).toPandas()
    assert len(anti_all) == 100


def test_mor_deletes_on_right_side(spark, tables):
    """Positional deletes on the B side are merged at decode time too:
    deleted customers stop matching (inner) and null out (left)."""
    ta, tb = tables
    from btrblocks_spark.operators.rowops import delete_where

    delete_where(tb, "ckey < 10", strategy="mor", job_id="bjr0")
    inner = bucket_join(ta, tb, on=("custkey", "ckey")).toPandas()
    assert (inner["custkey"] >= 10).all()
    left = bucket_join(
        ta, tb, on=("custkey", "ckey"), how="left",
        columns=["okey", "custkey"], columns_b=["cname"],
    ).toPandas()
    assert len(left) == 400
    assert left[left["custkey"] < 10]["cname"].isna().all()
    assert left[left["custkey"] >= 10]["cname"].notna().all()
