"""Binned range join: exact point-in-interval semantics, no cartesian."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.functions.rangejoin import range_join


def _brute(points, intervals):
    return sorted(
        (p[0], iv[0])
        for p in points
        for iv in intervals
        if iv[1] <= p[1] < iv[2]
    )


@pytest.mark.parametrize("w", [1.0, 7.0, 100.0, 10000.0])
def test_matches_brute_force_any_bin_width(spark, w):
    import random

    rng = random.Random(7)
    points = [(i, float(rng.randint(0, 1000))) for i in range(200)]
    intervals = [
        (j, float(s := rng.randint(0, 990)), float(s + rng.randint(0, 40)))
        for j in range(80)
    ]
    lt = spark.createDataFrame(points, "pid long, x double")
    rt = spark.createDataFrame(intervals, "iid long, lo double, hi double")
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(lt, rt, "x", "lo", "hi", bin_width=w).collect()
    )
    assert got == _brute(points, intervals)


def test_half_open_boundaries(spark):
    lt = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid long, x double")
    rt = spark.createDataFrame([(9, 10.0, 20.0)], "iid long, lo double, hi double")
    got = [(r.pid, r.iid) for r in
           range_join(lt, rt, "x", "lo", "hi", bin_width=10.0).collect()]
    assert got == [(1, 9)]  # start inclusive, end exclusive


def test_empty_and_inverted_intervals_drop(spark):
    lt = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    rt = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 9.0, 3.0)], "iid long, lo double, hi double"
    )
    assert range_join(lt, rt, "x", "lo", "hi", bin_width=2.0).count() == 0


def test_by_keys_and_timestamps(spark):
    lt = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:30"), (2, "b", "2024-01-01 00:00:30")],
        "pid long, k string, ts_s string",
    ).select("pid", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    rt = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 00:01:00", 77)],
        "k string, s_s string, e_s string, tag long",
    ).select(
        "k",
        F.col("s_s").cast("timestamp").alias("s"),
        F.col("e_s").cast("timestamp").alias("e"),
        "tag",
    )
    got = range_join(lt, rt, "ts", "s", "e", by="k", bin_width_s=60).collect()
    assert [(r.pid, r.tag) for r in got] == [(1, 77)]


def test_ambiguous_columns_rejected(spark):
    lt = spark.createDataFrame([(1, 1.0)], "x long, v double")
    rt = spark.createDataFrame([(2, 0.0, 2.0)], "x long, lo double, hi double")
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(lt, rt, "v", "lo", "hi", bin_width=1.0)


def test_no_cartesian_in_plan(spark):
    """The physical plan must be a shuffle equi-join on the bin, never
    BroadcastNestedLoop/Cartesian."""
    lt = spark.range(100).select(F.col("id").alias("pid"),
                                 (F.col("id") * 1.0).alias("x"))
    rt = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 2.0).alias("lo"),
        (F.col("id") * 2.0 + 3.0).alias("hi"),
    )
    plan = range_join(lt, rt, "x", "lo", "hi", bin_width=4.0)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
