"""KMV distinct sketch + ASOF join."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from btrblocks_spark.functions.asof import asof_join
from btrblocks_spark.functions.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select((F.col("id") % 40).alias("x"))
    row = kmv_distinct(df, "x", k=256).collect()[0]
    assert row.k_count == 40 and row.est_distinct == 40


def test_kmv_estimate_accuracy(spark):
    # 10^4 distinct values, k=256 -> stderr ~ 1/sqrt(254) ~ 6.3%
    df = spark.range(30000).select((F.col("id") % 10000).alias("x"))
    row = kmv_distinct(df, "x", k=256).collect()[0]
    assert row.k_count == 256
    assert abs(row.est_distinct - 10000) / 10000 < 0.2


def test_kmv_insensitive_to_duplication(spark):
    a = spark.range(5000).select((F.col("id") % 1000).alias("x"))
    b = a.union(a).union(a)  # same distinct set, 3x rows
    ra = kmv_distinct(a, "x", k=128).collect()[0]
    rb = kmv_distinct(b, "x", k=128).collect()[0]
    assert ra.kth_hash == rb.kth_hash and ra.est_distinct == rb.est_distinct


def _rand_events(seed, n_left=400, n_right=150, users=20):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "uid": rng.integers(0, users, n_left),
            "ts": rng.integers(0, 100000, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "uid": rng.integers(0, users, n_right),
            "ts": rng.integers(0, 100000, n_right).astype("int64"),
            "rv": rng.integers(0, 10**6, n_right).astype("int64"),
        }
    )
    # force some exact-timestamp collisions to pin inclusive semantics
    right.loc[: n_right // 10, "ts"] = left.loc[: n_right // 10, "ts"].values
    right.loc[: n_right // 10, "uid"] = left.loc[: n_right // 10, "uid"].values
    return left, right


def test_asof_backward_matches_pandas(spark):
    left, right = _rand_events(7)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="uid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # pandas merge_asof needs global sort; dedup right per (uid, ts) max
    # like asof_join does
    r = right.groupby(["uid", "ts"], as_index=False).agg(rv=("rv", "max"))
    exp = pd.merge_asof(
        left.sort_values("ts"),
        r.sort_values("ts").rename(columns={"rv": "rv_r"}),
        on="ts",
        by="uid",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["rv_r"], exp["rv_r"], check_dtype=False
    )


def test_asof_forward(spark):
    left = pd.DataFrame({"uid": [1, 1, 2], "ts": [10, 50, 10], "lid": [0, 1, 2]})
    right = pd.DataFrame({"uid": [1, 1], "ts": [20, 50], "rv": [100, 200]})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="uid",
            direction="forward",
        )
        .toPandas()
        .sort_values("lid")
    )
    assert got["rv_r"].tolist()[0] == 100  # 10 -> next at 20
    assert got["rv_r"].tolist()[1] == 200  # 50 -> exact match inclusive
    assert pd.isna(got["rv_r"].tolist()[2])  # uid 2: no right rows


def test_asof_no_by_key(spark):
    left = pd.DataFrame({"ts": [5, 15, 25], "lid": [0, 1, 2]})
    right = pd.DataFrame({"ts": [10, 20], "rv": [1, 2]})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
        )
        .toPandas()
        .sort_values("lid")
    )
    vals = got["rv_r"].tolist()
    assert pd.isna(vals[0]) and vals[1] == 1 and vals[2] == 2


def test_hash_sample_no_shuffle_and_deterministic(spark):
    from btrblocks_spark.functions.sampling import hash_sample

    df = spark.range(10000).select(F.col("id").alias("k"))
    s1 = hash_sample(df, "k", 0.1)
    # narrow: no Exchange in the plan
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    a = {r.k for r in s1.collect()}
    b = {r.k for r in hash_sample(df, "k", 0.1).collect()}
    assert a == b and 700 <= len(a) <= 1300
    # nested property: a 5% sample is a subset of the 10% sample
    c = {r.k for r in hash_sample(df, "k", 0.05).collect()}
    assert c <= a


def test_stratified_sample_fractions(spark):
    from btrblocks_spark.functions.sampling import stratified_sample

    df = spark.range(20000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s"),
    )
    got = stratified_sample(df, "k", "s", {"a": 0.5}, default=0.0)
    rows = got.groupBy("s").count().collect()
    by = {r.s: r["count"] for r in rows}
    assert "b" not in by
    assert abs(by["a"] - 5000) < 600


def test_top_k_per_group(spark):
    from btrblocks_spark.functions.sampling import top_k_per_group

    df = spark.range(100).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    got = top_k_per_group(df, "g", "v", k=3)
    assert got.count() == 12
    assert {r.v for r in got.filter(F.col("g") == 0).collect()} == {96, 92, 88}


def test_asof_tolerance_matches_pandas(spark):
    left, right = _rand_events(11)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="uid",
            tolerance=25.0,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    r = right.groupby(["uid", "ts"], as_index=False).agg(rv=("rv", "max"))
    exp = pd.merge_asof(
        left.sort_values("ts"),
        r.sort_values("ts").rename(columns={"rv": "rv_r"}),
        on="ts",
        by="uid",
        direction="backward",
        tolerance=25,
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["rv_r"], exp["rv_r"], check_dtype=False
    )
    assert got["rv_r"].isna().any()  # tolerance actually nulls gaps


def test_asof_tolerance_forward(spark):
    left = pd.DataFrame({"ts": [5, 15, 40], "lid": [0, 1, 2]})
    right = pd.DataFrame({"ts": [10, 50], "rv": [1, 2]})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            direction="forward",
            tolerance=8.0,
        )
        .toPandas()
        .sort_values("lid")
    )
    assert got["rv_r"].tolist()[0] == 1  # gap 5 <= 8
    assert pd.isna(got["rv_r"].tolist()[1])  # next at 50, gap 35 > 8
    assert pd.isna(got["rv_r"].tolist()[2])  # gap 10 > 8


def test_asof_null_payload_travels_whole_row(spark):
    """A NULL field in the matched right row must STAY NULL — the fill
    carries the nearest right row whole, never mixing a farther row's
    value into one column (pandas merge_asof whole-row semantics,
    ADVICE r5)."""
    left = pd.DataFrame({"uid": [1, 1], "ts": [10.0, 20.0],
                         "lid": [0, 1]})
    right = pd.DataFrame({
        "uid": [1, 1],
        "ts": [5.0, 18.0],
        "a": [100.0, None],     # nearest row (ts=18) is NULL in a
        "b": [7.0, 8.0],
    })
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts",
            by="uid",
            tolerance=5.0,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid=0: nearest right is ts=5 (gap 5 <= tol): whole row (100, 7)
    assert got.loc[0, "a_r"] == 100.0 and got.loc[0, "b_r"] == 7.0
    # lid=1: nearest right is ts=18 (gap 2 <= tol): row (NULL, 8) —
    # a_r must NOT backfill 100.0 from the farther ts=5 row
    assert pd.isna(got.loc[1, "a_r"]) and got.loc[1, "b_r"] == 8.0
    exp = pd.merge_asof(
        left.sort_values("ts"), 
        right.sort_values("ts").rename(columns={"a": "a_r", "b": "b_r"}),
        on="ts", by="uid", direction="backward", tolerance=5,
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["a_r"], exp["a_r"],
                                   check_dtype=False)
    pd.testing.assert_series_equal(got["b_r"], exp["b_r"],
                                   check_dtype=False)
