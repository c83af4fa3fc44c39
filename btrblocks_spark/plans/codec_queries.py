"""Operator-analysis queries over the TPC-H-ish test tables.

Every query returns deterministic, fully-aliased columns; the matching
oracle SQL lives in ``__spark_entry__.py``. Scale notes are inline: these
are one-or-two-shuffle plans whose group keys are low-cardinality, so at
100 TB they stay map-side-combine friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


#: Orderkeys per range bucket for the partitioned-window rewrites below.
#: Correctness is bucket-width independent; width only tunes the size of
#: the (tiny) boundary-stitch step. At 100 TB pick ~sqrt(n_rows) buckets.
_BUCKET_WIDTH = 4096

_SORT_KEYS = ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")


def rle_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length stats of l_returnflag in (l_orderkey, l_linenumber) order.

    The declarative form of TRLE compress (RLE.hpp:20-85), made scale-safe:
    instead of one global ``Window.orderBy`` (single-task at 100 TB), rows
    are range-bucketed on the leading sort key, runs are computed per
    bucket with a *partitioned* window, and runs touching bucket edges
    (<= 2 per bucket) are stitched with one window over that tiny boundary
    set. Global order = concatenation of buckets in bucket order, so the
    stitched result is byte-identical to the global-window answer.
    """
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("_bkt").orderBy(*_SORT_KEYS)
    runs = (
        li.select(*_SORT_KEYS, "l_returnflag")
        .withColumn("_bkt", F.floor(F.col("l_orderkey") / _BUCKET_WIDTH))
        .withColumn("_prev", F.lag("l_returnflag").over(w))
        .withColumn(
            "_new_run",
            F.when(
                F.col("_prev").isNull()
                | (F.col("_prev") != F.col("l_returnflag")),
                1,
            ).otherwise(0),
        )
        .withColumn("_rid", F.sum("_new_run").over(w))
        .groupBy("_bkt", "_rid", "l_returnflag")
        .agg(F.count("*").alias("run_len"))
    )
    # Boundary runs: the first and last run of every bucket (<= 2 rows per
    # bucket — small). Consecutive boundary rows across buckets are exactly
    # (last of b, first of next non-empty b'), the only pairs that may merge.
    wb = Window.partitionBy("_bkt")
    boundary = runs.withColumn("_maxrid", F.max("_rid").over(wb)).filter(
        (F.col("_rid") == 1) | (F.col("_rid") == F.col("_maxrid"))
    )
    wg = Window.orderBy("_bkt", "_rid")
    chains = (
        boundary.withColumn("_pv", F.lag("l_returnflag").over(wg))
        .withColumn("_pb", F.lag("_bkt").over(wg))
        .withColumn(
            "_newchain",
            F.when(
                (F.col("_pv") == F.col("l_returnflag"))
                & (F.col("_pb") != F.col("_bkt")),
                0,
            ).otherwise(1),
        )
        .withColumn("_chain", F.sum("_newchain").over(wg))
        .select("_bkt", "_rid", "_chain")
    )
    true_runs = (
        runs.join(F.broadcast(chains), ["_bkt", "_rid"], "left")
        .withColumn(
            "_key",
            F.coalesce(
                F.concat(F.lit("c"), F.col("_chain")),
                F.concat(F.lit("u"), F.col("_bkt"), F.lit("_"), F.col("_rid")),
            ),
        )
        .groupBy("_key", "l_returnflag")
        .agg(F.sum("run_len").alias("run_len"))
    )
    return (
        true_runs.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_runs"),
            F.sum("run_len").alias("n_rows"),
            F.round(F.avg("run_len"), 6).alias("avg_run_len"),
            F.max("run_len").alias("max_run_len"),
        )
        .orderBy("l_returnflag")
    )


def dict_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-dictionary build for p_brand: code = dense_rank, plus counts.

    Declarative TDynamicDictionary (DynamicDictionary.hpp:29-75): distinct
    + sort = the dictionary, dense_rank = the code assignment.
    """
    from btrblocks_spark.functions.dedup import _ordered_dense_ids

    part = _t(spark, sf_dir, "part")
    counts = part.groupBy("p_brand").agg(F.count("*").alias("n_rows"))
    # scale-safe: range-partitioned rank + tiny offset summary instead
    # of an unpartitioned dense_rank window (single task at a
    # high-cardinality dictionary); ids are identical to the global rank
    ids = _ordered_dense_ids(counts, "p_brand", "_id")
    return (
        counts.join(ids, "p_brand")
        .withColumn("code", (F.col("_id") - 1).cast("long"))
        .select("p_brand", "code", "n_rows")
        .orderBy("code")
    )


def for_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR bias per l_suppkey group: min bias + residual range (FOR.cpp:14-65)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.min("l_partkey").alias("bias"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("residual_range"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_suppkey")
    )


def frequency_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 value + exception count per p_type (TFrequency estimate,
    Frequency.hpp:23-48). Deterministic ties: higher count, then brand asc."""
    part = _t(spark, sf_dir, "part")
    counts = part.groupBy("p_type", "p_brand").agg(F.count("*").alias("cnt"))
    # ONE scan of part: the per-type total is a window sum over the tiny
    # (type, brand) count frame instead of a second scan + join
    w = Window.partitionBy("p_type").orderBy(F.desc("cnt"), F.asc("p_brand"))
    wt = Window.partitionBy("p_type")
    ranked = counts.withColumn("rn", F.row_number().over(w)).withColumn(
        "total", F.sum("cnt").over(wt)
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "p_type",
            F.col("p_brand").alias("top_value"),
            F.col("cnt").alias("top_count"),
            (F.col("total") - F.col("cnt")).alias("exception_count"),
            F.round(F.col("cnt") / F.col("total"), 6).alias("occupancy"),
        )
        .orderBy("p_type")
    )


def delta_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sortedness + delta stats of o_orderkey (the PFOR_DELTA gate,
    PBP.cpp:60-65): is_sorted, max/avg delta, bits needed for deltas."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey").withColumn(
        "_bkt", F.floor(F.col("o_orderkey") / _BUCKET_WIDTH)
    )
    # Scale-safe: deltas within a range bucket via a *partitioned* window;
    # cross-bucket deltas from the tiny per-bucket (first, last) summary
    # (ordering key == value, so first = min, last = max per bucket).
    w = Window.partitionBy("_bkt").orderBy("o_orderkey")
    local = (
        o.withColumn("_delta", F.col("o_orderkey") - F.lag("o_orderkey").over(w))
        .filter(F.col("_delta").isNotNull())
        .select("_delta")
    )
    bnd = o.groupBy("_bkt").agg(
        F.min("o_orderkey").alias("_first"), F.max("o_orderkey").alias("_last")
    )
    wg = Window.orderBy("_bkt")
    cross = (
        bnd.withColumn("_prevlast", F.lag("_last").over(wg))
        .filter(F.col("_prevlast").isNotNull())
        .select((F.col("_first") - F.col("_prevlast")).alias("_delta"))
    )
    d = local.unionByName(cross)
    return d.agg(
        F.count("*").alias("n_deltas"),
        F.min("_delta").alias("min_delta"),
        F.max("_delta").alias("max_delta"),
        F.round(F.avg("_delta"), 6).alias("avg_delta"),
        F.sum(F.when(F.col("_delta") < 0, 1).otherwise(0)).alias("inversions"),
        F.ceil(F.log2(F.max("_delta") + F.lit(1))).alias("delta_bits"),
    )


def one_value_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE_VALUE short-circuit detection per group (SchemePicker.hpp:118-129):
    which o_orderstatus groups have a single distinct o_orderpriority?"""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_orderpriority").alias("n_distinct"),
            F.count("*").alias("n_rows"),
        )
        .withColumn("is_one_value", (F.col("n_distinct") <= 1).cast("boolean"))
        .orderBy("o_orderstatus")
    )


def block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block NumberStats (NumberStats.hpp:78-130): min/max/count/distinct
    of l_partkey per 8192-row block in (l_orderkey, l_linenumber) order."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(*_SORT_KEYS)
        .withColumn("_bkt", F.floor(F.col("l_orderkey") / _BUCKET_WIDTH))
    )
    # Scale-safe global row numbering: per-bucket counts -> prefix-sum
    # offsets (window over the tiny bucket summary only), then a
    # *partitioned* row_number + offset. No full-table single-task window.
    counts = li.groupBy("_bkt").agg(F.count("*").alias("_cnt"))
    wg = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wg), F.lit(0))
    ).select("_bkt", "_off")
    wl = Window.partitionBy("_bkt").orderBy(*_SORT_KEYS)
    blocks = li.join(F.broadcast(offs), "_bkt").withColumn(
        "block_id",
        ((F.row_number().over(wl) - 1 + F.col("_off")) / F.lit(8192)).cast("long"),
    )
    return (
        blocks.groupBy("block_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_val"),
            F.max("l_partkey").alias("max_val"),
            F.countDistinct("l_partkey").alias("n_distinct"),
        )
        .orderBy("block_id")
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary (pure built-in aggregates;
    single shuffle on a 6-value key — map-side combine does the heavy
    lifting at any scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: join customer ⋈ orders ⋈ lineitem. Only the filtered
    customer dim is broadcast; orders is fact-class (grows with scale), so
    its join with lineitem is left to shuffle/AQE — at 100 TB a forced
    broadcast of orders would OOM rather than degrade."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # broadcast-reduce orders BEFORE the fact-fact shuffle: o ⋈ c keeps
    # ~1/5 of orders (one segment), so the lineitem join shuffles a 5x
    # smaller build side; inner joins commute, results identical
    o2 = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        li.join(o2, li.l_orderkey == o2.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation where customer and supplier sit
    in the same nation. All dims (region, nation, customer, supplier)
    broadcast; the only shuffle is the lineitem⋈orders co-aggregation —
    at 100 TB this is one fact-side shuffle, everything else map-side."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # project both fact sides down to exactly the join/agg columns
    # BEFORE the orderkey exchange (guide: shuffle fewer bytes) — the
    # broadcast dim joins attach only the nationkeys the filter needs
    o2 = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    li2 = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).select(
        "l_orderkey", "l_extendedprice", "l_discount", "s_nationkey"
    )
    return (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: share of revenue from promo parts. part is
    broadcast; single fact scan, no shuffle beyond the final global agg."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("p_type").startswith("PROMO"), rev
                    ).otherwise(F.lit(0.0))
                ),
                2,
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(
                F.sum(
                    F.when(
                        F.col("p_type").startswith("PROMO"), rev
                    ).otherwise(F.lit(0.0))
                )
                / F.sum(rev)
                * 100,
                6,
            ).alias("promo_share_pct"),
        )
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation over the events table — the
    batch twin of the streaming job in streaming/ingest.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )
