"""Physical/optimized plan-shape regression tests for the scale fixes:
fact tables must not carry broadcast hints, and the codec-analysis
queries must run their heavy windows hash-partitioned on the range
bucket (the single-partition step only ever sees the tiny boundary
summary)."""

import pytest

SF = "/root/testdata/sf0.001"


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_top_revenue_orders_broadcasts_only_customer(spark):
    from btrblocks_spark.plans import codec_queries as cq

    plan = _optimized(cq.top_revenue_orders(spark, SF))
    # exactly one broadcast hint, and it sits on the customer join side
    hint_lines = [l for l in plan.splitlines() if "strategy=broadcast" in l]
    assert len(hint_lines) == 1
    assert "c_custkey" in hint_lines[0]


def test_regional_revenue_broadcasts_dims_not_orders(spark):
    from btrblocks_spark.plans import codec_queries as cq

    plan = _optimized(cq.regional_revenue(spark, SF))
    hint_lines = [l for l in plan.splitlines() if "strategy=broadcast" in l]
    # supplier, customer, nation, region — never orders/lineitem
    assert len(hint_lines) == 4
    assert not any("o_orderkey" in l or "l_orderkey" in l for l in hint_lines)


@pytest.mark.parametrize("qname", ["rle_runs", "delta_sorted", "block_stats"])
def test_codec_queries_windows_are_bucket_partitioned(spark, qname):
    from btrblocks_spark.plans import codec_queries as cq

    df = getattr(cq, qname)(spark, SF)
    plan = _executed(df)
    # the fact-table window/aggregation exchanges hash on the range
    # bucket — the old single global Window.orderBy plan had none
    assert plan.count("hashpartitioning(_bkt") >= 1, plan[:2000]


def test_dict_build_no_unpartitioned_full_window(spark):
    """dict_build must rank inside range partitions: the only
    unpartitioned window (the offset prefix sum) runs over the tiny
    per-partition count summary, never the full dictionary."""
    from btrblocks_spark.plans import codec_queries as cq

    df = cq.dict_build(spark, SF)
    plan = _executed(df)
    # rank window partitioned by _pid; no dense_rank over an
    # unpartitioned full-cardinality exchange
    assert "dense_rank" not in plan
    assert plan.count("hashpartitioning(_pid") >= 1, plan[:2000]


def test_frequency_mode_scans_part_once(spark):
    """frequency_mode computes totals from the aggregated count frame —
    exactly one scan of the part table."""
    from btrblocks_spark.plans import codec_queries as cq

    df = cq.frequency_mode(spark, SF)
    plan = _executed(df)
    assert plan.count("part.parquet") == 1, plan[:3000]


def test_decontaminate_no_cartesian_and_broadcast_bench(spark):
    """Decontamination: the benchmark-gram side must reach the probe as
    a broadcast (explicit hint), and no plan node may be a cartesian
    product — the contract that keeps the op linear at 100 TB."""
    from pyspark.sql import functions as F

    from btrblocks_spark.functions.text import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = decontaminate(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=4,
    )
    plan = _executed(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_dedup_paragraphs_single_digest_window(spark):
    """Paragraph dedup: the first-occurrence choice is ONE row_number
    window keyed on the paragraph digest — no joins, no cartesian."""
    from btrblocks_spark.functions.dedup import dedup_paragraphs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _executed(dedup_paragraphs(docs, sep=" the ", joiner=" the "))
    assert "CartesianProduct" not in plan
    assert plan.count("RunningWindowFunction") <= 2  # rank + per-doc count
    assert "Join" not in plan  # linear: explode -> window -> regroup


def test_multimodal_pairs_no_all_pairs_join(spark):
    """Cross-modal near-dup pairs stay pigeonhole-bucketed: every join
    in the plan is an equi-join (hash/sort-merge), never nested-loop."""
    import pandas as pd
    from pyspark.sql import functions as F

    from btrblocks_spark.functions.multimodal import multimodal_near_dup

    df = spark.createDataFrame(
        pd.DataFrame(
            [("a", 10, 10, 7, "x y z"), ("b", 10, 10, 7, "x y z")],
            columns=["image_id", "w", "h", "phash", "caption"],
        )
    ).select(
        "image_id", F.col("w").cast("int"), F.col("h").cast("int"),
        F.col("phash").cast("long"), "caption",
    )
    plan = _executed(multimodal_near_dup(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_vocabulary_topk_is_take_ordered(spark):
    """vocabulary(top_k=...) must plan as TakeOrderedAndProject — a
    bounded per-partition heap + merge, never a global sort."""
    from btrblocks_spark.functions.text import vocabulary

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _executed(vocabulary(docs, top_k=50))
    assert "TakeOrderedAndProject" in plan
