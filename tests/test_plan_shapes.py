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
