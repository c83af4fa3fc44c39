"""Shared helpers for the function-library operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401


def widen(df: DataFrame, *keys: str, factor: int = 1) -> DataFrame:
    """Raise scan parallelism for compute-heavy narrow pipelines.

    A single-row-group parquet file scans as ONE task no matter how many
    cores the cluster has (Spark can only split scans at row-group
    boundaries), which serializes every downstream narrow operator —
    regex features, shingle hashing, token explodes. When per-row work
    dominates, one cheap hash exchange of the input buys full-cluster
    parallelism for the expensive stage.

    Scale-adaptive, not tuned to local mode: the target is the session's
    ``defaultParallelism`` (total executor cores on any deployment), and
    the repartition is SKIPPED whenever the input already plans at least
    that many partitions — a real 100 TB table with thousands of splits
    passes through untouched and pays nothing.
    """
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism, 1) * max(factor, 1)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive; planning failed
        current = None
    if current is not None and current >= target:
        return df
    return df.repartition(target, *[F.col(k) for k in keys])
