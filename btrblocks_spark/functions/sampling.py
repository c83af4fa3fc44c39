"""Deterministic sampling operators for training-data pipelines.

At 10^12 rows, `rand()`-based sampling is irreproducible across retries
and engines; these operators sample by a deterministic affine hash of a
key column, so the same row set comes back on every run, every engine,
every cluster size — the property a training-data pipeline needs for
auditable dataset construction (and what makes them oracle-checkable).

- :func:`hash_sample` — keep a fixed fraction of rows by key hash
  (per-row decision, NO shuffle: a pure narrow filter that pushes
  through Catalyst to the scan).
- :func:`stratified_sample` — per-stratum fixed fraction with the same
  hash, e.g. balance languages/classes (still narrow, no shuffle).
- :func:`top_k_per_group` — k best rows per group by an order column
  (ONE shuffle on the group key; rank window, the canonical Spark
  shape for per-class curation).

The hash reuses the KMV two-stream affine construction
(functions/sketch.py) — large multiplier so small keys wrap the
modulus, two different primes, never Mersenne-structured multipliers
(functions/dedup.py history).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from btrblocks_spark.functions.sketch import kmv_hash, kmv_hash_sql


def sample_bucket(col: Column, buckets: int = 10000) -> Column:
    """Deterministic bucket in [0, buckets) for a non-negative integer
    key column."""
    return kmv_hash(col) % buckets


def sample_bucket_sql(expr: str, buckets: int = 10000) -> str:
    return f"({kmv_hash_sql(expr)}) % {buckets}"


def hash_sample(
    df: DataFrame, key: str, fraction: float, buckets: int = 10000
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction`` of
    ``buckets`` — reproducible, engine-agnostic, no shuffle, and
    consistent across tables sharing the key (a lineitem sampled at the
    same fraction as its orders keeps referential integrity)."""
    cut = int(round(fraction * buckets))
    return df.filter(sample_bucket(F.col(key), buckets) < cut)


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    fractions: dict[str, float],
    default: float = 0.0,
    buckets: int = 10000,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value -> keep fraction (e.g. downsample a dominant language).
    Narrow filter, no shuffle."""
    cut = F.lit(int(round(default * buckets)))
    expr = cut
    for val, frac in fractions.items():
        expr = (
            F.when(
                F.col(stratum) == val, F.lit(int(round(frac * buckets)))
            ).otherwise(expr)
        )
    return df.filter(sample_bucket(F.col(key), buckets) < expr)


def top_k_per_group(
    df: DataFrame,
    group: str | list[str],
    order: Column | str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """k best rows per group (rank window over ONE shuffle on the group
    key). Ties broken by the order expression only — pass a composite
    Column for deterministic results."""
    group = [group] if isinstance(group, str) else list(group)
    oc = F.col(order) if isinstance(order, str) else order
    oc = oc.desc() if descending else oc.asc()
    w = Window.partitionBy(*group).orderBy(oc)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
