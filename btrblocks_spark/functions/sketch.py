"""KMV (k-minimum-values) distinct-count sketch.

Bottom-k sketch: hash every value with a fixed engine-agnostic hash into
[0, P), keep the k smallest DISTINCT hashes; with U_(k) = k-th smallest
normalized to (0,1], E[distinct] = (k-1)/U_(k)  (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"). Standard error ~
1/sqrt(k-2). Mergeable across partitions/tables by unioning hash sets
and re-taking the bottom k — the building block for distinct stats in
manifests at 10^12-row scale where COUNT(DISTINCT) is a full shuffle.

The hash is the product-of-two-affine-streams construction used by the
deterministic MinHash/LSH family in this repo (two independent LCG
streams modulo two DIFFERENT primes, concatenated): expressible
identically in ANSI SQL, so the whole sketch is DuckDB-oracle-checkable.
Never use power-of-two-structured multipliers modulo a Mersenne prime —
they degenerate to bit rotations (see functions/dedup.py).

Spark shape: one narrow map (hash), one distinct (map-side combined),
then TakeOrderedAndProject for the bottom-k — per-partition top-k with a
driver merge of k values, no global sort. Scales to any row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# two different primes (both < 2^31), NOT Mersenne-structured multipliers.
# The leading multiplier must be LARGE: with a small one (e.g. 48271),
# keys below p/a never wrap the modulus, the bottom-k order statistic is
# just 48271*x — not uniform — and the estimator biases high. a1*x must
# wrap p1 many times for realistic key ranges: a1 ~ 2^30 does.
KMV_P1 = 2147483647
KMV_P2 = 2147483629
KMV_A1, KMV_B1 = 1103515245, 12345
KMV_A2, KMV_B2 = 69621, 7


def kmv_hash(col: Column) -> Column:
    """Deterministic 62-bit hash of a non-negative integer column:
    h = ((a1*x+b1) mod p1) * p2 + ((a2*x+b2) mod p2)."""
    x = col.cast("bigint")
    h1 = (F.lit(KMV_A1) * (x % KMV_P1) + KMV_B1) % KMV_P1
    h2 = (F.lit(KMV_A2) * (x % KMV_P2) + KMV_B2) % KMV_P2
    return (h1 * KMV_P2 + h2).alias("h")


def kmv_hash_sql(expr: str) -> str:
    """The identical hash as ANSI SQL over expression ``expr``."""
    return (
        f"(({KMV_A1}*(({expr}) % {KMV_P1}) + {KMV_B1}) % {KMV_P1}) "
        f"* {KMV_P2} + "
        f"(({KMV_A2}*(({expr}) % {KMV_P2}) + {KMV_B2}) % {KMV_P2})"
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame (kth_hash, k_count, est_distinct).

    If fewer than k distinct values exist the count is exact
    (est = k_count); otherwise est = floor((k-1) * P / kth_hash)."""
    P = float(KMV_P1) * float(KMV_P2)
    bottom = (
        df.select(kmv_hash(F.col(col)))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return bottom.agg(
        F.max("h").alias("kth_hash"),
        F.count("h").alias("k_count"),
    ).select(
        "kth_hash",
        "k_count",
        F.when(F.col("k_count") < k, F.col("k_count"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1)) * F.lit(P) / F.col("kth_hash").cast("double")
            )
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


def kmv_distinct_sql(table: str, expr: str, k: int = 256) -> str:
    """DuckDB/ANSI oracle for :func:`kmv_distinct` (same arithmetic)."""
    # explicit DOUBLE casts: a bare decimal-literal product overflows
    # DuckDB's DECIMAL(18); the IEEE double product matches Spark's
    P = f"(CAST({KMV_P1} AS DOUBLE) * CAST({KMV_P2} AS DOUBLE))"
    return f"""
WITH hashes AS (
  SELECT DISTINCT {kmv_hash_sql(expr)} AS h FROM {table}
), bottom AS (
  SELECT h FROM hashes ORDER BY h LIMIT {k}
)
SELECT
  MAX(h) AS kth_hash,
  COUNT(*) AS k_count,
  CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
       ELSE FLOOR({k - 1}.0 * {P} / CAST(MAX(h) AS DOUBLE)) END
       AS BIGINT) AS est_distinct
FROM bottom
"""
