"""Distributed connected components + duplicate-cluster canonicalization.

The standard ending of every near-dup pipeline (MinHash/SimHash/Jaccard
pairs) is *transitive grouping*: if A~B and B~C, then {A,B,C} is one
duplicate cluster and the corpus keeps one canonical member. Pairwise
output alone under-deletes (keeping both ends of every chain link).

Spark has no connected-components operator on DataFrames (GraphFrames is
an external package), so this implements the alternating **large-star /
small-star** algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (ACM SoCC 2014):

- ``large_star``: every node points its *larger* neighbors at the
  minimum of its neighborhood (including itself);
- ``small_star``: every node points its *smaller-or-equal* neighbors
  (and itself) at that minimum.

Each round is two groupBy-min + join stages — pure shuffles, no driver
data — and the edge set converges to per-component stars rooted at the
component's minimum node id in O(log^2 n) rounds (2-5 in practice).
This is the 100 TB-safe choice: naive min-label propagation needs
O(graph diameter) rounds and a duplicate *chain* (common in boilerplate
text) has diameter O(n).

Convergence is detected with two scalars per round (edge count +
order-independent xxhash64 checksum), never by collecting edges.

Reference parity note: the reference engine (btrblocks) has no graph
operator; this extends the training-data layer the task brief requires
(dedup beyond pairwise output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["connected_components", "dedup_clusters", "canonical_docs"]

_MAX_ROUNDS = 25  # log2^2(10^12) ~ 16; hard stop for safety


def _undirected(e: DataFrame) -> DataFrame:
    return e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    und = _undirected(e)
    mins = und.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("m")
    )
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    a = (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    b = mins.select("u", F.col("m").alias("v"))
    return (
        a.union(b).filter(F.col("u") != F.col("v")).distinct()
    )


def _edge_sig(e: DataFrame) -> tuple[int, int]:
    """(count, order-independent checksum) — two scalars, no collect."""
    # bit_xor: order-independent and overflow-free under ANSI mode
    # (sum(xxhash64) overflows long); edge rows are distinct so XOR
    # cancellation of repeated rows cannot occur.
    row = e.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).first()
    return int(row["n"] or 0), int(row["h"] or 0)


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = _MAX_ROUNDS,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of its connected component.

    Node ids must be a numeric/orderable type. Self-loops are ignored.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _edge_sig(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # converged: stars (u -> root, root < u). Roots map to themselves.
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return nodes.union(roots).distinct()


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id) from near-dup ``pairs``; transitive closure.

    With ``all_ids`` (a one-column DataFrame of every document id),
    singleton documents appear with ``cluster_id = doc_id`` — the full
    corpus labeling a curation pipeline filters on.
    """
    cc = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    if all_ids is None:
        return cc
    return (
        all_ids.select(id_col)
        .join(cc, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    order_by: list | None = None,
) -> DataFrame:
    """One canonical row per duplicate cluster.

    ``order_by`` ranks members within a cluster (default: longest
    ``n_chars`` first, ties to the smallest id — deterministic). Output
    is the deduped corpus plus ``cluster_id`` and ``cluster_size``.
    """
    if order_by is None:
        order_by = [F.col("n_chars").desc(), F.col(id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order_by)
    return (
        docs.join(clusters, id_col)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
