"""Cross-modal near-duplicate curation over image+caption tables.

An image pair can be a near-duplicate in EITHER modality: pixel-level
(perceptual-hash hamming) or caption-level (simhash hamming). Real
curation unions both edge sets, closes the transitive hull, and keeps
one canonical row per cluster — this module composes the existing
primitives (``dedup.phash_near_pairs``, ``dedup.simhash64`` pipeline,
``graph.dedup_clusters``) into that flow.

Scale shape: both pair generators are pigeonhole-bucketed (never
all-pairs), the union is a narrow map, connected components is the
O(log^2 n)-round alternating-star job, and canonical selection is one
rank window per cluster. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrblocks_spark.functions.dedup import (
    phash_near_pairs,
    simhash64,
    simhash_near_pairs,
)
from btrblocks_spark.functions.graph import canonical_docs, dedup_clusters


def multimodal_near_dup(
    df: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    max_hamming_image: int = 3,
    max_hamming_caption: int = 3,
) -> DataFrame:
    """(id_a, id_b, modality, hamming) near-dup pairs — the union of
    pixel-level (phash) and caption-level (simhash) matches. A pair
    near-dup in both modalities appears twice with distinct modality
    tags (downstream clustering treats the edge set as a set)."""
    img = phash_near_pairs(
        df, id_col=id_col, phash_col=phash_col,
        max_hamming=max_hamming_image,
    ).select("id_a", "id_b", F.lit("image").alias("modality"), "hamming")
    cap_sim = simhash64(
        df.select(
            F.col(id_col).alias("doc_id"), F.col(caption_col).alias("text")
        )
    )
    cap = simhash_near_pairs(
        cap_sim, max_hamming=max_hamming_caption
    ).select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        F.lit("caption").alias("modality"),
        "hamming",
    )
    return img.unionByName(cap)


def curate_images(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "image_id",
    **near_dup_kwargs,
) -> DataFrame:
    """One canonical row per cross-modal duplicate cluster: the
    highest-resolution member (w*h, ties to the smallest id), plus the
    cluster id and size. Singleton images pass through (cluster of 1).
    """
    if pairs is None:
        pairs = multimodal_near_dup(df, id_col=id_col, **near_dup_kwargs)
    clusters = dedup_clusters(
        pairs.select("id_a", "id_b").distinct(),
        all_ids=df.select(F.col(id_col).alias("doc_id")),
        src="id_a",
        dst="id_b",
        id_col="doc_id",
    ).select(F.col("doc_id").alias(id_col), "cluster_id")
    # same canonical-selection window as the text path, ranked by
    # resolution instead of length
    return canonical_docs(
        df,
        clusters,
        id_col=id_col,
        order_by=[
            (F.col("w").cast("long") * F.col("h")).desc(),
            F.col(id_col).asc(),
        ],
    )
