"""Cross-modal near-dup curation: image-phash OR caption-simhash edges,
transitive clusters, one canonical (highest-resolution) survivor."""

import pandas as pd
from pyspark.sql import functions as F


def _table(spark):
    rows = [
        # a/b: identical phash (image dup), captions unrelated
        ("a01", 300, 200, 0x1234_5678_9ABC_DEF0, "a red bird on a branch"),
        ("a02", 600, 400, 0x1234_5678_9ABC_DEF0, "totally different words here"),
        # b/c: identical caption (caption dup), phash far apart
        ("b01", 100, 100, 0x0000_0000_0000_0000, "the same caption text exactly"),
        ("b02", 120, 100, 0x7FFF_FFFF_FFFF_FFF0, "the same caption text exactly"),
        # chain: c1-c2 by image, c2-c3 by caption -> one 3-cluster
        ("c01", 200, 200, 0x1111_1111_1111_1111, "first unique sentence"),
        ("c02", 400, 300, 0x1111_1111_1111_1110, "bridging caption words"),
        ("c03", 800, 600, 0x2222_2222_2222_2222, "bridging caption words"),
        # singleton
        ("d01", 640, 480, 0x3333_3333_3333_3333, "nothing matches this one"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["image_id", "w", "h", "phash", "caption"]
        )
    ).select(
        "image_id",
        F.col("w").cast("int"),
        F.col("h").cast("int"),
        F.col("phash").cast("long"),
        "caption",
    )


def test_multimodal_pairs_union_both_modalities(spark):
    from btrblocks_spark.functions.multimodal import multimodal_near_dup

    pairs = multimodal_near_dup(_table(spark)).collect()
    by_mod = {}
    for r in pairs:
        by_mod.setdefault(r.modality, set()).add((r.id_a, r.id_b))
    assert ("a01", "a02") in by_mod["image"]
    assert ("b01", "b02") in by_mod["caption"]
    assert ("c01", "c02") in by_mod["image"]
    assert ("c02", "c03") in by_mod["caption"]
    # cross-modality false edges must not exist
    assert ("b01", "b02") not in by_mod.get("image", set())


def test_curate_images_canonical_per_cluster(spark):
    from btrblocks_spark.functions.multimodal import curate_images

    out = {r.image_id: r for r in curate_images(_table(spark)).collect()}
    # a-cluster -> a02 (600x400 beats 300x200); b -> b02 (120x100)
    # c-chain collapses transitively -> c03 (800x600); d survives alone
    assert set(out) == {"a02", "b02", "c03", "d01"}
    assert out["c03"].cluster_size == 3
    assert out["d01"].cluster_size == 1
