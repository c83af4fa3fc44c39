"""Derived-image materialization: incremental refresh == full rebuild."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from btrblocks_spark.functions import images
from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.derive import (
    materialize_thumbnails,
    refresh_thumbnails,
    thumbnails_watermark,
)
from btrblocks_spark.sources.table import BtrTable


@pytest.fixture()
def src(spark, tmp_path):
    df = spark.createDataFrame(image_caption_table(40, seed=51))
    return BtrTable.create(
        spark, str(tmp_path / "imgs"), df, num_files=2, job_id="dv0"
    )


def test_materialize_and_incremental_refresh(spark, src, tmp_path):
    dst = materialize_thumbnails(
        src, str(tmp_path / "thumbs"), out_w=16, out_h=12, job_id="dv1"
    )
    assert dst.scan().count() == 40
    r = dst.scan().limit(1).collect()[0]
    px = images.decode_image(bytes(r.bytes))
    assert px.shape == (12, 16, 3) and r.fmt == "png"

    # noop refresh
    res = refresh_thumbnails(src, dst, job_id="dv2")
    assert res["noop"] and dst.scan().count() == 40

    # append 15 new images -> refresh processes ONLY them
    more = spark.createDataFrame(
        image_caption_table(15, seed=52)
    ).withColumn("image_id", F.concat(F.lit("n-"), F.col("image_id")))
    src.append(more, job_id="dv3")
    res = refresh_thumbnails(src, dst, job_id="dv4")
    assert res["new_rows"] == 15 and not res["noop"]
    assert dst.scan().count() == 55
    # params pinned from create ride every refresh
    wm, params = thumbnails_watermark(dst)
    assert wm == src.current_snapshot_id()
    assert params == [16, 12, "png"]

    # incremental result == full rebuild at the same snapshot
    full = materialize_thumbnails(
        src, str(tmp_path / "thumbs2"), out_w=16, out_h=12, job_id="dv5"
    )
    inc = {
        r.image_id: bytes(r.bytes) for r in dst.scan().collect()
    }
    ful = {
        r.image_id: bytes(r.bytes) for r in full.scan().collect()
    }
    assert inc == ful

    # replayed refresh (same window) is exactly-once
    res2 = refresh_thumbnails(src, dst, job_id="dv6")
    assert res2["noop"] and dst.scan().count() == 55


def test_thumbnails_compose_with_bucket_ops(spark, src, tmp_path):
    """The derived table is a full BtrTable: phash dedup features
    compute over thumbs and the stats fold answers metadata-only."""
    dst = materialize_thumbnails(
        src, str(tmp_path / "t8"), out_w=8, out_h=8, job_id="dv7"
    )
    got = dst.stats_agg([("count", "*", "n"), ("max", "w", "mw")])
    row = got.collect()[0]
    assert (row.n, row.mw) == (40, 8)
    stats = dst.scan(columns=["image_id", "bytes"]).mapInArrow(
        images.decode_stats_batches,
        "image_id string, pixel_mean double, pixel_std double",
    )
    assert stats.count() == 40


def test_cli_thumbs_create_refresh(spark, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq2

    from btrblocks_spark import jobs

    inp = str(tmp_path / "imgs.parquet")
    pq2.write_table(image_caption_table(20, seed=53), inp)
    src_root = str(tmp_path / "csrc")
    assert jobs.main(["create", "--table", src_root, "--input", inp]) == 0
    dst_root = str(tmp_path / "cthumbs")
    rc = jobs.main([
        "thumbs", "--src", src_root, "--dst", dst_root, "--create",
        "--width", "8", "--height", "8",
    ])
    assert rc == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["rows"] == 20

    more = str(tmp_path / "more.parquet")
    import pyarrow as pa

    t2 = image_caption_table(5, seed=54)
    t2 = t2.set_column(
        t2.schema.get_field_index("image_id"),
        "image_id",
        pa.array([f"m-{v}" for v in t2.column("image_id").to_pylist()]),
    )
    pq2.write_table(t2, more)
    assert jobs.main(["append", "--table", src_root, "--input", more]) == 0
    rc = jobs.main(["thumbs", "--src", src_root, "--dst", dst_root])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["new_rows"] == 5
    assert BtrTable(spark, dst_root).scan().count() == 25
