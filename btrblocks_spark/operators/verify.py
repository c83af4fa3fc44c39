"""Post-maintenance verification (the reference's verify-on-write,
``/root/reference/tools/conversion/csvtobtr.cpp:49-66``, lifted to
snapshot granularity).

Invariants per BASELINE.json input_hint:
- full row-set equality between two snapshots on all columns
  (captions byte-equal, metadata equal);
- decoded-pixel PSNR >= 40 dB per row for lossy formats / byte equality
  for lossless — checked via the image kernels.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from btrblocks_spark.sources.table import BtrTable


def verify_snapshots_equal(
    table: BtrTable, before_sid: int, after_sid: int | None = None
) -> dict:
    """Row-set equality between snapshots (order-insensitive, all columns)."""
    before = table.scan(snapshot_id=before_sid)
    after = table.scan(snapshot_id=after_sid)
    missing = before.exceptAll(after).count()
    extra = after.exceptAll(before).count()
    return {"missing_rows": missing, "extra_rows": extra, "ok": missing == extra == 0}


def verify_images(table: BtrTable, min_psnr: float = 40.0) -> dict:
    """Decode every image, re-encode in its fmt, check PSNR/byte-equality."""
    from btrblocks_spark.functions.images import reencode_check_batches

    df = table.scan(columns=["image_id", "bytes", "fmt"])
    checked = df.mapInArrow(
        lambda it: reencode_check_batches(it, min_psnr),
        "image_id string, ok boolean, psnr double",
    )
    agg = checked.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("failures"),
        F.min("psnr").alias("min_psnr"),
    ).collect()[0]
    return {
        "rows": agg.n,
        "failures": agg.failures or 0,
        "min_psnr": agg.min_psnr,
        "ok": (agg.failures or 0) == 0,
    }
