"""Derived-image materialization — build a thumbnail/preview table from
an image table as one maintenance job.

The 10^12-image motivation: training pipelines keep derived image
tables (thumbnails for dedup features, fixed-size previews for UIs,
normalized crops for models) next to the raw table. Rebuilding them is
a full decode of the corpus, so the job must be (a) a single narrow
map over the source — decode → resize (antialiased) → re-encode per
Arrow batch, no shuffle — and (b) INCREMENTAL: a refresh processes only
rows appended since the last materialized watermark (the same
snapshot-summary watermark protocol as ``operators/rollup``), so a
daily refresh over a petabyte table costs O(new images).

The derived table is a full BtrTable (same commit protocol, lineage,
maintenance operators apply), carrying ``image_id`` + the re-encoded
``bytes``/``w``/``h``/``fmt`` columns, so it composes with every other
operator (bucket_join back to the source, phash dedup over thumbs...).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from btrblocks_spark.sources.table import BtrTable

_WATERMARK = "derive_src_snapshot"


def _thumb_kernel(out_w: int, out_h: int, fmt: str):
    import pyarrow as pa

    from btrblocks_spark.functions.images import (
        _binary_views,
        decode_image,
        encode_image,
        resize_area,
    )

    def kernel(batch_iter):
        for batch in batch_iter:
            ids = batch.column("image_id")
            offs, buf = _binary_views(batch.column("bytes"))
            out = []
            for i in range(len(batch)):
                px = decode_image(buf[offs[i]: offs[i + 1]])
                out.append(
                    encode_image(resize_area(px, out_w, out_h), fmt)
                )
            yield pa.RecordBatch.from_pydict(
                {
                    "image_id": ids,
                    "bytes": pa.array(out, pa.binary()),
                    "w": pa.array([out_w] * len(batch), pa.int32()),
                    "h": pa.array([out_h] * len(batch), pa.int32()),
                    "fmt": pa.array([fmt] * len(batch), pa.string()),
                }
            )

    return kernel


_OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string"
)


def materialize_thumbnails(
    src: BtrTable,
    dst_root: str,
    out_w: int = 64,
    out_h: int = 64,
    fmt: str = "png",
    job_id: str | None = None,
    num_files: int | None = None,
) -> BtrTable:
    """Create the derived thumbnail table at the source's current
    snapshot; ``refresh_thumbnails`` advances it by appends only."""
    job_id = job_id or f"thumbs-{uuid.uuid4().hex[:8]}"
    watermark = src.current_snapshot_id()
    # pin the scan to the recorded watermark: a concurrent append
    # between the watermark read and the lazy scan's execution must not
    # be thumbnailed now AND re-processed by the next refresh
    thumbs = src.scan(
        columns=["image_id", "bytes"], snapshot_id=watermark
    ).mapInArrow(_thumb_kernel(out_w, out_h, fmt), _OUT_SCHEMA)
    dst = BtrTable.create(
        src.spark, dst_root, thumbs, num_files=num_files, job_id=job_id
    )
    dst._commit(
        [],
        operation="derive-state",
        replaced=None,
        extra_summary={
            _WATERMARK: watermark,
            "derive_params": [out_w, out_h, fmt],
        },
    )
    return dst


def thumbnails_watermark(dst: BtrTable) -> tuple[int, list]:
    """(latest source watermark, create-time derive params)."""
    wm, params = None, None
    for snap in reversed(dst.snapshots()):
        s = snap.get("summary") or {}
        if wm is None and s.get(_WATERMARK) is not None:
            wm = int(s[_WATERMARK])
        if params is None and s.get("derive_params") is not None:
            params = list(s["derive_params"])
        if wm is not None and params is not None:
            return wm, params
    raise KeyError("table has no derive watermark (not a derived table?)")


def refresh_thumbnails(
    src: BtrTable,
    dst: BtrTable,
    job_id: str | None = None,
) -> dict:
    """Fold source INSERTS since the last refresh into the derived
    table — O(new images), parameters pinned from the create watermark.

    Deletes are NOT propagated (a thumbnail of a deleted image is
    storage, not correctness), and an UPDATE (delete+insert in the
    changelog) re-thumbnails the new image while the stale row remains
    — i.e. updates create DUPLICATE image_id rows here. Run
    ``materialize_thumbnails`` fresh, or MERGE on image_id, when the
    derived table must track deletes/updates exactly.
    """
    job_id = job_id or f"thumbs-refresh-{uuid.uuid4().hex[:8]}"
    last, (out_w, out_h, fmt) = thumbnails_watermark(dst)
    cur = src.current_snapshot_id()
    if cur == last:
        return {"job_id": job_id, "from": last, "to": cur,
                "new_rows": 0, "noop": True}
    changes = src.scan_changes(last, cur, columns=["image_id", "bytes"])
    news = changes.filter(F.col("_change_type") == "insert").select(
        "image_id", "bytes"
    )
    thumbs = news.mapInArrow(
        _thumb_kernel(out_w, out_h, fmt), _OUT_SCHEMA
    )
    # ONE commit carries both the new files and the advanced watermark
    # (exactly-once: a crashed/replayed refresh can never double-apply
    # the window — same protocol as operators/rollup)
    rows = dst._write_files(thumbs, job_id)
    dst._commit(
        rows,
        operation="derive-refresh",
        replaced=None,
        extra_summary={_WATERMARK: cur},
    )
    n = sum(r["row_count"] for r in rows)
    return {"job_id": job_id, "from": last, "to": cur,
            "new_rows": n, "noop": False}
