"""MERGE INTO — join-based upsert/delete rewriting only touched files.

Semantics (Iceberg copy-on-write MERGE):

    MERGE INTO target USING source ON target.<key> = source.<key>
    WHEN MATCHED THEN UPDATE SET * | DELETE
    WHEN NOT MATCHED THEN INSERT *

Plan (all declarative DataFrame ops — Catalyst handles join strategy, and
the source side is broadcast when small):

1. *Prune*: manifest min/max stats on the key column cut the candidate
   file set before any data I/O.
2. *Touch discovery*: a column-pruned scan of candidates (key + _file
   only — parquet skips every other blob column) semi-joined to source
   keys yields the touched-file list. At 10^12 rows this is the critical
   step: only key blobs of candidate files are ever read.
3. *Rewrite*: full scan of only the touched files; matched rows are
   updated (or deleted) via a left join to the (broadcast) source;
   inserts are source rows anti-joined against touched keys.
4. *Commit*: new files replace exactly the touched files — untouched
   files carry over, snapshot isolation preserved.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrblocks_spark.sources.table import BtrTable


def _norm(path: str) -> str:
    return path.removeprefix("file://").removeprefix("file:")


def merge_into(
    table: BtrTable,
    source: DataFrame,
    on: str,
    when_matched: str = "update",  # "update" | "delete"
    when_not_matched: str = "insert",  # "insert" | "ignore"
    job_id: str | None = None,
    broadcast_source: bool | None = None,
) -> dict:
    """Execute MERGE INTO; returns job metrics."""
    assert when_matched in ("update", "delete")
    assert when_not_matched in ("insert", "ignore")
    job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"
    spark = table.spark
    cols = table.schema_arrow().names
    assert on in cols, f"merge key {on} not in table schema"

    source = source.select(*cols)
    if broadcast_source is None:
        broadcast_source = True  # dims/updates are usually << target
    src = F.broadcast(source) if broadcast_source else source
    src_keys = F.broadcast(source.select(on).distinct()) if broadcast_source \
        else source.select(on).distinct()

    # 1. stats-prune candidate files by source key range (driver-cheap)
    key_minmax = source.agg(
        F.min(on).alias("lo"), F.max(on).alias("hi")
    ).collect()[0]
    prune = {on: (key_minmax.lo, key_minmax.hi)}

    # 2. touched files: key-only scan of candidates x source keys
    keyscan = table.scan(columns=[on], prune=prune, with_file=True)
    touched = [
        _norm(r._file)
        for r in keyscan.join(src_keys, on=on, how="leftsemi")
        .select("_file")
        .distinct()
        .collect()
    ]

    matched_rows = 0
    new_rows: list[dict] = []
    if touched:
        target_rows = table.scan(files=touched)
        if when_matched == "update":
            # replace matched rows wholesale with source versions
            kept = target_rows.join(src_keys, on=on, how="left_anti")
            replacement = src.join(
                F.broadcast(target_rows.select(on)) if broadcast_source
                else target_rows.select(on),
                on=on,
                how="leftsemi",
            )
            rewritten = kept.unionByName(replacement)
        else:  # delete
            rewritten = target_rows.join(src_keys, on=on, how="left_anti")
    else:
        rewritten = None

    inserts = None
    if when_not_matched == "insert":
        all_keys = table.scan(columns=[on], prune=prune)
        inserts = source.join(all_keys, on=on, how="left_anti")

    to_write = None
    if rewritten is not None and inserts is not None:
        to_write = rewritten.unionByName(inserts)
    elif rewritten is not None:
        to_write = rewritten
    elif inserts is not None:
        to_write = inserts

    written = []
    if to_write is not None:
        written = table._write_files(to_write.select(*cols), job_id=job_id)
    sid = table._commit(
        written,
        operation="merge",
        replaced=set(touched),
        extra_summary={"on": on, "when_matched": when_matched},
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "touched_files": len(touched),
        "new_files": len(written),
    }
