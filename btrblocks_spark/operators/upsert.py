"""UPSERT via Iceberg-v2 equality deletes — O(change) writes, zero reads.

``upsert_eq(table, source, on)`` commits, in ONE snapshot:

- the source rows encoded as new data files (sequence number = the
  commit's snapshot id), and
- one-or-few *equality delete* files (manifest ``content=2``) holding
  the source's distinct key values.

Scans drop any row whose key appears in an equality delete file written
at a HIGHER sequence number than the row's data file — so every
pre-existing version of an upserted key disappears while the new rows
(equal seq) survive their own delete. Unlike MERGE INTO, nothing is
read: no keyscan, no touched-file discovery, no rewrite. Written bytes
are exactly (new rows + key list), which is what a high-frequency CDC
ingest needs at 100 TB — ``compact()`` later absorbs the deletes
(bloom/range-pruned) back into pure data files.

This extends the reference (a compression library with no DML) the same
way the MERGE/maintenance family does; the delete-file design follows
the public Iceberg v2 spec (equality deletes + data sequence numbers).

Scale shape: the only driver-side values are per-task manifest rows and
one (max duplicate count) scalar; source rows never leave executors.
"""

from __future__ import annotations

import json
import uuid

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable


def _key_stats_entry(col: pa.ChunkedArray, typ: pa.DataType) -> dict:
    """min/max stats for a delete-key column, in the SAME representation
    ``encode_table`` uses for data files (numeric as values, everything
    else stringified) so ``_file_may_match`` range logic composes."""
    import pyarrow.compute as pc

    entry: dict = {"null_count": int(col.null_count)}
    if col.length() - col.null_count == 0:
        return entry
    mm = pc.min_max(col)
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        entry["min"] = mm["min"].as_py()
        entry["max"] = mm["max"].as_py()
    else:
        entry["min"] = str(mm["min"].as_py())
        entry["max"] = str(mm["max"].as_py())
    return entry


def upsert_eq(
    table: BtrTable,
    source: DataFrame,
    on: str | list[str],
    job_id: str | None = None,
    num_files: int | None = None,
    branch: str | None = None,
    extra_delete_keys: DataFrame | None = None,
    extra_summary: dict | None = None,
) -> dict:
    """Upsert ``source`` into ``table`` on key column(s) ``on``.

    Requires key-unique source rows (a doubled key makes "the new
    version" ambiguous — raises ValueError, detected inside the same
    job that writes the keys, no extra pass). Returns job metrics.
    Checkpoint-resumable like every other writer: both the data-file
    and key-file tasks skip work their marker shows done.

    ``extra_delete_keys``: keys to delete WITHOUT replacement rows
    (they join the equality-delete files but have no new data) — the
    "key vanished" half of incremental view maintenance. Must be
    disjoint from the source's keys. ``extra_summary`` merges into the
    commit summary (e.g. a rollup watermark, atomic with the upsert).
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    schema_names = table.schema_arrow().names
    for c in on_cols:
        if c not in schema_names:
            raise KeyError(f"upsert key {c!r} not in table schema")
    job_id = job_id or f"upsert-{uuid.uuid4().hex[:8]}"
    # hidden-partitioning _p_* columns are recomputed by _write_files;
    # the caller's source frame never carries them
    source = source.select(
        *[c for c in schema_names if not c.startswith("_p_")]
    )

    # 1. new data files (no commit yet — one atomic snapshot at the end)
    data_rows = table._write_files(source, job_id, num_files=num_files)

    # 2. equality delete files: the source's distinct keys, one parquet
    #    per (coalesced) task; each task also reports its max duplicate
    #    count so key-uniqueness costs no extra job
    keys_df = source.groupBy(*on_cols).agg(
        F.count(F.lit(1)).alias("_n")
    )
    if extra_delete_keys is not None:
        # delete-only keys: never counted toward the duplicate check
        # (they carry no replacement row); re-grouped so a key that is
        # (wrongly) in both sets still writes one key row.
        extras = (
            extra_delete_keys.select(*on_cols)
            .distinct()
            .withColumn("_n", F.lit(1).cast("long"))
        )
        keys_df = (
            keys_df.unionByName(extras)
            .groupBy(*on_cols)
            .agg(F.max("_n").alias("_n"))
        )
    try:
        par = max(table.spark.sparkContext.defaultParallelism, 1)
    except Exception:
        par = 8
    keys_df = keys_df.coalesce(max(1, min(par, 8)))
    root = table.root
    ckpt_dir = fs.join(root, "_checkpoints", job_id)
    fs.mkdirs(ckpt_dir)
    key_schema_hex = (
        source.select(*on_cols).limit(0).toArrow().schema
        .serialize().hex().decode()
    )

    def write_keys(batch_iter):
        from pyspark import TaskContext

        from btrblocks_spark.operators.upsert import _key_stats_entry
        from btrblocks_spark.sources import fs as _fs
        from btrblocks_spark.sources.table import _write_parquet_atomic

        tid = TaskContext.get().partitionId()
        marker = _fs.join(ckpt_dir, f"eqdel-{tid}.json")
        if _fs.exists(marker):
            yield pa.RecordBatch.from_pydict(
                {"rows": [_fs.read_bytes(marker).decode()]}
            )
            return
        batches = list(batch_iter)
        key_schema = pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(key_schema_hex))
        )
        max_dup = 0
        kt = None
        if batches:
            t = pa.Table.from_batches(batches)
            import pyarrow.compute as pc

            max_dup = pc.max(t.column("_n")).as_py() or 0
            kt = t.select(on_cols).cast(key_schema)
        payload_obj = {"max_dup": int(max_dup), "rows": []}
        if kt is not None and kt.num_rows:
            fname = f"{job_id}-eqdel-{tid:05d}.parquet"
            fpath = _fs.join(root, "data", fname)
            fbytes = _write_parquet_atomic(kt, fpath)
            stats = {
                c: _key_stats_entry(kt.column(c), kt.schema.field(c).type)
                for c in on_cols
            }
            payload_obj["rows"] = [
                {
                    "file_path": fpath,
                    "partition": "{}",
                    "row_count": kt.num_rows,
                    "block_count": 0,
                    "file_bytes": fbytes,
                    "raw_bytes": fbytes,
                    "stats": json.dumps(stats),
                    "job_id": job_id,
                    "source_files": "[]",
                    "sort_key": "",
                    "content": 2,
                }
            ]
        payload = json.dumps(payload_obj)
        _fs.write_bytes_atomic(marker, payload.encode())
        yield pa.RecordBatch.from_pydict({"rows": [payload]})

    collected = keys_df.mapInArrow(write_keys, "rows string").collect()
    del_rows: list[dict] = []
    max_dup = 0
    for r in collected:
        obj = json.loads(r.rows)
        max_dup = max(max_dup, obj["max_dup"])
        del_rows.extend(obj["rows"])
    if max_dup > 1:
        # ambiguous source — roll back the orphaned files (best-effort;
        # remove_orphan_files would reclaim them anyway)
        for r in data_rows + del_rows:
            try:
                fs.delete_file(r["file_path"])
            except OSError:
                pass
        raise ValueError(
            f"upsert source has duplicate keys on {on_cols} "
            f"(a key appears {max_dup} times); deduplicate first"
        )

    n_keys = sum(r["row_count"] for r in del_rows)
    sid = table._commit(
        data_rows + del_rows,
        operation="upsert_eq",
        replaced=None,
        branch=branch,
        extra_summary={
            "strategy": "eq",
            "on": on_cols,
            "upsert_keys": n_keys,
            **(extra_summary or {}),
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "new_files": len(data_rows),
        "new_bytes": sum(r["file_bytes"] for r in data_rows),
        "eq_delete_files": len(del_rows),
        "eq_delete_keys": n_keys,
        "eq_delete_bytes": sum(r["file_bytes"] for r in del_rows),
    }
