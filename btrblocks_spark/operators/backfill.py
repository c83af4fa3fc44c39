"""Backfill — materialize a derived column for every row.

The training-data workflow this serves: evolve the schema (add `quality`,
`caption_len`, `phash`, …), then compute and STORE the value for the
existing corpus so downstream jobs filter on a real column instead of
recomputing. Composition of the engine's own pieces:

    add_column (schema evolution) → staged per-file-group rewrite
    (decode → vectorized kernel → re-encode) → atomic commit

The kernel is a plain ``Callable[[pa.Table], pa.Array]`` executed inside
the Python workers over decoded Arrow tables — numpy/Arrow vectorized, no
per-row Python, no JVM data transfer (same staging discipline as
compact/cluster/merge). Checkpoint-resumable per file group.
"""

from __future__ import annotations

import json
import uuid

import pyarrow as pa

from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable


def backfill(
    table: BtrTable,
    column: str,
    ddl_type: str,
    kernel,
    job_id: str | None = None,
    group_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compute ``kernel(decoded_table) -> pa.Array`` for every row and
    store it as ``column`` (added via schema evolution if absent)."""
    job_id = job_id or f"backfill-{uuid.uuid4().hex[:8]}"
    spark = table.spark
    if table.delete_files() or table.eq_delete_files():
        raise RuntimeError(
            "table carries delete files; run compact() to absorb them "
            "before backfill (backfill rewrites files physically and "
            "would shift delete positions / reset sequence numbers)"
        )
    if column not in table.schema_arrow().names:
        table.add_column(column, ddl_type)
    schema_hex = table.schema_arrow().serialize().hex().decode()
    aliases = table.metadata().get("renames", {})
    parts = table.partition_by()
    files = table.data_files()
    blooms = table.bloom_cols()
    ndvs = table.ndv_cols()
    tbcs = table.token_bloom_cols()
    all_tfs = table.all_partition_transforms()
    if not files:
        return {"job_id": job_id, "rewritten_files": 0}

    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_bytes = 0
    for r in files:
        cur.append(r)
        cur_bytes += r["file_bytes"]
        if cur_bytes >= group_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)
    specs = [
        {"gid": g, "paths": json.dumps([m["file_path"] for m in members])}
        for g, members in enumerate(groups)
    ]
    root = table.root
    ckpt = fs.join(root, "_checkpoints", job_id)
    fs.mkdirs(ckpt)
    spec_df = spark.createDataFrame(specs).repartition(len(specs))

    def rewrite(batch_iter):
        from btrblocks_spark.sources import fs as _fs
        from btrblocks_spark.sources.blockfile import (
            decode_batches,
            encode_table,
            split_by_partition,
        )
        from btrblocks_spark.sources.table import _write_blockfile_atomic

        logical = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(schema_hex)))
        col_idx = logical.names.index(column)
        for batch in batch_iter:
            for row in batch.to_pylist():
                gid = row["gid"]
                marker = _fs.join(ckpt, f"g-{gid}.json")
                if _fs.exists(marker):
                    yield pa.RecordBatch.from_pydict(
                        {"rows": [_fs.read_bytes(marker).decode()]}
                    )
                    continue
                batches = []
                srcs = json.loads(row["paths"])
                for p in srcs:
                    bt = _fs.read_parquet(p)
                    batches.extend(
                        decode_batches(
                            bt.to_batches(), logical, aliases=aliases
                        )
                    )
                tbl = pa.Table.from_batches(batches).combine_chunks()
                values = kernel(tbl)
                if isinstance(values, pa.ChunkedArray):
                    values = values.combine_chunks()
                if not values.type.equals(logical.field(col_idx).type):
                    values = values.cast(logical.field(col_idx).type)
                tbl = tbl.set_column(
                    col_idx, logical.field(col_idx), values
                )
                if all_tfs:
                    from btrblocks_spark.sources.table import (
                        recompute_partition_arrow,
                    )

                    tbl = recompute_partition_arrow(tbl, all_tfs)
                out_rows = []
                for k, (pjson, sub) in enumerate(
                    split_by_partition(tbl, parts)
                ):
                    if sub.num_rows == 0:
                        continue
                    block_table, stats = encode_table(
                        sub,
                        seed=42,
                        bloom_cols=blooms,
                        ndv_cols=ndvs,
                        token_bloom_cols=tbcs,
                    )
                    fname = f"{job_id}-g{gid:05d}-{k}.parquet"
                    fpath = _fs.join(root, "data", fname)
                    fbytes = _write_blockfile_atomic(block_table, fpath)
                    out_rows.append(
                        {
                            "file_path": fpath,
                            "partition": pjson,
                            "row_count": stats["row_count"],
                            "block_count": block_table.num_rows,
                            "file_bytes": fbytes,
                            "raw_bytes": stats["raw_bytes"],
                            "stats": json.dumps(stats["columns"]),
                            "job_id": job_id,
                            "source_files": json.dumps(srcs),
                            "sort_key": "",
                        }
                    )
                payload = json.dumps(out_rows)
                _fs.write_bytes_atomic(marker, payload.encode())
                yield pa.RecordBatch.from_pydict({"rows": [payload]})

    new_rows: list[dict] = []
    for r in spec_df.mapInArrow(rewrite, "rows string").collect():
        new_rows.extend(json.loads(r.rows))
    sid = table._commit(
        new_rows,
        operation="backfill",
        replaced={r["file_path"] for r in files},
        extra_summary={"column": column},
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "rewritten_files": len(files),
        "new_files": len(new_rows),
        "column": column,
    }
