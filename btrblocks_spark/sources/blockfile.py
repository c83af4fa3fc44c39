"""Block-file encode/decode kernels (Arrow-level, used inside Spark tasks).

A block file is parquet with schema::

    block_id: int64, tuple_count: int32, b_<col>: binary ...

Each ``b_<col>`` cell is one compressed block (codec blob). Block row
geometry mirrors the reference: <= 65536 tuples per block
(``/root/reference/btrblocks/btrblocks.hpp:24``) but additionally bounded
so one block's *bytes* stay near the 16 MiB part-size threshold
(``/root/reference/btrblocks/storage/Chunk.cpp:12``) — essential for wide
binary (image) columns where 65536 tuples would be gigabytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from btrblocks_spark import BLOCK_SIZE, PART_SIZE_BYTES
from btrblocks_spark.codec import decode_block, encode_block
from btrblocks_spark.codec.block import encode_block_pieces

STAT_TYPES = (
    pa.int32(),
    pa.int64(),
    pa.float64(),
    pa.string(),
    pa.large_string(),
)


def choose_block_rows(table: pa.Table) -> int:
    """Rows per block: min(65536, rows that fit the widest column in 16MiB)."""
    n = table.num_rows
    if n == 0:
        return BLOCK_SIZE
    widest = max(
        (col.nbytes / max(n, 1)) for col in table.columns
    )
    by_bytes = int(PART_SIZE_BYTES / max(widest, 1))
    return max(256, min(BLOCK_SIZE, by_bytes))


def encode_table(
    table: pa.Table,
    seed: int = 42,
    level: int | None = None,
    block_rows: int | None = None,
) -> tuple[pa.Table, dict]:
    """Encode a logical Arrow table into block rows + file-level stats.

    Returns (block_table, stats) where stats =
    {col: {min, max, null_count}} (min/max None for binary cols) plus
    ``row_count`` / ``raw_bytes``.
    """
    if level is None:
        from btrblocks_spark.codec.config import get_config

        level = get_config().max_cascade_depth
    n = table.num_rows
    rows = block_rows or choose_block_rows(table)
    names = table.schema.names
    # one up-front defrag: every per-block slice below is then a zero-copy
    # view into a single chunk instead of a combine_chunks copy per block
    table = table.combine_chunks()
    # per column: flat list of blob pieces + per-blob byte lengths; the
    # column buffer is assembled with ONE join + from_buffers (no
    # per-blob bytes materialization, no pa.array re-copy)
    pieces: dict[str, list] = {name: [] for name in names}
    blob_lens: dict[str, list] = {name: [] for name in names}
    block_ids, tuple_counts = [], []
    for b, start in enumerate(range(0, max(n, 1), rows)):
        chunk = table.slice(start, rows)
        if chunk.num_rows == 0 and n > 0:
            break
        block_ids.append(b)
        tuple_counts.append(chunk.num_rows)
        for name in names:
            col = chunk.column(name)
            col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
            ps = encode_block_pieces(col, level=level, seed=seed + b)
            pieces[name].extend(ps)
            blob_lens[name].append(sum(memoryview(p).nbytes for p in ps))
    out = {
        "block_id": pa.array(block_ids, pa.int64()),
        "tuple_count": pa.array(tuple_counts, pa.int32()),
    }
    for name in names:
        buf = b"".join(pieces[name])
        offs = np.zeros(len(blob_lens[name]) + 1, np.int64)
        np.cumsum(blob_lens[name], out=offs[1:])
        out[f"b_{name}"] = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            len(blob_lens[name]),
            [None, pa.py_buffer(offs), pa.py_buffer(buf)],
        )
    stats: dict = {"row_count": n, "raw_bytes": table.nbytes, "columns": {}}
    for name in names:
        col = table.column(name)
        entry = {"null_count": int(col.null_count), "min": None, "max": None}
        typ = col.type
        if typ in STAT_TYPES or pa.types.is_timestamp(typ):
            if n and col.null_count < n:
                mm = pc.min_max(col)
                entry["min"] = str(mm["min"].as_py())
                entry["max"] = str(mm["max"].as_py())
        stats["columns"][name] = entry
    return pa.table(out), stats


def decode_batches(
    batch_iter,
    logical_schema: pa.Schema,
    columns: list[str] | None = None,
    with_file: bool = False,
):
    """mapInArrow kernel: block rows -> logical record batches.

    With ``with_file`` the incoming batches must carry a ``_file`` column
    (from ``input_file_name()``); it is repeated per decoded row so callers
    can trace each row to its data file (MERGE touched-file discovery).
    """
    want = columns or logical_schema.names
    fields = [logical_schema.field(name) for name in want]
    out_schema = pa.schema(
        fields + ([pa.field("_file", pa.string())] if with_file else [])
    )
    for batch in batch_iter:
        # zero-copy blob views: slice each binary column's data buffer
        # directly instead of copying every blob out via .as_py()
        views = {}
        present = set(batch.schema.names)
        tuple_counts = (
            batch.column("tuple_count").to_numpy(zero_copy_only=False)
            if "tuple_count" in present
            else None
        )
        for f in fields:
            if f"b_{f.name}" not in present:
                # schema evolution: files written before add_column lack
                # the blob column — rows decode as nulls
                views[f.name] = None
                continue
            col = batch.column(f"b_{f.name}")
            if pa.types.is_large_binary(col.type):
                pass
            elif col.null_count == 0:
                col = col.cast(pa.large_binary())
            else:
                views[f.name] = ("nullable", col)
                continue
            bufs = col.buffers()
            offs = np.frombuffer(
                bufs[1], np.int64, len(col) + 1, col.offset * 8
            )
            views[f.name] = (memoryview(bufs[2]) if bufs[2] else None, offs)
        for i in range(batch.num_rows):
            arrays = []
            n = (
                int(tuple_counts[i]) if tuple_counts is not None else None
            )
            deferred = []
            for f in fields:
                view = views[f.name]
                blob = None
                if view is None:
                    pass
                elif view[0] == "nullable":
                    cell = view[1][i]
                    blob = cell.as_py() if cell.is_valid else None
                else:
                    data, offs = view
                    blob = data[offs[i] : offs[i + 1]]
                if blob is None:
                    deferred.append((len(arrays), f.type))
                    arrays.append(None)
                    continue
                arr = decode_block(blob)
                if not arr.type.equals(f.type):
                    arr = arr.cast(f.type)
                arrays.append(arr)
                n = len(arr)
            for pos, typ in deferred:
                if n is None:
                    raise ValueError(
                        "cannot size a null column block: select at least "
                        "one materialized column or tuple_count"
                    )
                arrays[pos] = pa.nulls(n, typ)
            if with_file:
                fname = batch.column("_file")[i].as_py()
                arrays.append(pa.array([fname] * (n or 0), pa.string()))
            yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def split_by_partition(table: pa.Table, parts: list[str]):
    """[(partition_json, subtable)] — rows grouped by partition-column
    values (shared by the write, cluster, and merge kernels)."""
    import json as _json

    if not parts:
        return [("{}", table)]
    # NULL partition values: fill with a sentinel BEFORE joining so the
    # composite key never goes null (a null key made u.as_py() None and
    # crashed .split in the worker kernels); the sentinel maps back to
    # JSON null in the manifest partition spec.
    _NULL = "\x00__null__"
    key_str = None
    for c in parts:
        col = pc.fill_null(pc.cast(table.column(c), pa.string()), _NULL)
        key_str = (
            col
            if key_str is None
            else pc.binary_join_element_wise(key_str, col, "\x1f")
        )
    out = []
    for u in pc.unique(key_str.combine_chunks()):
        vals = [None if v == _NULL else v for v in u.as_py().split("\x1f")]
        pjson = _json.dumps(dict(zip(parts, vals)))
        out.append((pjson, table.filter(pc.equal(key_str, u))))
    return out
