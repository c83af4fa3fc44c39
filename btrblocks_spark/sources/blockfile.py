"""Block-file encode/decode kernels (Arrow-level, used inside Spark tasks).

A block file is parquet with schema::

    block_id: int64, tuple_count: int32, zone: large_string, b_<col>: binary ...

Each ``b_<col>`` cell is one compressed block (codec blob); ``zone`` is
the per-block zone map — JSON {col: {min, max}} over the stat-typed
columns — enabling block-level predicate skipping at decode time (the
predicate ``scan()`` the reference declares but leaves UNREACHABLE,
``/root/reference/btrblocks/scheme/integer/PBP.cpp:51-56``). Block row
geometry mirrors the reference: <= 65536 tuples per block
(``/root/reference/btrblocks/btrblocks.hpp:24``) but additionally bounded
so one block's *bytes* stay near the 16 MiB part-size threshold
(``/root/reference/btrblocks/storage/Chunk.cpp:12``) — essential for wide
binary (image) columns where 65536 tuples would be gigabytes.
"""

from __future__ import annotations

import json as _json

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
    bloom_cols: list[str] | None = None,
    ndv_cols: list[str] | None = None,
    token_bloom_cols: list[str] | None = None,
) -> tuple[pa.Table, dict]:
    """Encode a logical Arrow table into block rows + file-level stats.

    Returns (block_table, stats) where stats =
    {col: {min, max, null_count}} (min/max None for binary cols) plus
    ``row_count`` / ``raw_bytes``. ``bloom_cols`` adds a per-file key
    bloom digest (``codec.bloom``) to those integer columns' stats —
    consulted by MERGE touched-file discovery (integer and string keys).
    ``ndv_cols`` adds a per-file KMV distinct sketch (``codec.bloom``)
    folded by ``stats_agg("approx_ndv", ...)`` into a table-level
    COUNT(DISTINCT) estimate with zero data I/O.
    ``token_bloom_cols`` adds a per-file bloom of a text column's token
    set — ``scan(prune={col: {"tokens_all": [...]}})`` skips files whose
    bloom rejects a query token (substring-search file skipping).
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
    stat_cols = [
        name
        for name in names
        if table.schema.field(name).type in STAT_TYPES
        or pa.types.is_timestamp(table.schema.field(name).type)
    ]
    block_ids, tuple_counts, zones = [], [], []
    # per-column block min/max scalars, kept to fold the FILE-level
    # min/max below without a second full-column pass (min over block
    # minima == min over the column; reduced through the same
    # pc.min_max kernel so null/NaN/binary ordering semantics are
    # byte-identical to the full scan this replaces)
    block_mm: dict[str, list] = {name: [] for name in stat_cols}
    for b, start in enumerate(range(0, max(n, 1), rows)):
        chunk = table.slice(start, rows)
        if chunk.num_rows == 0 and n > 0:
            break
        block_ids.append(b)
        tuple_counts.append(chunk.num_rows)
        zone: dict = {}
        for name in stat_cols:
            col = chunk.column(name)
            if chunk.num_rows and col.null_count < chunk.num_rows:
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                zone[name] = {"min": str(mn), "max": str(mx)}
                # an all-NaN float block yields the inverted identity
                # sentinel (min=inf > max=-inf): keep it in the zone
                # (prunes correctly — NaN matches no comparison) but do
                # NOT fold it into the file min/max, which must reflect
                # actual values like the full-column scan it replaces
                if not (
                    isinstance(mn, float)
                    and isinstance(mx, float)
                    and mn > mx
                ):
                    block_mm[name].extend((mn, mx))
        zones.append(_json.dumps(zone))
        for name in names:
            col = chunk.column(name)
            col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
            ps = encode_block_pieces(col, level=level, seed=seed + b)
            pieces[name].extend(ps)
            blob_lens[name].append(sum(memoryview(p).nbytes for p in ps))
    out = {
        "block_id": pa.array(block_ids, pa.int64()),
        "tuple_count": pa.array(tuple_counts, pa.int32()),
        "zone": pa.array(zones, pa.large_string()),
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
                if block_mm.get(name):
                    mm = pc.min_max(pa.array(block_mm[name], type=typ))
                else:
                    # degenerate: every non-null value is NaN — fall
                    # back to the full scan so the sentinel output
                    # matches the pre-optimization behavior exactly
                    mm = pc.min_max(col)
                entry["min"] = str(mm["min"].as_py())
                entry["max"] = str(mm["max"].as_py())
        if (
            (name in (bloom_cols or ()) or name in (ndv_cols or ()))
            and (
                pa.types.is_integer(typ)
                or pa.types.is_string(typ)
                or pa.types.is_large_string(typ)
            )
            and n
            and col.null_count < n
        ):
            from btrblocks_spark.codec.bloom import build_bloom, build_kmv

            vals = col.drop_null()
            if pa.types.is_integer(typ):
                keys = vals.to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                keys = np.asarray(
                    pc.unique(vals.combine_chunks()
                              if isinstance(vals, pa.ChunkedArray)
                              else vals).to_pylist(),
                    dtype=object,
                )
            if name in (bloom_cols or ()):
                bloom = build_bloom(keys)
                if bloom is not None:
                    entry["bloom"] = bloom
            if name in (ndv_cols or ()):
                kmv = build_kmv(keys)
                if kmv is not None:
                    entry["kmv"] = kmv
        if (
            name in (ndv_cols or ())
            and (pa.types.is_integer(typ) or pa.types.is_floating(typ))
            and n
            and col.null_count < n
        ):
            # equi-depth histogram: 33 exact within-file quantile
            # boundaries -> stats_agg("approx_quantile:q") folds them
            # into a table-level quantile with ZERO data I/O
            hv = (
                col.drop_null().to_numpy(zero_copy_only=False).astype(float)
            )
            qs = np.quantile(hv, np.linspace(0.0, 1.0, 33), method="lower")
            entry["hist"] = [float(x) for x in qs]
        if name in (token_bloom_cols or ()) and pa.types.is_string(typ):
            from btrblocks_spark.codec.bloom import build_token_bloom

            tb = build_token_bloom(col.to_pylist())
            if tb is not None:
                entry["token_bloom"] = tb
        stats["columns"][name] = entry
    return pa.table(out), stats


def load_eq_deletes(
    eq_specs: list[tuple[str, int]],
) -> list[tuple[int, dict[str, pa.ChunkedArray]]]:
    """Load equality delete files (Iceberg v2 content=2): each spec is
    ``(path, seq)``; the parquet file holds the delete KEY column(s).
    Returns ``[(seq, {key_col: values})...]`` sorted by seq — a delete
    applies to data files whose seq is strictly lower (rows appended in
    the same commit as the delete survive it)."""
    from btrblocks_spark.sources import fs as _fs

    out = []
    for path, seq in sorted(eq_specs, key=lambda s: s[1]):
        t = _fs.read_parquet(path)
        cols = [c for c in t.schema.names if not c.startswith("_")]
        out.append((int(seq), {c: t.column(c) for c in cols}))
    return out


def eq_delete_mask(
    batch: pa.RecordBatch,
    file_seq: int,
    eq_dels: list[tuple[int, dict[str, pa.ChunkedArray]]],
) -> np.ndarray | None:
    """Boolean KEEP mask for ``batch`` under the equality deletes, or
    None when nothing applies. Single-key deletes are a vectorized
    ``pc.is_in``; multi-key falls back to a tuple-set probe
    (delete sets are the since-last-compaction upsert keys — small).

    NULL semantics follow Iceberg v2 equality deletes: a NULL key value
    in a delete file matches NULL key values in data rows (``is_in``'s
    default MATCH behavior / exact ``None`` tuples) — so an upsert_eq
    over a NULL-keyed group really replaces it."""
    import pyarrow.compute as pc

    drop = None
    for seq, keys in eq_dels:
        if seq <= file_seq:
            continue
        cols = list(keys)
        if len(cols) == 1:
            c = cols[0]
            # is_in: NULL matches iff the value_set holds a NULL
            # (Iceberg null=null); fill_null guards pyarrow versions
            # that emit null instead of false for unmatched nulls
            hit = pc.fill_null(
                pc.is_in(
                    batch.column(c), value_set=keys[c].combine_chunks()
                ),
                False,
            )
            hit_np = hit.to_numpy(zero_copy_only=False).astype(bool)
        else:
            # to_pylist keeps nulls as exact None (pandas would coerce
            # nullable ints to float NaN, breaking both equality and
            # the null=null match)
            kset = set(
                zip(*[keys[c].to_pylist() for c in cols])
            )
            bcols = [batch.column(c).to_pylist() for c in cols]
            hit_np = np.fromiter(
                (t in kset for t in zip(*bcols)),
                dtype=bool,
                count=batch.num_rows,
            )
        drop = hit_np if drop is None else (drop | hit_np)
    if drop is None or not drop.any():
        return None
    return ~drop


def load_delete_index(
    delete_paths: list[str], data_paths: list[str] | None = None
) -> dict[str, np.ndarray]:
    """{data_file_path: sorted unique positions} from positional delete
    files (parquet, columns ``file_path``/``pos``, sorted on write).

    ``data_paths`` narrows the read to the task's own files via a
    parquet row-group filter — delete files are written sorted by
    file_path, so their row-group stats prune the irrelevant ranges and
    a 1000-task scan does not re-read every delete row 1000 times.
    """
    from btrblocks_spark.sources import fs as _fs

    filters = None
    if data_paths is not None:
        filters = [("file_path", "in", list(data_paths))]
    tables = []
    for dp in delete_paths:
        t = _fs.read_parquet(dp, columns=["file_path", "pos"], filters=filters)
        if t.num_rows:
            tables.append(t)
    if not tables:
        return {}
    t = pa.concat_tables(tables)
    fps = np.asarray(t.column("file_path").to_pylist(), dtype=object)
    poss = t.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(fps, kind="stable")
    fps, poss = fps[order], poss[order]
    uniq, starts = np.unique(fps, return_index=True)
    bounds = np.append(starts, len(fps))
    return {
        str(uniq[i]): np.unique(poss[bounds[i] : bounds[i + 1]])
        for i in range(len(uniq))
    }


def decode_batches(
    batch_iter,
    logical_schema: pa.Schema,
    columns: list[str] | None = None,
    with_file: bool = False,
    predicate: dict | None = None,
    with_pos: bool = False,
    deletes: np.ndarray | None = None,
    aliases: dict[str, list[str]] | None = None,
):
    """mapInArrow kernel: block rows -> logical record batches.

    With ``with_file`` the incoming batches must carry a ``_file`` column
    (from ``input_file_name()``); it is repeated per decoded row so callers
    can trace each row to its data file (MERGE touched-file discovery).

    ``predicate`` ({col: (lo, hi) | value-set}, the ``scan(prune=...)``
    shape) skips whole blocks whose zone map proves no row can match —
    the block is never decoded (ONE_VALUE / RLE blocks included). Like
    file pruning this is advisory: surviving blocks may still hold
    non-matching rows, so callers keep their row-level ``filter``.
    Files written before zone maps existed decode every block.

    ``with_pos`` appends a ``_pos`` int64 column: the row's global
    position within its FILE (block offset + row-in-block), the
    Iceberg-v2 positional-delete coordinate. ``deletes`` is a SORTED
    int64 array of file positions to drop at decode time (merge-on-read
    scan merge). Both require the batch stream to come from a single
    file in block order — true for the per-file native read path.

    ``aliases`` ({current_name: [former_names...]}, from the table's
    rename history) lets files written before a ``rename_column`` keep
    decoding: when a block's ``b_<name>`` cell is absent or null, the
    former names are tried in order before the column falls back to
    nulls. New files carry only the current name, so the fallback costs
    nothing on converged tables.
    """
    want = columns or logical_schema.names
    fields = [logical_schema.field(name) for name in want]
    aliases = aliases or {}
    cands = {f.name: [f.name] + list(aliases.get(f.name, [])) for f in fields}
    extra = []
    if with_file:
        extra.append(pa.field("_file", pa.string()))
    if with_pos:
        extra.append(pa.field("_pos", pa.int64()))
    out_schema = pa.schema(fields + extra)
    offset = 0  # file-global row position of the next block
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
        for phys in {p for f in fields for p in cands[f.name]}:
            if f"b_{phys}" not in present:
                # schema evolution: files written before add_column lack
                # the blob column — rows decode as nulls (or through a
                # rename alias below)
                views[phys] = None
                continue
            col = batch.column(f"b_{phys}")
            if pa.types.is_large_binary(col.type):
                pass
            elif col.null_count == 0:
                col = col.cast(pa.large_binary())
            else:
                views[phys] = ("nullable", col)
                continue
            bufs = col.buffers()
            offs = np.frombuffer(
                bufs[1], np.int64, len(col) + 1, col.offset * 8
            )
            views[phys] = (memoryview(bufs[2]) if bufs[2] else None, offs)
        if (with_pos or deletes is not None) and tuple_counts is None:
            raise ValueError(
                "_pos/deletes decoding needs the tuple_count column"
            )
        zone_col = (
            batch.column("zone")
            if predicate and "zone" in present
            else None
        )
        for i in range(batch.num_rows):
            n = (
                int(tuple_counts[i]) if tuple_counts is not None else None
            )
            if zone_col is not None:
                zcell = zone_col[i]
                if zcell.is_valid:
                    from btrblocks_spark.sources.pruning import (
                        stats_may_match,
                    )

                    if not stats_may_match(
                        _json.loads(zcell.as_py()), predicate
                    ):
                        offset += n or 0
                        continue
            arrays = []
            deferred = []
            for f in fields:
                blob = None
                for phys in cands[f.name]:
                    view = views[phys]
                    if view is None:
                        continue
                    if view[0] == "nullable":
                        cell = view[1][i]
                        if cell.is_valid:
                            blob = cell.as_py()
                            break
                    else:
                        data, offs = view
                        if data is not None and offs[i + 1] > offs[i]:
                            blob = data[offs[i] : offs[i + 1]]
                            break
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
            if with_pos:
                arrays.append(
                    pa.array(np.arange(offset, offset + (n or 0)), pa.int64())
                )
            out = pa.RecordBatch.from_arrays(arrays, schema=out_schema)
            if deletes is not None and n:
                i0, i1 = np.searchsorted(deletes, [offset, offset + n])
                if i1 > i0:
                    mask = np.ones(n, bool)
                    mask[(deletes[i0:i1] - offset).astype(np.int64)] = False
                    out = out.filter(pa.array(mask))
            offset += n or 0
            if out.num_rows:
                yield out


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
