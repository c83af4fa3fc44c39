"""Spark Python DataSource for BtrTable — ``format("btrtable")``.

The idiomatic integration surface (PySpark 4 ``pyspark.sql.datasource``):

- **Batch**: ``spark.read.format("btrtable").load(root)`` — schema from
  the table metadata, one input partition per data file, executor-side
  pyarrow read + block decode (positional delete files merged exactly
  like ``BtrTable.scan``). No collect, no JVM connector.
- **Streaming**: ``spark.readStream.format("btrtable").load(root)`` —
  a CDC tail of the snapshot log. Offsets are snapshot ids; each
  micro-batch emits the commits in ``(start, end]`` as change rows
  (table columns + ``_change_type`` 'insert'|'delete' +
  ``_change_snapshot_id``), with per-file input partitions so decoding
  runs in executors (a ``DataSourceStreamReader``, not the
  driver-reading Simple variant). Append/stream-append commits emit
  inserts; merge-on-read commits emit inserts plus the deleted rows'
  old images (reconstructed by position from the immutable target
  files); compaction/clustering/manifest rewrites emit nothing
  (physical-only); copy-on-write merges raise, as in
  ``BtrTable.scan_changes``.

Register once per session::

    from btrblocks_spark.sources.spark_datasource import BtrTableDataSource
    spark.dataSource.register(BtrTableDataSource)
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_CHANGE_FIELDS = [
    StructField("_change_type", StringType()),
    StructField("_change_snapshot_id", LongType()),
]


def _table(path: str):
    from btrblocks_spark.sources.table import BtrTable

    # metadata-only usage: no SparkSession needed (and none exists in
    # executor processes)
    return BtrTable(None, path)


def _user_schema_hex(meta: dict) -> str:
    """Table arrow schema minus hidden-partitioning _p_* columns — what
    the DataSource exposes (the derived layout is an internal detail,
    like Iceberg's partition fields)."""
    logical = pa.ipc.read_schema(
        pa.py_buffer(bytes.fromhex(meta["arrow_schema_hex"]))
    )
    keep = [f for f in logical if not f.name.startswith("_p_")]
    if len(keep) == len(logical):
        return meta["arrow_schema_hex"]
    return pa.schema(keep).serialize().hex().decode()


def _decode_file(
    path: str,
    schema_hex: str,
    del_paths: list[str],
    predicate: dict | None = None,
    aliases: dict | None = None,
):
    """Decode one block file to logical RecordBatches, deletes merged,
    blocks failing ``predicate`` (the prune-dict shape) skipped via
    their zone maps."""
    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.blockfile import (
        decode_batches,
        load_delete_index,
    )

    logical = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(schema_hex)))
    bt = fs.read_parquet(path)
    keep = [
        c
        for c in bt.schema.names
        if c == "tuple_count"
        or c.startswith("b_")
        or (c == "zone" and predicate)
    ]
    bt = bt.select(keep)
    deletes = None
    if del_paths:
        deletes = load_delete_index(del_paths, [path]).get(path)
    yield from decode_batches(
        bt.to_batches(),
        logical,
        deletes=deletes,
        predicate=predicate,
        aliases=aliases,
    )


class BtrTableDataSource(DataSource):
    """``format("btrtable")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "btrtable"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError(
                "btrtable needs a path: .load('/path/to/table')"
            )
        return root

    def schema(self):
        meta = _table(self._root()).metadata()
        base = StructType.fromJson(json.loads(meta["spark_schema_json"]))
        base = StructType(
            [f for f in base.fields if not f.name.startswith("_p_")]
        )
        if self.options.get("cdc", "").lower() in ("1", "true"):
            return StructType(base.fields + _CHANGE_FIELDS)
        return base

    def reader(self, schema: StructType) -> "BtrTableBatchReader":
        # pushdown is opt-in: Spark REFUSES any reader that implements
        # pushFilters while spark.sql.python.filterPushdown.enabled is
        # false, so the capability lives in a subclass selected by
        # .option("pushdown", "true") (set the conf too)
        sid = self.options.get("snapshotid")
        sid = int(sid) if sid else None
        if self.options.get("pushdown", "").lower() in ("1", "true"):
            return BtrTablePushdownReader(self._root(), sid)
        return BtrTableBatchReader(self._root(), sid)

    def streamReader(self, schema: StructType) -> "BtrTableStreamReader":
        cdc = self.options.get("cdc", "").lower() in ("1", "true")
        return BtrTableStreamReader(self._root(), self.options, cdc)

    def writer(self, schema: StructType, overwrite: bool):
        return BtrTableArrowWriter(
            self._root(), self.options, schema, overwrite
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
        return BtrTableStreamArrowWriter(
            self._root(), self.options, schema, overwrite
        )


class BtrTableBatchReader(DataSourceReader):
    def __init__(self, root: str, snapshot_id: int | None = None):
        # ``.option("snapshotId", N)`` = time travel: plan files and
        # deletes AS OF that snapshot (schema stays the current one,
        # matching BtrTable.scan — old files decode through aliases)
        self.root = root
        t = _table(root)
        meta = t.metadata()
        self.schema_hex = _user_schema_hex(meta)
        self.aliases = meta.get("renames", {})
        self.rows = t.data_files(snapshot_id)
        self.del_paths = [
            r["file_path"] for r in t.delete_files(snapshot_id)
        ]
        if t.eq_delete_files(snapshot_id):
            raise RuntimeError(
                "table carries equality delete files (upsert_eq); the "
                "Python DataSource reader merges positional deletes "
                "only — run compact() first or read via BtrTable.scan()"
            )
        self.prune: dict = {}
        # every spec that ever wrote files (partition-spec evolution):
        # prune translation must cover old-spec layouts too — shared
        # rule with BtrTable.scan so the two paths cannot diverge
        from btrblocks_spark.sources.table import all_transforms_of

        self._transforms = all_transforms_of(meta)

    def partitions(self):
        from btrblocks_spark.sources.table import _translate_prune

        rows = self.rows
        # hidden partitioning: pushed predicates on transform SOURCE
        # columns also prune the derived _p_* layout
        self.prune = _translate_prune(self.prune, self._transforms) or {}
        if self.prune:
            from btrblocks_spark.sources.table import _file_may_match

            rows = [r for r in rows if _file_may_match(r, self.prune)]
        return [
            InputPartition(
                (
                    r["file_path"],
                    self.schema_hex,
                    self.del_paths,
                    self.prune,
                    self.aliases,
                )
            )
            for r in rows
        ]

    def read(self, partition: InputPartition):
        path, schema_hex, del_paths, prune, aliases = partition.value
        yield from _decode_file(
            path,
            schema_hex,
            del_paths,
            predicate=prune or None,
            aliases=aliases or None,
        )


class BtrTablePushdownReader(BtrTableBatchReader):
    def pushFilters(self, filters):
        """Catalyst filter pushdown -> manifest + zone-map pruning.

        Supported shapes (top-level column vs literal: =, <, <=, >, >=,
        IN) become prune-dict bounds that skip FILES via manifest stats
        and BLOCKS via zone maps. Pruning here is ADVISORY — surviving
        files/blocks may still hold non-matching rows — so every filter
        is returned for Spark to re-apply after the scan (the documented
        partial-pushdown contract); the pushdown only removes I/O and
        decode work, never rows Spark wouldn't also remove."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        bounds: dict = {}
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            v = getattr(f, "value", None)
            lo, hi, vals = bounds.get(col, (None, None, None))
            if isinstance(f, EqualTo) and not isinstance(v, (list, bool)):
                vals = {v} if vals is None else (vals & {v})
            elif isinstance(f, In):
                s = set(f.value)
                vals = s if vals is None else (vals & s)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                lo = v if lo is None else max(lo, v)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                hi = v if hi is None else min(hi, v)
            else:
                continue
            bounds[col] = (lo, hi, vals)
        for col, (lo, hi, vals) in bounds.items():
            if vals is not None:
                self.prune[col] = sorted(vals)
            elif lo is not None or hi is not None:
                self.prune[col] = (lo, hi)
        return filters  # advisory: Spark re-applies everything


class BtrTableStreamReader(DataSourceStreamReader):
    """Snapshot-log tail: offset = {"snapshot_id": N}."""

    def __init__(self, root: str, options, cdc: bool = False):
        self.root = root
        self.cdc = cdc
        start = options.get("startingsnapshotid") or options.get(
            "startingSnapshotId"
        )
        self._start = int(start) if start is not None else None

    def initialOffset(self) -> dict:
        if self._start is not None:
            return {"snapshot_id": self._start}
        # default: tail from the CURRENT snapshot (only new commits)
        return {"snapshot_id": _table(self.root).current_snapshot_id()}

    def latestOffset(self) -> dict:
        return {"snapshot_id": _table(self.root).current_snapshot_id()}

    def partitions(self, start: dict, end: dict):
        t = _table(self.root)
        meta = t.metadata()
        schema_hex = _user_schema_hex(meta)
        aliases = meta.get("renames", {})
        known = {s["snapshot_id"]: s for s in meta["snapshots"]}
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        parts: list[InputPartition] = []
        for sid in sorted(known):
            if not (lo < sid <= hi):
                continue
            snap = known[sid]
            if snap.get("staged") or snap.get("branch"):
                continue  # unpublished stages / unadopted branch
                # commits are not (yet) main history
            op = snap["operation"]
            if op in ("compact", "cluster", "rewrite-manifests",
                      "create-empty", "add-column", "rename-column",
                      "drop-column"):
                continue
            if op == "merge" and snap["summary"].get("strategy") != "mor":
                raise NotImplementedError(
                    f"snapshot {sid}: copy-on-write merge has no "
                    "changelog representation; use strategy='mor' with "
                    "streaming consumers"
                )
            if op not in ("append", "stream-append", "merge",
                          "upsert_eq"):
                raise NotImplementedError(
                    f"snapshot {sid}: operation {op!r} is not streamable"
                )
            added = self._added_rows(t, snap)
            del_paths = [
                r["file_path"]
                for r in added
                if (r.get("content") or 0) == 1
            ]
            eq_rows = [
                r for r in added if (r.get("content") or 0) == 2
            ]
            if (del_paths or eq_rows) and not self.cdc:
                raise NotImplementedError(
                    f"snapshot {sid} carries delete files: plain "
                    "append-tail streaming cannot represent them — set "
                    ".option('cdc', 'true') for change rows"
                )
            if eq_rows:
                parts.extend(
                    self._eq_delete_partitions(
                        t, snap, eq_rows, schema_hex, aliases
                    )
                )
            for r in added:
                if (r.get("content") or 0) != 0:
                    continue
                parts.append(
                    InputPartition(
                        (
                            "insert",
                            r["file_path"],
                            schema_hex,
                            [],
                            sid,
                            aliases,
                        )
                    )
                )
            if del_paths:
                targets = sorted(
                    {
                        p
                        for r in added
                        if (r.get("content") or 0) == 1
                        for p in json.loads(r["source_files"] or "[]")
                    }
                )
                for p in targets:
                    parts.append(
                        InputPartition(
                            (
                                "delete",
                                p,
                                schema_hex,
                                del_paths,
                                sid,
                                aliases,
                            )
                        )
                    )
        return parts or [InputPartition(("empty", "", "", [], hi, {}))]

    @staticmethod
    def _eq_delete_partitions(
        t, snap: dict, eq_rows: list[dict], schema_hex: str, aliases
    ) -> list:
        """One partition per PARENT data file an upsert_eq commit's
        equality deletes might touch (seq below the commit, key range
        overlap): the task re-derives the old images by decoding its
        file with the parent's own delete state applied, then keeping
        rows matching the new keys."""
        from btrblocks_spark.sources.table import _file_may_match

        sid = snap["snapshot_id"]
        parent_rows = t._manifest_rows(snap["parent"])
        parent_del = [
            r["file_path"]
            for r in parent_rows
            if (r.get("content") or 0) == 1
        ]
        parent_eq = [
            [r["file_path"], r.get("seq") or 0]
            for r in parent_rows
            if (r.get("content") or 0) == 2
        ]
        eq_paths = [r["file_path"] for r in eq_rows]
        prune: dict = {}
        for r in eq_rows:
            for c, st in json.loads(r["stats"] or "{}").items():
                if st.get("min") is None:
                    continue
                lo, hi = prune.get(c, (st["min"], st["max"]))
                prune[c] = (min(lo, st["min"]), max(hi, st["max"]))
        parts = []
        for r in parent_rows:
            if (r.get("content") or 0) != 0:
                continue
            if (r.get("seq") or 0) >= sid:
                continue
            if prune and not _file_may_match(r, prune):
                continue
            parts.append(
                InputPartition(
                    (
                        "eqdelete",
                        r["file_path"],
                        schema_hex,
                        {
                            "eq_paths": eq_paths,
                            "file_seq": r.get("seq") or 0,
                            "parent_del_paths": parent_del,
                            "parent_eq_specs": parent_eq,
                        },
                        sid,
                        aliases,
                    )
                )
            )
        return parts

    @staticmethod
    def _added_rows(t, snap: dict) -> list[dict]:
        sid = snap["snapshot_id"]
        fast = f"manifest-{sid}-a.parquet"
        names = {e["name"] for e in t._manifest_list(sid)}
        if fast in names:
            return t._read_manifest(fast)
        prev = {r["file_path"] for r in t._manifest_rows(snap["parent"])}
        return [
            r
            for r in t._manifest_rows(sid)
            if r["file_path"] not in prev
        ]

    def read(self, partition: InputPartition):
        kind, path, schema_hex, del_paths, sid, aliases = partition.value
        if kind == "empty":
            return
        if kind == "insert":
            for rb in _decode_file(path, schema_hex, [], aliases=aliases):
                yield (
                    _with_change_cols(rb, "insert", sid)
                    if self.cdc
                    else rb
                )
            return
        if kind == "eqdelete":
            # old images of an upsert_eq commit: decode this parent data
            # file with the parent's delete state applied, keep rows
            # matching the commit's new keys
            from btrblocks_spark.sources import fs
            from btrblocks_spark.sources.blockfile import (
                decode_batches,
                eq_delete_mask,
                load_delete_index,
                load_eq_deletes,
            )

            aux = del_paths  # dict payload for this partition kind
            logical = pa.ipc.read_schema(
                pa.py_buffer(bytes.fromhex(schema_hex))
            )
            fseq = aux["file_seq"]
            pos = (
                load_delete_index(aux["parent_del_paths"], [path]).get(path)
                if aux["parent_del_paths"]
                else None
            )
            parent_eq = (
                load_eq_deletes(
                    [tuple(s) for s in aux["parent_eq_specs"]]
                )
                if aux["parent_eq_specs"]
                else []
            )
            new_keys = load_eq_deletes(
                [(p, sid) for p in aux["eq_paths"]]
            )
            bt = fs.read_parquet(path)
            bt = bt.select(
                [
                    c
                    for c in bt.schema.names
                    if c == "tuple_count" or c.startswith("b_")
                ]
            )
            for rb in decode_batches(
                bt.to_batches(), logical, deletes=pos, aliases=aliases
            ):
                if parent_eq:
                    m = eq_delete_mask(rb, fseq, parent_eq)
                    if m is not None:
                        rb = rb.filter(pa.array(m))
                keep = eq_delete_mask(rb, fseq, new_keys)
                if keep is None:  # no row of this batch was overwritten
                    continue
                old = rb.filter(pa.array(~keep))
                if old.num_rows:
                    yield _with_change_cols(old, "delete", sid)
            return
        # delete: old images of the rows this commit's delete files
        # removed from `path` — decode with positions, keep only them
        from btrblocks_spark.sources import fs
        from btrblocks_spark.sources.blockfile import (
            decode_batches,
            load_delete_index,
        )

        logical = pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(schema_hex))
        )
        positions = load_delete_index(del_paths, [path]).get(path)
        if positions is None or len(positions) == 0:
            return
        bt = fs.read_parquet(path)
        bt = bt.select(
            [
                c
                for c in bt.schema.names
                if c == "tuple_count" or c.startswith("b_")
            ]
        )
        for rb in decode_batches(
            bt.to_batches(), logical, with_pos=True, aliases=aliases
        ):
            pos = rb.column(rb.num_columns - 1).to_numpy(
                zero_copy_only=False
            )
            mask = np.zeros(len(pos), bool)
            i0, i1 = np.searchsorted(positions, [pos[0], pos[-1] + 1])
            hits = positions[i0:i1] - pos[0]
            if len(hits) == 0:
                continue
            mask[hits.astype(np.int64)] = True
            kept = rb.filter(pa.array(mask))
            # drop _pos, append change columns
            kept = pa.RecordBatch.from_arrays(
                [kept.column(i) for i in range(kept.num_columns - 1)],
                names=[
                    kept.schema.field(i).name
                    for i in range(kept.num_columns - 1)
                ],
            )
            yield _with_change_cols(kept, "delete", sid)

    def commit(self, end: dict) -> None:
        pass


def _with_change_cols(rb: pa.RecordBatch, kind: str, sid: int):
    n = rb.num_rows
    arrays = [rb.column(i) for i in range(rb.num_columns)]
    names = [rb.schema.field(i).name for i in range(rb.num_columns)]
    arrays.append(pa.array([kind] * n, pa.string()))
    arrays.append(pa.array([sid] * n, pa.int64()))
    names += ["_change_type", "_change_snapshot_id"]
    return pa.RecordBatch.from_arrays(arrays, names=names)


# --------------------------------------------------------------- writer
from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _BtrWriteMessage(WriterCommitMessage):
    rows_json: str  # manifest rows written by this task
    schema_hex: str  # arrow schema of the task's data ("" if empty)


class BtrTableArrowWriter(DataSourceArrowWriter):
    """``df.write.format("btrtable").save(root)`` — executors encode
    Arrow batches into block files (same kernels as ``BtrTable.append``)
    and return manifest rows as commit messages; the driver assembles
    them into ONE atomic snapshot commit. ``mode("append")`` adds to or
    creates the table; ``mode("overwrite")`` replaces every current
    data/delete file in the same commit. Options: ``partitionBy``
    (comma-separated, create only), ``bloomCols``, ``maxRowsPerFile``.
    """

    def __init__(self, root: str, options, schema, overwrite: bool):
        self.root = root
        self.overwrite = overwrite
        self.schema_json = schema.json()
        import uuid as _uuid

        self.job_id = f"dsw-{_uuid.uuid4().hex[:8]}"
        self.max_rows = int(options.get("maxrowsperfile") or 0) or None
        # ``.option("upsertKey", "image_id")``: every write() batch also
        # emits its distinct keys as equality delete files and the
        # commit becomes an Iceberg-v2 upsert — older versions of the
        # keys vanish at scan time, nothing is read or rewritten. The
        # streaming-sink form of operators/upsert.upsert_eq.
        self.upsert_on = [
            c for c in (options.get("upsertkey") or "").split(",") if c
        ]
        if self.upsert_on and overwrite:
            raise ValueError(
                "upsertKey cannot be combined with mode('overwrite')"
            )
        t = _table(root)
        try:
            meta = t.metadata()
            self.exists = True
            self.partition_by = meta.get("partition_by", [])
            self.partition_transforms = meta.get("partition_transforms", [])
            self.bloom_cols = meta.get("bloom_cols", [])
            self.ndv_cols = meta.get("ndv_cols", [])
            self.token_bloom_cols = meta.get("token_bloom_cols", [])
        except (FileNotFoundError, OSError):
            self.exists = False
            import re as _re

            from pyspark.sql.types import StructType as _ST

            from btrblocks_spark.sources.table import (
                _parse_partition_specs,
                _validate_transforms,
            )

            raw = [
                c
                for c in _re.split(
                    r",(?![^(]*\))", options.get("partitionby") or ""
                )
                if c
            ]
            self.partition_by, self.partition_transforms = (
                _parse_partition_specs(raw)
            )
            sch = _ST.fromJson(json.loads(self.schema_json))
            reserved = [
                f.name for f in sch.fields if f.name.startswith("_p_")
            ]
            if reserved:
                raise ValueError(
                    f"column names {reserved} use the reserved hidden-"
                    "partitioning prefix '_p_'"
                )
            _validate_transforms(self.partition_transforms, sch)
            # derived _p_* fields are SCHEMA-OWNED: mirror BtrTable.create
            # so spark_schema_json and arrow_schema_hex agree on the
            # hidden-partitioning columns (scan's _spark_schema_for would
            # otherwise KeyError on any explicit _p_* request)
            from pyspark.sql.types import (
                IntegerType as _IT,
                LongType as _LT,
                StringType as _StrT,
                StructField as _SF,
            )

            for tf in self.partition_transforms:
                if tf["kind"] in ("bucket", "days"):
                    dt = _IT()
                elif isinstance(sch[tf["col"]].dataType, _StrT):
                    dt = _StrT()
                else:
                    dt = _LT()
                sch = sch.add(_SF(tf["dest"], dt, True))
            self.schema_json = sch.json()
            self.bloom_cols = [
                c for c in (options.get("bloomcols") or "").split(",") if c
            ]
            self.ndv_cols = [
                c for c in (options.get("ndvcols") or "").split(",") if c
            ]
            self.token_bloom_cols = [
                c
                for c in (options.get("tokenbloomcols") or "").split(",")
                if c
            ]

    def write(self, iterator):
        import pyarrow as _pa
        from pyspark import TaskContext

        from btrblocks_spark.sources import fs
        from btrblocks_spark.sources.blockfile import (
            encode_table,
            split_by_partition,
        )
        from btrblocks_spark.sources.table import _write_blockfile_atomic

        task_id = TaskContext.get().partitionId()
        batches = list(iterator)
        if not batches:
            return _BtrWriteMessage("[]", "")
        tbl = _pa.Table.from_batches(batches)
        # hidden-partitioning columns: this path encodes Arrow directly
        # (no _write_files), so derive them here
        from btrblocks_spark.sources.table import _transform_arrow

        for tf in getattr(self, "partition_transforms", None) or []:
            if tf["dest"] not in tbl.schema.names:
                tbl = tbl.append_column(
                    tf["dest"], _transform_arrow(tf, tbl)
                )
        schema_hex = tbl.schema.serialize().hex().decode()
        rows_out = []
        k = 0
        for pjson, sub in split_by_partition(tbl, self.partition_by):
            step = self.max_rows or sub.num_rows or 1
            for start in range(0, sub.num_rows, step):
                piece = sub.slice(start, step)
                block_table, stats = encode_table(
                    piece,
                    seed=42,
                    bloom_cols=self.bloom_cols,
                    ndv_cols=self.ndv_cols,
                    token_bloom_cols=self.token_bloom_cols,
                )
                import uuid as _uuid

                # stream microbatches reuse one writer instance: a fresh
                # tag per write() call keeps file names collision-free
                # across batches and task retries
                tag = _uuid.uuid4().hex[:8]
                fname = f"{self.job_id}-{tag}-p{task_id:05d}-{k}.parquet"
                fpath = fs.join(self.root, "data", fname)
                fs.mkdirs(fs.join(self.root, "data"))
                fbytes = _write_blockfile_atomic(block_table, fpath)
                rows_out.append(
                    {
                        "file_path": fpath,
                        "partition": pjson,
                        "row_count": stats["row_count"],
                        "block_count": block_table.num_rows,
                        "file_bytes": fbytes,
                        "raw_bytes": stats["raw_bytes"],
                        "stats": json.dumps(stats["columns"]),
                        "job_id": self.job_id,
                        "source_files": "[]",
                        "sort_key": "",
                    }
                )
                k += 1
        if self.upsert_on:
            missing = [c for c in self.upsert_on if c not in tbl.schema.names]
            if missing:
                raise ValueError(f"upsertKey column(s) {missing} not in data")
            from btrblocks_spark.operators.upsert import _key_stats_entry
            from btrblocks_spark.sources.table import _write_parquet_atomic

            kt = tbl.select(self.upsert_on).group_by(
                self.upsert_on
            ).aggregate([])
            if kt.num_rows:
                import uuid as _uuid

                tag = _uuid.uuid4().hex[:8]
                fname = (
                    f"{self.job_id}-{tag}-eqdel-{task_id:05d}.parquet"
                )
                fpath = fs.join(self.root, "data", fname)
                fbytes = _write_parquet_atomic(kt, fpath)
                stats = {
                    c: _key_stats_entry(
                        kt.column(c), kt.schema.field(c).type
                    )
                    for c in self.upsert_on
                }
                rows_out.append(
                    {
                        "file_path": fpath,
                        "partition": "{}",
                        "row_count": kt.num_rows,
                        "block_count": 0,
                        "file_bytes": fbytes,
                        "raw_bytes": fbytes,
                        "stats": json.dumps(stats),
                        "job_id": self.job_id,
                        "source_files": "[]",
                        "sort_key": "",
                        "content": 2,
                    }
                )
        return _BtrWriteMessage(json.dumps(rows_out), schema_hex)

    @staticmethod
    def _gather(messages) -> tuple[list[dict], str]:
        rows: list[dict] = []
        schema_hex = ""
        for m in messages:
            if m is None:
                continue
            rows.extend(json.loads(m.rows_json))
            schema_hex = schema_hex or m.schema_hex
        return rows, schema_hex

    def commit(self, messages) -> None:
        rows, schema_hex = self._gather(messages)
        replaced = None
        operation = "append"
        extra = None
        if self.exists and self.overwrite:
            replaced = {r["file_path"] for r in _table(self.root).all_files()}
            operation = "overwrite"
        if self.upsert_on:
            operation = "upsert_eq"
            extra = {"strategy": "eq", "on": self.upsert_on}
        self._commit_rows(
            rows,
            schema_hex,
            operation=operation,
            replaced=replaced,
            extra_summary=extra,
        )

    def _commit_rows(
        self,
        rows: list[dict],
        schema_hex: str,
        operation: str,
        replaced: set | None = None,
        extra_summary: dict | None = None,
    ) -> None:
        import time as _time
        import uuid as _uuid

        from btrblocks_spark.sources import fs

        t = _table(self.root)
        if not self.exists:
            if not schema_hex:
                # empty write into a new table: derive the arrow schema
                # from the Spark schema
                from pyspark.sql.pandas.types import to_arrow_schema
                from pyspark.sql.types import StructType

                schema_hex = (
                    to_arrow_schema(
                        StructType.fromJson(json.loads(self.schema_json))
                    )
                    .serialize()
                    .hex()
                    .decode()
                )
            for sub in ("data", "manifests", "_checkpoints"):
                fs.mkdirs(fs.join(self.root, sub))
            meta = {
                "format_version": 1,
                "table_uuid": _uuid.uuid4().hex,
                "arrow_schema_hex": schema_hex,
                "spark_schema_json": self.schema_json,
                "partition_by": self.partition_by,
                "partition_transforms": self.partition_transforms,
                "bloom_cols": self.bloom_cols,
                "ndv_cols": self.ndv_cols,
                "token_bloom_cols": self.token_bloom_cols,
                "current_snapshot_id": 0,
                "snapshots": [
                    {
                        "snapshot_id": 0,
                        "parent": None,
                        "ts": _time.time(),
                        "operation": "create-empty",
                        "manifest": None,
                        "summary": {},
                    }
                ],
            }
            fs.write_json_atomic(fs.join(self.root, "metadata.json"), meta)
        t._commit(
            rows,
            operation=operation,
            replaced=replaced,
            extra_summary=extra_summary,
        )

    def abort(self, messages) -> None:
        from btrblocks_spark.sources import fs

        for m in messages:
            if m is None:
                continue
            for r in json.loads(m.rows_json):
                fs.delete_file(r["file_path"])


class BtrTableStreamArrowWriter(
    BtrTableArrowWriter, DataSourceStreamArrowWriter
):
    """``df.writeStream.format("btrtable")`` — each microbatch becomes
    one atomic snapshot commit (operation ``stream-append``), carrying
    the (writer, batchId) pair in its summary so a replayed microbatch
    after a failure commits exactly once (the engine may re-run a batch
    whose files were written but whose commit raced the crash — the
    summary check makes the re-commit a no-op and the stale files are
    remove_orphan_files' concern, same as every other resumable job)."""

    def commit(self, messages, batchId: int) -> None:  # type: ignore[override]
        t = _table(self.root)
        if self.exists:
            for s in t.snapshots():
                sm = s.get("summary") or {}
                if (
                    sm.get("stream_writer") == self.job_id
                    and sm.get("stream_batch_id") == batchId
                ):
                    return  # replayed microbatch: already committed
        rows, schema_hex = self._gather(messages)
        extra = {
            "stream_writer": self.job_id,
            "stream_batch_id": batchId,
        }
        operation = "stream-append"
        if self.upsert_on:
            operation = "upsert_eq"
            extra.update({"strategy": "eq", "on": self.upsert_on})
        self._commit_rows(
            rows,
            schema_hex,
            operation=operation,
            extra_summary=extra,
        )
        self.exists = True

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        BtrTableArrowWriter.abort(self, messages)
