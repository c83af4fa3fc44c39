"""BtrTable — Iceberg-style block-compressed table with snapshot commits.

Layout under ``root/``::

    data/<job>-p<task>-<k>.parquet     immutable block files
    manifests/manifest-<sid>-{a,r<k>,m}.parquet   append-only manifest list
    metadata.json                       atomic pointer + snapshot log
    _checkpoints/<job>/<task>.json      per-task resume markers

Commit protocol (driver-side, the analog of the reference's
single-threaded ``writeMetadata`` finale,
``/root/reference/tools/conversion/csvtobtr.cpp:190``), Iceberg-style
manifest lists:

1. executors write immutable data files + per-task checkpoint markers
   (temp file + ``os.replace`` → atomic; a marker holds the manifest rows
   for that task, so a killed-and-rerun job skips finished tasks);
2. the driver writes ONE new manifest with the added rows
   (``manifest-<sid>-a``) and rewrites only the manifests whose path
   range contains a replaced file (``manifest-<sid>-r<k>``); all other
   manifests are referenced by name, unread and unrewritten — commit
   cost is O(added + touched), not O(table files);
3. the driver rewrites ``metadata.json`` (which carries each snapshot's
   manifest list with per-manifest file counts and path bounds) via
   temp + ``os.replace`` — the single atomic step that makes the
   snapshot visible.

Readers resolve ``metadata.json`` once per scan; data files are immutable,
so a concurrent maintenance commit never disturbs a running scan
(snapshot isolation). Single-writer is assumed (guarded by a lock file);
a real deployment would swap step 3 for a catalog CAS.

Scale notes (100 TB / 1000 executors): the manifest set is read as a
DataFrame — stats-based file pruning (min/max per column per file) runs
as a Catalyst filter over it before any data I/O, and only surviving
paths return to the driver; the manifest list is bin-packed when it
exceeds ``MANIFEST_LIST_MAX`` entries; block files are sized to ~16 MiB
parts x N blocks so a scan task reads one file.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import re as _re
import time
import uuid
import zlib as _zlib

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

from btrblocks_spark import PART_SIZE_BYTES
from btrblocks_spark.sources import fs

MANIFEST_SCHEMA = pa.schema(
    [
        ("file_path", pa.string()),
        ("partition", pa.string()),  # JSON {col: value}
        ("row_count", pa.int64()),
        ("block_count", pa.int64()),
        ("file_bytes", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("stats", pa.string()),  # JSON {col: {min,max,null_count}}
        ("job_id", pa.string()),
        ("source_files", pa.string()),  # JSON [paths] — per-file lineage
        ("sort_key", pa.string()),  # clustering state, e.g. "zorder(phash,w,h)"
        # 0 = data file, 1 = positional delete file, 2 = equality delete
        # file (Iceberg v2 content ids); positional deletes hold
        # (file_path, pos) rows, equality deletes hold key-column values
        # applied to data files with a strictly lower ``seq``
        ("content", pa.int64()),
        # data sequence number (Iceberg v2): the snapshot id of the
        # commit that ADDED the file. Orders equality deletes against
        # data files — a delete kills matching rows only in files with
        # seq < the delete's seq, so rows appended in the same upsert
        # commit survive their own delete file. Pre-seq manifests read
        # as 0 (every equality delete applies).
        ("seq", pa.int64()),
    ]
)

#: manifest-row defaults for columns added after v1 tables were written
_MANIFEST_DEFAULTS = {"content": 0, "seq": 0}


_atomic_write_json = fs.write_json_atomic
_write_parquet_atomic = fs.write_parquet_atomic


def _write_blockfile_atomic(table: pa.Table, path: str) -> int:
    # Block blobs are already entropy-coded by the codec: parquet-level
    # recompression is ~1.0 ratio for pure CPU burn, parquet *dictionary
    # encoding* of multi-MB binary blobs costs ~10x the write (it hashes
    # every blob), and parquet *statistics* on those blobs cost another
    # ~4x (min/max compares + stores multi-MB byte strings; our manifests
    # carry the real stats) — disable all three.
    return _write_parquet_atomic(
        table,
        path,
        compression="none",
        use_dictionary=False,
        write_statistics=False,
        data_page_size=8 * 1024 * 1024,
    )


class CommitConflict(RuntimeError):
    pass


_TRANSFORM_RE = _re.compile(
    r"^(bucket|truncate|days)\(\s*(?:(\d+)\s*,\s*)?(\w+)\s*\)$"
)
_EPOCH = _dt.date(1970, 1, 1)


def _parse_partition_specs(partition_by: list[str] | None):
    """Split partition_by entries into (dest column names, transform
    specs). Iceberg hidden-partitioning analog: ``bucket(N, col)``,
    ``truncate(W, col)``, ``days(col)`` become derived ``_p_*`` columns
    computed at write; plain column names pass through unchanged."""
    plain: list[str] = []
    transforms: list[dict] = []
    for p in partition_by or []:
        m = _TRANSFORM_RE.match(p.strip())
        if not m:
            plain.append(p)
            continue
        kind, param, col = m.group(1), m.group(2), m.group(3)
        if kind in ("bucket", "truncate") and not param:
            raise ValueError(f"{kind}() needs a size parameter: {p!r}")
        if kind == "days" and param:
            raise ValueError(f"days() takes no parameter: {p!r}")
        dest = f"_p_{'trunc' if kind == 'truncate' else kind}_{col}"
        transforms.append(
            {
                "kind": kind,
                "param": int(param) if param else None,
                "col": col,
                "dest": dest,
            }
        )
        plain.append(dest)
    return plain, transforms


def _validate_transforms(transforms: list[dict], spark_schema) -> None:
    """Transform source columns must have engine-stable string/epoch
    forms across the three twins (Spark expr / Python literal / pyarrow)
    — bool and float keys stringify differently per engine, so they are
    rejected up front rather than silently landing in wrong buckets."""
    from pyspark.sql.types import (
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    ints = (ByteType, ShortType, IntegerType, LongType)
    for t in transforms:
        if t["col"] not in spark_schema.names:
            raise KeyError(f"transform source column {t['col']!r} missing")
        dt = spark_schema[t["col"]].dataType
        if t["kind"] in ("bucket", "truncate") and not isinstance(
            dt, ints + (StringType,)
        ):
            raise TypeError(
                f"{t['kind']}() needs an integer or string column, "
                f"got {t['col']}: {dt.simpleString()}"
            )
        if t["kind"] == "days" and not isinstance(
            dt, (DateType, TimestampType, TimestampNTZType)
        ):
            raise TypeError(
                f"days() needs a date/timestamp column, got "
                f"{t['col']}: {dt.simpleString()}"
            )


def _transform_column(t: dict, df: DataFrame):
    """Spark expression computing transform ``t`` over ``df``'s source
    column. Must stay value-identical to :func:`_transform_literal` —
    the scan-side prune translation depends on the parity."""
    from pyspark.sql.types import StringType

    c = F.col(t["col"])
    if t["kind"] == "bucket":
        # crc32 over the string form: Spark's crc32 == zlib.crc32, and
        # casting int/string sources through string keeps both engines
        # byte-identical
        return (
            F.crc32(c.cast("string").cast("binary")) % t["param"]
        ).cast("int")
    if t["kind"] == "days":
        # wall-clock days since epoch (TIMESTAMP_NTZ-safe: cast to date
        # takes the naive date, matching datetime.date() in Python)
        return F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("int")
    # truncate: string prefix / numeric floor-multiple (both monotone)
    src_type = df.schema[t["col"]].dataType
    if isinstance(src_type, StringType):
        return F.substring(c, 1, t["param"])
    return (F.floor(c / F.lit(t["param"])) * t["param"]).cast("long")


def _transform_literal(t: dict, v):
    """Python twin of :func:`_transform_column` for prune literals."""
    if v is None:
        return None
    if t["kind"] == "bucket":
        return _zlib.crc32(str(v).encode()) % t["param"]
    if t["kind"] == "days":
        if isinstance(v, str):
            v = _dt.date.fromisoformat(v[:10])
        if isinstance(v, _dt.datetime):
            v = v.date()
        return (v - _EPOCH).days
    if isinstance(v, str):
        return v[: t["param"]]
    # match the Spark expression's floor(v/W)*W cast to long — floats
    # quantize to the integral multiple
    return int((v // t["param"]) * t["param"])


def _transform_arrow(t: dict, tbl: "pa.Table") -> "pa.Array":
    """pyarrow twin of :func:`_transform_column` for executor-side batch
    writers (the Python DataSource path encodes Arrow tables directly,
    never seeing a Spark DataFrame)."""
    import pyarrow.compute as pc

    col = tbl[t["col"]]
    if t["kind"] == "bucket":
        vals = col.to_pylist()
        return pa.array(
            [
                None if v is None else _zlib.crc32(str(v).encode()) % t["param"]
                for v in vals
            ],
            pa.int32(),
        )
    if t["kind"] == "days":
        return pc.cast(pc.cast(col, pa.date32()), pa.int32())
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return pc.utf8_slice_codeunits(col, 0, t["param"])
    import numpy as _np

    arr = col.to_numpy(zero_copy_only=False)
    out = (_np.floor_divide(arr, t["param"]) * t["param"]).astype(_np.int64)
    return pa.array(out, pa.int64())


def all_transforms_of(meta: dict) -> list[dict]:
    """Every hidden-partitioning transform that ever wrote files, from
    a table's metadata dict — the ONE fallback rule (history when
    present, else the active spec) shared by BtrTable.scan and the
    Python DataSource reader so their pruning can never diverge."""
    hist = meta.get("partition_transforms_history")
    if hist is not None:
        return hist
    return meta.get("partition_transforms") or []


def recompute_partition_arrow(tbl: "pa.Table", transforms: list[dict]):
    """Recompute every derived ``_p_*`` column present in ``tbl`` from
    its source column (deterministic overwrite). Rewrite kernels decode
    evolved tables with the FULL logical schema, so a file written
    before a spec existed decodes that dest as NULL — mixing those
    nulls with real values in one output file would poison its min/max
    stats (a prune on the dest could drop a file whose only matching
    rows are the null-dest ones). Overwriting from the source keeps
    every written file's ``_p_*`` stats truthful AND opportunistically
    migrates old-spec files to the new layout on compaction."""
    for t in transforms:
        names = tbl.schema.names
        if t["dest"] not in names or t["col"] not in names:
            continue
        i = tbl.schema.get_field_index(t["dest"])
        arr = _transform_arrow(t, tbl)
        field = tbl.schema.field(i)
        if not arr.type.equals(field.type):
            import pyarrow.compute as _pc

            arr = _pc.cast(arr, field.type)
        tbl = tbl.set_column(i, field, arr)
    return tbl


def _translate_prune(prune: dict | None, transforms: list[dict]) -> dict | None:
    """Add derived-partition prune entries for predicates on transform
    SOURCE columns (the point of hidden partitioning: the caller prunes
    on ``ts``/``id``, the engine prunes the ``_p_*`` layout too).

    Set-form predicates translate for every transform; range form only
    for the monotone ones (days, truncate) — a bucket range translates
    only when it pins a single value (lo == hi). The raw-column entry
    is kept: file/block min-max stats on the source column still apply.
    """
    if not prune or not transforms:
        return prune
    out = dict(prune)
    for t in transforms:
        v = prune.get(t["col"])
        if v is None or t["dest"] in out or isinstance(v, dict):
            continue
        if isinstance(v, (list, set, frozenset)):
            lits = {
                _transform_literal(t, x) for x in v if x is not None
            }
            if lits:
                out[t["dest"]] = sorted(lits)
        else:
            lo, hi = v
            if t["kind"] == "bucket":
                if lo is not None and lo == hi:
                    out[t["dest"]] = [_transform_literal(t, lo)]
                continue
            out[t["dest"]] = (
                _transform_literal(t, lo),
                _transform_literal(t, hi),
            )
    return out


class BtrTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------ metadata
    @property
    def _meta_path(self) -> str:
        return fs.join(self.root, "metadata.json")

    def metadata(self) -> dict:
        return fs.read_json(self._meta_path)

    def current_snapshot_id(self) -> int:
        return self.metadata()["current_snapshot_id"]

    def snapshots(self) -> list[dict]:
        return self.metadata()["snapshots"]

    # ------------------------------------------------------------ refs
    def refs(self) -> dict:
        """Named snapshot refs (Iceberg tags): ``{name: {snapshot_id,
        type, ts}}``. A tagged snapshot is retained by
        :meth:`expire_snapshots` until the tag is dropped."""
        return self.metadata().get("refs", {})

    def tag(self, name: str, snapshot_id: int | None = None) -> dict:
        """Create an immutable named tag on a snapshot (default: the
        current one) for audit/time-travel pinning:
        ``table.scan(snapshot_id="v1")``."""
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            refs = meta.setdefault("refs", {})
            if name in refs:
                raise ValueError(f"ref {name!r} already exists")
            sid = (
                meta["current_snapshot_id"]
                if snapshot_id is None
                else snapshot_id
            )
            if not any(s["snapshot_id"] == sid for s in meta["snapshots"]):
                raise KeyError(f"no snapshot {sid}")
            refs[name] = {"snapshot_id": sid, "type": "tag", "ts": time.time()}
            _atomic_write_json(self._meta_path, meta)
            return dict(refs[name])
        finally:
            fs.delete_file(lock)

    def create_branch(
        self, name: str, snapshot_id: int | None = None
    ) -> dict:
        """Create a MUTABLE named ref (Iceberg branch) pointing at a
        snapshot (default: current). Writers target it with
        ``append(..., branch=name)`` / ``upsert_eq(..., branch=name)``;
        readers with ``scan(snapshot_id=name)``; main adopts it with
        :meth:`fast_forward`. Branch commits never move
        ``current_snapshot_id`` and never appear in main's changelog
        until adopted."""
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            refs = meta.setdefault("refs", {})
            if name in refs:
                raise ValueError(f"ref {name!r} already exists")
            sid = (
                meta["current_snapshot_id"]
                if snapshot_id is None
                else snapshot_id
            )
            if not any(s["snapshot_id"] == sid for s in meta["snapshots"]):
                raise KeyError(f"no snapshot {sid}")
            refs[name] = {
                "snapshot_id": sid,
                "type": "branch",
                "ts": time.time(),
            }
            _atomic_write_json(self._meta_path, meta)
            return dict(refs[name])
        finally:
            fs.delete_file(lock)

    def fast_forward(self, name: str) -> dict:
        """Adopt a branch: move ``current_snapshot_id`` to the branch
        head, provided current is an ancestor of it (pure fast-forward;
        anything else raises CommitConflict — rebase by re-running the
        branch's jobs on main). The adopted snapshots shed their branch
        marker and become main history (visible to changelog readers);
        the ref then points AT the adopted head and may keep receiving
        commits."""
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            ref = meta.get("refs", {}).get(name)
            if ref is None or ref.get("type") != "branch":
                raise KeyError(f"no branch {name!r}")
            head = ref["snapshot_id"]
            current = meta["current_snapshot_id"]
            known = {s["snapshot_id"]: s for s in meta["snapshots"]}
            adopted = []
            cur = head
            while cur is not None and cur != current:
                snap = known.get(cur)
                if snap is None:
                    raise CommitConflict(
                        f"branch ancestry broken at snapshot {cur}"
                    )
                adopted.append(snap)
                cur = snap.get("parent")
            if cur != current:
                raise CommitConflict(
                    f"cannot fast-forward: current snapshot {current} "
                    f"is not an ancestor of branch {name!r} head {head}"
                )
            for snap in adopted:
                snap.pop("branch", None)
            meta["current_snapshot_id"] = head
            _atomic_write_json(self._meta_path, meta)
            return {
                "branch": name,
                "snapshot_id": head,
                "adopted_snapshots": len(adopted),
            }
        finally:
            fs.delete_file(lock)

    def drop_branch(self, name: str) -> None:
        """Drop a branch ref; its unreferenced commits' files become
        orphan-collectable once expired."""
        ref = self.refs().get(name)
        if ref is None or ref.get("type") != "branch":
            raise KeyError(f"no branch {name!r}")
        self.drop_tag(name)  # same ref-map removal, under the lock

    def drop_tag(self, name: str) -> None:
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            refs = meta.get("refs", {})
            if name not in refs:
                raise KeyError(f"no ref {name!r}")
            del refs[name]
            _atomic_write_json(self._meta_path, meta)
        finally:
            fs.delete_file(lock)

    def _resolve_sid(self, snapshot_id: int | str | None) -> int:
        """None → current; str → tag name; int → itself."""
        if snapshot_id is None:
            return self.current_snapshot_id()
        if isinstance(snapshot_id, str):
            refs = self.metadata().get("refs", {})
            if snapshot_id not in refs:
                raise KeyError(f"no ref {snapshot_id!r}")
            return refs[snapshot_id]["snapshot_id"]
        return snapshot_id

    # ------------------------------------------- write-audit-publish
    def staged_snapshots(self) -> list[dict]:
        """Snapshots committed with ``stage=True`` and not yet
        published/abandoned — invisible to default reads."""
        return [s for s in self.snapshots() if s.get("staged")]

    def publish(self, snapshot_id: int) -> dict:
        """Make a staged (write-audit-publish) snapshot the current
        table state.

        Fast path: if the table has not moved since the snapshot was
        staged (its parent is still current), publishing is a metadata
        flip. Otherwise the staged snapshot is REBASED: append-only
        stages (no replaced files) re-commit their added manifest rows
        on top of the new current as a fresh snapshot (Iceberg
        cherry-pick); stages that replaced files conflict with the
        interleaved commit and raise :class:`CommitConflict` — re-run
        the job against the new table state."""
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            snap = None
            for s in meta["snapshots"]:
                if s["snapshot_id"] == snapshot_id:
                    snap = s
                    break
            if snap is None:
                raise KeyError(f"no snapshot {snapshot_id}")
            if not snap.get("staged"):
                raise ValueError(f"snapshot {snapshot_id} is not staged")
            current = meta["current_snapshot_id"]
            if snap["parent"] == current:
                del snap["staged"]
                meta["current_snapshot_id"] = snapshot_id
                _atomic_write_json(self._meta_path, meta)
                return {"snapshot_id": snapshot_id, "rebased": False}
            if snap["summary"].get("removed_files"):
                raise CommitConflict(
                    f"staged snapshot {snapshot_id} replaced files but "
                    f"the table moved on (current={current}); rebase of "
                    "non-append stages is unsafe — re-run the job"
                )
            added = self._staged_added_rows(snap)
        finally:
            fs.delete_file(lock)
        # rebase OUTSIDE the lock: _commit takes it again
        new_sid = self._commit(
            added,
            operation=snap["operation"],
            replaced=None,
            extra_summary={"published_from": snapshot_id},
        )
        self._drop_snapshot_entry(snapshot_id)
        return {"snapshot_id": new_sid, "rebased": True,
                "staged_snapshot_id": snapshot_id}

    def abandon(self, snapshot_id: int) -> dict:
        """Drop an unpublished staged snapshot. Its data files become
        unreferenced and are reclaimed by :meth:`remove_orphan_files`;
        its private manifests are deleted immediately, and its jobs'
        checkpoint markers are cleared (they would otherwise keep the
        abandoned files vacuum-protected as an in-flight job)."""
        snap = self._snapshot(snapshot_id)
        if not snap.get("staged"):
            raise ValueError(f"snapshot {snapshot_id} is not staged")
        jobs = {
            r.get("job_id")
            for r in self._staged_added_rows(snap)
            if r.get("job_id")
        }
        res = self._drop_snapshot_entry(snapshot_id)
        for j in jobs:
            fs.delete_dir(fs.join(self.root, "_checkpoints", j))
        return res

    def _staged_added_rows(self, snap: dict) -> list[dict]:
        """Manifest rows a staged snapshot added over its parent (the
        ``-a`` manifest it wrote; bin-pack merging never runs between
        stage and publish because the stage's merge happened at stage
        time and nothing else references its private manifests)."""
        fast = f"manifest-{snap['snapshot_id']}-a.parquet"
        names = {e["name"] for e in snap.get("manifests") or []}
        if fast in names:
            return self._read_manifest(fast)
        parent_paths = {
            r["file_path"] for r in self._manifest_rows(snap["parent"])
        }
        return [
            r
            for r in self._manifest_rows(snap["snapshot_id"])
            if r["file_path"] not in parent_paths
        ]

    def _drop_snapshot_entry(self, snapshot_id: int) -> dict:
        """Remove a snapshot from the history and delete the manifest
        files only it references (under the commit lock)."""
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            victim = None
            for s in meta["snapshots"]:
                if s["snapshot_id"] == snapshot_id:
                    victim = s
                    break
            if victim is None:
                raise KeyError(f"no snapshot {snapshot_id}")
            meta["snapshots"] = [
                s for s in meta["snapshots"]
                if s["snapshot_id"] != snapshot_id
            ]
            still_referenced = {
                e["name"]
                for s in meta["snapshots"]
                for e in (s.get("manifests") or [])
            } | {
                s["manifest"]
                for s in meta["snapshots"]
                if s.get("manifest")  # v1 single-manifest snapshots
            }
            removed = 0
            for e in victim.get("manifests") or []:
                if e["name"] in still_referenced:
                    continue
                mp = fs.join(self.root, "manifests", e["name"])
                if fs.exists(mp):
                    fs.delete_file(mp)
                    removed += 1
            _atomic_write_json(self._meta_path, meta)
            return {"snapshot_id": snapshot_id,
                    "removed_manifests": removed}
        finally:
            fs.delete_file(lock)

    def schema_arrow(self) -> pa.Schema:
        meta = self.metadata()
        return pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(meta["arrow_schema_hex"]))
        )

    def partition_by(self) -> list[str]:
        return self.metadata().get("partition_by", [])

    def user_columns(self) -> list[str]:
        """Schema columns minus the hidden-partitioning _p_* layout —
        what callers see and what source frames must align to (the
        derived columns are recomputed by _write_files)."""
        return [
            c for c in self.schema_arrow().names if not c.startswith("_p_")
        ]

    def bloom_cols(self) -> list[str]:
        return self.metadata().get("bloom_cols", [])

    def ndv_cols(self) -> list[str]:
        return self.metadata().get("ndv_cols", [])

    def token_bloom_cols(self) -> list[str]:
        return self.metadata().get("token_bloom_cols", [])

    # ------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        target_file_bytes: int = PART_SIZE_BYTES,
        max_rows_per_file: int | None = None,
        num_files: int | None = None,
        job_id: str | None = None,
        block_rows: int | None = None,
        bloom_cols: list[str] | None = None,
        ndv_cols: list[str] | None = None,
        token_bloom_cols: list[str] | None = None,
    ) -> "BtrTable":
        """Create a table at ``root`` from ``df`` (initial snapshot).

        ``bloom_cols``: integer columns that get a per-file key bloom
        digest in their manifest stats on every write (MERGE touched-
        file discovery skips files whose bloom rejects all source keys).
        ``ndv_cols``: int/string columns that get a per-file KMV
        distinct sketch in their stats — ``stats_agg`` folds them into
        an approx COUNT(DISTINCT) with zero data I/O.
        ``token_bloom_cols``: text columns that get a per-file bloom of
        their token set — ``scan(prune={col: {"tokens_all": [...]}})``
        opens only files that may contain every query token.
        """
        for sub in ("data", "manifests", "_checkpoints"):
            fs.mkdirs(fs.join(root, sub))
        # hidden-partitioning transforms: bucket(N,c)/truncate(W,c)/days(c)
        # entries become derived _p_* columns computed on every write;
        # the TABLE schema stays the user's (the derived layout is hidden)
        plain_parts, transforms = _parse_partition_specs(partition_by)
        reserved = [c for c in df.columns if c.startswith("_p_")]
        if reserved:
            raise ValueError(
                f"column names {reserved} use the reserved hidden-"
                "partitioning prefix '_p_'"
            )
        _validate_transforms(transforms, df.schema)
        for t in transforms:
            if t["dest"] not in df.columns:
                df = df.withColumn(t["dest"], _transform_column(t, df))
        arrow_schema = df.limit(0).toArrow().schema
        meta = {
            "format_version": 1,
            "table_uuid": uuid.uuid4().hex,
            "arrow_schema_hex": arrow_schema.serialize().hex().decode(),
            "spark_schema_json": df.schema.json(),
            "partition_by": plain_parts,
            "partition_transforms": transforms,
            "bloom_cols": bloom_cols or [],
            "ndv_cols": ndv_cols or [],
            "token_bloom_cols": token_bloom_cols or [],
            "current_snapshot_id": 0,
            "snapshots": [
                {
                    "snapshot_id": 0,
                    "parent": None,
                    "ts": time.time(),
                    "operation": "create-empty",
                    "manifest": None,
                    "summary": {},
                }
            ],
        }
        _atomic_write_json(fs.join(root, "metadata.json"), meta)
        table = cls(spark, root)
        table.append(
            df,
            job_id=job_id or f"create-{uuid.uuid4().hex[:8]}",
            num_files=num_files,
            max_rows_per_file=max_rows_per_file,
            block_rows=block_rows,
        )
        return table

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "BtrTable":
        t = cls(spark, root)
        t.metadata()  # raises if missing
        return t

    # ------------------------------------------------------------ write
    def append(
        self,
        df: DataFrame,
        job_id: str | None = None,
        num_files: int | None = None,
        max_rows_per_file: int | None = None,
        operation: str = "append",
        block_rows: int | None = None,
        stage: bool = False,
        branch: str | None = None,
    ) -> int:
        """Encode ``df`` into new block files and commit a snapshot.

        ``stage=True`` = write-audit-publish: the snapshot is recorded
        but NOT made current; audit it with
        ``scan(snapshot_id=staged_snapshot_id())`` then :meth:`publish`.

        The encode fan-out is one Spark task per output file group:
        ``repartition`` on the partition columns (hash co-location; a
        task may still see several partition values and then writes one
        file per value — no strict co-location needed, so no expensive
        global sort). Checkpoint-resumable per task.
        """
        job_id = job_id or f"append-{uuid.uuid4().hex[:8]}"
        rows = self._write_files(
            df,
            job_id,
            num_files=num_files,
            max_rows_per_file=max_rows_per_file,
            block_rows=block_rows,
        )
        sid = self._commit(
            rows,
            operation=operation,
            replaced=None,
            stage=stage,
            branch=branch,
        )
        return sid if stage or branch else len(rows)

    def _write_files(
        self,
        df: DataFrame,
        job_id: str,
        num_files: int | None = None,
        max_rows_per_file: int | None = None,
        preserve_partitioning: bool = False,
        sort_key: str = "",
        block_rows: int | None = None,
    ) -> list[dict]:
        """Run the distributed encode; returns manifest row dicts."""
        root = self.root
        parts = self.partition_by()
        blooms = self.bloom_cols()
        ndvs = self.ndv_cols()
        tbcs = self.token_bloom_cols()
        # hidden-partitioning columns: every write path flows through
        # here, so computing the derived _p_* columns here (idempotent —
        # rewrite kernels may already carry them from the scanned files,
        # and the expressions are deterministic) covers append, merge,
        # upsert, rowops, cluster and compact alike. Historical-spec
        # dests riding along from a rewrite are RECOMPUTED (a decode of
        # a pre-spec file fills them with NULL; mixed null/real values
        # would poison the written file's stats); active-spec dests are
        # added when absent.
        active = self.metadata().get("partition_transforms") or []
        for t in self.all_partition_transforms():
            if t["dest"] in df.columns and t["col"] in df.columns:
                df = df.withColumn(t["dest"], _transform_column(t, df))
        for t in active:
            if t["dest"] not in df.columns:
                df = df.withColumn(t["dest"], _transform_column(t, df))
        arrow_schema = df.limit(0).toArrow().schema

        if preserve_partitioning:
            num_files = None
        elif num_files is None:
            # size the fan-out from a cheap estimate: Spark's own input size
            est_bytes = df.inputFiles() and sum(
                os.path.getsize(p.replace("file:", "")) for p in df.inputFiles()
                if os.path.exists(p.replace("file:", ""))
            ) or 0
            num_files = max(1, min(512, est_bytes // PART_SIZE_BYTES or 8))
        if preserve_partitioning:
            work = df
        else:
            # deterministic content-hash fan-out; the encode kernel
            # splits each task's rows by partition value, so hash
            # co-location on the (few) partition columns would only
            # collapse the fan-out to one task per value — the opposite
            # of what a parallel write wants. A keyless round-robin
            # repartition would pay sortBeforeRepartition's local sort
            # of every full row (SPARK-23207); one row hash is cheaper,
            # equally retry-safe (deterministic, unlike rand keys), and
            # spreads any distinct rows uniformly. Map columns cannot
            # be hashed — fall back to round-robin then.
            hashable = [
                f.name
                for f in df.schema.fields
                if not isinstance(f.dataType, MapType)
            ]
            if hashable:
                work = df.repartition(
                    num_files, F.xxhash64(*[F.col(c) for c in hashable])
                )
            else:  # pragma: no cover - all-map schema
                work = df.repartition(num_files)

        ckpt_dir = fs.join(root, "_checkpoints", job_id)
        fs.mkdirs(ckpt_dir)
        result_schema = "rows string"
        max_rows = max_rows_per_file

        def encode_task(batch_iter):
            from pyspark import TaskContext

            from btrblocks_spark.sources.blockfile import (
                encode_table,
                split_by_partition,
            )

            from btrblocks_spark.sources import fs as _fs

            task_id = TaskContext.get().partitionId()
            marker = _fs.join(ckpt_dir, f"{task_id}.json")
            if _fs.exists(marker):
                payload = _fs.read_bytes(marker).decode()
                yield pa.RecordBatch.from_pydict({"rows": [payload]})
                return
            batches = list(batch_iter)
            rows_out: list[dict] = []
            if batches:
                tbl = pa.Table.from_batches(batches)
                # one file per partition value present in this task —
                # shared kernel (null-safe sentinel handling included)
                groups = split_by_partition(tbl, parts)
                k = 0
                for part_json, sub in groups:
                    step = max_rows or sub.num_rows or 1
                    for start in range(0, sub.num_rows, step):
                        piece = sub.slice(start, step)
                        block_table, stats = encode_table(
                            piece,
                            seed=42,
                            block_rows=block_rows,
                            bloom_cols=blooms,
                            ndv_cols=ndvs,
                            token_bloom_cols=tbcs,
                        )
                        fname = f"{job_id}-p{task_id:05d}-{k}.parquet"
                        fpath = _fs.join(root, "data", fname)
                        fbytes = _write_blockfile_atomic(block_table, fpath)
                        rows_out.append(
                            {
                                "file_path": fpath,
                                "partition": part_json,
                                "row_count": stats["row_count"],
                                "block_count": block_table.num_rows,
                                "file_bytes": fbytes,
                                "raw_bytes": stats["raw_bytes"],
                                "stats": json.dumps(stats["columns"]),
                                "job_id": job_id,
                                "source_files": "[]",
                                "sort_key": sort_key,
                            }
                        )
                        k += 1
            payload = json.dumps(rows_out)
            _fs.write_bytes_atomic(marker, payload.encode())
            yield pa.RecordBatch.from_pydict({"rows": [payload]})

        collected = work.mapInArrow(encode_task, result_schema).collect()
        rows: list[dict] = []
        for r in collected:
            rows.extend(json.loads(r.rows))
        return rows

    # ------------------------------------------------------------ commit
    #: manifest-list compaction threshold: when a snapshot would carry
    #: more manifest files than this, the smallest ones are merged.
    MANIFEST_LIST_MAX = 64
    #: above this many data files, scan planning (stats prune + delete
    #: association) runs as Catalyst jobs over the manifest DataFrame
    #: instead of a driver loop — the spec stays a DataFrame end-to-end
    SCAN_PLAN_DF_MIN = 10_000

    #: optimistic concurrency: a committer whose lock acquisition finds
    #: the lock held WAITS (jittered exponential backoff) up to this many
    #: seconds for the other commit to finish, then raises
    #: CommitConflict. 0 = fail fast. Commits re-read metadata.json
    #: under the lock, so serialized concurrent writers compose —
    #: a genuine conflict (two commits replacing the same file) still
    #: raises via the files-vanished check.
    COMMIT_LOCK_WAIT = 30.0
    COMMIT_LOCK_POLL = 0.05
    #: a lock older than this is a dead writer (crashed before the
    #: finally-unlink); waiters break it. A real deployment swaps the
    #: whole pointer commit for a catalog CAS.
    COMMIT_LOCK_TTL = 600.0

    def _acquire_commit_lock(self, lock: str) -> None:
        import random

        deadline = time.time() + self.COMMIT_LOCK_WAIT
        sleep = self.COMMIT_LOCK_POLL
        while True:
            if fs.create_exclusive(lock):
                return
            age = fs.file_age(lock)
            if age is not None and age > self.COMMIT_LOCK_TTL:
                fs.delete_file(lock)  # dead writer — break its lock
                continue
            if time.time() >= deadline:
                raise CommitConflict(
                    f"another commit holds {lock} "
                    f"(waited {self.COMMIT_LOCK_WAIT}s)"
                )
            time.sleep(sleep + random.uniform(0.0, sleep))
            sleep = min(sleep * 2, 1.0)

    def _read_manifest(self, name: str) -> list[dict]:
        return fs.read_parquet(
            fs.join(self.root, "manifests", name)
        ).to_pylist()

    @staticmethod
    def _entry_from_rows(name: str, rows: list[dict]) -> dict:
        paths = [r["file_path"] for r in rows]
        return {
            "name": name,
            "file_count": len(rows),
            "row_count_sum": int(sum(r["row_count"] for r in rows)),
            "path_min": min(paths) if paths else "",
            "path_max": max(paths) if paths else "",
        }

    def _write_manifest(self, name: str, rows: list[dict]) -> dict:
        path = fs.join(self.root, "manifests", name)
        cols = {
            f.name: pa.array(
                [r.get(f.name, _MANIFEST_DEFAULTS.get(f.name)) for r in rows],
                f.type,
            )
            for f in MANIFEST_SCHEMA
        }
        _write_parquet_atomic(pa.table(cols, schema=MANIFEST_SCHEMA), path)
        return self._entry_from_rows(name, rows)

    def _manifest_list(self, snapshot_id: int) -> list[dict]:
        """Manifest-list entries for a snapshot (Iceberg manifest list).

        v2 snapshots carry ``manifests``: a list of
        ``{name, file_count, row_count_sum, path_min, path_max}``. v1
        snapshots (single ``manifest``) get one synthesized entry with
        unknown bounds, which the next commit migrates in place."""
        snap = self._snapshot(snapshot_id)
        if snap.get("manifests") is not None:
            return [dict(e) for e in snap["manifests"]]
        if snap.get("manifest"):
            return [{
                "name": snap["manifest"],
                "file_count": None,
                "row_count_sum": None,
                "path_min": None,
                "path_max": None,
            }]
        return []

    @staticmethod
    def _next_snapshot_id(meta: dict) -> int:
        """Next unused snapshot id: ids are unique across the whole
        history (staged WAP snapshots included), NOT current+1 — a
        staged snapshot holds an id without advancing ``current``."""
        return max(s["snapshot_id"] for s in meta["snapshots"]) + 1

    def _commit(
        self,
        new_rows: list[dict],
        operation: str,
        replaced: set[str] | None,
        extra_summary: dict | None = None,
        stage: bool = False,
        branch: str | None = None,
    ) -> int:
        """Atomic snapshot commit, O(added + touched) not O(table files).

        Added files go into ONE new appended manifest; manifests whose
        [path_min, path_max] range can contain a replaced path are the
        only ones read and rewritten (file paths embed the writing
        job_id, so ranges are tight); every other manifest is referenced
        as-is by name in the new snapshot's manifest list. At 10^6-10^7
        files a compaction commit therefore never rereads or rewrites
        the untouched bulk of the metadata.

        ``stage=True`` records the snapshot WITHOUT advancing
        ``current_snapshot_id`` (Iceberg write-audit-publish): readers
        keep seeing the old table, auditors scan the staged id, and
        :meth:`publish` flips it live (or rebases it if the table moved
        on in the meantime).

        ``branch="name"`` commits on top of that branch ref's head and
        advances the REF, never ``current_snapshot_id`` — main readers
        are untouched until :meth:`fast_forward` adopts the branch.

        Concurrency (Iceberg's optimistic model): the heavy work —
        reading and rewriting touched manifests — runs OUTSIDE the
        commit lock against an optimistically-read head. The lock only
        guards re-validate + append-manifest-write + metadata swap. If
        the head moved while preparing:

        - a pure APPEND (nothing replaced) rebases trivially onto the
          new head's manifest list — two appenders never block on each
          other beyond the short swap;
        - a REPLACE commit retries its manifest processing against the
          new head (bounded attempts); a true conflict — its replaced
          files vanished because another writer rewrote them — raises
          :class:`CommitConflict`."""
        import bisect

        lock = fs.join(self.root, "_commit.lock")
        replaced = set(replaced or ())
        rsorted = sorted(replaced)

        def may_contain(e: dict) -> bool:
            if e["path_min"] is None:
                return True
            i = bisect.bisect_left(rsorted, e["path_min"])
            return i < len(rsorted) and rsorted[i] <= e["path_max"]

        def head_of(meta: dict) -> int:
            if branch is not None:
                ref = meta.get("refs", {}).get(branch)
                if ref is None or ref.get("type") != "branch":
                    raise KeyError(f"no branch {branch!r}")
                return ref["snapshot_id"]
            return meta["current_snapshot_id"]

        MAX_ATTEMPTS = 4
        for attempt in range(MAX_ATTEMPTS):
            # ---- optimistic phase (no lock): process touched manifests
            meta = self.metadata()
            current = head_of(meta)
            entries = self._manifest_list(current)
            token = uuid.uuid4().hex[:8]  # unique rewritten-manifest tag
            kept: list[dict] = []
            skipped: list[dict] = []  # entries not read (range miss)
            found: set[str] = set()
            written_names: list[str] = []
            k = 0

            def process(e: dict) -> None:
                nonlocal k
                rows = self._read_manifest(e["name"])
                hit = {r["file_path"] for r in rows} & replaced
                if not hit:  # range false positive — keep untouched
                    kept.append(self._entry_from_rows(e["name"], rows))
                    return
                found.update(hit)
                remaining = [
                    r for r in rows if r["file_path"] not in replaced
                ]
                if remaining:
                    name = f"manifest-{token}-r{k}.parquet"
                    k += 1
                    kept.append(self._write_manifest(name, remaining))
                    written_names.append(name)

            for e in entries:
                if replaced and may_contain(e):
                    process(e)
                elif e["file_count"] is None:  # v1 migration: fill meta
                    kept.append(
                        self._entry_from_rows(
                            e["name"], self._read_manifest(e["name"])
                        )
                    )
                else:
                    kept.append(e)
                    skipped.append(e)
            if replaced - found and skipped:
                # stale path bounds (e.g. a copied/retargeted table):
                # degrade gracefully to reading the remaining manifests
                # instead of failing the commit
                for e in skipped:
                    kept.remove(e)
                    process(e)
            missing = replaced - found
            if missing:
                # a true conflict aborts the commit: drop this attempt's
                # rewritten manifests (referenced by no snapshot)
                for name in written_names:
                    fs.delete_file(fs.join(self.root, "manifests", name))
                raise CommitConflict(
                    f"files vanished from manifest: {missing}"
                )

            # ---- critical section: re-validate head, append, swap
            self._acquire_commit_lock(lock)
            try:
                meta2 = self.metadata()
                head2 = head_of(meta2)
                if head2 != current:
                    if replaced:
                        # head moved under a replace commit: drop this
                        # attempt's rewritten manifests and re-process
                        # against the new head (outside the lock)
                        for name in written_names:
                            fs.delete_file(
                                fs.join(self.root, "manifests", name)
                            )
                        continue
                    # pure append: rebase onto the new head's list
                    # (v1 entries lack counts — fill them like the
                    # optimistic phase does)
                    kept = [
                        e
                        if e["file_count"] is not None
                        else self._entry_from_rows(
                            e["name"], self._read_manifest(e["name"])
                        )
                        for e in self._manifest_list(head2)
                    ]
                    current = head2
                meta = meta2
                snapshot_id = self._next_snapshot_id(meta)
                # data sequence number (Iceberg v2): files added by this
                # commit get seq = snapshot_id (assigned at COMMIT time,
                # so a rebased append still orders after the commits it
                # rebased over), unless the caller pre-stamped one; rows
                # rewritten verbatim in process() keep their original seq
                for r in new_rows:
                    r.setdefault("seq", snapshot_id)
                if new_rows:
                    kept = kept + [
                        self._write_manifest(
                            f"manifest-{snapshot_id}-a.parquet",
                            list(new_rows),
                        )
                    ]
                kept = self._maybe_merge_manifests(kept, snapshot_id)
                total_files = sum(e["file_count"] for e in kept)
                total_rows = sum(e["row_count_sum"] for e in kept)
                snap_entry = {
                    "snapshot_id": snapshot_id,
                    "parent": current,
                    "ts": time.time(),
                    "operation": operation,
                    "manifest": None,
                    "manifests": kept,
                    "summary": {
                        "added_files": len(new_rows),
                        "removed_files": len(replaced),
                        "total_files": total_files,
                        "total_rows": total_rows,
                        **(extra_summary or {}),
                    },
                }
                if stage:
                    snap_entry["staged"] = True
                if branch is not None:
                    snap_entry["branch"] = branch
                meta["snapshots"].append(snap_entry)
                if branch is not None:
                    meta["refs"][branch]["snapshot_id"] = snapshot_id
                elif not stage:
                    meta["current_snapshot_id"] = snapshot_id
                _atomic_write_json(self._meta_path, meta)
                self._write_job_metrics(
                    snapshot_id, operation, new_rows, replaced
                )
                return snapshot_id
            finally:
                fs.delete_file(lock)
        raise CommitConflict(
            f"head kept moving for {MAX_ATTEMPTS} attempts "
            f"({operation}, {len(replaced)} replaced files)"
        )

    def _maybe_merge_manifests(
        self, entries: list[dict], snapshot_id: int
    ) -> list[dict]:
        """Bin-pack the manifest list when it grows past
        MANIFEST_LIST_MAX: merge the smallest entries into one manifest
        (Iceberg rewrite_manifests, amortized — a merge touches only the
        small tail, never the large stable manifests)."""
        if len(entries) <= self.MANIFEST_LIST_MAX:
            return entries
        by_size = sorted(entries, key=lambda e: e["file_count"])
        n_merge = len(entries) - self.MANIFEST_LIST_MAX // 2
        to_merge, rest = by_size[:n_merge], by_size[n_merge:]
        rows: list[dict] = []
        for e in to_merge:
            rows.extend(self._read_manifest(e["name"]))
        merged = self._write_manifest(
            f"manifest-{snapshot_id}-m.parquet", rows
        )
        return rest + [merged]

    def _write_job_metrics(
        self,
        snapshot_id: int,
        operation: str,
        new_rows: list[dict],
        replaced: set[str] | None,
    ) -> None:
        """Per-partition lineage/metrics row set for this job (north rule)."""
        per_part: dict[str, dict] = {}
        for r in new_rows:
            p = per_part.setdefault(
                r["partition"],
                {"files": 0, "rows": 0, "bytes": 0, "raw_bytes": 0},
            )
            p["files"] += 1
            p["rows"] += r["row_count"]
            p["bytes"] += r["file_bytes"]
            p["raw_bytes"] += r["raw_bytes"]
        mdir = fs.join(self.root, "metrics")
        fs.mkdirs(mdir)
        _atomic_write_json(
            fs.join(mdir, f"job-{snapshot_id}.json"),
            {
                "snapshot_id": snapshot_id,
                "operation": operation,
                "ts": time.time(),
                "job_ids": sorted({r["job_id"] for r in new_rows}),
                "replaced_files": len(replaced or ()),
                "partitions": per_part,
            },
        )

    def metrics_df(self) -> DataFrame:
        """Per-partition per-job metrics as a DataFrame."""
        mdir = fs.join(self.root, "metrics")
        rows = []
        if True:
            for fname in fs.list_files(mdir):
                m = fs.read_json(fs.join(mdir, fname))
                for part, p in m["partitions"].items():
                    rows.append(
                        (
                            m["snapshot_id"],
                            m["operation"],
                            part,
                            p["files"],
                            p["rows"],
                            p["bytes"],
                            p["raw_bytes"],
                        )
                    )
        return self.spark.createDataFrame(
            rows,
            "snapshot_id long, operation string, partition string, "
            "files long, rows long, bytes long, raw_bytes long",
        )

    def _manifest_rows(self, snapshot_id: int) -> list[dict]:
        rows: list[dict] = []
        for e in self._manifest_list(snapshot_id):
            rows.extend(self._read_manifest(e["name"]))
        return rows

    def _snapshot(self, snapshot_id: int) -> dict:
        for s in self.metadata()["snapshots"]:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(f"no snapshot {snapshot_id}")

    # ------------------------------------------------------------ read
    def manifest_df(self, snapshot_id: int | str | None = None) -> DataFrame:
        sid = self._resolve_sid(snapshot_id)
        entries = self._manifest_list(sid)
        if not entries:
            return self.spark.createDataFrame([], schema=self._manifest_spark_schema())
        paths = [
            fs.join(self.root, "manifests", e["name"]) for e in entries
        ]
        if fs.is_local(paths[0]):
            return self.spark.read.schema(
                self._manifest_spark_schema()
            ).parquet(*paths)
        n_files = sum(e["file_count"] or 0 for e in entries)
        return self._read_manifests_arrow(paths, n_files)

    @staticmethod
    def _manifest_spark_schema():
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        return StructType(
            [
                StructField("file_path", StringType()),
                StructField("partition", StringType()),
                StructField("row_count", LongType()),
                StructField("block_count", LongType()),
                StructField("file_bytes", LongType()),
                StructField("raw_bytes", LongType()),
                StructField("stats", StringType()),
                StructField("job_id", StringType()),
                StructField("source_files", StringType()),
                StructField("sort_key", StringType()),
                StructField("content", LongType()),
                StructField("seq", LongType()),
            ]
        )

    def all_files(self, snapshot_id: int | str | None = None) -> list[dict]:
        """Every manifest row (data AND delete files)."""
        return self._manifest_rows(self._resolve_sid(snapshot_id))

    def data_files(self, snapshot_id: int | str | None = None) -> list[dict]:
        return [
            r
            for r in self.all_files(snapshot_id)
            if (r.get("content") or 0) == 0
        ]

    def delete_files(self, snapshot_id: int | str | None = None) -> list[dict]:
        """Positional delete files (content=1) in the snapshot —
        written by merge-on-read MERGE, absorbed by compaction."""
        return [
            r
            for r in self.all_files(snapshot_id)
            if (r.get("content") or 0) == 1
        ]

    def eq_delete_files(
        self, snapshot_id: int | str | None = None
    ) -> list[dict]:
        """Equality delete files (content=2) — written by
        :func:`operators.upsert.upsert_eq`, absorbed by compaction.
        Each holds key-column values that kill matching rows in data
        files with ``seq`` strictly below the delete's ``seq``."""
        return [
            r
            for r in self.all_files(snapshot_id)
            if (r.get("content") or 0) == 2
        ]

    def scan(
        self,
        columns: list[str] | None = None,
        snapshot_id: int | str | None = None,
        prune: dict | None = None,
        files: list[str] | None = None,
        with_file: bool = False,
        native_io: bool | None = None,
        block_skip: bool = True,
        with_pos: bool = False,
        apply_deletes: bool = True,
    ) -> DataFrame:
        """Read the table back as a logical DataFrame.

        ``prune`` = {col: (lo, hi)} filters *files* via manifest min/max
        stats before any data I/O (the stats live outside the data files,
        like Iceberg manifests — Catalyst cannot see inside our blocks).
        The pruning predicate runs as a Catalyst filter over the manifest
        DataFrame (``get_json_object`` on the stats column), so at 10^6+
        files the stats evaluation is distributed; only the SURVIVING
        file paths come back to the driver to build the scan. Parquet
        column pruning then skips the ``b_<col>`` blobs of unselected
        columns at I/O level.

        The same ``prune`` dict then cascades to BLOCK granularity
        inside each surviving file (``block_skip``, default on): the
        per-block ``zone`` maps written at encode time let the decode
        kernel skip blocks no row of which can match — a selective
        filter pays for headers + matching blocks only, not full-file
        decode. ``with_pos`` appends the Iceberg-v2 positional
        coordinate ``_pos`` (row position within ``_file``); it implies
        the native per-file read path.

        Positional delete files in the snapshot (merge-on-read MERGE)
        are merged at scan time: each task loads the delete positions
        for ITS files (parquet row-group filter over the sorted delete
        files) and the decode kernel drops them. ``apply_deletes=False``
        reads the raw physical rows (maintenance internals only).

        ``native_io``: executors open block files through ``pyarrow.fs``
        directly instead of Spark's JVM parquet reader — the analog of the
        reference's own S3 scan path (``tools/conversion/
        decompression-speed-s3.cpp:37-110``). Auto-enabled for object-store
        roots (no Hadoop connector needed); opt-in for local paths.
        """
        # hidden partitioning: a predicate on a transform SOURCE column
        # also prunes the derived _p_* layout (bucket/truncate/days) —
        # through EVERY spec that ever wrote files (spec evolution):
        # files lacking a dest column are kept by stats_may_match
        prune = _translate_prune(prune, self.all_partition_transforms())
        spec_src = None  # paths-DataFrame when planning is distributed
        sid = self._resolve_sid(snapshot_id)
        snapshot_id = sid  # tag name resolved once for the whole scan
        # ONE driver manifest read per scan, shared by the data-file and
        # delete-file discovery below (the big-table branches never take
        # this path — they plan through the manifest DataFrame)
        all_rows: list[dict] | None = None

        def rows_once() -> list[dict]:
            nonlocal all_rows
            if all_rows is None:
                all_rows = self._manifest_rows(sid)
            return all_rows

        if files is not None:
            # explicit file list (maintenance inner scans): driver-side
            # filtering over the already-known subset
            wanted = set(files)
            rows = [
                r
                for r in rows_once()
                if (r.get("content") or 0) == 0
                and r["file_path"] in wanted
            ]
            if prune:
                rows = [r for r in rows if _file_may_match(r, prune)]
            paths = [
                (r["file_path"], r.get("seq") or 0) for r in rows
            ]
        elif prune:
            entries = self._manifest_list(sid)
            n_files = sum(e["file_count"] or 0 for e in entries)
            if n_files <= self.SCAN_PLAN_DF_MIN:
                # small table: a Spark job costs more than the loop
                paths = [
                    (r["file_path"], r.get("seq") or 0)
                    for r in rows_once()
                    if (r.get("content") or 0) == 0
                    and _file_may_match(r, prune)
                ]
            else:
                # Catalyst filter over the manifest DataFrame — stats
                # never loop through the driver, and the surviving paths
                # STAY a DataFrame (spec_src): the driver never holds the
                # path list at all, only its count
                mdf = self.manifest_df(snapshot_id)
                spec_src = (
                    mdf.filter(
                        F.coalesce(F.col("content"), F.lit(0)) == 0
                    )
                    .filter(_prune_predicate(prune))
                    .select(
                        "file_path",
                        F.coalesce(F.col("seq"), F.lit(0)).alias("seq"),
                    )
                )
                paths = None
        else:
            entries = self._manifest_list(sid)
            n_files = sum(e["file_count"] or 0 for e in entries)
            if n_files <= self.SCAN_PLAN_DF_MIN:
                paths = [
                    (r["file_path"], r.get("seq") or 0)
                    for r in rows_once()
                    if (r.get("content") or 0) == 0
                ]
            else:
                # full scan of a big table: same batched planning — the
                # manifest rows flow straight into the task spec
                mdf = self.manifest_df(snapshot_id)
                spec_src = mdf.filter(
                    F.coalesce(F.col("content"), F.lit(0)) == 0
                ).select(
                    "file_path",
                    F.coalesce(F.col("seq"), F.lit(0)).alias("seq"),
                )
                paths = None
        del_paths: list[str] = []
        eq_specs: list[tuple[str, int]] = []  # (path, seq) content=2
        eq_key_cols: list[str] = []
        dels_join = None  # Spark-side per-data-file delete-path lists
        if apply_deletes:
            if paths is None:
                # big-table branches: positional delete files are
                # associated to their data files IN SPARK via the
                # manifest's `source_files` lineage (explode + equi-
                # join onto the spec), so the driver never holds the
                # delete-path list and no task closure carries it —
                # each task only sees the delete files covering its
                # own spec rows. The driver collect is limited to
                # equality-delete rows (bounded: compaction absorbs
                # them) plus any legacy positional row lacking
                # lineage (normally none — every writer records it).
                src_arr = F.from_json(
                    "source_files", "array<string>"
                )
                dels_join = (
                    mdf.filter(
                        F.coalesce(F.col("content"), F.lit(0)) == 1
                    )
                    .select(
                        F.col("file_path").alias("_del_path"),
                        F.explode(src_arr).alias("file_path"),
                    )
                    .groupBy("file_path")
                    .agg(F.collect_set("_del_path").alias("_dels"))
                )
                del_rows = (
                    mdf.filter(
                        (
                            F.coalesce(F.col("content"), F.lit(0)) == 2
                        )
                        | (
                            (
                                F.coalesce(F.col("content"), F.lit(0))
                                == 1
                            )
                            & (
                                src_arr.isNull()
                                | (F.size(src_arr) == 0)
                            )
                        )
                    )
                    .select("file_path", "content", "seq", "stats")
                    .collect()
                )
                del_paths = [
                    r.file_path for r in del_rows if r.content == 1
                ]
                eq_rows = [
                    {
                        "file_path": r.file_path,
                        "seq": r.seq,
                        "stats": r.stats,
                    }
                    for r in del_rows
                    if r.content == 2
                ]
            else:
                del_paths = [
                    r["file_path"]
                    for r in rows_once()
                    if (r.get("content") or 0) == 1
                ]
                eq_rows = [
                    r
                    for r in rows_once()
                    if (r.get("content") or 0) == 2
                ]
            eq_specs = [
                (r["file_path"], r.get("seq") or 0) for r in eq_rows
            ]
            # the delete key columns are the stats keys of the delete
            # files — known from the manifest, no file open needed
            eq_key_cols = sorted(
                {
                    c
                    for r in eq_rows
                    for c in json.loads(r["stats"] or "{}")
                }
            )
        arrow_schema = self.schema_arrow()
        want = list(
            columns
            or [c for c in arrow_schema.names if not c.startswith("_p_")]
        )
        # equality deletes filter on their key columns, so those must be
        # decoded even when the caller didn't ask for them; trimmed from
        # every output batch after the mask
        eq_extra = (
            [c for c in eq_key_cols if c not in want] if eq_specs else []
        )
        spark_schema = self._spark_schema_for(want)
        # rename history: files written before a rename_column carry the
        # former blob names; the decode kernel falls back per block
        renames = self.metadata().get("renames", {})
        aliases = {c: renames[c] for c in want if c in renames}
        n_paths = spec_src.count() if paths is None else len(paths)
        if n_paths == 0:
            return self.spark.createDataFrame([], schema=spark_schema)
        if native_io is None:
            # default EVERYWHERE, not just object stores: the block
            # decode runs in Python workers regardless, so the JVM
            # parquet reader only adds a second Arrow IPC hop and
            # coalesces ~8 block files per task (maxPartitionBytes),
            # starving parallelism — measured 4.4x slower than workers
            # reading via pyarrow with one task per file
            native_io = True
        schema_hex = arrow_schema.serialize().hex().decode()
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        extra_fields = []
        if with_file:
            extra_fields.append(StructField("_file", StringType()))
        if with_pos:
            extra_fields.append(StructField("_pos", LongType()))
        out_schema = (
            StructType(spark_schema.fields + extra_fields)
            if extra_fields
            else spark_schema
        )
        predicate = prune if (prune and block_skip) else None
        if with_pos and not native_io:
            raise ValueError(
                "_pos needs the per-file native read path (native_io=True)"
            )

        if native_io:
            # one row per file, but cap the TASK count at 4x parallelism:
            # a task has ~100ms of Arrow-stream setup overhead, so a
            # narrow scan of 500 small files must not pay 500 of them;
            # each task streams its files sequentially (still one file
            # in memory at a time)
            try:
                par = max(self.spark.sparkContext.defaultParallelism, 1)
            except Exception:
                par = 8
            n_tasks = max(1, min(n_paths, par * 4))
            if paths is None:
                if dels_join is not None:
                    # per-spec-row delete lists ride the task spec
                    spec_src = spec_src.join(
                        dels_join, "file_path", "left"
                    )
                spec_df = spec_src.repartition(n_tasks)
            else:
                spec_df = self.spark.createDataFrame(
                    paths, "file_path string, seq long"
                ).repartition(n_tasks)
            want_read = want + eq_extra
            bcols = ["tuple_count"] + [f"b_{c}" for c in want_read]
            alias_bcols = [
                f"b_{a}" for c in want_read for a in aliases.get(c, [])
            ]
            if predicate:
                bcols.append("zone")
            out_names = (
                want
                + (["_file"] if with_file else [])
                + (["_pos"] if with_pos else [])
            )

            def read_native(batch_iter):
                from btrblocks_spark.sources import fs as _fs
                from btrblocks_spark.sources.blockfile import (
                    decode_batches,
                    eq_delete_mask,
                    load_delete_index,
                    load_eq_deletes,
                )

                logical = pa.ipc.read_schema(
                    pa.py_buffer(bytes.fromhex(schema_hex))
                )
                # task's own file list first, so the delete-file read is
                # row-group-filtered to exactly these paths; the big-
                # table branch delivers each row's covering delete
                # files in a `_dels` spec column (Spark-side lineage
                # join) — the closure's `del_paths` list then only
                # holds legacy lineage-less files (normally empty)
                task_paths: list = []
                task_dels: set = set()
                for batch in batch_iter:
                    fps = batch.column("file_path").to_pylist()
                    seqs = batch.column("seq").to_pylist()
                    if "_dels" in batch.schema.names:
                        dls = batch.column("_dels").to_pylist()
                    else:
                        dls = [None] * len(fps)
                    for p, s, d in zip(fps, seqs, dls):
                        task_paths.append((p, s))
                        if d:
                            task_dels.update(d)
                if not task_paths:
                    return
                all_dels = sorted(task_dels.union(del_paths))
                del_index = (
                    load_delete_index(
                        all_dels, [p for p, _ in task_paths]
                    )
                    if all_dels
                    else {}
                )
                eq_dels = load_eq_deletes(eq_specs) if eq_specs else []
                for path, fseq in task_paths:
                    try:
                        # I/O-level column pruning: only the wanted
                        # b_<col> blobs leave the store
                        bt = _fs.read_parquet(path, columns=bcols)
                    except Exception:
                        # evolved schema: old files lack new columns or
                        # carry pre-rename names — pick the present
                        # subset via a footer-only schema read (never a
                        # full-column fetch)
                        names = set(_fs.read_parquet_schema(path).names)
                        bt = _fs.read_parquet(
                            path,
                            columns=[
                                c
                                for c in bcols + alias_bcols
                                if c in names
                            ],
                        )
                    if with_file:
                        bt = bt.append_column(
                            "_file",
                            pa.array([path] * bt.num_rows, pa.string()),
                        )
                    stream = decode_batches(
                        bt.to_batches(),
                        logical,
                        want_read,
                        with_file=with_file,
                        predicate=predicate,
                        with_pos=with_pos,
                        deletes=del_index.get(path),
                        aliases=aliases,
                    )
                    applicable = [
                        d for d in eq_dels if d[0] > (fseq or 0)
                    ]
                    if not applicable:
                        if eq_extra:
                            for rb in stream:
                                yield rb.select(out_names)
                        else:
                            yield from stream
                        continue
                    for rb in stream:
                        mask = eq_delete_mask(
                            rb, fseq or 0, applicable
                        )
                        if mask is not None:
                            rb = rb.filter(pa.array(mask))
                        yield (
                            rb.select(out_names) if eq_extra else rb
                        )

            return spec_df.mapInArrow(read_native, out_schema)

        if (
            del_paths
            or eq_specs
            or (
                dels_join is not None
                and dels_join.limit(1).count() > 0
            )
        ):
            raise ValueError(
                "snapshot has delete files: the JVM batch "
                "path cannot merge them (use native_io=True)"
            )
        if paths is None:
            # explicit JVM path on a 10^4+-file table: materialize the
            # list (spark.read needs concrete paths)
            paths = [r.file_path for r in spec_src.collect()]
        else:
            paths = [p for p, _ in paths]
        alias_names = [a for c in want for a in aliases.get(c, [])]
        sel = [F.col("tuple_count")] + [
            F.col(f"b_{c}") for c in want + alias_names
        ]
        if predicate:
            sel.append(F.col("zone"))
        if with_file:
            sel.append(F.input_file_name().alias("_file"))
        from pyspark.sql.types import BinaryType, IntegerType

        block_schema = StructType(
            [
                StructField("block_id", LongType()),
                StructField("tuple_count", IntegerType()),
                StructField("zone", StringType()),
            ]
            + [
                StructField(f"b_{c}", BinaryType())
                for c in want + alias_names
            ]
        )
        block_df = (
            self.spark.read.schema(block_schema).parquet(*paths).select(*sel)
        )

        def decode(batch_iter):
            from btrblocks_spark.sources.blockfile import decode_batches

            logical = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(schema_hex)))
            yield from decode_batches(
                batch_iter,
                logical,
                list(want),
                with_file=with_file,
                predicate=predicate,
                aliases=aliases,
            )

        return block_df.mapInArrow(decode, out_schema)

    def _spark_schema_for(self, columns: list[str]):
        from pyspark.sql.types import StructType

        full = StructType.fromJson(json.loads(self.metadata()["spark_schema_json"]))
        by_name = {f.name: f for f in full.fields}
        # preserve the REQUESTED order — the decode kernel emits columns in
        # this order, and Spark trusts the declared schema positionally
        return StructType([by_name[c] for c in columns])

    # ------------------------------------------------------------ maintenance
    #: above this many files, the explicit metadata-maintenance ops
    #: (expire_snapshots / remove_orphan_files / rewrite_manifests) run
    #: as Spark jobs over the manifest DataFrames instead of driver
    #: loops with per-file fs calls — driver work stays O(manifests),
    #: matching the commit path's O(added+touched) guarantee
    DISTRIBUTED_META_MIN = 10_000

    def _manifests_files_df(self, sids: list[int]) -> DataFrame:
        """One DataFrame over the UNION of the snapshots' manifests
        (deduped by manifest name — manifests are shared across
        snapshots)."""
        names = sorted(
            {e["name"] for sid in sids for e in self._manifest_list(sid)}
        )
        if not names:
            return self.spark.createDataFrame(
                [], schema=self._manifest_spark_schema()
            )
        paths = [fs.join(self.root, "manifests", n) for n in names]
        if fs.is_local(paths[0]):
            return self.spark.read.schema(
                self._manifest_spark_schema()
            ).parquet(*paths)
        n_files = sum(
            e["file_count"] or 0
            for sid in sids
            for e in self._manifest_list(sid)
        )
        return self._read_manifests_arrow(paths, n_files)

    def _read_manifests_arrow(self, paths: list[str], n_files: int) -> DataFrame:
        """Manifest rows as a DataFrame for stores the JVM has no
        connector for. Below ``DISTRIBUTED_META_MIN`` rows the driver
        reads them via pyarrow (bounded by the threshold). At or above
        it the manifest *names* are parallelized and each executor task
        reads its manifests via ``fs.read_parquet`` — the driver holds
        O(manifests) names, never 10^5-10^7 manifest rows (mirrors the
        local ``spark.read.parquet`` branch and keeps the documented
        O(manifests)-driver-work guarantee on object stores)."""
        schema = self._manifest_spark_schema()
        if n_files < self.DISTRIBUTED_META_MIN:
            tbl = pa.concat_tables(
                [fs.read_parquet(p) for p in paths], promote_options="default"
            )
            cols = {
                f.name: (
                    tbl.column(f.name)
                    if f.name in tbl.schema.names
                    else pa.nulls(tbl.num_rows, f.type)
                )
                for f in MANIFEST_SCHEMA
            }
            return self.spark.createDataFrame(
                pa.table(cols, schema=MANIFEST_SCHEMA).to_pandas(),
                schema=schema,
            )
        names_df = self.spark.createDataFrame(
            [(p,) for p in paths], "manifest_path string"
        )
        try:
            par = max(self.spark.sparkContext.defaultParallelism, 1)
        except Exception:
            par = 8
        names_df = names_df.repartition(max(1, min(len(paths), par * 4)))

        def read_rows(batch_iter):
            import pyarrow as _pa

            from btrblocks_spark.sources import fs as _fs
            from btrblocks_spark.sources.table import MANIFEST_SCHEMA as _MS

            for batch in batch_iter:
                for p in batch.column("manifest_path").to_pylist():
                    t = _fs.read_parquet(p)
                    cols = {
                        f.name: (
                            t.column(f.name)
                            if f.name in t.schema.names
                            else _pa.nulls(t.num_rows, f.type)
                        )
                        for f in _MS
                    }
                    yield from _pa.table(cols, schema=_MS).to_batches()

        return names_df.mapInArrow(read_rows, schema)

    def _delete_paths_spark(self, paths_df: DataFrame) -> int:
        """Delete the ``file_path`` column's files in a Spark job (the
        driver never stats or deletes a data file); missing files are
        counted as already gone."""

        def dele(batch_iter):
            import pyarrow as _pa

            from btrblocks_spark.sources import fs as _fs

            for batch in batch_iter:
                n = 0
                for p in batch.column("file_path").to_pylist():
                    try:
                        _fs.delete_file(p)
                        n += 1
                    except (FileNotFoundError, OSError):
                        pass
                yield _pa.RecordBatch.from_pydict({"n": [n]})

        try:
            par = max(self.spark.sparkContext.defaultParallelism, 1)
        except Exception:
            par = 8
        row = (
            paths_df.select("file_path")
            .repartition(par)
            .mapInArrow(dele, "n long")
            .groupBy()
            .sum("n")
            .collect()[0]
        )
        return int(row[0] or 0)

    def expire_snapshots(
        self, keep_last: int = 1, older_than: float | None = None
    ) -> dict:
        """Drop all but the last ``keep_last`` snapshots; delete orphans.

        ``older_than`` (seconds) adds Iceberg-style age retention: a
        snapshot younger than the cutoff is kept even beyond
        ``keep_last`` — expiry only ever removes snapshots that fail
        BOTH criteria.

        Above ``DISTRIBUTED_META_MIN`` expired files the doomed-file set
        is computed as a Spark anti-join of the expired snapshots'
        manifest rows against the retained ones', and deletion runs in
        executor tasks — the driver reads no manifest rows and makes no
        per-file fs calls (O(manifests) driver work).

        Retention is chain-aware: ``keep_last`` counts ancestors of the
        CURRENT snapshot; snapshots pinned by a tag (:meth:`tag`) and
        unpublished staged (write-audit-publish) snapshots are always
        retained regardless of age."""
        meta = self.metadata()
        snaps = meta["snapshots"]
        known = {s["snapshot_id"]: s for s in snaps}
        chain: list[int] = []
        cur: int | None = meta["current_snapshot_id"]
        while cur is not None and cur in known:
            chain.append(cur)
            cur = known[cur].get("parent")
        keep_sids = set(chain[:keep_last])
        keep_sids.add(meta["current_snapshot_id"])
        keep_sids |= {
            r["snapshot_id"] for r in meta.get("refs", {}).values()
        }
        keep_sids |= {s["snapshot_id"] for s in snaps if s.get("staged")}
        # unadopted branch commits: their chain must stay walkable for
        # fast_forward (the head alone is in refs; ancestors carry the
        # branch marker until adoption sheds it)
        keep_sids |= {s["snapshot_id"] for s in snaps if s.get("branch")}
        if older_than is not None:
            cutoff = time.time() - older_than
            keep_sids |= {
                s["snapshot_id"] for s in snaps if s["ts"] > cutoff
            }
        retained = [s for s in snaps if s["snapshot_id"] in keep_sids]
        expired = [s for s in snaps if s["snapshot_id"] not in keep_sids]
        retained_sids = [s["snapshot_id"] for s in retained]
        expired_sids = [s["snapshot_id"] for s in expired]
        keep_manifests = {
            e["name"] for sid in retained_sids for e in self._manifest_list(sid)
        }
        # manifests are SHARED across snapshots (append-only manifest
        # lists): phase 1 reads every expired snapshot's rows while all
        # manifests still exist, phase 2 deletes the manifests no
        # retained snapshot references
        expired_entries: dict[str, dict] = {}
        for sid in expired_sids:
            for e in self._manifest_list(sid):
                expired_entries[e["name"]] = e
        n_expired_files = sum(
            e["file_count"] or 0 for e in expired_entries.values()
        )
        removed_manifests = 0
        if expired and n_expired_files >= self.DISTRIBUTED_META_MIN:
            doomed = (
                self._manifests_files_df(expired_sids)
                .select("file_path")
                .distinct()
                .join(
                    self._manifests_files_df(retained_sids)
                    .select("file_path")
                    .distinct(),
                    "file_path",
                    "left_anti",
                )
            )
            removed_data = self._delete_paths_spark(doomed)
        else:
            keep_files: set[str] = set()
            for sid in retained_sids:
                for r in self._manifest_rows(sid):
                    keep_files.add(r["file_path"])
            removed_data = 0
            seen: set[str] = set()
            for sid in expired_sids:
                for r in self._manifest_rows(sid):
                    p = r["file_path"]
                    if p in keep_files or p in seen:
                        continue
                    seen.add(p)
                    if fs.exists(p):
                        fs.delete_file(p)
                        removed_data += 1
        for name in set(expired_entries) - keep_manifests:
            mp = fs.join(self.root, "manifests", name)
            if fs.exists(mp):
                fs.delete_file(mp)
                removed_manifests += 1
        meta["snapshots"] = retained
        _atomic_write_json(self._meta_path, meta)
        return {
            "expired_snapshots": len(expired),
            "removed_data_files": removed_data,
            "removed_manifests": removed_manifests,
        }

    def add_column(self, name: str, spark_ddl_type: str) -> dict:
        """Schema evolution: append a nullable column (Iceberg add-column).
        Existing files stay untouched; their rows scan as NULL for the new
        column (the decode kernel fills from each block's tuple_count)."""
        import json as _json

        from pyspark.sql.types import StructType, _parse_datatype_string

        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            spark_schema = StructType.fromJson(
                _json.loads(meta["spark_schema_json"])
            )
            if name in spark_schema.names:
                raise ValueError(f"column {name} already exists")
            if name in self._retired_names(meta):
                raise ValueError(
                    f"column name {name!r} was used by a dropped or "
                    "renamed column; existing files still carry its "
                    "blobs, so reusing it would resurrect old data — "
                    "pick a fresh name (or rewrite the table first)"
                )
            dt = _parse_datatype_string(spark_ddl_type)
            spark_schema = spark_schema.add(name, dt, nullable=True)
            new_df = self.spark.createDataFrame([], schema=spark_schema)
            arrow_schema = new_df.limit(0).toArrow().schema
            meta["spark_schema_json"] = spark_schema.json()
            meta["arrow_schema_hex"] = arrow_schema.serialize().hex().decode()
            current = meta["current_snapshot_id"]
            cur_snap = self._snapshot(current)
            new_sid = self._next_snapshot_id(meta)
            meta["snapshots"].append(
                {
                    "snapshot_id": new_sid,
                    "parent": current,
                    "ts": time.time(),
                    "operation": "add-column",
                    "manifest": cur_snap.get("manifest"),
                    "manifests": cur_snap.get("manifests"),
                    "summary": {"column": name, "type": spark_ddl_type},
                }
            )
            meta["current_snapshot_id"] = new_sid
            _atomic_write_json(self._meta_path, meta)
            return {"column": name, "type": spark_ddl_type}
        finally:
            fs.delete_file(lock)

    #: legal type promotions (Iceberg schema-evolution set): widening
    #: only — every stored value remains exactly representable, so old
    #: blocks decode and CAST losslessly (the decode kernel already
    #: casts each block to the logical type)
    _WIDEN_OK = {
        "tinyint": {"smallint", "int", "bigint"},
        "smallint": {"int", "bigint"},
        "int": {"bigint"},
        "float": {"double"},
    }

    def widen_column(self, name: str, spark_ddl_type: str) -> dict:
        """Schema evolution: promote a column to a wider type
        (Iceberg ``update_column`` type promotion: int→long,
        float→double). Metadata-only — existing files keep their
        narrower blocks; the decode kernel casts every block to the
        logical type, so old and new files scan uniformly.

        Refused while equality-delete files exist (their stored key
        values would probe data columns at a different type) — run
        ``compact()`` first.
        """
        import json as _json

        from pyspark.sql.types import StructType, _parse_datatype_string

        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            spark_schema = StructType.fromJson(
                _json.loads(meta["spark_schema_json"])
            )
            if name not in spark_schema.names:
                raise KeyError(f"no column {name}")
            if name.startswith("_p_"):
                raise ValueError("derived partition columns cannot widen")
            old_f = spark_schema[name]
            old_t = old_f.dataType.simpleString()
            new_t = _parse_datatype_string(spark_ddl_type)
            if new_t.simpleString() not in self._WIDEN_OK.get(old_t, ()):
                raise ValueError(
                    f"cannot widen {name}: {old_t} -> "
                    f"{new_t.simpleString()} is not a lossless promotion"
                )
            if self.eq_delete_files():
                raise RuntimeError(
                    "table carries equality delete files; compact() to "
                    "absorb them before widening a column"
                )
            from pyspark.sql.types import StructField

            spark_schema = StructType(
                [
                    StructField(name, new_t, nullable=f.nullable)
                    if f.name == name
                    else f
                    for f in spark_schema.fields
                ]
            )
            self._schema_evolution_commit(
                meta,
                spark_schema,
                "widen-column",
                {
                    "column": name,
                    "from": old_t,
                    "to": new_t.simpleString(),
                },
            )
            return {"column": name, "from": old_t,
                    "to": new_t.simpleString()}
        finally:
            fs.delete_file(lock)

    @staticmethod
    def _retired_names(meta: dict) -> set[str]:
        """Column names that still have physical blobs in old files:
        dropped columns and every former name in the rename history.
        ``add_column`` refuses these — a new logical column under such
        a name would decode the old blobs as its data."""
        retired = set(meta.get("retired_columns", []))
        for chain in meta.get("renames", {}).values():
            retired.update(chain)
        return retired

    def all_partition_transforms(self) -> list[dict]:
        """Active + historical hidden-partitioning transforms — every
        spec that ever wrote files. Prune translation must cover them
        all: old-spec files prune on their own ``_p_*`` stats, files
        lacking a dest column are kept by ``stats_may_match``."""
        return all_transforms_of(self.metadata())

    def evolve_partition_spec(
        self, partition_by: list[str] | None
    ) -> dict:
        """Iceberg-style partition-spec evolution: REPLACE the active
        spec with ``partition_by`` (same syntax as ``create`` —
        ``bucket(N,col)`` / ``truncate(W,col)`` / ``days(col)`` / plain
        columns) without rewriting any data.

        - Existing files keep their old-spec layout and keep pruning
          through it (``all_partition_transforms`` unions every spec's
          prune translation; a file lacking a ``_p_*`` column is kept).
        - New writes compute only the NEW spec's derived columns.
        - Re-parameterizing a transform (``bucket(8,k)`` →
          ``bucket(16,k)``) gets a fresh ``_p_*_sN`` column — the old
          name keeps its old meaning in old files.
        - ``compact()`` / ``cluster()`` rewrites migrate old files to
          the new spec opportunistically (every write path computes the
          active transforms).

        Metadata-only snapshot commit (operation ``evolve-spec``).
        Reference analog: none — the reference has no partitioned
        tables; semantics follow the Iceberg spec (per-file spec ids).
        """
        import json as _json

        from pyspark.sql.types import (
            IntegerType,
            LongType,
            StringType,
            StructType,
        )

        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            spark_schema = StructType.fromJson(
                _json.loads(meta["spark_schema_json"])
            )
            plain, transforms = _parse_partition_specs(partition_by)
            spec_id = int(meta.get("partition_spec_id") or 0) + 1
            history = list(
                meta.get("partition_transforms_history")
                or meta.get("partition_transforms")
                or []
            )
            hist_by_dest = {t["dest"]: t for t in history}
            final: list[dict] = []
            renamed_plain = list(plain)
            for t in transforms:
                ex = hist_by_dest.get(t["dest"])
                if ex is not None and (
                    ex["kind"], ex["param"], ex["col"]
                ) != (t["kind"], t["param"], t["col"]):
                    # same source re-parameterized: fresh derived column
                    nd = f"{t['dest']}_s{spec_id}"
                    renamed_plain[renamed_plain.index(t["dest"])] = nd
                    t = {**t, "dest": nd}
                final.append(t)
            # validate sources against the USER schema (a derived _p_*
            # column is never a transform source)
            user_fields = [
                f for f in spark_schema.fields
                if not f.name.startswith("_p_")
            ]
            _validate_transforms(final, StructType(user_fields))
            for p in renamed_plain:
                if not p.startswith("_p_") and p not in spark_schema.names:
                    raise KeyError(f"partition column {p!r} missing")
            # extend the schema with any new derived columns (type
            # parity with _transform_column/_transform_arrow)
            for t in final:
                if t["dest"] in spark_schema.names:
                    continue
                if t["kind"] in ("bucket", "days"):
                    dt = IntegerType()
                elif isinstance(
                    spark_schema[t["col"]].dataType, StringType
                ):
                    dt = StringType()
                else:
                    dt = LongType()
                spark_schema = spark_schema.add(t["dest"], dt, True)
            new_hist = history + [
                t for t in final if t["dest"] not in hist_by_dest
            ]
            meta["partition_by"] = renamed_plain
            meta["partition_transforms"] = final
            meta["partition_transforms_history"] = new_hist
            meta["partition_spec_id"] = spec_id
            self._schema_evolution_commit(
                meta,
                spark_schema,
                "evolve-spec",
                {
                    "spec_id": spec_id,
                    "partition_by": renamed_plain,
                },
            )
            return {
                "spec_id": spec_id,
                "partition_by": renamed_plain,
                "transforms": final,
            }
        finally:
            fs.delete_file(lock)

    def _schema_evolution_commit(
        self, meta: dict, spark_schema, operation: str, summary: dict
    ) -> None:
        """Shared metadata-only commit for add/rename/drop column: same
        manifests as current, new schema, new snapshot."""
        import json as _json  # noqa: F401  (parity with add_column)

        new_df = self.spark.createDataFrame([], schema=spark_schema)
        arrow_schema = new_df.limit(0).toArrow().schema
        meta["spark_schema_json"] = spark_schema.json()
        meta["arrow_schema_hex"] = arrow_schema.serialize().hex().decode()
        current = meta["current_snapshot_id"]
        cur_snap = next(
            s for s in meta["snapshots"] if s["snapshot_id"] == current
        )
        new_sid = self._next_snapshot_id(meta)
        meta["snapshots"].append(
            {
                "snapshot_id": new_sid,
                "parent": current,
                "ts": time.time(),
                "operation": operation,
                "manifest": cur_snap.get("manifest"),
                "manifests": cur_snap.get("manifests"),
                "summary": summary,
            }
        )
        meta["current_snapshot_id"] = new_sid
        _atomic_write_json(self._meta_path, meta)

    def rename_column(self, old: str, new: str) -> dict:
        """Schema evolution: rename a column without touching data
        (Iceberg rename). Old files keep their ``b_<old>`` blobs; scans
        fall back through the recorded rename chain per block, and every
        rewrite (compaction, clustering, merge) re-encodes under the new
        name, converging the table. Stats/zone/bloom pruning on the new
        name simply stops pruning not-yet-rewritten files (pruning is
        advisory), never loses rows.

        Partition and bloom-digest columns cannot be renamed in place —
        their names are baked into manifest partition values and stats
        digests."""
        import json as _json

        from pyspark.sql.types import StructField, StructType

        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            spark_schema = StructType.fromJson(
                _json.loads(meta["spark_schema_json"])
            )
            if old not in spark_schema.names:
                raise KeyError(f"no column {old}")
            if new in spark_schema.names:
                raise ValueError(f"column {new} already exists")
            if new in self._retired_names(meta):
                raise ValueError(
                    f"column name {new!r} was used by a dropped or "
                    "renamed column; pick a fresh name"
                )
            if (
                old in meta.get("partition_by", [])
                or old in meta.get("bloom_cols", [])
                or old in meta.get("ndv_cols", [])
                or old in meta.get("token_bloom_cols", [])
                or any(
                    t["col"] == old
                    for t in meta.get("partition_transforms") or []
                )
            ):
                raise ValueError(
                    f"cannot rename partition/bloom/ndv column {old!r}"
                )
            renames = meta.setdefault("renames", {})
            chain = [old] + renames.pop(old, [])
            renames[new] = chain
            spark_schema = StructType(
                [
                    StructField(new, f.dataType, f.nullable)
                    if f.name == old
                    else f
                    for f in spark_schema.fields
                ]
            )
            self._schema_evolution_commit(
                meta,
                spark_schema,
                "rename-column",
                {"from": old, "to": new},
            )
            return {"from": old, "to": new}
        finally:
            fs.delete_file(lock)

    def drop_column(self, name: str) -> dict:
        """Schema evolution: drop a column logically (Iceberg drop).
        No data is rewritten — column pruning means the blobs are simply
        never read again; rewrites emit new files without them. The name
        is retired (``add_column`` refuses to reuse it) because old
        files keep the physical blobs until fully rewritten."""
        import json as _json

        from pyspark.sql.types import StructType

        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            spark_schema = StructType.fromJson(
                _json.loads(meta["spark_schema_json"])
            )
            if name not in spark_schema.names:
                raise KeyError(f"no column {name}")
            if (
                name in meta.get("partition_by", [])
                or any(
                    t["col"] == name
                    for t in meta.get("partition_transforms") or []
                )
                or name in meta.get("bloom_cols", [])
                or name in meta.get("ndv_cols", [])
                or name in meta.get("token_bloom_cols", [])
            ):
                raise ValueError(
                    f"cannot drop partition/bloom/ndv column {name!r}"
                )
            if len(spark_schema.fields) == 1:
                raise ValueError("cannot drop the last column")
            retired = meta.setdefault("retired_columns", [])
            retired.append(name)
            # former names of the dropped column are retired too
            retired.extend(meta.get("renames", {}).pop(name, []))
            spark_schema = StructType(
                [f for f in spark_schema.fields if f.name != name]
            )
            self._schema_evolution_commit(
                meta, spark_schema, "drop-column", {"column": name}
            )
            return {"column": name}
        finally:
            fs.delete_file(lock)

    def rollback(self, snapshot_id: int) -> dict:
        """Roll the table back to an earlier snapshot (Iceberg rollback):
        a NEW snapshot is committed whose manifest is the old one's —
        history is preserved, nothing is deleted."""
        self._snapshot(snapshot_id)  # raises if unknown
        rows = self._manifest_rows(snapshot_id)
        current_rows = self.all_files()
        sid = self._commit(
            rows,
            operation="rollback",
            replaced={r["file_path"] for r in current_rows},
            extra_summary={"rolled_back_to": snapshot_id},
        )
        return {"snapshot_id": sid, "rolled_back_to": snapshot_id,
                "files": len(rows)}

    def remove_orphan_files(
        self,
        dry_run: bool = False,
        older_than_seconds: float = 3 * 24 * 3600.0,
    ) -> dict:
        """Delete data/staging files not referenced by ANY retained
        snapshot (Iceberg remove_orphan_files): crashed-job leftovers,
        superseded staging output. Never touches referenced files.

        Two extra guards protect in-flight / resumable jobs (the
        checkpoint-resume protocol intentionally leaves
        committed-later data files plus ``_checkpoints`` markers on
        disk, and vacuuming between a crash and a resume would commit a
        manifest referencing deleted files):

        - files younger than ``older_than_seconds`` (Iceberg's 3-day
          default) are kept, and
        - files belonging to a job_id with live ``_checkpoints/<job>/``
          markers are kept regardless of age (data files are named
          ``<job_id>-...``; staging lives under ``_staging/<job_id>/``).
        """
        live_jobs = set(fs.list_dirs(fs.join(self.root, "_checkpoints")))
        cutoff = time.time() - older_than_seconds
        all_sids = [s["snapshot_id"] for s in self.snapshots()]
        data_dir = fs.join(self.root, "data")

        # ONE recursive-free listing with mtimes — no per-file stat calls
        from pyarrow import fs as pafs

        f_, p_ = fs.resolve(data_dir)
        try:
            infos = [
                i
                for i in f_.get_file_info(pafs.FileSelector(p_))
                if i.type == pafs.FileType.File
            ]
        except (FileNotFoundError, OSError):
            infos = []

        def _job_protected(name: str) -> bool:
            return any(
                name.startswith(j + "-") or name.startswith(j + "/")
                for j in live_jobs
            )

        removed, kept = [], 0
        if len(infos) >= self.DISTRIBUTED_META_MIN:
            # distributed: anti-join the listing against the referenced
            # basenames from the manifest DataFrame; the driver never
            # reads manifest rows or touches a data file
            listing = self.spark.createDataFrame(
                [
                    (
                        data_dir.rstrip("/") + "/" + i.base_name,
                        i.base_name,
                        i.mtime.timestamp() if i.mtime else 0.0,
                    )
                    for i in infos
                ],
                "file_path string, name string, mtime double",
            )
            ref = (
                self._manifests_files_df(all_sids)
                .select(
                    F.element_at(
                        F.split(F.col("file_path"), "/"), -1
                    ).alias("name")
                )
                .distinct()
            )
            cand = listing.join(ref, "name", "left_anti")
            for j in live_jobs:
                cand = cand.filter(~F.col("name").startswith(j + "-"))
            n_cand = cand.count()
            orphans = cand.filter(F.col("mtime") <= F.lit(cutoff))
            removed = [
                r.file_path
                for r in orphans.select("file_path").limit(20).collect()
            ]
            if dry_run:
                n_removed = orphans.count()
            else:
                n_removed = self._delete_paths_spark(orphans)
            kept += n_cand - n_removed
            n_removed_data = n_removed
        else:
            referenced: set[str] = set()
            for sid in all_sids:
                for r in self._manifest_rows(sid):
                    referenced.add(
                        fs.join(
                            self.root,
                            "data",
                            r["file_path"].rsplit("/", 1)[-1],
                        )
                    )
            for i in infos:
                name = i.base_name
                p = fs.join(data_dir, name)
                if p in referenced:
                    continue
                mtime = i.mtime.timestamp() if i.mtime else fs.mtime(p)
                if _job_protected(name) or mtime > cutoff:
                    kept += 1
                    continue
                removed.append(p)
                if not dry_run:
                    fs.delete_file(p)
            n_removed_data = len(removed)
        # transient staging output (crashed jobs) — recurse the tree
        staging_root = fs.join(self.root, "_staging")
        f_, p_ = fs.resolve(staging_root)
        from pyarrow import fs as pafs

        try:
            infos = f_.get_file_info(pafs.FileSelector(p_, recursive=True))
        except (FileNotFoundError, OSError):
            infos = []
        for i in infos:
            if i.type == pafs.FileType.File:
                rel = i.path.split("/_staging", 1)[-1].lstrip("/")
                q = self.root.rstrip("/") + "/_staging/" + rel
                if rel.split("/", 1)[0] in live_jobs or fs.mtime(q) > cutoff:
                    kept += 1
                    continue
                removed.append(q)
                n_removed_data += 1
                if not dry_run:
                    fs.delete_file(q)
        # orphan MANIFESTS: a manifest written then superseded within
        # its own commit (merged away by manifest bin-packing) or left
        # by a crash before the metadata.json swap is referenced by no
        # snapshot and would otherwise accumulate forever. O(manifests)
        # driver loop, same age guard.
        referenced_manifests = {
            e["name"] for sid in all_sids for e in self._manifest_list(sid)
        }
        mdir = fs.join(self.root, "manifests")
        for name in fs.list_files(mdir):
            if name in referenced_manifests:
                continue
            mp = fs.join(mdir, name)
            if fs.mtime(mp) > cutoff:
                kept += 1
                continue
            removed.append(mp)
            n_removed_data += 1
            if not dry_run:
                fs.delete_file(mp)
        return {"removed": n_removed_data, "kept": kept, "dry_run": dry_run,
                "paths": removed[:20]}

    #: target rows per manifest written by the distributed
    #: rewrite_manifests path
    REWRITE_MANIFEST_ROWS = 100_000

    def _rewrite_manifests_spark(self, current: int, snapshot_id: int):
        """Distributed manifest rewrite: sort the manifest DataFrame by
        (partition, file_path) with a range partitioner and have each
        task write one clustered manifest, yielding only its entry
        metadata — the driver never reads a manifest row. Unlike the
        small path there is no per-file existence check (10^7 stat
        calls); vanished files are remove_orphan_files' concern, and a
        scan of a missing file fails loudly rather than silently."""
        mdf = self._manifests_files_df([current])
        n_files = mdf.count()
        n_out = max(1, -(-n_files // self.REWRITE_MANIFEST_ROWS))
        root = self.root
        sorted_df = mdf.repartitionByRange(
            n_out, F.col("partition"), F.col("file_path")
        ).sortWithinPartitions("partition", "file_path")

        def write_part(batch_iter):
            import pyarrow as _pa
            import pyarrow.compute as _pc

            from btrblocks_spark.sources import fs as _fs
            from btrblocks_spark.sources.table import MANIFEST_SCHEMA

            batches = [
                b.select(MANIFEST_SCHEMA.names).cast(MANIFEST_SCHEMA)
                for b in batch_iter
            ]
            if not batches:
                return
            tbl = _pa.Table.from_batches(batches, MANIFEST_SCHEMA)
            paths = tbl.column("file_path").to_pylist()
            # deterministic name from the partition's content, not the
            # task/partition id — idempotent across retries
            import hashlib as _hl

            tag = _hl.sha256(
                (paths[0] + paths[-1]).encode()
            ).hexdigest()[:12]
            name = f"manifest-{snapshot_id}-d{tag}.parquet"
            _fs.write_parquet_atomic(
                tbl, _fs.join(root, "manifests", name)
            )
            yield _pa.RecordBatch.from_pydict(
                {
                    "name": [name],
                    "file_count": [tbl.num_rows],
                    "row_count_sum": [
                        int(_pc.sum(tbl.column("row_count")).as_py())
                    ],
                    "path_min": [min(paths)],
                    "path_max": [max(paths)],
                }
            )

        entries = [
            r.asDict()
            for r in sorted_df.mapInArrow(
                write_part,
                "name string, file_count long, row_count_sum long, "
                "path_min string, path_max string",
            ).collect()
        ]
        entries.sort(key=lambda e: e["path_min"])
        return entries, n_files

    def rewrite_manifests(self) -> dict:
        """Compact the manifest list into clustered manifests (Iceberg
        rewrite_manifests): rows sorted by partition/cluster position so
        scan planning reads clustered manifests. Below
        ``DISTRIBUTED_META_MIN`` files: ONE manifest, driver-side, with
        defensive vanished-file drops. Above it: a Spark job writes one
        ~``REWRITE_MANIFEST_ROWS``-row manifest per range partition and
        the driver handles only the O(manifests) entry list. Data files
        are untouched."""
        lock = fs.join(self.root, "_commit.lock")
        self._acquire_commit_lock(lock)
        try:
            meta = self.metadata()
            current = meta["current_snapshot_id"]
            mlist = self._manifest_list(current)
            before = len(mlist)
            n_total = sum(e["file_count"] or 0 for e in mlist)
            snapshot_id = self._next_snapshot_id(meta)
            if n_total >= self.DISTRIBUTED_META_MIN:
                entries, n_kept = self._rewrite_manifests_spark(
                    current, snapshot_id
                )
                dropped = 0
                meta["snapshots"].append(
                    {
                        "snapshot_id": snapshot_id,
                        "parent": current,
                        "ts": time.time(),
                        "operation": "rewrite-manifests",
                        "manifest": None,
                        "manifests": entries,
                        "summary": {
                            "manifests_before": before,
                            "manifests_after": len(entries),
                            "total_files": n_kept,
                            "dropped_missing": 0,
                        },
                    }
                )
                meta["current_snapshot_id"] = snapshot_id
                _atomic_write_json(self._meta_path, meta)
                return {
                    "snapshot_id": snapshot_id,
                    "files": n_kept,
                    "dropped": 0,
                    "manifests_before": before,
                    "manifests_after": len(entries),
                }
            rows = self._manifest_rows(current)
            kept = [r for r in rows if fs.exists(r["file_path"])]

            def sort_key(r: dict):
                stats = json.loads(r["stats"])
                first = next(iter(stats.values()), {})
                return (r["partition"], str(first.get("min")))

            kept.sort(key=sort_key)
            dropped = len(rows) - len(kept)
            entries = []
            if kept:
                entries = [
                    self._write_manifest(
                        f"manifest-{snapshot_id}-m.parquet", kept
                    )
                ]
            meta["snapshots"].append(
                {
                    "snapshot_id": snapshot_id,
                    "parent": current,
                    "ts": time.time(),
                    "operation": "rewrite-manifests",
                    "manifest": None,
                    "manifests": entries,
                    "summary": {
                        "manifests_before": before,
                        "manifests_after": len(entries),
                        "total_files": len(kept),
                        "dropped_missing": dropped,
                    },
                }
            )
            meta["current_snapshot_id"] = snapshot_id
            _atomic_write_json(self._meta_path, meta)
            return {
                "snapshot_id": snapshot_id,
                "files": len(kept),
                "dropped": dropped,
                "manifests_before": before,
                "manifests_after": len(entries),
            }
        finally:
            fs.delete_file(lock)

    # ------------------------------------------------------------ lookup
    def lookup(
        self,
        col: str,
        value,
        columns: list[str] | None = None,
        snapshot_id: int | str | None = None,
    ) -> DataFrame:
        """Point lookup — the ``lookup()`` the reference declares on
        every scheme but leaves UNREACHABLE (e.g.
        ``/root/reference/btrblocks/scheme/integer/PBP.cpp:51-56``).

        Three skip levels before any decode: manifest min/max stats drop
        files; per-file key blooms (when ``col`` is a bloom column) drop
        range-overlapping files that provably lack the key; per-block
        zone maps drop blocks inside surviving files. The final
        row-level equality filter runs on the decoded survivors.
        """
        prune = {col: [value]}
        rows = [
            r
            for r in self.data_files(snapshot_id)
            if _file_may_match(r, prune)
        ]
        bloomable = (
            isinstance(value, int) and not isinstance(value, bool)
        ) or isinstance(value, (str, bytes))
        if col in self.bloom_cols() and bloomable:
            import numpy as np

            from btrblocks_spark.codec.bloom import bloom_may_contain_any

            probe = (
                np.array([value], np.int64)
                if isinstance(value, int)
                else np.asarray([value], dtype=object)
            )
            kept = []
            for r in rows:
                bl = json.loads(r["stats"]).get(col, {}).get("bloom")
                if bl is not None and not bloom_may_contain_any(bl, probe):
                    continue
                kept.append(r)
            rows = kept
        out_cols = columns
        if out_cols is not None and col not in out_cols:
            out_cols = [col, *out_cols]
        df = self.scan(
            columns=out_cols,
            snapshot_id=snapshot_id,
            files=[r["file_path"] for r in rows],
            prune=prune,
        ).filter(F.col(col) == F.lit(value))
        if columns is not None and col not in columns:
            df = df.select(*columns)
        return df

    def stats_agg(
        self,
        aggs: list[tuple[str, str, str]],
        snapshot_id: int | str | None = None,
        partition: dict | None = None,
    ) -> DataFrame:
        """Answer COUNT/MIN/MAX aggregates from manifest stats alone —
        zero data-file I/O (Iceberg's metadata-table trick; the
        reference stores the same per-column min/max in its file
        metadata, ``btrblocks/storage/MetaData.hpp``, but has no
        aggregate pushdown over it).

        ``aggs``: list of ``(fn, col, alias)`` with ``fn`` in
        ``{"count", "min", "max", "null_count"}``; ``col="*"`` with
        ``count`` is the table row count. Returns a one-row DataFrame.
        ``partition={col: value}`` scopes the fold to that partition's
        files EXACTLY (the manifest partition spec is per-file truth,
        unlike advisory stats pruning); keys must be declared partition
        columns — plain or derived ``_p_*``.

        The per-file stats are exact (computed over every value at
        encode time, not sampled), so the folded answers are exact —
        EXCEPT when the snapshot carries positional delete files
        (merge-on-read): shadowed rows still count in the file stats,
        so this method transparently falls back to a real scan then
        (correctness first; compaction absorbs the deletes and restores
        the metadata-only path). Files written before an
        ``add_column`` lack the stats key — their rows contribute as
        all-null; files written before a ``rename_column`` contribute
        through the recorded alias chain.
        """
        valid = {"count", "min", "max", "null_count", "approx_ndv"}
        for fn, col, _ in aggs:
            base = fn.split(":", 1)[0]
            if base == "approx_quantile":
                fn_parts = fn.split(":", 1)
                if len(fn_parts) != 2:
                    raise ValueError(
                        f"approx_quantile needs a ':q' suffix "
                        f"(e.g. 'approx_quantile:0.5'): {fn!r}"
                    )
                try:
                    q = float(fn_parts[1])
                except ValueError:
                    raise ValueError(f"bad quantile in {fn!r}") from None
                if not 0.0 <= q <= 1.0:
                    raise ValueError(f"quantile out of [0,1]: {fn!r}")
                if col not in self.ndv_cols():
                    raise ValueError(
                        f"approx_quantile needs a per-file histogram: "
                        f"column {col!r} is not in ndv_cols "
                        f"({self.ndv_cols()}); declare it at create()"
                    )
                continue
            if fn not in valid:
                raise ValueError(f"unsupported aggregate {fn!r}")
            if col == "*" and fn != "count":
                raise ValueError(f"{fn}(*) is not a thing")
            if fn == "approx_ndv" and col not in self.ndv_cols():
                raise ValueError(
                    f"approx_ndv needs a per-file KMV sketch: column "
                    f"{col!r} is not in ndv_cols "
                    f"({self.ndv_cols()}); declare it at create()"
                )
        sid = self._resolve_sid(snapshot_id)
        if partition:
            # exact partition scoping: keys must be declared partition
            # columns (plain or derived _p_*) — the manifest partition
            # spec records them per file EXACTLY, so the metadata fold
            # stays exact (unlike advisory stats pruning)
            bad = [k for k in partition if k not in self.partition_by()]
            if bad:
                raise KeyError(
                    f"not partition column(s): {bad} "
                    f"(declared: {self.partition_by()})"
                )
            if any(v is None for v in partition.values()):
                raise ValueError("partition scoping takes non-null values")
        need = sorted({c for _, c, _ in aggs if c != "*"})
        missing = [c for c in need if c not in self.schema_arrow().names]
        if missing:
            raise KeyError(f"no column(s) {missing}")
        if self.delete_files(sid) or self.eq_delete_files(sid):
            return self._stats_scan_fold(aggs, sid, partition, need)
        return self._stats_meta_fold(aggs, sid, partition, need)

    def _stats_scan_fold(
        self,
        aggs: list[tuple[str, str, str]],
        sid: int,
        partition: dict | None,
        need: list[str],
    ) -> DataFrame:
        """Real-scan fold for :meth:`stats_agg` — used when positional/
        equality deletes shadow rows, or when partition scoping touches
        files written before the current spec. Partition keys that are
        derived ``_p_*`` columns are RECOMPUTED from their source
        column (value-identical to the stored column for current-spec
        files by the three-impl parity invariant), so pre-spec files —
        which decode the dest as all-NULL — still filter exactly."""
        tmap = {
            t["dest"]: t
            for t in (self.metadata().get("partition_transforms") or [])
        }
        scan_cols = need or None
        if partition:
            srcs = {
                tmap[k]["col"] if k in tmap else k for k in partition
            }
            scan_cols = sorted(set(need or self.user_columns()) | srcs)
        df = self.scan(columns=scan_cols, snapshot_id=sid)
        for k, v in (partition or {}).items():
            t = tmap.get(k)
            expr = _transform_column(t, df) if t else F.col(k)
            df = df.filter(expr == F.lit(v))
        exprs = []
        for fn, col, alias in aggs:
            if fn == "count" and col == "*":
                exprs.append(F.count(F.lit(1)).alias(alias))
            elif fn == "count":
                exprs.append(F.count(F.col(col)).alias(alias))
            elif fn == "null_count":
                exprs.append(
                    F.sum(
                        F.col(col).isNull().cast("long")
                    ).alias(alias)
                )
            elif fn == "approx_ndv":
                # fallback gives the EXACT distinct count — a legal
                # answer for an approximate aggregate
                exprs.append(F.countDistinct(F.col(col)).alias(alias))
            elif fn.startswith("approx_quantile:"):
                qv = float(fn.split(":", 1)[1])
                exprs.append(
                    F.expr(f"percentile({col}, {qv})")
                    .cast("double")
                    .alias(alias)
                )
            else:
                exprs.append(getattr(F, fn)(F.col(col)).alias(alias))
        return df.agg(*exprs)

    def _stats_meta_fold(
        self,
        aggs: list[tuple[str, str, str]],
        sid: int,
        partition: dict | None,
        need: list[str],
    ) -> DataFrame:
        # metadata-only path: ONE Spark aggregation over the manifest
        # rows (tiny driver DataFrame below DISTRIBUTED_META_MIN files,
        # the distributed manifest DataFrame above it — stats of 10^6+
        # files never loop through the driver)
        entries = self._manifest_list(sid)
        n_files = sum(e["file_count"] or 0 for e in entries)
        if n_files >= self.DISTRIBUTED_META_MIN:
            mdf = self.manifest_df(sid)
        else:
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            rows = self.data_files(sid)
            if partition:
                import json as _json

                # pre-spec detection stays driver-side here: the rows
                # are already in memory, no Spark job needed
                for r in rows:
                    pj = _json.loads(r.get("partition") or "{}")
                    if any(pj.get(k) is None for k in partition):
                        return self._stats_scan_fold(
                            aggs, sid, partition, need
                        )
            mdf = self.spark.createDataFrame(
                [
                    (
                        r["file_path"],
                        r["row_count"],
                        r["stats"],
                        r.get("partition") or "{}",
                        0,
                    )
                    for r in rows
                ],
                StructType(
                    [
                        StructField("file_path", StringType()),
                        StructField("row_count", LongType()),
                        StructField("stats", StringType()),
                        StructField("partition", StringType()),
                        StructField("content", LongType()),
                    ]
                ),
            )
        mdf = mdf.filter(F.coalesce(F.col("content"), F.lit(0)) == 0)
        if partition and n_files >= self.DISTRIBUTED_META_MIN:
            # files written BEFORE the current spec (e.g. before
            # evolve_partition_spec) carry a partition JSON without the
            # key — get_json_object extracts NULL there, and an
            # equality filter would silently DROP those files from the
            # documented-exact fold. Detect them and route the whole
            # call through the scan fold, which recomputes the
            # transform from the source column per row and so answers
            # exactly for every file regardless of its write-time spec.
            # (The driver-local path above did this check in Python.)
            pre_spec = F.lit(False)
            for k in partition:
                pre_spec = pre_spec | F.get_json_object(
                    F.col("partition"), f"$.{k}"
                ).isNull()
            if mdf.filter(pre_spec).limit(1).count() > 0:
                return self._stats_scan_fold(aggs, sid, partition, need)
        for k, v in (partition or {}).items():
            # JSON scalars stringify the same way python str() does for
            # the int/string/date types partition columns allow
            mdf = mdf.filter(
                F.get_json_object(F.col("partition"), f"$.{k}")
                == F.lit(str(v))
            )
        renames = self.metadata().get("renames", {})
        spark_schema = self._spark_schema_for(need) if need else None

        def stat(col: str, key: str):
            # fold through the rename chain: first present JSON entry
            names = [col] + list(renames.get(col, []))
            return F.coalesce(
                *[
                    F.get_json_object(
                        F.col("stats"), f"$.{n}.{key}"
                    )
                    for n in names
                ]
            )

        def nulls_of(col: str):
            # a file with no stats entry predates add_column: all rows
            # null there
            return F.coalesce(
                stat(col, "null_count").cast("long"), F.col("row_count")
            )

        # approx_quantile must never average an arbitrary SUBSET of
        # files: every data file needs a histogram for the column (older
        # files written before the column joined ndv_cols, or a
        # non-numeric column, lack one) — error out rather than return a
        # silently skewed quantile; a compact() rewrite backfills hists
        # (files whose column holds no non-null rows legitimately lack a
        # histogram — blockfile only writes one when null_count < n —
        # and contribute zero weight, so they are exempt)
        for fn, col, _ in aggs:
            if fn.startswith("approx_quantile:"):
                n_missing = mdf.filter(
                    stat(col, "hist").isNull()
                    & (nulls_of(col) < F.col("row_count"))
                ).count()
                if n_missing:
                    raise ValueError(
                        f"approx_quantile({col!r}): {n_missing} data "
                        "file(s) carry no histogram (written before the "
                        "column was in ndv_cols, or non-numeric) — "
                        "compact() to backfill, or scan+percentile"
                    )
        zero = F.lit(0).cast("long")
        exprs = []
        ndv_frames: list[DataFrame] = []
        for fn, col, alias in aggs:
            if fn == "count" and col == "*":
                exprs.append(
                    F.coalesce(F.sum("row_count"), zero).alias(alias)
                )
            elif fn == "count":
                exprs.append(
                    F.coalesce(
                        F.sum(F.col("row_count") - nulls_of(col)), zero
                    ).alias(alias)
                )
            elif fn == "null_count":
                exprs.append(
                    F.coalesce(F.sum(nulls_of(col)), zero).alias(alias)
                )
            elif fn == "approx_ndv":
                ndv_frames.append(self._ndv_frame(mdf, stat, col, alias))
            elif fn.startswith("approx_quantile:"):
                ndv_frames.append(
                    self._quantile_frame(
                        mdf,
                        stat,
                        nulls_of,
                        col,
                        float(fn.split(":", 1)[1]),
                        alias,
                    )
                )
            else:
                dt = spark_schema[col].dataType
                exprs.append(
                    getattr(F, fn)(
                        stat(col, fn).cast(dt)
                    ).alias(alias)
                )
        if not exprs and ndv_frames:
            out = ndv_frames[0]
            rest = ndv_frames[1:]
        else:
            out = mdf.agg(*exprs)
            rest = ndv_frames
        for nf in rest:
            out = out.crossJoin(nf)  # one-row frames: no fan-out
        # restore the requested column order (crossJoin appends)
        return out.select(*[a for _, _, a in aggs])

    @staticmethod
    def _quantile_frame(
        mdf: DataFrame, stat, nulls_of, col: str, q: float, alias: str
    ) -> DataFrame:
        """One-row DataFrame: approximate quantile from the per-file
        equi-depth histograms (32 buckets of cnt/32 rows each, exact
        within-file boundaries). Error is bounded by the within-file
        bucket mass. Scale shape: one row per file explodes into 32
        weighted boundaries; the cumulative sum runs range-partitioned
        (per-range partials + tiny offset window), never a single-task
        global window — the same trick as _ordered_dense_ids."""
        from pyspark.sql import Window

        h = F.from_json(stat(col, "hist"), "array<double>")
        cnt = (F.col("row_count") - nulls_of(col)).cast("double")
        rows = (
            mdf.filter(stat(col, "hist").isNotNull())
            .select(
                F.explode(F.slice(h, 2, 32)).alias("_ub"),
                (cnt / F.lit(32.0)).alias("_w"),
            )
        )
        parts = rows.repartitionByRange(64, F.col("_ub")).withColumn(
            "_pid", F.spark_partition_id()
        )
        sums = parts.groupBy("_pid").agg(F.sum("_w").alias("_s"))
        wo = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = sums.withColumn(
            "_off", F.coalesce(F.sum("_s").over(wo), F.lit(0.0))
        )
        total = sums.agg(F.sum("_s").alias("_tot"))
        wl = (
            Window.partitionBy("_pid")
            .orderBy("_ub")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            parts.withColumn("_c", F.sum("_w").over(wl))
            .join(F.broadcast(offs.select("_pid", "_off")), "_pid")
            .crossJoin(F.broadcast(total))
            .withColumn("_cum", F.col("_c") + F.col("_off"))
        )
        return cum.filter(
            F.col("_cum") >= F.lit(q) * F.col("_tot")
        ).agg(F.min("_ub").alias(alias))

    @staticmethod
    def _ndv_frame(mdf: DataFrame, stat, col: str, alias: str) -> DataFrame:
        """One-row DataFrame: approx COUNT(DISTINCT col) by merging the
        per-file KMV sketches (union of the 63-bit hash sets, re-take
        the bottom k, (k-1)/U_(k) estimator — Bar-Yossef et al. 2002).
        Fully distributed: one row per FILE explodes into <= k hashes;
        at 10^6 files that is a ~2.6*10^8-row distinct + top-k, never a
        data scan."""
        import base64 as _b64

        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf

        from btrblocks_spark.codec.bloom import KMV_DOMAIN, KMV_K

        @pandas_udf("array<long>")
        def _decode(b64s):
            import base64

            import numpy as np

            return b64s.map(
                lambda s: np.frombuffer(
                    base64.b64decode(s), "<i8"
                ).tolist()
            )

        b = stat(col, "kmv.b64")
        hashes = (
            mdf.filter(b.isNotNull())
            .select(F.explode(_decode(b)).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )
        k = F.lit(KMV_K)
        return hashes.agg(
            F.count("h").alias("_c"), F.max("h").alias("_kth")
        ).select(
            F.when(F.col("_c") < k, F.col("_c"))
            .otherwise(
                F.floor(
                    (k - 1)
                    * F.lit(KMV_DOMAIN)
                    / F.greatest(F.col("_kth"), F.lit(1)).cast("double")
                )
            )
            .cast("long")
            .alias(alias)
        )

    # ------------------------------------------------------------ changelog
    def scan_changes(
        self,
        from_snapshot_id: int | str,
        to_snapshot_id: int | str | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Incremental (snapshot-diff) changelog between two snapshots —
        the CDC primitive every downstream training-data pipeline needs
        so an appended table is not rescanned end-to-end.

        Returns the table columns plus ``_change_type`` ('insert' |
        'delete') and ``_change_snapshot_id``. Events are emitted per
        commit in the window ``(from, to]``:

        - ``append`` / ``stream-append``: the commit's added manifest
          rows are net-new — their files scan as inserts.
        - ``merge`` (merge-on-read): added data files are inserts
          (updates appear as delete of the old image + insert of the
          new — standard CDC delta form); added positional delete files
          identify the removed rows, whose old images are reconstructed
          by scanning the referenced (immutable) data files at exactly
          those positions.
        - ``compact`` / ``cluster`` / ``rewrite-manifests`` and the
          metadata-only schema evolutions (``add-column`` /
          ``rename-column`` / ``drop-column``): no row-level change —
          contribute nothing (changelog rows use the CURRENT schema).
        - merge-on-read ``delete`` / ``update`` (rowops): added data
          files are inserts, added positional delete files yield the
          removed rows' old images — same form as MOR merge.
        - copy-on-write ``merge``/``delete``/``update``, ``backfill``,
          ``rollback``: not representable as a file-level diff —
          NotImplementedError (run MOR variants when a changelog
          consumer is downstream).

        Fast path: each commit's added rows live in its own
        ``manifest-<sid>-a`` manifest. When manifest bin-packing merged
        that file away, the commit's additions are recovered by a
        set-diff of the two adjacent snapshots' file lists.
        """
        to_sid = self._resolve_sid(to_snapshot_id)
        from_snapshot_id = self._resolve_sid(from_snapshot_id)
        if from_snapshot_id > to_sid:
            raise ValueError("from_snapshot_id must be <= to_snapshot_id")
        known = {s["snapshot_id"]: s for s in self.snapshots()}
        for sid in (from_snapshot_id, to_sid):
            if sid not in known:
                raise KeyError(
                    f"snapshot {sid} not in table history (expired?)"
                )
        window = [
            known[s]
            for s in sorted(known)
            if from_snapshot_id < s <= to_sid
            # unpublished WAP stages and unadopted branch commits are
            # not part of the published history — they enter the
            # changelog via publish() / fast_forward()
            and not known[s].get("staged")
            and not known[s].get("branch")
        ]
        arrow_schema = self.schema_arrow()
        want = list(
            columns
            or [c for c in arrow_schema.names if not c.startswith("_p_")]
        )
        out_parts: list[DataFrame] = []

        def added_rows_of(snap: dict) -> list[dict]:
            sid = snap["snapshot_id"]
            fast = f"manifest-{sid}-a.parquet"
            names = {e["name"] for e in self._manifest_list(sid)}
            if fast in names:
                return self._read_manifest(fast)
            # merged away: recover via file-list set diff vs the parent
            prev = snap["parent"]
            prev_paths = {
                r["file_path"] for r in self._manifest_rows(prev)
            }
            return [
                r
                for r in self._manifest_rows(sid)
                if r["file_path"] not in prev_paths
            ]

        for snap in window:
            op = snap["operation"]
            sid = snap["snapshot_id"]
            if op in ("compact", "cluster", "rewrite-manifests",
                      "create-empty", "add-column", "rename-column",
                      "drop-column", "widen-column"):
                # physical rewrites and metadata-only schema evolution:
                # no row-level change events (changelog rows always use
                # the CURRENT schema)
                continue
            if (
                op in ("merge", "delete", "update")
                and snap["summary"].get("strategy") != "mor"
            ):
                raise NotImplementedError(
                    f"snapshot {sid}: copy-on-write {op} is not "
                    "file-diffable; use strategy='mor' for changelog "
                    "consumers"
                )
            if op not in ("append", "stream-append", "merge",
                          "upsert_eq", "delete", "update"):
                raise NotImplementedError(
                    f"snapshot {sid}: operation {op!r} has no "
                    "changelog representation"
                )
            added = added_rows_of(snap)
            if op == "upsert_eq":
                out_parts.extend(
                    self._upsert_changelog_parts(snap, added, want)
                )
                continue
            data_paths = [
                r["file_path"]
                for r in added
                if (r.get("content") or 0) == 0
            ]
            del_paths = [
                r["file_path"]
                for r in added
                if (r.get("content") or 0) == 1
            ]
            if data_paths:
                ins = self.scan(
                    columns=want,
                    snapshot_id=sid,
                    files=data_paths,
                    apply_deletes=False,
                )
                out_parts.append(
                    ins.withColumn("_change_type", F.lit("insert"))
                    .withColumn("_change_snapshot_id", F.lit(sid))
                )
            if del_paths:
                # old images of the removed rows: scan the referenced
                # immutable files at exactly the deleted positions
                del_rows = self._delete_rows_df(del_paths)
                targets = sorted(
                    r.file_path
                    for r in del_rows.select("file_path")
                    .distinct()
                    .collect()
                )
                old = self.scan(
                    columns=want,
                    snapshot_id=snap["parent"],
                    files=targets,
                    with_file=True,
                    with_pos=True,
                    apply_deletes=False,
                )
                removed = (
                    old.join(
                        del_rows,
                        (old._file == del_rows.file_path)
                        & (old._pos == del_rows.pos),
                        "leftsemi",
                    )
                    .drop("_file", "_pos")
                )
                out_parts.append(
                    removed.withColumn("_change_type", F.lit("delete"))
                    .withColumn("_change_snapshot_id", F.lit(sid))
                )
        if not out_parts:
            schema = self._spark_schema_for(want)
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            return self.spark.createDataFrame(
                [],
                StructType(
                    schema.fields
                    + [
                        StructField("_change_type", StringType()),
                        StructField("_change_snapshot_id", LongType()),
                    ]
                ),
            )
        out = out_parts[0]
        for p in out_parts[1:]:
            out = out.unionByName(p)
        return out

    def _upsert_changelog_parts(
        self, snap: dict, added: list[dict], want: list[str]
    ) -> list[DataFrame]:
        """Changelog rows of an ``upsert_eq`` commit: its added data
        files scan as inserts; the old images of overwritten keys are
        the PARENT snapshot's rows semijoined with the commit's
        equality-delete key files (stats-range-pruned scan, one
        broadcastable join — never a full-history diff)."""
        sid = snap["snapshot_id"]
        parts: list[DataFrame] = []
        data_paths = [
            r["file_path"]
            for r in added
            if (r.get("content") or 0) == 0
        ]
        eq_rows = [
            r for r in added if (r.get("content") or 0) == 2
        ]
        if data_paths:
            ins = self.scan(
                columns=want,
                snapshot_id=sid,
                files=data_paths,
                apply_deletes=False,
            )
            parts.append(
                ins.withColumn("_change_type", F.lit("insert"))
                .withColumn("_change_snapshot_id", F.lit(sid))
            )
        if eq_rows:
            key_cols = sorted(
                {c for r in eq_rows for c in json.loads(r["stats"] or "{}")}
            )
            # range prune for the parent scan from the delete files'
            # own stats (advisory — the semijoin is the real filter).
            # A column whose delete set contains NULL keys gets NO
            # bound: the NULL old image may live in a file whose
            # non-null min/max sit outside the range (null=null
            # equality-delete semantics, blockfile.eq_delete_mask)
            prune: dict = {}
            for c in key_cols:
                bounds = [
                    json.loads(r["stats"])[c]
                    for r in eq_rows
                    if c in json.loads(r["stats"] or "{}")
                ]
                if any(b.get("null_count") for b in bounds):
                    continue
                los = [b["min"] for b in bounds if b.get("min") is not None]
                his = [b["max"] for b in bounds if b.get("max") is not None]
                if los and his:
                    prune[c] = (min(los), max(his))
            keys_df = self._delete_rows_df(
                [r["file_path"] for r in eq_rows]
            )
            scan_cols = list(
                dict.fromkeys(want + key_cols)
            )  # want order first, keys appended if missing
            old = self.scan(
                columns=scan_cols,
                snapshot_id=snap["parent"],
                prune=prune or None,
            )
            # null-safe semijoin: NULL-keyed old images are real deletes
            o, kd = old.alias("_o"), keys_df.alias("_k")
            sem = F.lit(True)
            for c in key_cols:
                sem = sem & F.col(f"_o.{c}").eqNullSafe(F.col(f"_k.{c}"))
            removed = o.join(
                F.broadcast(kd), on=sem, how="leftsemi"
            ).select(*want)
            parts.append(
                removed.withColumn("_change_type", F.lit("delete"))
                .withColumn("_change_snapshot_id", F.lit(sid))
            )
        return parts

    def _delete_rows_df(self, del_paths: list[str]) -> DataFrame:
        """(file_path, pos) rows of the given positional delete files."""
        if fs.is_local(del_paths[0]):
            return self.spark.read.parquet(*del_paths)
        tbl = pa.concat_tables([fs.read_parquet(p) for p in del_paths])
        return self.spark.createDataFrame(tbl.to_pandas())

    def partitions_df(self) -> DataFrame:
        """Per-partition summary (Iceberg ``table.partitions`` analog):
        file/row/byte counts and compression ratio per partition value,
        straight from the manifest DataFrame — zero data I/O."""
        df = self.manifest_df().filter(
            F.coalesce(F.col("content"), F.lit(0)) == 0
        )
        return (
            df.groupBy("partition")
            .agg(
                F.count("*").alias("file_count"),
                F.sum("row_count").alias("row_count"),
                F.sum("file_bytes").alias("file_bytes"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.round(
                    F.sum("raw_bytes") / F.greatest(F.sum("file_bytes"), F.lit(1)),
                    3,
                ).alias("ratio"),
            )
            .orderBy("partition")
        )

    def lineage_df(self) -> DataFrame:
        """Per-file lineage as a DataFrame (job ids + source files)."""
        df = self.manifest_df()
        return df.select(
            "file_path",
            "partition",
            "job_id",
            F.from_json("source_files", "array<string>").alias("source_files"),
            "row_count",
            "file_bytes",
            "raw_bytes",
            "sort_key",
        )

    def net_changes(
        self,
        from_snapshot_id: int | str,
        to_snapshot_id: int | str | None = None,
        keys: list[str] | str = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Net row-level changes per key over ``(from, to]`` — the
        Iceberg ``create_changelog_view(net_changes=true)`` analog on
        top of :meth:`scan_changes`.

        A key touched by several commits collapses to its LAST effect:
        ALL events of its highest ``_change_snapshot_id``, inserts
        winning over deletes within that snapshot (an update commit
        emits both; the inserts are the final state). Keys need NOT be
        unique — a key with several live rows keeps every sibling
        insert event of the winning snapshot, so applying the result to
        a downstream copy (delete all rows of keys whose events are
        ``_change_type='delete'``, replace the rows of the other keys
        with their insert events) reproduces applying the full
        changelog in order. A key inserted AND deleted inside the
        window nets to a delete event for a row the consumer never saw
        — a no-op on apply, kept because dropping it would need a
        pre-window existence probe.
        """
        if not keys:
            raise ValueError("net_changes needs the key column(s)")
        keys = [keys] if isinstance(keys, str) else list(keys)
        want = columns
        if want is not None:
            want = list(dict.fromkeys(list(want) + keys))
        ch = self.scan_changes(
            from_snapshot_id, to_snapshot_id, columns=want
        )
        # one shuffle: both windows share the key partitioning
        w = Window.partitionBy(*keys)
        is_ins = (F.col("_change_type") == "insert").cast("int")
        return (
            ch.withColumn(
                "_max_sid", F.max("_change_snapshot_id").over(w)
            )
            .filter(F.col("_change_snapshot_id") == F.col("_max_sid"))
            .withColumn("_has_ins", F.max(is_ins).over(w))
            .filter(
                (F.col("_change_type") == "insert")
                | (F.col("_has_ins") == 0)
            )
            .drop("_max_sid", "_has_ins")
        )

    def snapshots_df(self) -> DataFrame:
        """The snapshot log as a DataFrame (Iceberg ``table.snapshots``
        metadata-table analog): one row per snapshot with its summary as
        a string map. Metadata only — the list is bounded by snapshot
        retention, never by table size."""
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            MapType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType([
            StructField("snapshot_id", LongType()),
            StructField("parent_id", LongType()),
            StructField("committed_at", DoubleType()),
            StructField("operation", StringType()),
            StructField("manifest_count", LongType()),
            StructField("summary", MapType(StringType(), StringType())),
        ])
        rows = [
            (
                int(s["snapshot_id"]),
                int(s["parent"]) if s.get("parent") is not None else None,
                float(s.get("ts") or 0.0),
                s.get("operation"),
                len(s.get("manifests") or ([1] if s.get("manifest") else [])),
                {k: str(v) for k, v in (s.get("summary") or {}).items()},
            )
            for s in self.snapshots()
        ]
        return self.spark.createDataFrame(rows, schema)

    def history_df(self) -> DataFrame:
        """Iceberg ``table.history`` analog: the snapshot log annotated
        with ``is_current_ancestor`` — whether each snapshot is on the
        parent chain of the current head. Staged write-audit-publish
        snapshots that were never published are not (a rollback here
        commits a NEW snapshot, so unlike Iceberg's ref rewind it keeps
        the abandoned lineage on the chain)."""
        ancestors: set[int] = set()
        by_id = {s["snapshot_id"]: s for s in self.snapshots()}
        cur = self.current_snapshot_id()
        while cur is not None and cur in by_id:
            ancestors.add(cur)
            cur = by_id[cur].get("parent")
        df = self.snapshots_df()
        return df.select(
            "committed_at",
            "snapshot_id",
            "parent_id",
            "operation",
            F.col("snapshot_id")
            .isin(sorted(ancestors))
            .alias("is_current_ancestor"),
        )


def _prune_predicate(prune: dict):
    """Catalyst twin of :func:`_file_may_match`: a Column predicate over
    manifest rows. Missing/uncastable stats keep the file (pruning is an
    optimization, never a correctness filter).

    Each prune value is either a ``(lo, hi)`` range or a list/set of
    discrete values (``in``-set form): the file survives iff ANY value
    falls inside its [min, max] — probing cells {0, 15} of 16 must not
    read the 14 files in between."""
    pred = F.lit(True)
    for col, bound in prune.items():
        if isinstance(bound, dict):
            # token-bloom form: probing a bloom needs Python — the
            # big-table Catalyst plan keeps every file (advisory;
            # the driver loop and the row filter stay correct)
            continue
        smin = F.get_json_object(F.col("stats"), f"$.{col}.min")
        smax = F.get_json_object(F.col("stats"), f"$.{col}.max")
        if isinstance(bound, (list, set, frozenset)):
            vals = sorted(set(bound))
            numeric = any(isinstance(v, (int, float)) for v in vals)
            if numeric:
                smin, smax = smin.cast("double"), smax.cast("double")
            keep = F.lit(False)
            for v in vals:
                keep = keep | ((smin <= F.lit(v)) & (smax >= F.lit(v)))
        else:
            lo, hi = bound
            numeric = isinstance(lo, (int, float)) or isinstance(
                hi, (int, float)
            )
            if numeric:
                smin, smax = smin.cast("double"), smax.cast("double")
            keep = F.lit(True)
            if lo is not None:
                keep = keep & (smax >= F.lit(lo))
            if hi is not None:
                keep = keep & (smin <= F.lit(hi))
        cannot_prune = smin.isNull() | smax.isNull()
        pred = pred & (cannot_prune | keep)
    return pred


def _file_may_match(row: dict, prune: dict) -> bool:
    from btrblocks_spark.sources.pruning import stats_may_match

    return stats_may_match(json.loads(row["stats"]), prune)
