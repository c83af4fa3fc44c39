"""MERGE INTO — join-based upsert/delete, copy-on-write or merge-on-read.

Semantics (Iceberg MERGE):

    MERGE INTO target USING source ON target.<key> = source.<key>
    WHEN MATCHED THEN UPDATE SET * | DELETE
    WHEN NOT MATCHED THEN INSERT *

Shared discovery (all declarative DataFrame ops — Catalyst handles join
strategy, and the source side is broadcast when small):

1. *Prune*: manifest min/max stats on the key column cut the candidate
   file set before any data I/O; when the table carries per-file key
   blooms (``create(bloom_cols=...)``), files whose bloom rejects every
   source key are dropped without being opened.
2. *Touch discovery*: a column-pruned scan of candidates (key + _file
   only — parquet skips every other blob column, and per-block zone
   maps skip non-matching blocks) semi-joined to source keys. At 10^12
   rows this is the critical step: only key blobs of bloom-surviving
   candidate files are ever read.

Then one of two write strategies:

- *copy-on-write* (``staged``/``shuffle``): full scan of only the
  touched files; matched rows replaced, inserts appended; new files
  replace exactly the touched files. Best read performance, but
  rewritten bytes scale with the files the change touches.
- *merge-on-read* (``mor``, Iceberg v2): matched (file, position) pairs
  are written to sorted positional delete files and replacement/insert
  rows are appended; NOTHING is rewritten, so written bytes scale with
  the change set. Scans merge the deletes per task; compaction absorbs
  them back into pure data files.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from btrblocks_spark.sources.table import BtrTable


def _row_bytes_expr(df: DataFrame):
    """Column expression for the approximate in-memory Arrow size of one
    row (octet_length for variable-width columns, fixed widths for the
    rest; nested types recurse so an array<string>- or struct-heavy
    source cannot slip under the staged-merge cap by 10x)."""
    from pyspark.sql import types as T

    def field_bytes(c, dt):
        if isinstance(dt, (T.StringType, T.BinaryType)):
            return F.coalesce(F.octet_length(c), F.lit(0)).cast("long") + 16
        if isinstance(dt, T.ArrayType):
            el = dt.elementType
            if isinstance(el, (T.StringType, T.BinaryType)):
                per = F.aggregate(
                    c,
                    F.lit(0).cast("long"),
                    lambda acc, x: acc
                    + F.coalesce(F.octet_length(x), F.lit(0)).cast("long")
                    + 16,
                )
                return F.coalesce(per, F.lit(0)) + 16
            if isinstance(el, (T.ArrayType, T.StructType, T.MapType)):
                # nested-nested: conservative 64 B/element floor
                return (
                    F.coalesce(F.size(c), F.lit(0)).cast("long") * 64 + 16
                )
            return F.coalesce(F.size(c), F.lit(0)).cast("long") * 8 + 16
        if isinstance(dt, T.StructType):
            total = F.lit(16).cast("long")
            for sf in dt.fields:
                total = total + field_bytes(c.getField(sf.name), sf.dataType)
            return total
        if isinstance(dt, T.MapType):
            # values are opaque here; assume string-ish 32 B/entry
            return F.coalesce(F.size(c), F.lit(0)).cast("long") * 32 + 16
        return F.lit(8).cast("long")

    total = F.lit(0).cast("long")
    for f in df.schema.fields:
        total = total + field_bytes(F.col(f.name), f.dataType)
    return total


def _estimate_df_bytes(df: DataFrame) -> int:
    """Approximate in-memory Arrow size of a DataFrame via one JVM-side
    aggregation — no rows cross to Python."""
    row = df.agg(F.sum(_row_bytes_expr(df)).alias("b")).collect()[0]
    return int(row.b or 0)


def _norm(path: str) -> str:
    return path.removeprefix("file://").removeprefix("file:")


def _candidate_files(
    table: BtrTable,
    source: DataFrame,
    keys: list[str],
    prune: dict,
    source_bytes: int | None,
    max_collect_mb: int,
    timings: dict,
) -> tuple[list[str] | None, int]:
    """(candidate file paths, bloom_skipped) for the MERGE keyscan.

    Manifest min/max range prune first; then, when the table carries
    per-file key blooms on any key column (``create(bloom_cols=...)``)
    and the source is small enough to collect its keys, every range-
    surviving file's bloom is probed with the full source key set —
    files whose bloom rejects ALL keys are dropped WITHOUT being opened
    (their key blobs are never read). With composite keys, a file
    survives only if EVERY bloomed key column may contain at least one
    of the source's values for that column (a tuple can only match
    where each of its components might). Returns (None, 0) when blooms
    don't apply (scan falls back to prune-only discovery)."""
    import json as _json
    import time as _time

    from btrblocks_spark.sources.table import _file_may_match

    bloomed = [c for c in keys if c in table.bloom_cols()]
    if not bloomed:
        return None, 0
    if source_bytes is not None and source_bytes > max_collect_mb * 2**20:
        return None, 0  # keys too big to collect; range prune only
    t0 = _time.time()
    import numpy as np

    key_vals: dict[str, np.ndarray] = {}
    for c in bloomed:
        vals = source.select(c).distinct().toPandas()[c].to_numpy()
        if vals.dtype.kind in "iu":
            key_vals[c] = vals.astype(np.int64)
        elif vals.dtype.kind == "O" and all(
            isinstance(k, (str, bytes)) for k in vals[:8]
        ):
            key_vals[c] = vals.astype(object)
    if not key_vals:
        return None, 0
    from btrblocks_spark.codec.bloom import bloom_may_contain_any

    cand, skipped = [], 0
    for r in table.data_files():
        if not _file_may_match(r, prune):
            continue
        stats = _json.loads(r["stats"])
        rejected = False
        for c, vals in key_vals.items():
            bl = stats.get(c, {}).get("bloom")
            if bl is not None and not bloom_may_contain_any(bl, vals):
                rejected = True
                break
        if rejected:
            skipped += 1
            continue
        cand.append(r["file_path"])
    timings["bloom_filter"] = _time.time() - t0
    return cand, skipped


_KEY_SEP = "\x1f"

# composite staged merges canonicalize key tuples as strings on BOTH the
# driver (python str() of collected Spark values) and the executors
# (arrow cast-to-string) — these agree only for these Spark types
_STAGED_MULTIKEY_TYPES = (
    "tinyint", "smallint", "int", "bigint", "string", "date",
)


def _canon_key(vals) -> str:
    """Canonical string for a composite merge-key tuple. Must agree with
    the executor's ``str()`` of its ``key_comp`` values — a single key
    stays its native type there (so plain ``str(v)`` here), a composite
    is an arrow length-prefixed cast-to-string join ("3:abc\\x1f2:xy",
    self-delimiting so a string value containing the separator can
    never alias a different tuple); cross-engine cast agreement is
    guaranteed by the ``_STAGED_MULTIKEY_TYPES`` restriction."""
    if len(vals) == 1:
        return str(vals[0])
    parts = [str(v) for v in vals]
    return _KEY_SEP.join(f"{len(sv)}:{sv}" for sv in parts)


def merge_into(
    table: BtrTable,
    source: DataFrame,
    on: str | list[str],
    when_matched: str = "update",  # "update" | "delete"
    when_not_matched: str = "insert",  # "insert" | "ignore"
    job_id: str | None = None,
    broadcast_source: bool | None = None,
    strategy: str = "staged",
    max_staged_source_mb: int = 256,
    extra_summary: dict | None = None,
) -> dict:
    """Execute MERGE INTO; returns job metrics.

    ``on`` may be a single column or a composite key list (Iceberg
    MERGE ``ON t.k1 = s.k1 AND t.k2 = s.k2``); all discovery joins,
    bloom probes and the owner-file map operate on the key tuple.
    NULL key components never match (SQL equality semantics) — a
    NULL-keyed source row is always an insert.

    ``strategy="staged"`` (default): touched files are rewritten entirely
    inside Python workers — each task reads its files via pyarrow, drops /
    replaces matched rows against a driver-collected Arrow copy of the
    source, re-encodes, writes. Row bytes never enter the JVM or a Spark
    shuffle (the declarative formulation measured 40x slower on binary
    rows). Falls back to ``"shuffle"`` automatically when the source
    exceeds ``max_staged_source_mb`` (a huge source no longer fits the
    broadcast-to-every-rewrite-task model).

    ``strategy="mor"`` (merge-on-read, Iceberg v2 semantics): instead of
    rewriting touched files, matched row positions are written to
    positional delete files and replacement/insert rows are appended —
    rewritten bytes scale with the CHANGE, not with the files the change
    touches (copy-on-write amplification: 5% of keys can touch ~all
    files). Scans merge the deletes; compaction absorbs them back into
    pure data files.
    """
    assert when_matched in ("update", "delete")
    assert when_not_matched in ("insert", "ignore")
    assert strategy in ("staged", "shuffle", "mor")
    if table.eq_delete_files():
        raise RuntimeError(
            "table carries equality delete files (upsert_eq); run "
            "compact() to absorb them before MERGE INTO (merge copies "
            "rows into new files, whose fresh sequence numbers would "
            "escape the pending deletes)"
        )
    job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"
    spark = table.spark
    cols = table.user_columns()
    keys = [on] if isinstance(on, str) else list(on)
    assert keys, "merge needs at least one key column"
    for k in keys:
        assert k in cols, f"merge key {k} not in table schema"
    if len(keys) > 1 and strategy == "staged" and when_matched == "update":
        # the staged owner map canonicalizes key tuples through string
        # casts on two engines — only types whose python str() and
        # arrow cast-to-string agree are safe; others take the pure-
        # Spark shuffle path (same semantics, no canonicalization).
        # The check runs on the TABLE schema (the owner map's driver
        # values come from the keyscan and the executor casts the
        # file's columns — both table-typed), and ALSO requires the
        # source's key types to match the table's (a bigint source key
        # against a double table column would canonicalize "5" vs
        # "5.0"). Delete-mode staged merges match purely arrow-side
        # (self-consistent casts) and need no restriction.
        tdts = {
            f.name: f.dataType.simpleString()
            for f in table._spark_schema_for(keys).fields
        }
        sdts = dict(source.select(*keys).dtypes)
        if any(
            tdts[k] not in _STAGED_MULTIKEY_TYPES or sdts[k] != tdts[k]
            for k in keys
        ):
            strategy = "shuffle"

    import time as _time

    timings: dict[str, float] = {}
    source = source.select(*cols)
    if broadcast_source is None:
        broadcast_source = True  # dims/updates are usually << target
    src = F.broadcast(source) if broadcast_source else source
    src_keys = source.select(*keys).distinct()
    if broadcast_source:
        src_keys = F.broadcast(src_keys)

    # 1. ONE source pass: per-key-column range (stats pruning) + byte-
    #    size estimate (the staged-path gate) in a single aggregation
    #    job. No rows cross to Python; a multi-GB source must never be
    #    materialized on the driver just to decide to fall back.
    t0 = _time.time()
    aggs = []
    for i, k in enumerate(keys):
        aggs += [F.min(k).alias(f"_lo_{i}"), F.max(k).alias(f"_hi_{i}")]
    aggs.append(F.sum(_row_bytes_expr(source)).alias("b"))
    srow = source.agg(*aggs).collect()[0]
    prune = {
        k: (srow[f"_lo_{i}"], srow[f"_hi_{i}"]) for i, k in enumerate(keys)
    }
    timings["source_stats"] = _time.time() - t0

    # 1b. per-file key blooms cut the candidate set below the range prune
    cand_paths, bloom_skipped = _candidate_files(
        table, source, keys, prune,
        int(srow.b or 0), max_staged_source_mb, timings,
    )

    # 2. touched files: key-only scan of candidates x source keys
    keyscan = table.scan(
        columns=keys, prune=prune, files=cand_paths, with_file=True
    )

    if strategy == "mor":
        return _merge_mor(
            table, source, keys, when_matched, when_not_matched, job_id,
            cand_paths, prune, broadcast_source, bloom_skipped, timings,
            extra_summary,
        )

    if strategy == "staged":
        cap = max_staged_source_mb * 1024 * 1024
        if int(srow.b or 0) <= cap:
            t0 = _time.time()
            src_tbl = source.toArrow()
            timings["source_collect"] = _time.time() - t0
            if src_tbl.nbytes <= cap:  # exact check on the bounded collect
                return _merge_staged(
                    table, src_tbl, keys, when_matched, when_not_matched,
                    job_id, keyscan, source, prune, timings,
                    bloom_skipped=bloom_skipped,
                    extra_summary=extra_summary,
                )
        # source too large for the staged broadcast model

    touched = [
        _norm(r._file)
        for r in keyscan.join(src_keys, on=keys, how="leftsemi")
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
            kept = target_rows.join(src_keys, on=keys, how="left_anti")
            replacement = src.join(
                F.broadcast(target_rows.select(*keys)) if broadcast_source
                else target_rows.select(*keys),
                on=keys,
                how="leftsemi",
            )
            rewritten = kept.unionByName(replacement)
        else:  # delete
            rewritten = target_rows.join(src_keys, on=keys, how="left_anti")
    else:
        rewritten = None

    inserts = None
    if when_not_matched == "insert":
        all_keys = table.scan(columns=keys, prune=prune)
        inserts = source.join(all_keys, on=keys, how="left_anti")

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
        extra_summary={
            "on": keys if len(keys) > 1 else keys[0],
            "when_matched": when_matched,
            **(extra_summary or {}),
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "touched_files": len(touched),
        "new_files": len(written),
        "bloom_skipped_files": bloom_skipped,
    }


# per-worker cache of the parsed broadcast source (reused python workers
# parse the Arrow stream once per job, not once per task)
_SRC_CACHE: dict = {}


def _merge_staged(
    table: BtrTable,
    src_tbl,
    keys: list[str],
    when_matched: str,
    when_not_matched: str,
    job_id: str,
    keyscan: DataFrame,
    source: DataFrame,
    prune: dict,
    timings: dict | None = None,
    bloom_skipped: int = 0,
    extra_summary: dict | None = None,
) -> dict:
    """File-staged copy-on-write MERGE: one task per touched-file bin."""
    import json as _json
    import time as _time

    import pyarrow as pa

    from btrblocks_spark.sources import fs

    timings = timings if timings is not None else {}
    spark = table.spark
    cols = table.schema_arrow().names
    parts = table.partition_by()
    schema_hex = table.schema_arrow().serialize().hex().decode()
    aliases = table.metadata().get("renames", {})
    # replacement rows splice into FULL-schema decoded files, so the
    # source Arrow table needs the hidden-partitioning columns too
    from btrblocks_spark.sources.table import _transform_arrow

    all_tfs = table.all_partition_transforms()
    for tf in all_tfs:
        # EVERY spec's dest that lives in the table schema (replacement
        # rows splice into old-spec files too — a null dest mixed with
        # stored values would poison the rewritten file's stats)
        if tf["dest"] in cols and tf["dest"] not in src_tbl.schema.names:
            src_tbl = src_tbl.append_column(
                tf["dest"], _transform_arrow(tf, src_tbl)
            )
    src_tbl = src_tbl.select(cols).combine_chunks()

    # ONE key-only pass, aggregated IN SPARK: the touched-file set plus
    # the owner file per matched key (a key may appear in several
    # files; exactly one rewrite emits the replacement row — min(_file)
    # is the deterministic owner). Only O(matched keys) + O(touched
    # files) rows ever reach the driver — never the (key, file) pair
    # multiset, which a hot key appearing in many files multiplies.
    # keyscan is cached — the owner agg, the touched-file distinct and
    # the insert anti-join all reuse it instead of rescanning.
    t0 = _time.time()
    keyscan = keyscan.cache()
    file_of = {r["file_path"]: r for r in table.data_files()}
    src_keys = F.broadcast(source.select(*keys).distinct())
    matched = keyscan.join(src_keys, on=keys, how="inner")
    owner_of_key: dict = {}
    if when_matched == "update":
        owner_rows = (
            matched.groupBy(*keys)
            .agg(F.min("_file").alias("_owner"))
            .collect()
        )
        owner_of_key = {
            _canon_key(tuple(r[k] for k in keys)): _norm(r._owner)
            for r in owner_rows
        }
    # the full touched set (owners plus files holding non-owner copies
    # of a matched key — all must be rewritten)
    touched = sorted(
        {
            _norm(r._file)
            for r in matched.select("_file").distinct().collect()
        }
    )
    timings["keyscan"] = _time.time() - t0

    src_blob = b""
    if len(src_tbl):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, src_tbl.schema) as w:
            w.write_table(src_tbl)
        src_blob = sink.getvalue().to_pybytes()
    owner_json = _json.dumps(owner_of_key)
    root = table.root
    blooms = table.bloom_cols()
    ndvs = table.ndv_cols()
    tbcs = table.token_bloom_cols()
    # positional delete files from earlier merge-on-read merges: the
    # direct file reads below must not resurrect deleted rows
    del_paths = [r["file_path"] for r in table.delete_files()]
    ckpt = fs.join(root, "_checkpoints", job_id)
    fs.mkdirs(ckpt)
    specs = [
        {
            "bin_id": i,
            "path": p,
            "partition": file_of[p]["partition"] if p in file_of else "{}",
        }
        for i, p in enumerate(sorted(touched))
    ]
    new_rows: list[dict] = []
    if specs:
        # a real broadcast: the source travels to each executor once, NOT
        # inside every task's pickled closure (72 MB in the closure
        # re-parsed per task measured 199 x ~0.4 s)
        bc = spark.sparkContext.broadcast((src_blob, owner_json))
        try:
            cores = spark.sparkContext.defaultParallelism
        except Exception:
            cores = 8
        spec_df = spark.createDataFrame(specs).repartition(
            max(1, min(len(specs), cores * 4))
        )

        def rewrite(batch_iter):
            import pyarrow.compute as pc

            import btrblocks_spark.operators.merge as _merge_mod
            from btrblocks_spark.sources import fs as _fs
            from btrblocks_spark.sources.blockfile import (
                decode_batches,
                encode_table,
            )
            from btrblocks_spark.sources.table import _write_blockfile_atomic

            logical = pa.ipc.read_schema(
                pa.py_buffer(bytes.fromhex(schema_hex))
            )
            def key_comp(t):
                # composite key: LENGTH-PREFIXED cast-to-string join
                # ("3:abc\x1f2:xy") — self-delimiting, so a string key
                # value containing the separator cannot alias another
                # tuple (single key stays its native type — no
                # canonicalization needed). A NULL component yields a
                # NULL composite, which never matches (SQL equality
                # semantics).
                if len(keys) == 1:
                    return t.column(keys[0]).combine_chunks()
                parts_ = []
                for c in keys:
                    sv = pc.cast(t.column(c).combine_chunks(), pa.string())
                    ln = pc.cast(pc.utf8_length(sv), pa.string())
                    parts_.append(
                        pc.binary_join_element_wise(ln, sv, ":")
                    )
                return pc.binary_join_element_wise(*parts_, _KEY_SEP)

            cached = _merge_mod._SRC_CACHE.get(job_id)
            if cached is None:
                blob, owners_js = bc.value
                src_parsed = (
                    pa.ipc.open_stream(blob).read_all() if blob else None
                )
                src_comp = (
                    key_comp(src_parsed) if src_parsed is not None else None
                )
                cached = (src_parsed, _json.loads(owners_js), src_comp)
                _merge_mod._SRC_CACHE.clear()  # one live job per worker
                _merge_mod._SRC_CACHE[job_id] = cached
            src_local, owners, src_comp = cached
            for batch in batch_iter:
                for row in batch.to_pylist():
                    bin_id = row["bin_id"]
                    marker = _fs.join(ckpt, f"rw-{bin_id}.json")
                    if _fs.exists(marker):
                        yield pa.RecordBatch.from_pydict(
                            {"rows": [_fs.read_bytes(marker).decode()]}
                        )
                        continue
                    path = row["path"]
                    bt = _fs.read_parquet(path)
                    dels = None
                    if del_paths:
                        from btrblocks_spark.sources.blockfile import (
                            load_delete_index,
                        )

                        dels = load_delete_index(del_paths, [path]).get(path)
                    tbl = pa.Table.from_batches(
                        list(
                            decode_batches(
                                bt.to_batches(),
                                logical,
                                deletes=dels,
                                aliases=aliases,
                            )
                        ),
                        schema=logical,  # robust to an all-deleted file
                    ).combine_chunks()
                    comp = key_comp(tbl)
                    # NULL-keyed target rows never match (fill_null
                    # keeps them in `kept`); NULL source keys never
                    # delete (drop_null from the probe set)
                    matched = pc.fill_null(
                        pc.is_in(comp, value_set=pc.drop_null(src_comp)),
                        False,
                    )
                    kept = tbl.filter(pc.invert(matched))
                    pieces = [kept]
                    if when_matched == "update":
                        hit_keys = set(comp.filter(matched).to_pylist())
                        owned = [
                            k
                            for k in hit_keys
                            if owners.get(str(k)) == path
                        ]
                        if owned:
                            repl = src_local.filter(
                                pc.is_in(
                                    src_comp,
                                    value_set=pa.array(
                                        owned, type=src_comp.type
                                    ),
                                )
                            )
                            # align column order AND nullability (lit()
                            # columns arrive non-nullable from Spark)
                            pieces.append(
                                repl.select(tbl.schema.names).cast(tbl.schema)
                            )
                    merged = pa.concat_tables(pieces).combine_chunks()
                    if all_tfs:
                        from btrblocks_spark.sources.table import (
                            recompute_partition_arrow,
                        )

                        merged = recompute_partition_arrow(merged, all_tfs)
                    out_rows = []
                    # replacement rows may carry a DIFFERENT partition
                    # value than the file they land in (an update can
                    # change a partition column) — split per value so the
                    # manifest stays truthful
                    from btrblocks_spark.sources.blockfile import (
                        split_by_partition,
                    )

                    old = file_of.get(path) or {}
                    for k_sub, (pjson, sub) in enumerate(
                        split_by_partition(merged, parts)
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
                        fname = f"{job_id}-rw{bin_id:05d}-{k_sub}.parquet"
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
                                "stats": _json.dumps(stats["columns"]),
                                "job_id": job_id,
                                "source_files": _json.dumps([path]),
                                "sort_key": old.get("sort_key", ""),
                            }
                        )
                    payload = _json.dumps(out_rows)
                    _fs.write_bytes_atomic(marker, payload.encode())
                    yield pa.RecordBatch.from_pydict({"rows": [payload]})

        t0 = _time.time()
        try:
            for r in spec_df.mapInArrow(rewrite, "rows string").collect():
                new_rows.extend(_json.loads(r.rows))
            timings["rewrite"] = _time.time() - t0
        finally:
            # free the driver+executor broadcast blocks — a long-lived
            # session running many merges must not accumulate them
            try:
                bc.destroy()
            except Exception:
                bc.unpersist()

    if when_not_matched == "insert":
        t0 = _time.time()
        inserts = source.join(
            keyscan.select(*keys), on=keys, how="left_anti"
        ).select(*table.user_columns())
        new_rows.extend(table._write_files(inserts, job_id=job_id))
        timings["inserts"] = _time.time() - t0
    keyscan.unpersist()

    t0 = _time.time()
    sid = table._commit(
        new_rows,
        operation="merge",
        replaced=set(touched),
        extra_summary={
            "on": keys if len(keys) > 1 else keys[0],
            "when_matched": when_matched,
            "strategy": "staged",
            **(extra_summary or {}),
        },
    )
    timings["commit"] = _time.time() - t0
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "touched_files": len(touched),
        "new_files": len(new_rows),
        "strategy": "staged",
        "bloom_skipped_files": bloom_skipped,
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }


def write_positional_deletes(
    table: BtrTable, del_rows: DataFrame, job_id: str
) -> list[dict]:
    """Write a ``(file_path string, pos long)`` DataFrame as Iceberg-v2
    positional delete files; returns their manifest rows (``content=1``).

    Rows are range-partitioned and sorted on (file_path, pos) with small
    row groups so a later scan task's row-group filter reads only its own
    files' positions. Shared by MERGE-on-read, DELETE WHERE and
    UPDATE WHERE."""
    import json as _json

    spark = table.spark
    root = table.root
    try:
        cores = spark.sparkContext.defaultParallelism
    except Exception:
        cores = 8
    n_tasks = max(1, cores * 2)
    sorted_dels = del_rows.repartitionByRange(
        n_tasks, "file_path", "pos"
    ).sortWithinPartitions("file_path", "pos")

    def write_deletes(batch_iter):
        import hashlib as _hl

        import pyarrow as _pa

        from btrblocks_spark.sources import fs as _fs

        batches = list(batch_iter)
        t = (
            _pa.Table.from_batches(batches)
            if batches
            else None
        )
        if t is None or t.num_rows == 0:
            return
        paths = t.column("file_path").to_pylist()
        # deterministic name from the partition's content bounds —
        # idempotent across task retries
        tag = _hl.sha256(
            f"{paths[0]}:{t.column('pos')[0].as_py()}:{paths[-1]}".encode()
        ).hexdigest()[:12]
        fpath = _fs.join(root, "data", f"{job_id}-del-{tag}.parquet")
        fbytes = _fs.write_parquet_atomic(
            t, fpath, compression="zstd", row_group_size=8192
        )
        row = {
            "file_path": fpath,
            "partition": "{}",
            "row_count": t.num_rows,
            "block_count": 0,
            "file_bytes": fbytes,
            "raw_bytes": t.num_rows * 16,
            "stats": "{}",
            "job_id": job_id,
            # referenced data files — compaction absorbs this delete
            # file once every referenced file has been rewritten
            "source_files": _json.dumps(sorted(set(paths))),
            "sort_key": "",
            "content": 1,
        }
        yield _pa.RecordBatch.from_pydict({"rows": [_json.dumps([row])]})

    delete_rows: list[dict] = []
    for r in sorted_dels.mapInArrow(write_deletes, "rows string").collect():
        delete_rows.extend(_json.loads(r.rows))
    return delete_rows


def _merge_mor(
    table: BtrTable,
    source: DataFrame,
    keys: list[str],
    when_matched: str,
    when_not_matched: str,
    job_id: str,
    cand_paths: list[str] | None,
    prune: dict,
    broadcast_source: bool,
    bloom_skipped: int,
    timings: dict,
    extra_summary: dict | None = None,
) -> dict:
    """Merge-on-read MERGE (Iceberg v2 positional deletes).

    1. *Keyscan with positions*: a key+``_file``+``_pos`` scan of the
       (range+bloom-pruned) candidate files — earlier delete files are
       merged by the scan, so already-deleted rows never rematch.
    2. *Delete write*: matched (file, pos) pairs, range-partitioned and
       sorted on (file_path, pos), one delete parquet per task with
       small row groups — a later scan task's row-group filter reads
       only its own files' positions.
    3. *Appends*: replacement rows (matched source rows, update mode)
       and inserts (anti-join) become normal new data files.
    4. *Commit*: delete rows + data rows added, NOTHING replaced —
       rewritten bytes scale with the change set, not with touched-file
       bytes (CoW rewrote 199 files for 5% of keys in the r3 bench).
    """
    import json as _json
    import time as _time

    spark = table.spark
    cols = table.user_columns()
    root = table.root

    t0 = _time.time()
    keyscan = table.scan(
        columns=keys,
        prune=prune,
        files=cand_paths,
        with_file=True,
        with_pos=True,
    ).cache()
    src_keys = source.select(*keys).distinct()
    if broadcast_source:
        src_keys = F.broadcast(src_keys)
    matched = keyscan.join(src_keys, on=keys, how="inner")
    # (file, pos) pairs are already unique: keyscan emits one row per
    # PHYSICAL row and src_keys is distinct — no dedup shuffle needed
    del_rows = matched.select(
        F.col("_file").alias("file_path"), F.col("_pos").alias("pos")
    )

    delete_rows = write_positional_deletes(table, del_rows, job_id)
    timings["delete_write"] = _time.time() - t0

    t0 = _time.time()
    pieces = []
    if when_matched == "update":
        matched_keys = matched.select(*keys).distinct()
        if broadcast_source:
            matched_keys = F.broadcast(matched_keys)
        pieces.append(source.join(matched_keys, on=keys, how="leftsemi"))
    if when_not_matched == "insert":
        pieces.append(
            source.join(keyscan.select(*keys), on=keys, how="left_anti")
        )
    data_rows: list[dict] = []
    if pieces:
        to_write = pieces[0]
        for p in pieces[1:]:
            to_write = to_write.unionByName(p)
        data_rows = table._write_files(to_write.select(*cols), job_id=job_id)
    timings["appends"] = _time.time() - t0
    keyscan.unpersist()

    touched = sorted(
        {
            p
            for r in delete_rows
            for p in _json.loads(r["source_files"])
        }
    )
    size_of = {r["file_path"]: r["file_bytes"] for r in table.data_files()}
    touched_bytes = sum(size_of.get(p, 0) for p in touched)
    t0 = _time.time()
    sid = table._commit(
        delete_rows + data_rows,
        operation="merge",
        replaced=None,
        extra_summary={
            "on": keys if len(keys) > 1 else keys[0],
            "when_matched": when_matched,
            "strategy": "mor",
            "delete_rows": sum(r["row_count"] for r in delete_rows),
            **(extra_summary or {}),
        },
    )
    timings["commit"] = _time.time() - t0
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "strategy": "mor",
        "touched_files": len(touched),
        "touched_bytes": touched_bytes,
        "delete_files": len(delete_rows),
        "delete_rows": sum(r["row_count"] for r in delete_rows),
        "delete_bytes": sum(r["file_bytes"] for r in delete_rows),
        "new_files": len(data_rows),
        "new_bytes": sum(r["file_bytes"] for r in data_rows),
        "bloom_skipped_files": bloom_skipped,
        "timings": {k: round(v, 3) for k, v in timings.items()},
    }


def rewrite_position_deletes(
    table: BtrTable, job_id: str | None = None, min_files: int = 2
) -> dict:
    """Minor compaction of positional delete files (Iceberg's
    rewrite_position_delete_files analog): every MERGE/DELETE/UPDATE
    adds small delete files, and scan tasks pay one parquet open per
    overlapping delete file — this job unions all content=1 rows,
    drops duplicates and rows referencing no live data file, and
    rewrites them as the minimal sorted set WITHOUT touching data.

    O(delete rows) — at 100 TB that is the change stream, never the
    table. Commit replaces the old delete files atomically.
    """
    import time as _time

    job_id = job_id or f"rewrite-dels-{uuid.uuid4().hex[:8]}"
    dels = table.delete_files()
    if len(dels) < min_files:
        return {
            "job_id": job_id,
            "noop": True,
            "delete_files": len(dels),
        }
    t0 = _time.time()
    spark = table.spark
    old_paths = [r["file_path"] for r in dels]
    # read through the engine's fs/pyarrow layer (never the JVM parquet
    # reader): scan() supports object-store roots without a Hadoop
    # connector, and this maintenance job must too
    try:
        cores = spark.sparkContext.defaultParallelism
    except Exception:
        cores = 8
    paths_df = spark.createDataFrame(
        [(p,) for p in old_paths], "p string"
    ).repartition(max(1, min(len(old_paths), cores * 2)))

    def _read_dels(batch_iter):
        from btrblocks_spark.sources import fs as _fs

        for batch in batch_iter:
            for p in batch.column("p").to_pylist():
                t = _fs.read_parquet(p, columns=["file_path", "pos"])
                yield from t.to_batches()

    rows = paths_df.mapInArrow(_read_dels, "file_path string, pos long")
    live = spark.createDataFrame(
        [(r["file_path"],) for r in table.data_files()], "file_path string"
    )
    rows = rows.join(F.broadcast(live), "file_path", "leftsemi").distinct()
    new_rows = write_positional_deletes(table, rows, job_id)
    sid = table._commit(
        new_rows,
        operation="rewrite-deletes",
        replaced=set(old_paths),
        extra_summary={
            "rewritten_delete_files": len(old_paths),
            "new_delete_files": len(new_rows),
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "delete_files_before": len(old_paths),
        "delete_files_after": len(new_rows),
        "delete_rows": sum(r["row_count"] for r in new_rows),
        "bytes_before": sum(r["file_bytes"] for r in dels),
        "bytes_after": sum(r["file_bytes"] for r in new_rows),
        "elapsed_sec": round(_time.time() - t0, 3),
    }
