"""Storage-partitioned join — join two co-partitioned BtrTables with
ZERO data shuffle.

Spark's own storage-partitioned join (SPARK-37375) needs a DataSource
V2 that reports its partitioning, which the Python DataSource API
cannot do — so the engine provides the same contract directly: when
both tables carry the SAME active transform over their join key
(``bucket(N)`` the common case; ``truncate(W)`` and ``days()`` work
identically — key equality implies equal transform value for any
deterministic transform), every pair of matching rows lives in the
same partition value on both sides, so the join runs
partition-by-partition inside ONE ``mapInArrow`` pass:

1. group each side's data files by their manifest ``partition`` bucket
   value (a metadata-only Spark job past ``DISTRIBUTED_META_MIN``
   files, a driver fold below it — never a data read);
2. build a tiny spec DataFrame with one row per bucket carrying both
   sides' file lists (the only exchange in the whole plan moves these
   N spec rows, never data);
3. each task decodes its buckets' files on both sides (positional
   deletes merged per file, exactly like ``scan``) and hash-joins them
   in Arrow.

At 10^12 rows this is the difference between a full two-sided shuffle
(the dominant cost of a fact-fact join) and a co-located join that
moves nothing: per-task memory is bounded by the bucket size chosen at
write time (rows / N per side), the shape Iceberg + SPJ ships for
exactly this reason.

Correctness boundary: files written BEFORE the bucket spec (partition
JSON lacks the key) have no bucket home — the join refuses and points
at ``compact()``, which migrates them (``recompute_partition_arrow``).
Equality-delete files are refused the same way (compaction absorbs
them); positional deletes are merged at decode time.
"""

from __future__ import annotations

import json as _json

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from btrblocks_spark.sources.table import BtrTable


def _bucket_transform(t: BtrTable, key: str) -> dict:
    """Active partition transform over ``key`` — ANY kind qualifies:
    key equality implies equal transform value for every deterministic
    transform (bucket/truncate/days), so co-located joins work on all
    of them (e.g. two days(ts)-partitioned event tables join
    day-by-day)."""
    for tr in t.metadata().get("partition_transforms") or []:
        if tr["col"] == key:
            return tr
    raise ValueError(
        f"table {t.root} has no active partition transform over "
        f"{key!r} — bucket_join needs both sides co-partitioned on the "
        "join key (create(partition_by=['bucket(N, key)']) or "
        "evolve_partition_spec + compact)"
    )


def _files_by_bucket(t: BtrTable, dest: str, sid: int) -> dict[str, list[str]]:
    """{partition value (JSON string form): [file paths]} from manifest
    metadata only — string keys cover every transform kind (bucket ints,
    truncate prefixes, days ordinals) since both sides stringify
    identically (_transform_literal parity)."""
    entries = t._manifest_list(sid)
    n_files = sum(e["file_count"] or 0 for e in entries)
    if n_files >= t.DISTRIBUTED_META_MIN:
        rows = (
            t.manifest_df(sid)
            .filter(F.coalesce(F.col("content"), F.lit(0)) == 0)
            .select(
                F.get_json_object(F.col("partition"), f"$.{dest}")
                .alias("b"),
                "file_path",
            )
            .groupBy("b")
            .agg(F.collect_list("file_path").alias("fps"))
            .collect()
        )
        pairs = [(r.b, list(r.fps)) for r in rows]
    else:
        acc: dict = {}
        for r in t.data_files(sid):
            b = _json.loads(r.get("partition") or "{}").get(dest)
            acc.setdefault(b, []).append(r["file_path"])
        pairs = list(acc.items())
    out: dict[str, list[str]] = {}
    for b, fps in pairs:
        if b is None:
            raise ValueError(
                f"{len(fps)} data file(s) in {t.root} predate the "
                f"partition spec ({dest!r} missing from their partition "
                "metadata) — run compact() to migrate them, then join"
            )
        out[str(b)] = sorted(fps)
    return out


def bucket_join(
    ta: BtrTable,
    tb: BtrTable,
    on: str | tuple[str, str],
    how: str = "inner",
    columns: list[str] | None = None,
    columns_b: list[str] | None = None,
    suffix: str = "_r",
    snapshot_id_a: int | str | None = None,
    snapshot_id_b: int | str | None = None,
    max_files_per_task: int = 64,
) -> DataFrame:
    """Shuffle-free equi-join of two tables bucketed on the join key.

    ``on``: the join key column name, or ``(key_a, key_b)`` when the
    two tables name it differently. ``columns`` / ``columns_b`` project
    each side (defaults: all user columns). B-side columns colliding
    with A-side output names come back suffixed. ``how``: ``"inner"``,
    ``"left"``, ``"leftsemi"``, or ``"leftanti"`` — the semi/anti modes
    are shuffle-free membership filtering (keep/drop A rows whose key
    exists in B), the decontaminate-against-a-reference-set shape at
    10^12 rows.
    """
    if how not in ("inner", "left", "leftsemi", "leftanti"):
        raise ValueError(
            f"how must be inner|left|leftsemi|leftanti, got {how!r}"
        )
    key_a, key_b = (on, on) if isinstance(on, str) else on
    tra = _bucket_transform(ta, key_a)
    trb = _bucket_transform(tb, key_b)
    if (tra["kind"], tra["param"]) != (trb["kind"], trb["param"]):
        raise ValueError(
            f"partition transforms differ: {key_a} has "
            f"{tra['kind']}({tra['param']}) vs {key_b} "
            f"{trb['kind']}({trb['param']}) — evolve one side and "
            "compact to co-partition them"
        )
    sid_a = ta._resolve_sid(snapshot_id_a)
    sid_b = tb._resolve_sid(snapshot_id_b)
    for t, sid, side in ((ta, sid_a, "left"), (tb, sid_b, "right")):
        if t.eq_delete_files(sid):
            raise NotImplementedError(
                f"{side} table carries equality-delete files — "
                "compact() absorbs them, then bucket_join"
            )

    want_a = list(columns or ta.user_columns())
    if key_a not in want_a:
        want_a = [key_a] + want_a
    want_b = [
        c
        for c in (columns_b or tb.user_columns())
        if c != key_b
    ]
    if how in ("leftsemi", "leftanti"):
        # membership filtering: B contributes only its key
        want_b = []
    out_b = [c + suffix if c in want_a else c for c in want_b]
    dupes = [
        c for c in set(out_b) if out_b.count(c) > 1 or c in want_a
    ]
    if dupes:
        raise ValueError(
            f"output column collision {sorted(dupes)}: a B-side column "
            f"clashes with another output name even after the "
            f"{suffix!r} suffix — project or rename it"
        )

    # join-key type parity: Arrow's hash join refuses mixed-width keys;
    # promote both integer keys to int64 in the kernel (the bucket
    # function already hashes the STRING form, so int32 5 and int64 5
    # land in the same bucket and must join)
    sa_, sb_ = ta.schema_arrow(), tb.schema_arrow()
    ka_t = sa_.field(sa_.get_field_index(key_a)).type
    kb_t = sb_.field(sb_.get_field_index(key_b)).type
    promote_keys = False
    if not ka_t.equals(kb_t):
        if pa.types.is_integer(ka_t) and pa.types.is_integer(kb_t):
            promote_keys = True
        else:
            raise TypeError(
                f"join key types differ: {key_a}: {ka_t} vs "
                f"{key_b}: {kb_t}"
            )

    fa = _files_by_bucket(ta, tra["dest"], sid_a)
    fb = _files_by_bucket(tb, trb["dest"], sid_b)
    dels_a = sorted(r["file_path"] for r in ta.delete_files(sid_a))
    dels_b = sorted(r["file_path"] for r in tb.delete_files(sid_b))
    if how in ("left", "leftanti"):
        # A rows with no B bucket still produce output
        buckets = sorted(set(fa) | set(fb))
    else:
        buckets = sorted(set(fa) & set(fb))

    spark = ta.spark
    # skew defense: a hot bucket (many A files) must not pin one task —
    # split its A-file list into chunks of max_files_per_task; every
    # chunk re-reads the bucket's (small) B side, so per-task memory
    # stays bounded by chunk size + one B bucket regardless of skew.
    # Each A row still appears in exactly ONE chunk, so inner AND left
    # results are unchanged.
    spec_rows = []
    for b in buckets:
        af, bf = fa.get(b, []), fb.get(b, [])
        for i in range(0, max(len(af), 1), max_files_per_task):
            spec_rows.append((b, af[i: i + max_files_per_task], bf))
    schema_a_hex = bytes(ta.schema_arrow().serialize()).hex()
    schema_b_hex = bytes(tb.schema_arrow().serialize()).hex()

    # output schema: A's projection + B's (suffixed) payload
    sa, sb = ta.schema_arrow(), tb.schema_arrow()
    fields = [sa.field(sa.get_field_index(c)) for c in want_a]
    for c, oc in zip(want_b, out_b):
        f_ = sb.field(sb.get_field_index(c))
        fields.append(pa.field(oc, f_.type, True))
    out_arrow = pa.schema(fields)
    from pyspark.sql.pandas.types import from_arrow_schema

    out_schema = from_arrow_schema(out_arrow)

    try:
        par = max(spark.sparkContext.defaultParallelism, 1)
    except Exception:
        par = 8
    n_tasks = max(1, min(len(spec_rows) or 1, par * 4))
    spec_df = spark.createDataFrame(
        spec_rows,
        "bucket string, a_files array<string>, b_files array<string>",
    ).repartition(n_tasks)

    kb, wa, wb, ob = key_b, list(want_a), list(want_b), list(out_b)

    # pre-rename files store columns under their OLD names — the same
    # alias chains scan() resolves (table.py read_native) apply here
    aliases_a = {
        c: ta.metadata().get("renames", {}).get(c, [])
        for c in want_a
        if c in ta.metadata().get("renames", {})
    }
    aliases_b = {
        c: tb.metadata().get("renames", {}).get(c, [])
        for c in [key_b] + want_b
        if c in tb.metadata().get("renames", {})
    }

    def _read_side(paths, dels, schema_hex, cols, aliases):
        from btrblocks_spark.sources import fs as _fs
        from btrblocks_spark.sources.blockfile import (
            decode_batches,
            load_delete_index,
        )

        logical = pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(schema_hex))
        )
        del_index = (
            load_delete_index(dels, paths) if dels and paths else {}
        )
        bcols = ["tuple_count"] + [f"b_{c}" for c in cols]
        alias_bcols = [
            f"b_{a}" for c in cols for a in (aliases or {}).get(c, [])
        ]
        tabs = []
        for path in paths:
            try:
                bt = _fs.read_parquet(path, columns=bcols)
            except Exception:
                names = set(_fs.read_parquet_schema(path).names)
                bt = _fs.read_parquet(
                    path,
                    columns=[
                        c for c in bcols + alias_bcols if c in names
                    ],
                )
            batches = list(
                decode_batches(
                    bt.to_batches(),
                    logical,
                    cols,
                    deletes=del_index.get(path),
                    aliases=aliases,
                )
            )
            if batches:
                tabs.append(pa.Table.from_batches(batches))
        if not tabs:
            return pa.schema(
                [logical.field(logical.get_field_index(c)) for c in cols]
            ).empty_table()
        return pa.concat_tables(tabs)

    def join_task(batch_iter):
        for batch in batch_iter:
            bks = batch.column("bucket").to_pylist()
            afs = batch.column("a_files").to_pylist()
            bfs = batch.column("b_files").to_pylist()
            for _b, af, bf in zip(bks, afs, bfs):
                if not af:
                    continue
                at = _read_side(
                    af or [], dels_a, schema_a_hex, wa, aliases_a
                )
                if how in ("inner", "leftsemi") and not bf:
                    continue
                if how == "leftanti" and not bf:
                    # no B rows in this bucket: every A row survives
                    for rb in at.select(wa).cast(out_arrow).to_batches(
                        max_chunksize=65536
                    ):
                        yield rb
                    continue
                btab = _read_side(
                    bf or [], dels_b, schema_b_hex, [kb] + wb,
                    aliases_b,
                )
                # pre-rename B payload to the output names so the
                # Arrow hash join emits them directly
                btab = btab.rename_columns([kb] + ob)
                if promote_keys:
                    import pyarrow.compute as _pc

                    i_a = at.schema.get_field_index(key_a)
                    at = at.set_column(
                        i_a,
                        pa.field(key_a, pa.int64()),
                        _pc.cast(at[key_a], pa.int64()),
                    )
                    i_b = btab.schema.get_field_index(kb)
                    btab = btab.set_column(
                        i_b,
                        pa.field(kb, pa.int64()),
                        _pc.cast(btab[kb], pa.int64()),
                    )
                jt = at.join(
                    btab,
                    keys=[key_a],
                    right_keys=[kb],
                    join_type={
                        "inner": "inner",
                        "left": "left outer",
                        "leftsemi": "left semi",
                        "leftanti": "left anti",
                    }[how],
                )
                jt = jt.select(wa + ob)
                # align field order AND exact types to the declared
                # output schema (acero may relax nullability)
                jt = jt.cast(out_arrow)
                for rb in jt.to_batches(max_chunksize=65536):
                    yield rb

    return spec_df.mapInArrow(join_task, out_schema)
