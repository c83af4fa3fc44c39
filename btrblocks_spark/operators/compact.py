"""Bin-packing compaction with fused block re-encode.

Greedy first-fit-decreasing bin packing of small files into
``target_file_bytes`` bins per partition — the distributed analog of the
reference's ColumnPart packing loop (greedily append compressed chunks
until 16 MiB, then flush — ``/root/reference/btrblocks/storage/
Chunk.cpp:233-243``, ``tools/conversion/csvtobtr.cpp:160-187``).

Planning is a *driver-side* computation over the manifest (file counts are
~10^4-10^6 rows even at 100 TB — trivially driver-sized since one row per
16-MiB-class file; the 100 TB of *data* is never collected). Execution is
one Spark task per output bin: the task reads its bin's block files,
decodes, re-encodes fresh blocks (picking schemes anew over the bigger
blocks — this is where compression ratio improves), writes one new file,
and leaves a checkpoint marker so a killed job resumes by skipping
finished bins.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa

from btrblocks_spark import PART_SIZE_BYTES
from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable, _write_blockfile_atomic


def plan_bins(
    files: list[dict],
    target_file_bytes: int,
    min_input_files: int = 2,
    small_file_bytes: int | None = None,
    must_rewrite: set[str] | None = None,
) -> list[list[dict]]:
    """First-fit-decreasing bin packing of compactable files, per partition.

    ``must_rewrite`` paths (files shadowed by positional delete files)
    are always included regardless of size, and a bin containing one is
    kept even as a singleton — rewriting such a file is what lets the
    commit drop its delete entries (delete absorption)."""
    small_file_bytes = small_file_bytes or int(target_file_bytes * 0.75)
    must_rewrite = must_rewrite or set()
    by_part: dict[str, list[dict]] = {}
    for r in files:
        if (
            r["file_bytes"] < small_file_bytes
            or r["file_path"] in must_rewrite
        ):
            by_part.setdefault(r["partition"], []).append(r)
    bins: list[list[dict]] = []
    for part_files in by_part.values():
        if len(part_files) < min_input_files:
            # too few smalls for a worthwhile merge: only the forced
            # (delete-shadowed) files are rewritten — an absorb-only
            # compaction must not drag provably-unaffected neighbors
            # into the rewrite
            part_files = [
                r for r in part_files if r["file_path"] in must_rewrite
            ]
            if not part_files:
                continue
        part_files.sort(key=lambda r: -r["file_bytes"])
        part_bins: list[tuple[int, list[dict]]] = []
        for r in part_files:
            placed = False
            for i, (used, members) in enumerate(part_bins):
                if used + r["file_bytes"] <= target_file_bytes:
                    part_bins[i] = (used + r["file_bytes"], members + [r])
                    placed = True
                    break
            if not placed:
                part_bins.append((r["file_bytes"], [r]))
        bins.extend(
            members
            for _, members in part_bins
            if len(members) >= 2
            or any(r["file_path"] in must_rewrite for r in members)
        )
    return bins


#: above this many pending equality-delete keys the driver stops probing
#: per-file blooms (it would have to load the keys) and falls back to
#: range-overlap pruning only — affected-file discovery stays
#: O(manifest), never O(data)
EQ_KEYS_DRIVER_MAX = 2_000_000


def _eq_affected_files(
    table: BtrTable, files: list[dict], eq_rows: list[dict]
) -> set[str]:
    """Data files an equality delete MIGHT touch: seq below the
    delete's seq AND key range overlap (manifest stats), refined by the
    per-file key bloom when the pending key set is small enough to load
    on the driver. Everything here is metadata + the (small) delete
    files — no data file is opened."""
    import numpy as np

    from btrblocks_spark.codec.bloom import bloom_may_contain_any
    from btrblocks_spark.sources.table import _file_may_match

    if not eq_rows:
        return set()
    blooms = set(table.bloom_cols())
    total_keys = sum(r["row_count"] or 0 for r in eq_rows)
    affected: set[str] = set()
    for d in eq_rows:
        d_seq = d.get("seq") or 0
        d_stats = json.loads(d["stats"] or "{}")
        cols = sorted(d_stats)
        prune = {
            c: (d_stats[c].get("min"), d_stats[c].get("max"))
            for c in cols
            if d_stats[c].get("min") is not None
        }
        keys = None
        if (
            len(cols) == 1
            and cols[0] in blooms
            and total_keys <= EQ_KEYS_DRIVER_MAX
        ):
            kt = fs.read_parquet(d["file_path"], columns=cols)
            arr = kt.column(cols[0]).to_numpy(zero_copy_only=False)
            keys = (
                arr.astype(np.int64)
                if arr.dtype.kind in "iu"
                else np.asarray(arr, dtype=object)
            )
        for r in files:
            if (r.get("seq") or 0) >= d_seq:
                continue
            if r["file_path"] in affected:
                continue
            if prune and not _file_may_match(r, prune):
                continue
            if keys is not None:
                bl = json.loads(r["stats"]).get(cols[0], {}).get("bloom")
                if bl is not None and not bloom_may_contain_any(bl, keys):
                    continue
            affected.add(r["file_path"])
    return affected


def compact(
    table: BtrTable,
    target_file_bytes: int = PART_SIZE_BYTES,
    min_input_files: int = 2,
    job_id: str | None = None,
) -> dict:
    """Compact small files; returns job metrics. Checkpoint-resumable.

    Positional delete files are ABSORBED: files they shadow are always
    rewritten (deletes applied during the re-encode), and every delete
    file whose referenced data files were all rewritten is dropped from
    the new snapshot — compaction returns the table to pure data files.
    """
    job_id = job_id or f"compact-{uuid.uuid4().hex[:8]}"
    files = table.data_files()
    delete_rows = table.delete_files()
    del_paths = [r["file_path"] for r in delete_rows]
    shadowed: set[str] = set()
    for r in delete_rows:
        shadowed.update(json.loads(r["source_files"] or "[]"))
    # only shadowed files that still exist in this snapshot matter
    live = {r["file_path"] for r in files}
    shadowed &= live
    # equality deletes (upsert_eq) are absorbed too: every data file
    # that could hold a matching key (range + bloom probe, no file
    # opens) with seq below a delete's seq is force-rewritten with the
    # keys filtered out; provably-unaffected files let the delete files
    # retire without being touched
    eq_rows = table.eq_delete_files()
    eq_specs = [
        (r["file_path"], r.get("seq") or 0) for r in eq_rows
    ]
    eq_affected = _eq_affected_files(table, files, eq_rows)
    shadowed |= eq_affected
    # schema-evolution convergence: files written before a rename/drop
    # still carry retired physical blob names (their manifest stats are
    # keyed by the old names — no file open needed to detect this).
    # Force-rewrite them so the table converges to the current schema.
    retired = table._retired_names(table.metadata())
    if retired:
        shadowed |= {
            r["file_path"]
            for r in files
            if retired & set(json.loads(r["stats"] or "{}"))
        }
    bins = plan_bins(
        files, target_file_bytes, min_input_files, must_rewrite=shadowed
    )
    if not bins:
        if eq_specs:
            # no data file can hold a pending delete key (range/bloom
            # rejected everywhere): the equality delete files carry no
            # live information — retire them in a metadata-only commit
            sid = table._commit(
                [],
                operation="compact",
                replaced={p for p, _ in eq_specs},
                extra_summary={
                    "bins": 0,
                    "absorbed_eq_delete_files": len(eq_specs),
                },
            )
            return {
                "job_id": job_id,
                "snapshot_id": sid,
                "bins": 0,
                "rewritten_files": 0,
                "absorbed_eq_delete_files": len(eq_specs),
            }
        return {"job_id": job_id, "bins": 0, "rewritten_files": 0}

    root = table.root
    ckpt_dir = fs.join(root, "_checkpoints", job_id)
    fs.mkdirs(ckpt_dir)
    spark = table.spark

    specs = [
        {
            "bin_id": i,
            "partition": members[0]["partition"],
            "paths": json.dumps([m["file_path"] for m in members]),
            "seqs": json.dumps([m.get("seq") or 0 for m in members]),
        }
        for i, members in enumerate(bins)
    ]
    # a few bins per task: bins are ~target_file_bytes each and uniform,
    # so packing them 2-4 deep cuts task-scheduling + python-worker
    # turnaround overhead without meaningful skew; cap at 4x cluster
    # parallelism so every core stays busy
    try:
        cores = spark.sparkContext.defaultParallelism
    except Exception:
        cores = 8
    if os.environ.get("BTRSPARK_ONE_BIN_PER_TASK"):
        n_tasks = len(specs)
    else:
        n_tasks = max(1, min(len(specs), max(cores * 4, len(specs) // 4)))
    spec_df = spark.createDataFrame(specs).repartition(n_tasks)
    schema_hex = table.schema_arrow().serialize().hex().decode()
    aliases = table.metadata().get("renames", {})

    blooms = table.bloom_cols()
    ndvs = table.ndv_cols()
    tbcs = table.token_bloom_cols()
    all_tfs = table.all_partition_transforms()

    def rebuild(batch_iter):
        from btrblocks_spark.sources import fs as _fs
        from btrblocks_spark.sources.blockfile import (
            decode_batches,
            encode_table,
            eq_delete_mask,
            load_delete_index,
            load_eq_deletes,
        )

        eq_dels = load_eq_deletes(eq_specs) if eq_specs else []
        for batch in batch_iter:
            for row in batch.to_pylist():
                bin_id = row["bin_id"]
                marker = _fs.join(ckpt_dir, f"bin-{bin_id}.json")
                if _fs.exists(marker):
                    payload = _fs.read_bytes(marker).decode()
                    yield pa.RecordBatch.from_pydict({"rows": [payload]})
                    continue
                import time as _time

                _t0 = _time.time()
                paths = json.loads(row["paths"])
                seqs = json.loads(row["seqs"])
                schema = pa.ipc.read_schema(
                    pa.py_buffer(bytes.fromhex(schema_hex))
                )
                del_index = (
                    load_delete_index(del_paths, paths) if del_paths else {}
                )
                logical_batches = []
                for p, fseq in zip(paths, seqs):
                    bt = _fs.read_parquet(p)
                    for rb in decode_batches(
                        bt.to_batches(),
                        schema,
                        schema.names,
                        deletes=del_index.get(p),
                        aliases=aliases,
                    ):
                        if eq_dels:
                            mask = eq_delete_mask(rb, fseq, eq_dels)
                            if mask is not None:
                                rb = rb.filter(pa.array(mask))
                        logical_batches.append(rb)
                merged = pa.Table.from_batches(
                    logical_batches, schema=schema
                )
                if all_tfs:
                    # refresh _p_* layout columns (pre-spec files decode
                    # them as NULL; also migrates old files to the
                    # evolved spec's stats)
                    from btrblocks_spark.sources.table import (
                        recompute_partition_arrow,
                    )

                    merged = recompute_partition_arrow(merged, all_tfs)
                _t1 = _time.time()
                if merged.num_rows == 0:
                    # every row of the bin was deleted — nothing to write
                    payload = json.dumps([])
                    _fs.write_bytes_atomic(marker, payload.encode())
                    yield pa.RecordBatch.from_pydict({"rows": [payload]})
                    continue
                block_table, stats = encode_table(
                    merged,
                    seed=42,
                    bloom_cols=blooms,
                    ndv_cols=ndvs,
                    token_bloom_cols=tbcs,
                )
                _t2 = _time.time()
                fname = f"{job_id}-bin{bin_id:05d}.parquet"
                fpath = _fs.join(root, "data", fname)
                fbytes = _write_blockfile_atomic(block_table, fpath)
                _t3 = _time.time()
                timing = {
                    "read_s": round(_t1 - _t0, 3),
                    "encode_s": round(_t2 - _t1, 3),
                    "write_s": round(_t3 - _t2, 3),
                }
                out = [
                    {
                        "file_path": fpath,
                        "partition": row["partition"],
                        "row_count": stats["row_count"],
                        "block_count": block_table.num_rows,
                        "file_bytes": fbytes,
                        "raw_bytes": stats["raw_bytes"],
                        "stats": json.dumps(stats["columns"]),
                        "job_id": job_id,
                        "source_files": json.dumps(paths),
                        "sort_key": "",
                        "_timing": timing,
                    }
                ]
                payload = json.dumps(out)
                _fs.write_bytes_atomic(marker, payload.encode())
                yield pa.RecordBatch.from_pydict({"rows": [payload]})

    collected = spec_df.mapInArrow(rebuild, "rows string").collect()
    new_rows: list[dict] = []
    for r in collected:
        new_rows.extend(json.loads(r.rows))
    timing_totals = {"read_s": 0.0, "encode_s": 0.0, "write_s": 0.0}
    for r in new_rows:
        t = r.pop("_timing", None)
        if t:
            for k in timing_totals:
                timing_totals[k] += t.get(k, 0.0)
    replaced = {m["file_path"] for members in bins for m in members}
    # delete absorption: a delete file whose referenced data files were
    # all rewritten (or are no longer in the snapshot) carries no live
    # information — drop it with the rewritten files
    absorbed = [
        r["file_path"]
        for r in delete_rows
        if all(
            p in replaced or p not in live
            for p in json.loads(r["source_files"] or "[]")
        )
    ]
    # every possibly-affected file was force-rewritten with the keys
    # filtered (eq_affected ⊆ must_rewrite), so ALL equality delete
    # files retire with this commit
    absorbed_eq = [p for p, _ in eq_specs]
    replaced |= set(absorbed) | set(absorbed_eq)
    sid = table._commit(
        new_rows,
        operation="compact",
        replaced=replaced,
        extra_summary={
            "bins": len(bins),
            "absorbed_delete_files": len(absorbed),
            "absorbed_eq_delete_files": len(absorbed_eq),
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "bins": len(bins),
        "rewritten_files": len(replaced),
        "new_files": len(new_rows),
        "absorbed_delete_files": len(absorbed),
        "new_bytes": sum(r["file_bytes"] for r in new_rows),
        "input_bytes": sum(
            m["file_bytes"] for members in bins for m in members
        ),
        "task_time_s": {k: round(v, 2) for k, v in timing_totals.items()},
    }
