"""Z-order / Hilbert clustering over (phash, w, h) with skew handling.

The clustering key is a 63-bit interleave (21 bits per dimension) computed
in a vectorized Arrow-batched pandas UDF — no per-row Python. Layout job:

    scan -> zkey (pandas_udf) -> salted repartitionByRange(zkey)
         -> sortWithinPartitions(zkey) -> re-encode blocks -> commit

Salting (explicit, per the north rule — not AQE-dependent): hot zkey
ranges (detected from a sampled quantile sketch) get a per-row salt
``pmod(xxhash64(image_id), k)`` appended to the range key so one hot phash
band spreads over k tasks instead of one straggler. Sorting *within*
partitions is preserved, so files stay zkey-contiguous except in the hot
band, where k files share a range — the manifest min/max stats still make
pruning correct, just marginally less tight there.

Z-ordering means a predicate on any of (phash, w, h) prunes files via
manifest min/max stats: multi-dimensional locality without partitioning
by all three (the standard lakehouse clustering argument; at 10^12 rows
partition-by-value on phash is impossible, clustering is the only option).
"""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from btrblocks_spark.sources.table import BtrTable

Z_BITS = 21  # 3 x 21 = 63 bits, fits signed int64


def _spread_bits_21(v: np.ndarray) -> np.ndarray:
    """Insert two zero bits between each of the low 21 bits (Morton spread)."""
    x = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """63-bit Z-order key from three int64 columns (top 21 bits each used)."""
    return (
        _spread_bits_21(a)
        | (_spread_bits_21(b) << np.uint64(1))
        | (_spread_bits_21(c) << np.uint64(2))
    ).astype(np.int64)


def hilbert3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """63-bit Hilbert-curve index from three 21-bit coordinates.

    Vectorized Skilling transform (public-domain AxesToTranspose,
    Skilling 2004) followed by bit interleave. Hilbert preserves locality
    strictly better than Z-order (no long diagonal jumps), at ~21
    vectorized passes instead of 6.
    """
    X = [
        a.astype(np.uint64) & np.uint64(0x1FFFFF),
        b.astype(np.uint64) & np.uint64(0x1FFFFF),
        c.astype(np.uint64) & np.uint64(0x1FFFFF),
    ]
    M = np.uint64(1 << (Z_BITS - 1))
    Q = int(M)
    while Q > 1:
        P = np.uint64(Q - 1)
        Qu = np.uint64(Q)
        for i in range(3):
            hit = (X[i] & Qu) != 0
            # if bit set: invert low bits of X[0]; else swap low bits X[0]<->X[i]
            t = (X[0] ^ X[i]) & P
            X[0] = np.where(hit, X[0] ^ P, X[0] ^ t)
            X[i] = np.where(hit, X[i], X[i] ^ t)
        Q >>= 1
    # Gray encode
    X[1] ^= X[0]
    X[2] ^= X[1]
    t = np.zeros_like(X[2])
    Q = int(M)
    while Q > 1:
        Qu = np.uint64(Q)
        t ^= np.where((X[2] & Qu) != 0, np.uint64(Q - 1), np.uint64(0))
        Q >>= 1
    X[0] ^= t
    X[1] ^= t
    X[2] ^= t
    return (
        (_spread_bits_21(X[0]) << np.uint64(2))
        | (_spread_bits_21(X[1]) << np.uint64(1))
        | _spread_bits_21(X[2])
    ).astype(np.int64)


def _normalize_21(v: pd.Series) -> np.ndarray:
    """Map an int64 column into its top-21-bit bucket, order-preserving."""
    x = v.to_numpy(dtype=np.int64, na_value=0)
    # shift into unsigned space so negative values order below positives
    u = x.astype(np.uint64) + np.uint64(1 << 63)
    return (u >> np.uint64(64 - Z_BITS)).astype(np.uint64)


def make_key_udf(curve: str = "zorder"):
    """Vectorized pandas UDF computing the clustering key for 3 columns."""
    fn = morton3 if curve == "zorder" else hilbert3

    @F.pandas_udf(LongType())
    def key_udf(phash: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        a = _normalize_21(phash)
        b = _normalize_21(w.astype(np.int64))
        c = _normalize_21(h.astype(np.int64))
        return pd.Series(fn(a, b, c))

    return key_udf


zkey_udf = make_key_udf("zorder")


def cluster_staged(
    table: BtrTable,
    by: tuple[str, str, str] = ("phash", "w", "h"),
    job_id: str | None = None,
    num_files: int | None = None,
    salt_buckets: int = 8,
    hot_share_threshold: float = 0.15,
    curve: str = "zorder",
    group_bytes: int = 128 * 1024 * 1024,
    max_rows_per_file: int | None = None,
    only_new: bool = False,
) -> dict:
    """Two-phase file-staged range clustering (the 100 TB path).

    Phase 0: key-only scan (parquet prunes to the tiny key blobs) →
    driver-side zkey quantile cuts + hot-bucket detection.
    Phase A (one task per ~128 MB input group): decode, assign each row a
    range bucket (hot buckets get a deterministic salt sub-bucket — the
    explicit skew spread of the north rule), write one transient plain
    parquet per (partition, bucket, salt) into ``_staging/``.
    Phase B (one task per bucket): merge that bucket's staged files, sort
    by zkey, re-encode into final block files.

    Row bytes move file→worker→file twice and never enter the JVM or
    Spark's shuffle — the file-level equivalent of a range exchange.
    Both phases are checkpoint-resumable per task.
    """
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq  # noqa: F401 (workers re-import)

    assert curve in ("zorder", "hilbert")
    job_id = job_id or f"cluster-{uuid.uuid4().hex[:8]}"
    spark = table.spark
    if table.delete_files() or table.eq_delete_files():
        raise RuntimeError(
            "table carries delete files; run compact() to absorb them "
            "before clustering (the staged cluster kernel reads files "
            "physically)"
        )
    files = table.data_files()
    if only_new:
        # incremental clustering (the steady-state 100 TB path): only
        # files NOT already carrying this sort key are rewritten into a
        # fresh sorted run — existing sorted files stay byte-identical.
        # Zone-map pruning is per file, so several sorted runs prune as
        # well as one; a periodic full cluster() re-merges the runs.
        sig = f"{curve}({','.join(by)})"
        files = [r for r in files if (r.get("sort_key") or "") != sig]
    if not files:
        return {"job_id": job_id, "rewritten_files": 0, "new_files": 0}
    from btrblocks_spark import PART_SIZE_BYTES
    from btrblocks_spark.sources import fs

    total_rows = sum(r["row_count"] for r in files)
    total_bytes = sum(r["file_bytes"] for r in files)
    if num_files is None:
        num_files = max(1, min(512, int(total_bytes / PART_SIZE_BYTES) or 1))

    # ---- Phase 0: cuts + hot buckets from a key-only sampled scan of
    # exactly the files being rewritten
    frac = min(1.0, 200_000 / max(total_rows, 1))
    keys_pdf = (
        table.scan(
            columns=list(by), files=[r["file_path"] for r in files]
        )
        .sample(fraction=frac, seed=42)
        .toPandas()
    )
    hot: set[int] = set()
    if len(keys_pdf) >= 100 and num_files > 1:
        z = compute_zkey(pa.Table.from_pandas(keys_pdf), by, curve)
        cuts = np.unique(
            np.quantile(z, np.linspace(0, 1, num_files + 1)[1:-1]).astype(
                np.int64
            )
        )
        bucket_of = np.searchsorted(cuts, z, side="right")
        share = np.bincount(bucket_of, minlength=len(cuts) + 1) / max(len(z), 1)
        hot = {int(i) for i in np.flatnonzero(share > hot_share_threshold)}
    else:
        cuts = np.empty(0, np.int64)

    root = table.root
    ckpt = fs.join(root, "_checkpoints", job_id)
    staging = fs.join(root, "_staging", job_id)
    fs.mkdirs(ckpt)
    fs.mkdirs(staging)
    parts = table.partition_by()
    schema_hex = table.schema_arrow().serialize().hex().decode()
    aliases = table.metadata().get("renames", {})
    cuts_list = [int(c) for c in cuts]
    hot_list = sorted(hot)

    # ---- Phase A: split input groups into staged bucket files
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for r in files:
        cur.append(r["file_path"])
        cur_bytes += r["file_bytes"]
        if cur_bytes >= group_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)
    specs_a = [
        {"gid": g, "paths": _json.dumps(ps)} for g, ps in enumerate(groups)
    ]
    spec_a_df = spark.createDataFrame(specs_a).repartition(len(specs_a))

    def split_task(batch_iter):
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        from btrblocks_spark.operators.cluster import compute_zkey as _zk
        from btrblocks_spark.sources import fs as _fs
        from btrblocks_spark.sources.blockfile import decode_batches

        logical = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(schema_hex)))
        cuts_np = np.array(cuts_list, np.int64)
        hot_set = set(hot_list)
        for batch in batch_iter:
            for row in batch.to_pylist():
                gid = row["gid"]
                marker = _fs.join(ckpt, f"a-{gid}.json")
                if _fs.exists(marker):
                    yield pa.RecordBatch.from_pydict(
                        {"rows": [_fs.read_bytes(marker).decode()]}
                    )
                    continue
                batches = []
                for p in _json.loads(row["paths"]):
                    bt = _fs.read_parquet(p)
                    batches.extend(
                        decode_batches(
                            bt.to_batches(), logical, aliases=aliases
                        )
                    )
                tbl = pa.Table.from_batches(batches).combine_chunks()
                z = _zk(tbl, tuple(by), curve)
                bucket = (
                    np.searchsorted(cuts_np, z, side="right")
                    if len(cuts_np)
                    else np.zeros(len(z), np.int64)
                )
                salt = np.zeros(len(z), np.int64)
                if hot_set:
                    hot_rows = np.isin(bucket, list(hot_set))
                    salt[hot_rows] = (
                        np.flatnonzero(hot_rows) + gid * 1_000_003
                    ) % salt_buckets
                if parts:
                    # NULL partition values: same sentinel as
                    # blockfile.split_by_partition — an unfilled null
                    # cell would surface as None and crash np.unique
                    # ('<' unsupported between NoneType and str)
                    _NULL = "\x00__null__"
                    key_str = None
                    for c in parts:
                        col = pc.fill_null(
                            pc.cast(tbl.column(c), pa.string()), _NULL
                        )
                        key_str = (
                            col
                            if key_str is None
                            else pc.binary_join_element_wise(
                                key_str, col, "\x1f"
                            )
                        )
                    part_np = (
                        key_str.combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    )
                else:
                    part_np = None
                out_entries = []
                combo = bucket * salt_buckets + salt
                if part_np is not None:
                    # vectorized dictionary build: np.unique returns the
                    # sorted uniques AND the per-row index in one pass
                    # (the uniq_parts.index(p) loop was O(rows*parts))
                    uniq_np, part_idx = np.unique(part_np, return_inverse=True)
                    uniq_parts = uniq_np.tolist()
                    combo = combo * len(uniq_parts) + part_idx.astype(np.int64)
                else:
                    uniq_parts = [None]
                for cval in np.unique(combo):
                    sel = np.flatnonzero(combo == cval)
                    sub = tbl.take(pa.array(sel))
                    # decompose combo -> (bucket, salt, partition index)
                    rem = int(cval)
                    pi = rem % len(uniq_parts)
                    rem //= len(uniq_parts)
                    s = rem % salt_buckets
                    bkt = rem // salt_buckets
                    pjson = (
                        _json.dumps(
                            dict(
                                zip(
                                    parts,
                                    [
                                        None if v == "\x00__null__" else v
                                        for v in str(
                                            uniq_parts[pi]
                                        ).split("\x1f")
                                    ],
                                )
                            )
                        )
                        if part_np is not None
                        else "{}"
                    )
                    fname = f"a{gid:05d}-b{bkt:05d}-s{s}-p{pi}.parquet"
                    fpath = _fs.join(staging, fname)
                    f, pth = _fs.resolve(fpath)
                    with f.open_output_stream(pth) as stream:
                        _pq.write_table(
                            sub,
                            stream,
                            compression="none",
                            use_dictionary=False,
                            write_statistics=False,
                        )
                    out_entries.append(
                        {
                            "path": fpath,
                            "bucket": int(bkt),
                            "salt": int(s),
                            "partition": pjson,
                            "rows": sub.num_rows,
                        }
                    )
                payload = _json.dumps(out_entries)
                _fs.write_bytes_atomic(marker, payload.encode())
                yield pa.RecordBatch.from_pydict({"rows": [payload]})

    staged: list[dict] = []
    for r in spec_a_df.mapInArrow(split_task, "rows string").collect():
        staged.extend(_json.loads(r.rows))

    # ---- Phase B: merge each (partition, bucket, salt) into final files
    bins: dict[tuple, list[dict]] = {}
    for e in staged:
        bins.setdefault((e["partition"], e["bucket"], e["salt"]), []).append(e)
    specs_b = [
        {
            "bin_id": i,
            "partition": key[0],
            "paths": _json.dumps([e["path"] for e in members]),
        }
        for i, (key, members) in enumerate(sorted(bins.items()))
    ]
    spec_b_df = spark.createDataFrame(specs_b).repartition(len(specs_b))
    sort_key = f"{curve}({','.join(by)})"
    target_rows = max_rows_per_file
    blooms = table.bloom_cols()
    ndvs = table.ndv_cols()
    tbcs = table.token_bloom_cols()
    all_tfs = table.all_partition_transforms()

    def merge_task(batch_iter):
        from btrblocks_spark.operators.cluster import compute_zkey as _zk
        from btrblocks_spark.sources import fs as _fs
        from btrblocks_spark.sources.blockfile import encode_table
        from btrblocks_spark.sources.table import _write_blockfile_atomic

        for batch in batch_iter:
            for row in batch.to_pylist():
                bin_id = row["bin_id"]
                marker = _fs.join(ckpt, f"b-{bin_id}.json")
                if _fs.exists(marker):
                    yield pa.RecordBatch.from_pydict(
                        {"rows": [_fs.read_bytes(marker).decode()]}
                    )
                    continue
                tbls = [
                    _fs.read_parquet(p) for p in _json.loads(row["paths"])
                ]
                tbl = pa.concat_tables(tbls).combine_chunks()
                if all_tfs:
                    # refresh _p_* layout columns (pre-spec files decode
                    # them as NULL — mixed stats would mis-prune)
                    from btrblocks_spark.sources.table import (
                        recompute_partition_arrow,
                    )

                    tbl = recompute_partition_arrow(tbl, all_tfs)
                z = _zk(tbl, tuple(by), curve)
                tbl = tbl.take(pa.array(np.argsort(z, kind="stable")))
                out_rows = []
                step = target_rows or tbl.num_rows or 1
                k = 0
                for start in range(0, max(tbl.num_rows, 1), step):
                    piece = tbl.slice(start, step)
                    if piece.num_rows == 0 and tbl.num_rows > 0:
                        break
                    block_table, stats = encode_table(
                        piece,
                        seed=42,
                        bloom_cols=blooms,
                        ndv_cols=ndvs,
                        token_bloom_cols=tbcs,
                    )
                    fname = f"{job_id}-b{bin_id:05d}-{k}.parquet"
                    fpath = _fs.join(root, "data", fname)
                    fbytes = _write_blockfile_atomic(block_table, fpath)
                    out_rows.append(
                        {
                            "file_path": fpath,
                            "partition": row["partition"],
                            "row_count": stats["row_count"],
                            "block_count": block_table.num_rows,
                            "file_bytes": fbytes,
                            "raw_bytes": stats["raw_bytes"],
                            "stats": _json.dumps(stats["columns"]),
                            "job_id": job_id,
                            "source_files": "[]",
                            "sort_key": sort_key,
                        }
                    )
                    k += 1
                payload = _json.dumps(out_rows)
                _fs.write_bytes_atomic(marker, payload.encode())
                yield pa.RecordBatch.from_pydict({"rows": [payload]})

    new_rows: list[dict] = []
    for r in spec_b_df.mapInArrow(merge_task, "rows string").collect():
        new_rows.extend(_json.loads(r.rows))

    replaced = {r["file_path"] for r in files}
    sid = table._commit(
        new_rows,
        operation="cluster",
        replaced=replaced,
        extra_summary={
            "sort_key": sort_key,
            "hot_ranges": len(hot_list),
            "salt_buckets": salt_buckets if hot_list else 0,
            "strategy": "staged",
        },
    )
    # transient staging cleanup (markers stay for lineage/debug)
    for e in staged:
        fs.delete_file(e["path"])
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "rewritten_files": len(replaced),
        "new_files": len(new_rows),
        "hot_ranges": hot_list,
        "strategy": "staged",
    }


def compute_zkey(
    tbl, by: tuple[str, str, str], curve: str
) -> np.ndarray:
    """Clustering key for an Arrow table's key columns (pure numpy)."""
    fn = morton3 if curve == "zorder" else hilbert3
    cols = []
    for c in by:
        s = tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
        cols.append(_normalize_21(pd.Series(s)))
    return fn(*cols)


def cluster(
    table: BtrTable,
    by: tuple[str, str, str] = ("phash", "w", "h"),
    job_id: str | None = None,
    num_files: int | None = None,
    salt_buckets: int = 8,
    hot_share_threshold: float = 0.15,
    max_rows_per_file: int | None = None,
    curve: str = "zorder",
    strategy: str = "staged",
    only_new: bool = False,
) -> dict:
    """Rewrite the whole table in Z-order/Hilbert order; returns metrics.

    ``only_new=True`` (staged only) clusters just the files appended
    since the last cluster into their own sorted run, leaving already-
    sorted files untouched — the steady-state incremental maintenance
    mode at 100 TB.

    ``strategy="staged"`` (default) is the scale path: a two-phase
    file-level range exchange where executors read, split, and merge
    block files directly — row data NEVER crosses the JVM boundary or
    Spark's shuffle machinery (shuffling multi-MB image rows through the
    JVM costs ~25x in local measurement and would spill catastrophically
    at 100 TB). ``strategy="shuffle"`` keeps the declarative
    repartitionByRange formulation for comparison.
    """
    assert strategy in ("staged", "shuffle")
    if only_new and strategy != "staged":
        raise ValueError("only_new requires strategy='staged'")
    if strategy == "staged":
        return cluster_staged(
            table,
            by=by,
            job_id=job_id,
            num_files=num_files,
            salt_buckets=salt_buckets,
            hot_share_threshold=hot_share_threshold,
            curve=curve,
            max_rows_per_file=max_rows_per_file,
            only_new=only_new,
        )
    assert curve in ("zorder", "hilbert")
    job_id = job_id or f"cluster-{uuid.uuid4().hex[:8]}"
    spark = table.spark
    files = table.data_files()
    if not files:
        return {"job_id": job_id, "rewritten_files": 0}
    total_rows = sum(r["row_count"] for r in files)
    key_udf = make_key_udf(curve)
    df = table.scan().withColumn("_zkey", key_udf(*[F.col(c) for c in by]))

    if num_files is None:
        total_bytes = sum(r["file_bytes"] for r in files)
        from btrblocks_spark import PART_SIZE_BYTES

        num_files = max(1, min(512, int(total_bytes / PART_SIZE_BYTES) or 1))

    # --- skew detection on a sample: share of rows per zkey quantile bucket
    frac = min(1.0, 50_000 / max(total_rows, 1))
    sample = df.select("_zkey").sample(fraction=frac, seed=42).toPandas()
    hot_ranges: list[tuple[int, int]] = []
    if len(sample) >= 100 and num_files > 1:
        qs = np.quantile(
            sample["_zkey"].to_numpy(), np.linspace(0, 1, num_files + 1)
        ).astype(np.int64)
        counts, _ = np.histogram(sample["_zkey"].to_numpy(), bins=qs)
        share = counts / max(len(sample), 1)
        for i in np.flatnonzero(share > hot_share_threshold):
            hot_ranges.append((int(qs[i]), int(qs[i + 1])))

    hot_cond = None
    for lo, hi in hot_ranges:
        c = (F.col("_zkey") >= F.lit(lo)) & (F.col("_zkey") <= F.lit(hi))
        hot_cond = c if hot_cond is None else (hot_cond | c)
    if hot_cond is not None:
        salt = F.when(
            hot_cond, F.pmod(F.xxhash64("image_id"), F.lit(salt_buckets))
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    work = (
        df.withColumn("_salt", salt)
        .repartitionByRange(num_files, "_zkey", "_salt")
        .sortWithinPartitions("_zkey")
        .drop("_salt")
    )

    rows = table._write_files(
        work.drop("_zkey"),
        job_id=job_id,
        num_files=None,  # partitioning already fixed by repartitionByRange
        max_rows_per_file=max_rows_per_file,
        preserve_partitioning=True,
        sort_key=f"{curve}({','.join(by)})",
    )
    replaced = {r["file_path"] for r in files}
    sid = table._commit(
        rows,
        operation="cluster",
        replaced=replaced,
        extra_summary={
            "sort_key": f"{curve}({','.join(by)})",
            "hot_ranges": len(hot_ranges),
            "salt_buckets": salt_buckets if hot_ranges else 0,
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "rewritten_files": len(replaced),
        "new_files": len(rows),
        "hot_ranges": hot_ranges,
    }
