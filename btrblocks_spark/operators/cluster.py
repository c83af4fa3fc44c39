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


def cluster(
    table: BtrTable,
    by: tuple[str, str, str] = ("phash", "w", "h"),
    job_id: str | None = None,
    num_files: int | None = None,
    salt_buckets: int = 8,
    hot_share_threshold: float = 0.15,
    max_rows_per_file: int | None = None,
    curve: str = "zorder",
) -> dict:
    """Rewrite the whole table in Z-order/Hilbert order; returns metrics."""
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
