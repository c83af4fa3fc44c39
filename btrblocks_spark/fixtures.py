"""Deterministic synthesis of the image+caption table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Generated fully vectorized with numpy seed 42; images are procedural
(gradient + per-image noise) encoded with the stub codecs in
:mod:`btrblocks_spark.functions.images`. ``phash`` has a deliberate hot
range (~20% of rows in a narrow band) to exercise salted-repartition skew
handling, and ``fmt`` is skewed ~90% jpeg.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from btrblocks_spark.functions.images import encode_image, phash64

_SIZES = np.array([64, 128, 224, 256, 512], np.int32)
_FMTS = np.array(["jpeg", "png", "bmp"])
_FMT_P = np.array([0.9, 0.07, 0.03])

_VOCAB = (
    "a the photo image picture of with on in under over beside "
    "cat dog tree house car mountain river city street person sky cloud "
    "red blue green golden dark bright small large tiny huge "
    "running sleeping standing looking smiling walking sitting flying"
).split()


def make_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    gy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    gx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    base = (gy + gx) / 2
    px = np.empty((h, w, 3), np.uint8)
    for c in range(3):
        noise = rng.normal(0, 20, (h, w))
        px[..., c] = np.clip(base * (0.5 + 0.25 * c) + noise, 0, 255).astype(np.uint8)
    return px


def make_caption(rng: np.random.Generator) -> str:
    n = rng.integers(5, 30)
    idx = rng.integers(0, len(_VOCAB), n)
    return " ".join(_VOCAB[i] for i in idx)


def _batch_images(rng: np.random.Generator, w: int, h: int, n: int) -> np.ndarray:
    """(n, h, w, 3) uint8 procedural images, vectorized in bounded chunks
    (cap temporaries to ~32M pixels so big size-groups don't allocate GBs)."""
    gy = np.linspace(0, 255, h, dtype=np.float32)[None, :, None, None]
    gx = np.linspace(0, 255, w, dtype=np.float32)[None, None, :, None]
    base = ((gy + gx) / 2) * np.array([0.5, 0.75, 1.0], np.float32)[
        None, None, None, :
    ]
    out = np.empty((n, h, w, 3), np.uint8)
    step = max(1, 32_000_000 // (h * w * 3))
    for s in range(0, n, step):
        m = min(step, n - s)
        noise = rng.standard_normal((m, h, w, 3), dtype=np.float32)
        noise *= 20.0
        noise += base
        np.clip(noise, 0, 255, out=noise)
        out[s : s + m] = noise.astype(np.uint8)
    return out


def _batch_phash(px: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit phash for a (n, h, w, 3) batch (8x8 mean grid)."""
    n, h, w, _ = px.shape
    gray = px.mean(axis=3)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    rowsum = np.add.reduceat(gray, ys[:-1], axis=1)
    cells = np.add.reduceat(rowsum, xs[:-1], axis=2)
    counts = np.outer(np.diff(ys), np.diff(xs))[None, :, :]
    cells = cells / counts
    flat = cells.reshape(n, 64)
    med = np.median(flat, axis=1, keepdims=True)
    bits = (flat > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return (bits @ weights).astype(np.int64)


def image_caption_table(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    size_idx = rng.integers(0, len(_SIZES), n_rows)
    w = _SIZES[size_idx]
    # h correlated with w via aspect buckets
    aspect = rng.choice([1.0, 0.75, 1.33], n_rows, p=[0.5, 0.25, 0.25])
    h = (w * aspect).astype(np.int32)
    fmt_idx = rng.choice(len(_FMTS), n_rows, p=_FMT_P)
    fmts = _FMTS[fmt_idx]

    blobs: list = [None] * n_rows
    phashes_arr = np.zeros(n_rows, np.int64)
    hot = rng.uniform(0, 1, n_rows) < 0.2  # hot phash band
    # vectorized per (w, h) group: one noise draw + one phash pass per group
    keys = w.astype(np.int64) * 100_000 + h.astype(np.int64)
    for key in np.unique(keys):
        idx = np.flatnonzero(keys == key)
        gw, gh = int(w[idx[0]]), int(h[idx[0]])
        grng = np.random.default_rng(seed * 1_000_003 + int(key))
        px = _batch_images(grng, gw, gh, len(idx))
        phashes_arr[idx] = _batch_phash(px)
        for j, i in enumerate(idx):
            blobs[i] = encode_image(px[j], str(fmts[i]))
    ids = [f"{i:012x}" for i in range(n_rows)]
    captions = [
        make_caption(np.random.default_rng(seed * 7_000_003 + i))
        for i in range(n_rows)
    ]
    phashes = [
        int(0x7FFF_0000_0000_0000 + (int(p) & 0xFFFF)) if is_hot else int(p)
        for p, is_hot in zip(phashes_arr, hot)
    ]
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array(fmts.tolist(), pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def public_bi_mix_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Public BI-style column mix (FIXTURES.md §3): ~9 ints, 5 doubles,
    4 strings with the reference benchmark's distribution characters
    (/root/reference/bench/bench-cases/regression_benchmark.cpp:13-24).
    Fully vectorized generation."""
    rng = np.random.default_rng(seed)
    n = n_rows
    ids = np.arange(n, dtype=np.int64) * 3 + rng.integers(0, 3, n)
    cat8 = rng.integers(0, 255, n).astype(np.int32)
    top = rng.integers(0, 10**6)
    cat_freq = np.full(n, top, np.int32)
    idx = rng.choice(n, max(n // 50, 1), replace=False)
    cat_freq[idx] = rng.integers(0, 10**6, len(idx))
    run_vals = rng.integers(0, 1000, n // 16 + 1)
    rle_int = np.repeat(run_vals, 16)[:n].astype(np.int32)
    big_bias = (rng.integers(0, 200, n) + 10**9).astype(np.int32)
    sorted_ts = np.cumsum(rng.integers(0, 5, n)).astype(np.int64) + 1_600_000_000
    m1 = rng.integers(0, 10**4, n).astype(np.int32)
    m2 = rng.integers(-(10**8), 10**8, n).astype(np.int32)
    m3 = rng.integers(0, 30, n).astype(np.int32)
    price = rng.integers(0, 10**7, n).astype(np.float64) / 100.0
    ratio = rng.integers(0, 10**4, n).astype(np.float64) / 10**4
    rand_double = rng.uniform(-999999, 999999, n)
    freq_double = np.full(n, 0.5)
    fidx = rng.choice(n, max(n // 50, 1), replace=False)
    freq_double[fidx] = rng.uniform(-1, 1, len(fidx))
    dpool = rng.uniform(-1000, 1000, 255)
    dict_double = dpool[rng.integers(0, 255, n)]
    vocab = np.array([f"category_{i:03d}" for i in range(300)])
    str_cat = vocab[rng.integers(0, 300, n)]
    words = np.array(_VOCAB)
    widx = rng.integers(0, len(words), (n, 6))
    str_fsst = np.char.add(
        np.char.add(
            words[widx[:, 0]],
            np.char.add(" ", words[widx[:, 1]]),
        ),
        np.char.add(
            np.char.add(" ", words[widx[:, 2]]),
            np.char.add("-", np.arange(n).astype(str)),
        ),
    )
    str_one = np.full(n, "CONSTANT", dtype=object)
    pool16 = np.array([f"v{i:05d}" for i in range(1020)])
    str_dict16 = pool16[rng.integers(0, 1020, n)]
    return pa.table(
        {
            "id": pa.array(ids),
            "cat8": pa.array(cat8),
            "cat_freq": pa.array(cat_freq),
            "rle_int": pa.array(rle_int),
            "big_bias": pa.array(big_bias),
            "sorted_ts": pa.array(sorted_ts),
            "m1": pa.array(m1),
            "m2": pa.array(m2),
            "m3": pa.array(m3),
            "price": pa.array(price),
            "ratio": pa.array(ratio),
            "rand_double": pa.array(rand_double),
            "freq_double": pa.array(freq_double),
            "dict_double": pa.array(dict_double),
            "str_cat": pa.array(str_cat.tolist(), pa.string()),
            "str_fsst": pa.array(str_fsst.tolist(), pa.string()),
            "str_one": pa.array(str_one.tolist(), pa.string()),
            "str_dict16": pa.array(str_dict16.tolist(), pa.string()),
        }
    )


def write_fragmented(
    table: pa.Table, out_dir: str, rows_per_file: int = 500
) -> list[str]:
    """Write the table as many small parquet files (compaction workload)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    k = 0
    for start in range(0, table.num_rows, rows_per_file):
        p = f"{out_dir}/frag-{k:05d}.parquet"
        pq.write_table(table.slice(start, rows_per_file), p)
        paths.append(p)
        k += 1
    return paths


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=5000)
    ap.add_argument("--rows-per-file", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    t = image_caption_table(args.rows, args.seed)
    paths = write_fragmented(t, args.out, args.rows_per_file)
    print(f"wrote {len(paths)} files, {t.num_rows} rows to {args.out}")
