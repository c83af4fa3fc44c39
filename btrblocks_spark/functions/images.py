"""Multimodal image-column handling.

Images travel as opaque ``binary`` cells with typed metadata columns
(``w``, ``h``, ``fmt``) per the graft's input schema. This module gives the
engine decode / PSNR-verify / re-encode / feature-extract kernels.

STUB NOTICE: no real image libraries (PIL/opencv/libjpeg) exist in this
container, so the three fast-path codecs are deterministic stand-ins
with the right *shape* (header + encoded payload, lossless vs lossy) —
but REAL PNGs round-trip in-sandbox through the dependency-free codec
in :mod:`btrblocks_spark.functions.png_pure` (zlib + PNG filters);
only lossy formats (JPEG) keep the NotImplementedError boundary:

- ``bmp``  — raw uint8 pixels (lossless)
- ``png``  — zlib-compressed pixels (lossless)
- ``jpeg`` — quantized (step 4) + zlib (LOSSY — round-trip PSNR ≈ 48 dB,
  exercising the PSNR >= 40 dB acceptance gate from the input_hint)
- ``jpd``  — the REAL lossy transform pipeline, dependency-free: 8x8
  DCT + quality-scaled quantization + DC prediction in pure numpy
  (:mod:`btrblocks_spark.functions.jpeg_pure`); default quality 98
  keeps PSNR >= 43 dB on any input, so the lossy acceptance gate runs
  against genuine transform-coding error in this sandbox

Every kernel is numpy-vectorized per image and Arrow-batched across rows
(``mapInArrow``); a real libjpeg-turbo binding drops in behind
``decode_image`` / ``encode_image`` without touching the Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC_BMP = b"FBMP"
MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"
_JPEG_QSTEP = 4

LOSSLESS_FMTS = {"bmp", "png", "real-png"}

# Optional real-codec seam: when PIL exists (not in this container, but
# a real deployment), real image bytes decode/encode through it behind
# the SAME decode_image/encode_image API — no Spark plumbing changes.
# Real containers are recognized by their actual magic bytes; encode
# uses the fmt names "real-png"/"real-jpeg". Without PIL, real formats
# keep raising NotImplementedError (the stub tests never touch them).
try:  # pragma: no cover - exercised only where PIL is installed
    import io as _io

    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

_REAL_MAGICS = (b"\x89PNG", b"\xff\xd8\xff", b"BM")


def _decode_real(data) -> np.ndarray:
    if HAVE_PIL:
        img = _PILImage.open(_io.BytesIO(bytes(data))).convert("RGB")
        return np.asarray(img, np.uint8)
    if bytes(data[:4]).startswith(b"\x89PNG"):
        # dependency-free lossless path: real PNGs decode in-sandbox
        from btrblocks_spark.functions.png_pure import decode_png

        return decode_png(data)
    raise NotImplementedError(
        "real image formats beyond PNG need an image library not "
        "present here"
    )


def _encode_real(pixels: np.ndarray, fmt: str) -> bytes:
    if HAVE_PIL:
        sink = _io.BytesIO()
        _PILImage.fromarray(pixels, "RGB").save(
            sink, format=fmt.removeprefix("real-").upper()
        )
        return sink.getvalue()
    if fmt == "real-png":
        from btrblocks_spark.functions.png_pure import encode_png

        return encode_png(pixels)
    raise NotImplementedError(
        "real image formats beyond PNG need an image library not "
        "present here"
    )


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 -> encoded bytes."""
    h, w, c = pixels.shape
    assert c == 3
    head = struct.pack("<II", w, h)
    if fmt == "bmp":
        return MAGIC_BMP + head + pixels.tobytes()
    if fmt == "png":
        return MAGIC_PNG + head + zlib.compress(pixels.tobytes(), 1)
    if fmt == "jpeg":
        q = (pixels.astype(np.int16) // _JPEG_QSTEP).astype(np.uint8)
        return MAGIC_JPG + head + zlib.compress(q.tobytes(), 1)
    if fmt == "jpd":
        # real DCT transform coding, dependency-free (jpeg_pure)
        from btrblocks_spark.functions.jpeg_pure import encode_jpd

        return encode_jpd(pixels)
    if fmt in ("real-png", "real-jpeg"):
        return _encode_real(pixels, fmt)
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data) -> np.ndarray:
    """encoded bytes/memoryview -> (h, w, 3) uint8 pixels."""
    magic = bytes(data[:4])
    if magic not in (MAGIC_BMP, MAGIC_PNG, MAGIC_JPG):
        if magic == b"FJPD":
            from btrblocks_spark.functions.jpeg_pure import decode_jpd

            return decode_jpd(data)
        if any(magic.startswith(m) for m in _REAL_MAGICS):
            return _decode_real(data)  # PIL seam (or NotImplementedError)
        raise NotImplementedError(
            "real image formats need an image library not present here"
        )
    w, h = struct.unpack("<II", data[4:12])
    body = data[12:]
    if magic == MAGIC_BMP:
        px = np.frombuffer(body, np.uint8)
    elif magic == MAGIC_PNG:
        px = np.frombuffer(zlib.decompress(body), np.uint8)
    else:
        q = np.frombuffer(zlib.decompress(body), np.uint8).astype(np.int16)
        px = np.clip(q * _JPEG_QSTEP + _JPEG_QSTEP // 2, 0, 255).astype(np.uint8)
    return px.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual-hash-like fingerprint: 8x8 mean-downsample vs median."""
    h, w, _ = pixels.shape
    gray = pixels.mean(axis=2)
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > np.median(cells)).reshape(-1)
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    # fold into signed int64
    if out >= 2**63:
        out -= 2**64
    return out


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (real, not stubbed)."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys[:, None], xs[None, :], :]


def resize_area(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average (antialiased) downscale, pure numpy — the correct
    filter for thumbnails (nearest-neighbor aliases high frequencies,
    which poisons pHash/embedding features computed downstream).

    Each output pixel averages its (possibly fractional) source box via
    two cumulative-sum passes — O(h*w) regardless of scale factor, no
    per-pixel Python. Falls back to nearest for upscales."""
    h, w, c = pixels.shape
    if out_h >= h or out_w >= w:
        return resize_nearest(pixels, out_w, out_h)
    acc = pixels.astype(np.float64)
    # integral image with a zero row/col so box sums are 4 lookups
    ii = np.zeros((h + 1, w + 1, c))
    np.cumsum(np.cumsum(acc, axis=0), axis=1, out=ii[1:, 1:])
    ye = np.round(np.linspace(0, h, out_h + 1)).astype(np.int64)
    xe = np.round(np.linspace(0, w, out_w + 1)).astype(np.int64)
    # guarantee non-empty boxes even when out dims ~ in dims
    ye = np.maximum.accumulate(np.maximum(ye, np.arange(out_h + 1)))
    xe = np.maximum.accumulate(np.maximum(xe, np.arange(out_w + 1)))
    y0, y1 = ye[:-1], ye[1:]
    x0, x1 = xe[:-1], xe[1:]
    box = (
        ii[y1[:, None], x1[None, :]]
        - ii[y0[:, None], x1[None, :]]
        - ii[y1[:, None], x0[None, :]]
        + ii[y0[:, None], x0[None, :]]
    )
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    return np.clip(box / area[..., None] + 0.5, 0, 255).astype(np.uint8)


def sample_frames(pixels: np.ndarray, n: int) -> list[np.ndarray]:
    """Frame sampling for a (fake) video laid out as vertical frame stack:
    split height into n bands and return one 'frame' per band — the
    Spark-side plumbing for video columns (real decoders plug in here)."""
    h = pixels.shape[0]
    bounds = (np.arange(n + 1) * h) // n
    return [pixels[bounds[i] : bounds[i + 1]] for i in range(n)]


# --------------------------------------------------------- Spark kernels


def _binary_views(arr):
    """Zero-copy per-cell access to a binary column: (offsets, databuf).

    Cell i is ``databuf[offsets[i]:offsets[i+1]]`` — a memoryview slice
    of the Arrow buffer, no per-cell ``.as_py()`` bytes copy (the same
    trick as blockfile.decode_batches). The per-image *decode* stays a
    Python loop (that is the honest cost of the stub codecs), but buffer
    access is O(1) and copy-free."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int64, len(arr) + 1, arr.offset * 8)
    # cast to unsigned: pyarrow buffers expose format 'b' (signed), under
    # which memoryview == bytes is False for any payload byte >= 0x80
    data = (
        memoryview(bufs[2]).cast("B")
        if bufs[2] is not None
        else memoryview(b"")
    )
    return offs, data


def decode_stats_batches(batch_iter):
    """mapInArrow kernel: (image_id, bytes, fmt) -> per-image pixel stats.

    Demonstrates the decode + feature-extract path: mean/std per channel.
    """
    for batch in batch_iter:
        ids = batch.column("image_id")
        offs, buf = _binary_views(batch.column("bytes"))
        n = len(batch)
        means = np.empty(n)
        stds = np.empty(n)
        for i in range(n):
            px = decode_image(buf[offs[i] : offs[i + 1]])
            means[i] = px.mean()
            stds[i] = px.std()
        yield pa.RecordBatch.from_pydict(
            {
                "image_id": ids,
                "pixel_mean": pa.array(means),
                "pixel_std": pa.array(stds),
            }
        )


def resize_batches(
    batch_iter, out_w: int = 64, out_h: int = 64, filter: str = "area"
):
    """mapInArrow kernel: (image_id, bytes, fmt) -> resized thumbnails.

    Decode -> resize (antialiased ``area`` default, ``nearest`` opt-in)
    -> re-encode in the same fmt. The standard thumbnail/preprocess
    stage of a training-data pipeline; at 10^12 images it is one narrow
    map stage, no shuffle.
    """
    rz = resize_area if filter == "area" else resize_nearest
    for batch in batch_iter:
        ids = batch.column("image_id")
        offs, buf = _binary_views(batch.column("bytes"))
        fmts = batch.column("fmt").to_pylist()
        out = []
        for i in range(len(batch)):
            px = decode_image(buf[offs[i] : offs[i + 1]])
            out.append(
                encode_image(rz(px, out_w, out_h), fmts[i])
            )
        yield pa.RecordBatch.from_pydict(
            {
                "image_id": ids,
                "thumb": pa.array(out, pa.binary()),
                "thumb_w": pa.array([out_w] * len(batch), pa.int32()),
                "thumb_h": pa.array([out_h] * len(batch), pa.int32()),
            }
        )


def reencode_check_batches(batch_iter, min_psnr: float = 40.0):
    """mapInArrow kernel: decode -> re-encode -> PSNR gate.

    Lossless fmts must round-trip byte-identically; lossy must clear
    ``min_psnr`` (input_hint invariant). Emits per-row verdicts.
    """
    for batch in batch_iter:
        ids = batch.column("image_id")
        offs, buf = _binary_views(batch.column("bytes"))
        fmts = batch.column("fmt").to_pylist()
        n = len(batch)
        ok = np.zeros(n, bool)
        psnrs = np.empty(n)
        for i in range(n):
            raw = buf[offs[i] : offs[i + 1]]
            fmt = fmts[i]
            px = decode_image(raw)
            re = encode_image(px, fmt)
            if fmt in LOSSLESS_FMTS:
                ok[i] = re == raw
                psnrs[i] = float("inf")
            else:
                px2 = decode_image(re)
                psnrs[i] = psnr(px, px2)
                ok[i] = psnrs[i] >= min_psnr
        yield pa.RecordBatch.from_pydict(
            {
                "image_id": ids,
                "ok": pa.array(ok),
                "psnr": pa.array(psnrs),
            }
        )
