"""String/binary cascading compression schemes.

Re-implements ``/root/reference/btrblocks/scheme/string/``:

  UNCOMPRESSED — offsets + byte pool (Uncompressed.cpp); offsets themselves
                 cascade through the integer codec (they are sorted, so
                 DELTA_BP usually wins — mirroring Fsst.cpp:72-77 which
                 cascades the offsets array through the integer picker)
  ONE_VALUE    — single string, offsets rematerialized on decode
                 (OneValue.cpp:14-110)
  DICT         — sorted distinct strings + codes; the *codes* stream goes
                 through the full integer picker, which gives the reference's
                 forced-RLE fast path for free when runs are long
                 (DynamicDictionary.cpp:183-188); the dictionary *pool* is
                 entropy-compressed when >= 16 KiB
                 (dict_fsst_input_size_threshold, SchemeConfig.hpp:44-60)
  POOL_COMPRESS— whole-pool zlib(level 1) compression + cascaded offsets
                 (general-purpose entropy slot; gates per Fsst.cpp:119-127:
                 usable when unique >= non_null/2 and total_length > 16 KiB)
  FSST         — whole-pool FSST compression + cascaded offsets: a real
                 numpy-vectorized FSST (symbol table + escape format, see
                 codec/fsst.py), the scheme the reference links in as
                 libfsst (Fsst.cpp:17-80). Competes with POOL_COMPRESS in
                 the sampled picker; typically wins on natural-language
                 pools (captions), loses to zlib on highly repetitive ones.

Strings are (offsets:int64[n+1], pool:bytes) — the Arrow large_utf8 layout,
which is also the reference's StringArrayViewer layout
(``/root/reference/btrblocks/storage/MMapVector.hpp:74-110``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from btrblocks_spark.codec import fsst as fsst_codec
from btrblocks_spark.codec import numeric

UNCOMPRESSED = 0
ONE_VALUE = 1
DICT = 2
POOL_COMPRESS = 3
FSST = 4

SCHEME_NAMES = {
    UNCOMPRESSED: "UNCOMPRESSED",
    ONE_VALUE: "ONE_VALUE",
    DICT: "DICT",
    POOL_COMPRESS: "POOL_COMPRESS",
    FSST: "FSST",
}

POOL_COMPRESS_MIN_BYTES = 16 * 1024  # fsst_input_size_threshold analogs
_ZLIB_LEVEL = 1


def to_arrow(offsets: np.ndarray, pool) -> pa.Array:
    if offsets.dtype != np.int64:
        offsets = offsets.astype(np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets), pa.py_buffer(pool)],
    )


def from_arrow(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(offsets:int64[n+1], pool buffer) from a large_binary/large_utf8 array.

    Zero-copy: the pool is a memoryview into the array's data buffer (the
    array object stays referenced via the buffer chain)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], np.int64, len(arr) + 1, arr.offset * 8)
    data = buffers[2]
    pool = (
        memoryview(data)[offsets[0] : offsets[-1]]
        if data is not None
        else memoryview(b"")
    )
    if offsets[0] != 0:
        offsets = offsets - offsets[0]
    return offsets, pool


def unique_strings(
    offsets: np.ndarray, pool: bytes
) -> tuple[np.ndarray, bytes, np.ndarray]:
    """Sorted-unique strings + codes. Returns (uoffsets, upool, codes)."""
    arr = to_arrow(offsets, pool)
    import pyarrow.compute as pc

    dict_arr = pc.dictionary_encode(arr)
    dictionary = dict_arr.dictionary
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False)
    inverse = np.empty_like(order)
    inverse[order] = np.arange(len(order))
    sorted_dict = dictionary.take(pa.array(order))
    uoffsets, upool = from_arrow(sorted_dict)
    return uoffsets, upool, inverse[codes]


def _enc_offsets(offsets: np.ndarray, level: int, seed: int) -> bytes:
    if offsets.dtype != np.int64:
        offsets = offsets.astype(np.int64)
    blob = numeric.encode(offsets, max(level, 1), seed)
    return struct.pack("<I", len(blob)) + blob


def _dec_offsets(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    (blen,) = struct.unpack_from("<I", buf, pos)
    offsets, _ = numeric.decode(buf, pos + 4, "i")
    return offsets, pos + 4 + blen


def encode(
    offsets: np.ndarray,
    pool,
    level: int,
    seed: int,
    force_scheme: int | None = None,
) -> bytes:
    return b"".join(encode_pieces(offsets, pool, level, seed, force_scheme))


def encode_pieces(
    offsets: np.ndarray,
    pool,
    level: int,
    seed: int,
    force_scheme: int | None = None,
) -> list:
    """Encode as a list of bytes-like pieces (callers join once — the big
    pool piece is never recopied through intermediate concatenations)."""
    n = len(offsets) - 1
    scheme = (
        force_scheme
        if force_scheme is not None
        else pick_string(offsets, pool, level, seed)
    )
    if scheme == UNCOMPRESSED:
        return [
            struct.pack("<BI", UNCOMPRESSED, n),
            _enc_offsets(offsets, level, seed),
            pool,
        ]
    if scheme == ONE_VALUE:
        one = pool[offsets[0] : offsets[1]] if n else b""
        return [struct.pack("<BII", ONE_VALUE, n, len(one)), one]
    if scheme == DICT:
        uoffsets, upool, codes = unique_strings(offsets, pool)
        codes_blob = numeric.encode(codes, level - 1, seed)
        upool_out, pool_mode = _compress_dict_pool(upool)
        return [
            struct.pack(
                "<BIIBI",
                DICT,
                n,
                len(uoffsets) - 1,
                pool_mode,
                len(upool_out),
            ),
            _enc_offsets(uoffsets, level, seed),
            upool_out,
            codes_blob,
        ]
    if scheme == POOL_COMPRESS:
        comp = zlib.compress(pool, _ZLIB_LEVEL)
        return [
            struct.pack("<BII", POOL_COMPRESS, n, len(comp)),
            comp,
            _enc_offsets(offsets, level, seed),
        ]
    if scheme == FSST:
        comp = fsst_codec.compress(pool)
        return [
            struct.pack("<BII", FSST, n, len(comp)),
            comp,
            _enc_offsets(offsets, level, seed),
        ]
    raise ValueError(f"unknown string scheme {scheme}")


_POOL_RAW, _POOL_ZLIB, _POOL_FSST = 0, 1, 2
_POOL_PROBE_BYTES = 64 * 1024


def _compress_dict_pool(upool) -> tuple[object, int]:
    """Entropy-compress a DICT dictionary pool >= 16 KiB, competing FSST
    against zlib the way the reference FSSTs its dict pool
    (scheme/string/DynamicDictionary.cpp:54-56). Large pools decide on a
    64 KiB probe, then run only the winner on the whole pool; if neither
    shrinks the pool it stays raw. Returns (pool_bytes, mode)."""
    if len(upool) < POOL_COMPRESS_MIN_BYTES:
        return upool, _POOL_RAW
    whole = len(upool) <= 4 * _POOL_PROBE_BYTES
    if whole:
        probe = bytes(upool)
    else:
        # STRIDED probe: 4 slices spread across the pool — a head-only
        # probe misjudges mixed pools (e.g. a compressible bmp blob first,
        # then megabytes of already-entropy-coded png/jpeg)
        n_sl, sl = 4, _POOL_PROBE_BYTES // 4
        stride = max((len(upool) - sl) // (n_sl - 1), 1)
        probe = b"".join(
            bytes(upool[i * stride : i * stride + sl]) for i in range(n_sl)
        )
    z = zlib.compress(probe, _ZLIB_LEVEL)
    # near-incompressible pools (dictionaries of already-entropy-coded
    # image blobs) bail after the cheap probe — whole-pool zlib for a
    # ~1.0 ratio is the single biggest CPU burn in the image bin rewrite
    # path, and every future scan would pay the decompress too
    if len(z) >= 0.95 * len(probe):
        return upool, _POOL_RAW
    fz = fsst_codec.compress(probe)
    if len(fz) < len(z):
        out = fz if whole else fsst_codec.compress(bytes(upool))
        mode = _POOL_FSST
    else:
        out = z if whole else zlib.compress(bytes(upool), _ZLIB_LEVEL)
        mode = _POOL_ZLIB
    if len(out) >= len(upool):
        return upool, _POOL_RAW
    return out, mode


def decode(buf: memoryview, offset: int) -> tuple[np.ndarray, object, int]:
    """Returns (offsets, pool bytes-like, consumed). The pool may be a
    zero-copy memoryview into ``buf`` — callers must keep ``buf`` alive
    (to_arrow's py_buffer does)."""
    scheme = buf[offset]
    pos = offset + 1
    if scheme == UNCOMPRESSED:
        (n,) = struct.unpack_from("<I", buf, pos)
        offsets, pos = _dec_offsets(buf, pos + 4)
        pool_len = int(offsets[-1]) if n else 0
        pool = buf[pos : pos + pool_len]
        return offsets, pool, pos + pool_len - offset
    if scheme == ONE_VALUE:
        n, slen = struct.unpack_from("<II", buf, pos)
        pos += 8
        one = bytes(buf[pos : pos + slen])
        offsets = np.arange(n + 1, dtype=np.int64) * slen
        return offsets, one * n, pos + slen - offset
    if scheme == DICT:
        n, n_uniq, pool_compressed, plen = struct.unpack_from("<IIBI", buf, pos)
        pos += 13
        uoffsets, pos = _dec_offsets(buf, pos)
        upool = buf[pos : pos + plen]
        pos += plen
        if pool_compressed == _POOL_ZLIB:
            upool = zlib.decompress(upool)
        elif pool_compressed == _POOL_FSST:
            upool = fsst_codec.decompress(upool)
        codes, consumed = numeric.decode(buf, pos, "i")
        pos += consumed
        # gather: vectorized via arrow take
        arr = to_arrow(uoffsets, upool).take(pa.array(codes))
        offsets, pool = from_arrow(arr)
        return offsets, pool, pos - offset
    if scheme == POOL_COMPRESS:
        n, clen = struct.unpack_from("<II", buf, pos)
        pos += 8
        pool = zlib.decompress(buf[pos : pos + clen])
        pos += clen
        offsets, pos = _dec_offsets(buf, pos)
        return offsets, pool, pos - offset
    if scheme == FSST:
        n, clen = struct.unpack_from("<II", buf, pos)
        pos += 8
        pool = fsst_codec.decompress(buf[pos : pos + clen])
        pos += clen
        offsets, pos = _dec_offsets(buf, pos)
        return offsets, pool, pos - offset
    raise ValueError(f"unknown string scheme {scheme}")


_SAMPLE_POOL_BUDGET = 128 * 1024  # cap sampled bytes; wide binary (images)
# would otherwise make the estimator compress megabytes per decision


def pick_string(offsets: np.ndarray, pool: bytes, level: int, seed: int) -> int:
    """Greedy sampled selection among string schemes (SchemePicker analog).

    Unlike the numeric picker, sampled sizes are EXTRAPOLATED to the full
    block before comparison: pool-compression sizes scale ~linearly with
    bytes, but DICT's dictionary does not — a 640-row sample of a
    4000-distinct/65536-row column shows a 0.74 unique ratio where the
    block's is 0.06, so comparing raw sample encodings systematically
    buries DICT. Distinct count is extrapolated with the Chao1 estimator
    (d + f1^2/2f2 over sample value frequencies).
    """
    from btrblocks_spark.codec.bitpack import bits_needed
    from btrblocks_spark.codec.config import get_config
    from btrblocks_spark.codec.stats import sample_indices

    enabled = get_config().string_schemes
    n = len(offsets) - 1
    if n == 0 or level <= 0:
        return UNCOMPRESSED
    total_len = int(offsets[-1])
    # cheap unique probe on a sample, capped by *bytes* not just rows
    idx = sample_indices(n, seed)
    avg_len = total_len / max(n, 1)
    max_rows = max(2, int(_SAMPLE_POOL_BUDGET / max(avg_len, 1)))
    if len(idx) > max_rows:
        idx = idx[:: max(1, len(idx) // max_rows)][:max_rows]
    arr = to_arrow(offsets, pool)
    import pyarrow.compute as pc

    sample = arr.take(pa.array(idx))
    vc = pc.value_counts(sample)
    counts = vc.field("counts").to_numpy(zero_copy_only=False)
    d = len(counts)
    if (
        ONE_VALUE in enabled
        and d <= 1
        and (len(idx) == n or len(pc.unique(arr)) <= 1)
    ):
        return ONE_VALUE
    # Chao1 distinct extrapolation (capped by n and by the sampling ratio)
    f1 = int((counts == 1).sum())
    f2 = int((counts == 2).sum())
    est_d = d + (f1 * f1) / (2.0 * max(f2, 1))
    est_d = float(min(est_d, n))
    est_ratio = est_d / max(n, 1)

    soff, spool = from_arrow(sample)
    sample_raw = len(spool) + len(soff) * 2
    scale = max(total_len, 1) / max(len(spool), 1)
    full_est: dict[int, float] = {UNCOMPRESSED: float(total_len + n * 2)}

    if DICT in enabled and est_ratio < 0.5:
        # analytic: dictionary pool + bit-packed codes
        uniq_arr = vc.field("values")
        uniq_bytes = (
            pc.sum(pc.binary_length(pc.cast(uniq_arr, pa.large_binary())))
            .as_py()
            or 0
        )
        avg_uniq_len = uniq_bytes / max(d, 1)
        code_bits = max(bits_needed(max(int(est_d) - 1, 1)), 1)
        full_est[DICT] = (
            est_d * (avg_uniq_len + 8) + n * code_bits / 8.0 + 64
        )
    if total_len > POOL_COMPRESS_MIN_BYTES:
        if POOL_COMPRESS in enabled:
            z = len(zlib.compress(spool, _ZLIB_LEVEL))
            full_est[POOL_COMPRESS] = z * scale + n * 2
        if FSST in enabled:
            # FSST trial on a smaller slice: training+parse are costly and
            # the ratio signal saturates quickly
            fs_pool = spool[: 32 * 1024]
            if len(fs_pool) >= 4096:
                fz = len(fsst_codec.compress(fs_pool))
                full_est[FSST] = fz * (total_len / len(fs_pool)) + n * 2
    best = min(full_est, key=lambda s: full_est[s])
    if full_est[best] >= total_len + n * 2:
        return UNCOMPRESSED
    return best


def scheme_tree(buf: memoryview, offset: int = 0) -> dict:
    scheme = buf[offset]
    node: dict = {"scheme": SCHEME_NAMES.get(scheme, f"?{scheme}")}
    if scheme == DICT:
        n, n_uniq, pool_compressed, _plen = struct.unpack_from("<IIBI", buf, offset + 1)
        node["unique"] = n_uniq
        node["pool_compressed"] = bool(pool_compressed)
        node["pool_codec"] = {_POOL_RAW: "raw", _POOL_ZLIB: "zlib",
                              _POOL_FSST: "fsst"}.get(pool_compressed)
    return node
