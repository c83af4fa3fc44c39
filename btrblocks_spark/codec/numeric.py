"""Numeric (int32/int64/double) cascading compression schemes.

Re-implements, in vectorized numpy, the scheme algebra of
``/root/reference/btrblocks/scheme/integer/`` and ``.../scheme/double/``:

  UNCOMPRESSED  (integer/Uncompressed.cpp)     — memcpy passthrough
  ONE_VALUE     (integer/OneValue.cpp)         — single distinct value
  DICT          (templated/DynamicDictionary.hpp) — sorted distinct + codes,
                codes always bit-packed (":65-67 we only need FBP for coding")
  RLE           (templated/RLE.hpp)            — (values, counts), both cascade
  FOR_BP        (integer/FOR.cpp + PBP.cpp FBP) — min-bias + bit-pack
  DELTA_BP      (integer/PBP.cpp:60-116 PBP_DELTA) — sorted-only delta + pack
  FREQUENCY     (templated/Frequency.hpp)      — top value + exception
                positions + cascaded exception values
  PSEUDODECIMAL (double/Pseudodecimal.cpp)     — digits x 10^-e decomposition
                with patches for non-convertible values

All integer sub-streams are int64 internally; the container records the
logical type and casts on decode. Selection among schemes lives in
``picker.py``. Every blob is ``u8 scheme_code`` followed by a
scheme-specific payload; container schemes recurse with cascade level - 1
(max depth 3, ``/root/reference/btrblocks/btrblocks.hpp:31,37,43``).
"""

from __future__ import annotations

import struct

import numpy as np

from btrblocks_spark.codec import bitpack

# Scheme codes (shared numeric namespace).
UNCOMPRESSED = 0
ONE_VALUE = 1
DICT = 2
RLE = 3
FOR_BP = 4
DELTA_BP = 5
FREQUENCY = 6
PSEUDODECIMAL = 7
DOUBLE_BP = 8
PFOR = 9

SCHEME_NAMES = {
    UNCOMPRESSED: "UNCOMPRESSED",
    ONE_VALUE: "ONE_VALUE",
    DICT: "DICT",
    RLE: "RLE",
    FOR_BP: "FOR_BP",
    DELTA_BP: "DELTA_BP",
    FREQUENCY: "FREQUENCY",
    PSEUDODECIMAL: "PSEUDODECIMAL",
    DOUBLE_BP: "DOUBLE_BP",
    PFOR: "PFOR",
}

_MAX_DECIMAL_EXPONENT = 14  # reference allows e<=22; float64 exactness caps us


def _run_view(v: np.ndarray) -> np.ndarray:
    """Bit-pattern view for NaN-stable run/equality detection on floats."""
    if v.dtype == np.float64:
        return v.view(np.int64)
    return v


# ---------------------------------------------------------------- encoders


def _enc_uncompressed_pieces(v: np.ndarray) -> list:
    return [struct.pack("<BI", UNCOMPRESSED, len(v)), v]


def _enc_one_value(v: np.ndarray) -> bytes:
    return struct.pack("<BI", ONE_VALUE, len(v)) + v[:1].tobytes()


def _enc_for_bp(v: np.ndarray) -> bytes:
    lo = int(v.min()) if len(v) else 0
    residuals = (v.astype(np.int64) - lo).astype(np.uint64)
    return struct.pack("<Bq", FOR_BP, lo) + bitpack.pack(residuals)


def _enc_pfor(v: np.ndarray) -> bytes:
    """Patched FOR (FastPFor semantics, scheme/integer/PBP.cpp:18-57,
    extern/FastPFOR.cpp:19-25): residuals are packed at a BASE width
    chosen to minimize total size; the few values that need more bits
    become exceptions (bit-packed positions + raw values). One stray
    sentinel no longer inflates the whole block's width the way plain
    FOR_BP does."""
    lo = int(v.min()) if len(v) else 0
    res = (v.astype(np.int64) - lo).astype(np.uint64)
    n = len(res)
    sres = np.sort(res)
    pos_bytes = (bitpack.bits_needed(max(n - 1, 0)) + 7) // 8
    best_w, best_sz = 64, None
    for w in bitpack._WIDTHS:
        if w >= 64:
            n_exc = 0
        else:
            n_exc = n - int(np.searchsorted(sres, 1 << w, side="left"))
        sz = (n * w + 7) // 8 + n_exc * (8 + pos_bytes)
        if best_sz is None or sz < best_sz:
            best_sz, best_w = sz, w
    if best_w >= 64:
        exc_idx = np.empty(0, np.int64)
    else:
        exc_idx = np.flatnonzero(res >= np.uint64(1 << best_w))
    exc_vals = res[exc_idx]
    base = res.copy()
    base[exc_idx] = 0
    return (
        struct.pack("<BqI", PFOR, lo, len(exc_idx))
        + bitpack.pack(exc_idx.astype(np.uint64))
        + exc_vals.tobytes()
        + bitpack.pack(base, width=best_w)
    )


def _enc_delta_bp(v: np.ndarray) -> bytes:
    # caller guarantees sorted (is_sorted gate, PBP.cpp:60-65)
    first = int(v[0]) if len(v) else 0
    deltas = np.diff(v.astype(np.int64)).astype(np.uint64)
    return struct.pack("<BIq", DELTA_BP, len(v), first) + bitpack.pack(deltas)


def _enc_dict(v: np.ndarray, level: int, seed: int) -> bytes:
    uniq, codes = np.unique(_run_view(v), return_inverse=True)
    uniq = uniq.view(v.dtype)
    # codes: always plain bit-pack (DynamicDictionary.hpp:65-67)
    codes_blob = bitpack.pack(codes.astype(np.uint64))
    values_blob = encode(uniq, level - 1, seed, exclude=(DICT,))
    return (
        struct.pack("<BII", DICT, len(uniq), len(values_blob))
        + values_blob
        + codes_blob
    )


def _enc_rle(v: np.ndarray, level: int, seed: int) -> bytes:
    rv = _run_view(v)
    breaks = np.flatnonzero(np.diff(rv)) + 1
    starts = np.concatenate([[0], breaks])
    run_values = v[starts]
    run_lengths = np.diff(np.concatenate([starts, [len(v)]])).astype(np.int64)
    values_blob = encode(run_values, level - 1, seed, exclude=(RLE,))
    counts_blob = encode(run_lengths, level - 1, seed, exclude=(RLE,))
    return (
        struct.pack("<BIII", RLE, len(v), len(values_blob), len(counts_blob))
        + values_blob
        + counts_blob
    )


def _enc_frequency(v: np.ndarray, level: int, seed: int) -> bytes:
    rv = _run_view(v)
    uniq, counts = np.unique(rv, return_counts=True)
    top = uniq[np.argmax(counts)]
    exc_idx = np.flatnonzero(rv != top)
    exc_values = v[exc_idx]
    top_arr = np.array([top], dtype=rv.dtype).view(v.dtype)
    exc_blob = encode(exc_values, level - 1, seed, exclude=(FREQUENCY,))
    return (
        struct.pack("<BI", FREQUENCY, len(v))
        + top_arr.tobytes()
        + bitpack.pack(exc_idx.astype(np.uint64))
        + struct.pack("<I", len(exc_blob))
        + exc_blob
    )


def decimal_decompose(
    v: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(digits:int64, exponents:int64, patch_mask) for d == digits * 10^-e.

    Vectorized trial over e = 0..14 (Pseudodecimal.cpp:56-123); values with
    no exact decomposition become patches (stored as raw doubles). Digits
    must fit int32 like the reference's INTEGER digit vector
    (Pseudodecimal.hpp:13-32), which also stops noise values from spuriously
    "converting" at high exponents with 50+ bit digits.
    """
    n = len(v)
    digits = np.zeros(n, np.int64)
    exponents = np.zeros(n, np.int64)
    unresolved = np.ones(n, bool)
    finite = np.isfinite(v)
    unresolved &= finite
    for e in range(_MAX_DECIMAL_EXPONENT + 1):
        if not unresolved.any():
            break
        with np.errstate(over="ignore", invalid="ignore"):
            scaled = v[unresolved] * (10.0**e)
            cand = np.round(scaled)
            ok = (np.abs(cand) < 2**31) & (cand / (10.0**e) == v[unresolved])
            # -0.0 == 0.0 in IEEE, but digits=0 would decode as +0.0 and
            # lose the sign bit — keep negative zero as a patch
            ok &= ~(np.signbit(v[unresolved]) & (cand == 0.0))
        idx = np.flatnonzero(unresolved)[ok]
        digits[idx] = cand[ok].astype(np.int64)
        exponents[idx] = e
        unresolved[idx] = False
    patch_mask = unresolved | ~finite
    return digits, exponents, patch_mask


def _enc_double_bp(v: np.ndarray) -> bytes:
    """Reinterpret doubles as 2 x u32 and bit-pack each half
    (scheme/double/DoubleBP.cpp:16-39). Wins when exponent/sign bits are
    near-constant (narrow-range doubles) but mantissas are incompressible."""
    bits = v.view(np.uint64)
    hi = (bits >> np.uint64(32)).astype(np.uint32)
    lo = (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi_lo = int(hi.min()) if len(hi) else 0
    lo_lo = int(lo.min()) if len(lo) else 0
    hi_blob = bitpack.pack((hi.astype(np.int64) - hi_lo).astype(np.uint64))
    lo_blob = bitpack.pack((lo.astype(np.int64) - lo_lo).astype(np.uint64))
    return (
        struct.pack("<BIqqI", DOUBLE_BP, len(v), hi_lo, lo_lo, len(hi_blob))
        + hi_blob
        + lo_blob
    )


def _enc_pseudodecimal(v: np.ndarray, level: int, seed: int) -> bytes:
    digits, exponents, patch_mask = decimal_decompose(v)
    patch_idx = np.flatnonzero(patch_mask)
    digits_blob = encode(digits, level - 1, seed, exclude=(PSEUDODECIMAL,))
    exp_blob = encode(exponents, level - 1, seed, exclude=(PSEUDODECIMAL,))
    return (
        struct.pack(
            "<BIII", PSEUDODECIMAL, len(v), len(digits_blob), len(exp_blob)
        )
        + digits_blob
        + exp_blob
        + bitpack.pack(patch_idx.astype(np.uint64))
        + v[patch_idx].tobytes()
    )


_IS_FLOAT = {np.dtype(np.float64): True}


def encode(
    v: np.ndarray,
    level: int,
    seed: int,
    force_scheme: int | None = None,
    exclude: tuple[int, ...] = (),
) -> bytes:
    return b"".join(encode_pieces(v, level, seed, force_scheme, exclude))


def encode_pieces(
    v: np.ndarray,
    level: int,
    seed: int,
    force_scheme: int | None = None,
    exclude: tuple[int, ...] = (),
) -> list:
    """Encode one numeric stream as bytes-like pieces (callers join once);
    picks a scheme via the sampled picker."""
    from btrblocks_spark.codec.picker import pick_numeric

    v = np.ascontiguousarray(v)
    if v.dtype not in (np.dtype(np.int64), np.dtype(np.float64)):
        v = v.astype(np.int64)
    scheme = (
        force_scheme
        if force_scheme is not None
        else pick_numeric(v, level, seed, exclude)
    )
    if scheme == UNCOMPRESSED:
        return _enc_uncompressed_pieces(v)
    if scheme == ONE_VALUE:
        return [_enc_one_value(v)]
    if scheme == DICT:
        return [_enc_dict(v, level, seed)]
    if scheme == RLE:
        return [_enc_rle(v, level, seed)]
    if scheme == FOR_BP:
        return [_enc_for_bp(v)]
    if scheme == PFOR:
        return [_enc_pfor(v)]
    if scheme == DELTA_BP:
        return [_enc_delta_bp(v)]
    if scheme == FREQUENCY:
        return [_enc_frequency(v, level, seed)]
    if scheme == PSEUDODECIMAL:
        return [_enc_pseudodecimal(v, level, seed)]
    if scheme == DOUBLE_BP:
        return [_enc_double_bp(v)]
    raise ValueError(f"unknown numeric scheme {scheme}")


# ---------------------------------------------------------------- decoders


def decode(buf: memoryview, offset: int, kind: str) -> tuple[np.ndarray, int]:
    """Decode one numeric blob. kind: 'i' -> int64, 'f' -> float64.

    Returns (values, bytes_consumed).
    """
    dtype = np.int64 if kind == "i" else np.float64
    scheme = buf[offset]
    pos = offset + 1
    if scheme == UNCOMPRESSED:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        out = np.frombuffer(buf, dtype, n, pos)
        return out, pos + n * 8 - offset
    if scheme == ONE_VALUE:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        val = np.frombuffer(buf, dtype, 1, pos)[0]
        return np.full(n, val, dtype), pos + 8 - offset
    if scheme == DICT:
        n_uniq, vlen = struct.unpack_from("<II", buf, pos)
        pos += 8
        uniq, consumed = decode(buf, pos, kind)
        pos += vlen
        codes, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        return uniq[codes.astype(np.int64)], pos - offset
    if scheme == RLE:
        n, vlen, clen = struct.unpack_from("<III", buf, pos)
        pos += 12
        run_values, _ = decode(buf, pos, kind)
        pos += vlen
        run_lengths, _ = decode(buf, pos, "i")
        pos += clen
        return np.repeat(run_values, run_lengths)[:n], pos - offset
    if scheme == FOR_BP:
        (lo,) = struct.unpack_from("<q", buf, pos)
        pos += 8
        residuals, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        return (residuals.astype(np.int64) + lo), pos - offset
    if scheme == PFOR:
        lo, n_exc = struct.unpack_from("<qI", buf, pos)
        pos += 12
        exc_idx, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        exc_vals = np.frombuffer(buf, np.uint64, n_exc, pos)
        pos += n_exc * 8
        base, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        if n_exc:
            base = base.copy()
            base[exc_idx.astype(np.int64)] = exc_vals
        return (base.astype(np.int64) + lo), pos - offset
    if scheme == DELTA_BP:
        n, first = struct.unpack_from("<Iq", buf, pos)
        pos += 12
        deltas, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        out = np.empty(n, np.int64)
        if n:
            out[0] = first
            np.cumsum(deltas.astype(np.int64), out=out[1:] if n > 1 else None)
            if n > 1:
                out[1:] += first
        return out, pos - offset
    if scheme == FREQUENCY:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        top = np.frombuffer(buf, dtype, 1, pos)[0]
        pos += 8
        exc_idx, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        (elen,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        exc_values, _ = decode(buf, pos, kind)
        pos += elen
        out = np.full(n, top, dtype)
        out[exc_idx.astype(np.int64)] = exc_values
        return out, pos - offset
    if scheme == PSEUDODECIMAL:
        n, dlen, elen = struct.unpack_from("<III", buf, pos)
        pos += 12
        digits, _ = decode(buf, pos, "i")
        pos += dlen
        exponents, _ = decode(buf, pos, "i")
        pos += elen
        patch_idx, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        patches = np.frombuffer(buf, np.float64, len(patch_idx), pos)
        pos += len(patch_idx) * 8
        out = digits.astype(np.float64) / np.power(10.0, exponents.astype(np.float64))
        if len(patch_idx):
            out[patch_idx.astype(np.int64)] = patches
        return out, pos - offset
    if scheme == DOUBLE_BP:
        n, hi_lo, lo_lo, hlen = struct.unpack_from("<IqqI", buf, pos)
        pos += 24
        hi, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        lo, consumed = bitpack.unpack(buf, pos)
        pos += consumed
        bits = (
            ((hi.astype(np.int64) + hi_lo).astype(np.uint64) << np.uint64(32))
            | (lo.astype(np.int64) + lo_lo).astype(np.uint64)
        )
        return bits.view(np.float64).copy(), pos - offset
    raise ValueError(f"unknown numeric scheme {scheme}")


def scheme_tree(buf: memoryview, offset: int = 0) -> dict:
    """Human-readable scheme tree for a numeric blob (btrmeta analog,
    ``/root/reference/tools/conversion/btrmeta.cpp:22-50``)."""
    scheme = buf[offset]
    name = SCHEME_NAMES.get(scheme, f"?{scheme}")
    node: dict = {"scheme": name}
    pos = offset + 1
    if scheme == DICT:
        n_uniq, vlen = struct.unpack_from("<II", buf, pos)
        node["unique"] = n_uniq
        node["values"] = scheme_tree(buf, pos + 8)
    elif scheme == RLE:
        n, vlen, clen = struct.unpack_from("<III", buf, pos)
        node["values"] = scheme_tree(buf, pos + 12)
        node["counts"] = scheme_tree(buf, pos + 12 + vlen)
    elif scheme == FREQUENCY:
        pass
    elif scheme == PSEUDODECIMAL:
        n, dlen, elen = struct.unpack_from("<III", buf, pos)
        node["digits"] = scheme_tree(buf, pos + 12)
        node["exponents"] = scheme_tree(buf, pos + 12 + dlen)
    return node
