"""Vectorized byte/bit packing for integer residuals.

Plays the role of FastBinaryPacking/FastPFor in the reference
(``/root/reference/btrblocks/scheme/integer/PBP.cpp:126-163``,
``/root/reference/btrblocks/extern/FastPFOR.cpp:19-29``). Instead of
arbitrary bit widths with SIMD kernels, we pack at numpy-friendly widths:
sub-byte {1, 2, 4} via ``np.packbits``-style shifts, whole-byte
{8, 16, 32, 64} via dtype casts, and byte-sliced {24, 40, 48, 56} by
viewing the 4/8-byte representation as a byte matrix and dropping the
constant-zero high bytes — every path a handful of vectorized numpy ops.
The width formula mirrors ``Utils::getBitsNeeded``
(``/root/reference/btrblocks/common/Utils.hpp:19-31``) rounded up to the
next supported width.
"""

from __future__ import annotations

import struct

import numpy as np

_WIDTHS = (0, 1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64)
_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}
_SLICED = {24: (np.uint32, 3), 40: (np.uint64, 5), 48: (np.uint64, 6), 56: (np.uint64, 7)}


def bits_needed(max_value: int) -> int:
    """Smallest supported width (bits) that can hold values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bits_needed expects a non-negative max")
    raw = int(max_value).bit_length()
    for w in _WIDTHS:
        if raw <= w:
            return w
    return 64


def pack(values: np.ndarray, width: int | None = None) -> bytes:
    """Pack non-negative integers at the smallest supported bit width.

    Layout: u8 width | u32 count | payload. ``width`` forces a specific
    supported width (PFOR packs patched residuals at the base width);
    all values must fit it.
    """
    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0:
        return struct.pack("<BI", 0, 0)
    maxv = int(v.max()) if n else 0
    if int(v.min()) < 0:
        raise ValueError("pack expects non-negative values (apply FOR bias first)")
    if width is not None:
        assert width in _WIDTHS and maxv.bit_length() <= width
        w = width
    else:
        w = bits_needed(maxv)
    head = struct.pack("<BI", w, n)
    if w == 0:
        return head
    if w == 1:
        return head + np.packbits(v.astype(np.uint8)).tobytes()
    if w == 2:
        u = v.astype(np.uint8)
        pad = (-n) % 4
        if pad:
            u = np.concatenate([u, np.zeros(pad, np.uint8)])
        u = u.reshape(-1, 4)
        b = u[:, 0] | (u[:, 1] << 2) | (u[:, 2] << 4) | (u[:, 3] << 6)
        return head + b.tobytes()
    if w == 4:
        u = v.astype(np.uint8)
        pad = (-n) % 2
        if pad:
            u = np.concatenate([u, np.zeros(pad, np.uint8)])
        u = u.reshape(-1, 2)
        b = u[:, 0] | (u[:, 1] << 4)
        return head + b.tobytes()
    if w in _SLICED:
        dt, nbytes = _SLICED[w]
        mat = np.ascontiguousarray(v.astype(dt)).view(np.uint8).reshape(n, dt().itemsize)
        return head + np.ascontiguousarray(mat[:, :nbytes]).tobytes()
    return head + v.astype(_DTYPES[w]).tobytes()


def unpack(buf: memoryview, offset: int = 0) -> tuple[np.ndarray, int]:
    """Inverse of :func:`pack`. Returns (uint64 array, bytes consumed)."""
    w, n = struct.unpack_from("<BI", buf, offset)
    pos = offset + 5
    if n == 0:
        return np.empty(0, np.uint64), pos - offset
    if w == 0:
        return np.zeros(n, np.uint64), pos - offset
    if w == 1:
        nbytes = (n + 7) // 8
        bits = np.unpackbits(np.frombuffer(buf, np.uint8, nbytes, pos))[:n]
        return bits.astype(np.uint64), pos + nbytes - offset
    if w == 2:
        nbytes = (n + 3) // 4
        b = np.frombuffer(buf, np.uint8, nbytes, pos)
        out = np.empty((nbytes, 4), np.uint8)
        out[:, 0] = b & 3
        out[:, 1] = (b >> 2) & 3
        out[:, 2] = (b >> 4) & 3
        out[:, 3] = (b >> 6) & 3
        return out.reshape(-1)[:n].astype(np.uint64), pos + nbytes - offset
    if w == 4:
        nbytes = (n + 1) // 2
        b = np.frombuffer(buf, np.uint8, nbytes, pos)
        out = np.empty((nbytes, 2), np.uint8)
        out[:, 0] = b & 15
        out[:, 1] = b >> 4
        return out.reshape(-1)[:n].astype(np.uint64), pos + nbytes - offset
    if w in _SLICED:
        dt, nbytes = _SLICED[w]
        width = dt().itemsize
        raw = np.frombuffer(buf, np.uint8, n * nbytes, pos).reshape(n, nbytes)
        mat = np.zeros((n, width), np.uint8)
        mat[:, :nbytes] = raw
        return (
            mat.view(dt).reshape(n).astype(np.uint64),
            pos + n * nbytes - offset,
        )
    dt = _DTYPES[w]
    nbytes = n * dt().itemsize
    return (
        np.frombuffer(buf, dt, n, pos).astype(np.uint64),
        pos + nbytes - offset,
    )


def packed_size(values: np.ndarray) -> int:
    """Size in bytes :func:`pack` would produce, without materializing."""
    n = len(values)
    if n == 0:
        return 5
    w = bits_needed(int(values.max()))
    return 5 + (n * w + 7) // 8
