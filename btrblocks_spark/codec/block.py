"""Self-describing compressed block container.

One block = one column slice of <= 65536 tuples, serialized as:

    u16 magic | u8 type_code | u8 null_kind | u32 tuple_count |
    u32 null_payload_len | null payload | scheme blob

the analog of the reference's ``ColumnChunkMeta`` + payload + compressed
nullmap (``/root/reference/btrblocks/compression/Datablock.hpp:12-21``,
``Datablock.cpp:54-148``).

Null bitmap kinds mirror the reference's 4 physical bitmap types
(``/root/reference/btrblocks/extern/RoaringBitmap.cpp:117-159``):
ALLONES / ALLZEROS cost 0 bytes; the mixed case stores a packed validity
bitset, zlib-entropy-coded when that wins (stand-in for Roaring
REGULAR/FLIPPED). As in the reference, null slots hold NULL_CODE (0 / empty
string) and participate in the value encoding (NumberStats.hpp:89,
RLE.hpp:35-46 — nulls extend runs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from btrblocks_spark.codec import numeric, strings

MAGIC = 0xB7B1

T_INT32 = 0
T_INT64 = 1
T_DOUBLE = 2
T_STRING = 3
T_BINARY = 4

NULL_ALLONES = 0  # no nulls
NULL_ALLZEROS = 1  # all null
NULL_BITMAP = 2  # packed validity bitset
NULL_BITMAP_Z = 3  # zlib'd packed validity bitset

_TYPE_OF_ARROW = {
    pa.int32(): T_INT32,
    pa.int64(): T_INT64,
    pa.float64(): T_DOUBLE,
    pa.string(): T_STRING,
    pa.large_string(): T_STRING,
    pa.binary(): T_BINARY,
    pa.large_binary(): T_BINARY,
}

_ARROW_OF_TYPE = {
    T_INT32: pa.int32(),
    T_INT64: pa.int64(),
    T_DOUBLE: pa.float64(),
    T_STRING: pa.large_string(),
    T_BINARY: pa.large_binary(),
}


def _encode_validity(arr: pa.Array) -> tuple[int, bytes, np.ndarray | None]:
    n = len(arr)
    if arr.null_count == 0:
        return NULL_ALLONES, b"", None
    if arr.null_count == n:
        return NULL_ALLZEROS, b"", np.zeros(n, bool)
    validity = np.asarray(arr.is_valid())
    packed = np.packbits(validity).tobytes()
    z = zlib.compress(packed, 1)
    if len(z) < len(packed):
        return NULL_BITMAP_Z, z, validity
    return NULL_BITMAP, packed, validity


def _decode_validity(
    kind: int, payload: memoryview, n: int
) -> np.ndarray | None:
    if kind == NULL_ALLONES:
        return None
    if kind == NULL_ALLZEROS:
        return np.zeros(n, bool)
    raw = zlib.decompress(bytes(payload)) if kind == NULL_BITMAP_Z else bytes(payload)
    return np.unpackbits(np.frombuffer(raw, np.uint8))[:n].astype(bool)


def encode_block(
    arr: pa.Array,
    level: int = 3,
    seed: int = 42,
    force_scheme: int | None = None,
) -> bytes:
    """Encode one Arrow array (one column block) into a compressed blob."""
    return b"".join(encode_block_pieces(arr, level, seed, force_scheme))


def encode_block_pieces(
    arr: pa.Array,
    level: int = 3,
    seed: int = 42,
    force_scheme: int | None = None,
) -> list:
    """Encode one column block as bytes-like pieces (callers join once)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    atype = arr.type
    if pa.types.is_timestamp(atype):
        arr = arr.cast(pa.int64())
        atype = arr.type
    if pa.types.is_float32(atype):
        arr = arr.cast(pa.float64())
        atype = arr.type
    type_code = _TYPE_OF_ARROW.get(atype)
    if type_code is None:
        raise TypeError(f"unsupported block type {atype}")
    n = len(arr)
    null_kind, null_payload, _ = _encode_validity(arr)

    if type_code in (T_STRING, T_BINARY):
        offsets, pool = strings.from_arrow(arr)
        payload = strings.encode_pieces(offsets, pool, level, seed, force_scheme)
    else:
        if arr.null_count:
            arr_filled = arr.fill_null(0)
        else:
            arr_filled = arr
        v = arr_filled.to_numpy(zero_copy_only=False)
        if type_code == T_INT32 or type_code == T_INT64:
            v = v.astype(np.int64, copy=False)
        payload = numeric.encode_pieces(
            np.ascontiguousarray(v), level, seed, force_scheme=force_scheme
        )
    return [
        struct.pack("<HBBII", MAGIC, type_code, null_kind, n, len(null_payload)),
        null_payload,
        *payload,
    ]


def decode_block(blob: bytes | memoryview) -> pa.Array:
    """Decode a blob back into an Arrow array (nulls restored)."""
    buf = memoryview(blob)
    magic, type_code, null_kind, n, null_len = struct.unpack_from("<HBBII", buf, 0)
    if magic != MAGIC:
        raise ValueError("bad block magic")
    pos = 12
    validity = _decode_validity(null_kind, buf[pos : pos + null_len], n)
    pos += null_len

    if type_code in (T_STRING, T_BINARY):
        offsets, pool, _ = strings.decode(buf, pos)
        arr = strings.to_arrow(offsets, pool)
        if type_code == T_STRING:
            arr = arr.cast(pa.large_string())
    else:
        kind = "f" if type_code == T_DOUBLE else "i"
        v, _ = numeric.decode(buf, pos, kind)
        if type_code == T_INT32:
            v = v.astype(np.int32)
        arr = pa.array(v)
    if validity is not None:
        mask = pa.array(~validity)
        arr = pa.compute.if_else(mask, pa.nulls(n, arr.type), arr)
    return arr


def block_scheme_tree(blob: bytes | memoryview) -> dict:
    """btrmeta-style description of the scheme tree inside a blob."""
    buf = memoryview(blob)
    _, type_code, null_kind, n, null_len = struct.unpack_from("<HBBII", buf, 0)
    pos = 12 + null_len
    if type_code in (T_STRING, T_BINARY):
        tree = strings.scheme_tree(buf, pos)
    else:
        tree = numeric.scheme_tree(buf, pos)
    return {
        "type": {0: "int32", 1: "int64", 2: "double", 3: "string", 4: "binary"}[
            type_code
        ],
        "rows": n,
        "null_kind": null_kind,
        **tree,
    }
