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
T_LIST_F32 = 5  # embedding columns: list<float32>
T_LIST_F64 = 6  # list<float64>
T_LIST_I64 = 7  # list<int32/int64>

NULL_ALLONES = 0  # no nulls
NULL_ALLZEROS = 1  # all null
NULL_BITMAP = 2  # packed validity bitset
NULL_BITMAP_Z = 3  # zlib'd packed validity bitset
NULL_ROARING = 4  # roaring-style container (array/run of minority side)

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

_LIST_CHILD_OF_TYPE = {
    T_LIST_F32: pa.float32(),
    T_LIST_F64: pa.float64(),
    T_LIST_I64: pa.int64(),
}


def _list_type_code(atype: pa.DataType) -> int | None:
    if not (pa.types.is_list(atype) or pa.types.is_large_list(atype)):
        return None
    child = atype.value_type
    if pa.types.is_float32(child):
        return T_LIST_F32
    if pa.types.is_float64(child):
        return T_LIST_F64
    if pa.types.is_int64(child) or pa.types.is_int32(child):
        return T_LIST_I64
    return None


def _encode_list_pieces(
    arr: pa.Array, type_code: int, level: int, seed: int
) -> list:
    """List column block: offsets cascade through the int codec; float32
    values ride raw (entropy-coding random mantissas never wins and
    embeddings decode straight into numpy); float64/int64 values go
    through the numeric picker. Null lists become empty (the block's null
    bitmap restores them)."""
    import pyarrow.compute as pc

    lengths = pc.list_value_length(arr)
    if arr.null_count:
        lengths = lengths.fill_null(0)
    lengths_np = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(arr) + 1, np.int64)
    np.cumsum(lengths_np, out=offsets[1:])
    values = pc.list_flatten(arr)
    offsets_blob = numeric.encode(offsets, level, seed)
    if type_code == T_LIST_F32:
        v = values.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
        val_pieces = [np.ascontiguousarray(v)]
    elif type_code == T_LIST_F64:
        v = values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        val_pieces = numeric.encode_pieces(np.ascontiguousarray(v), level, seed)
    else:
        v = values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        val_pieces = numeric.encode_pieces(np.ascontiguousarray(v), level, seed)
    return [
        struct.pack("<IQ", len(offsets_blob), int(offsets[-1])),
        offsets_blob,
        *val_pieces,
    ]


def _decode_list(buf: memoryview, pos: int, type_code: int, n: int) -> pa.Array:
    offsets_len, n_values = struct.unpack_from("<IQ", buf, pos)
    pos += 12
    offsets, _ = numeric.decode(buf, pos, "i")
    pos += offsets_len
    child = _LIST_CHILD_OF_TYPE[type_code]
    if type_code == T_LIST_F32:
        values = np.frombuffer(buf, np.float32, int(n_values), pos)
        varr = pa.array(values, pa.float32())
    else:
        v, _ = numeric.decode(buf, pos, "f" if type_code == T_LIST_F64 else "i")
        varr = pa.array(v, child)
    return pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), varr)


def _rebuild_list_with_nulls(arr: pa.Array, validity: np.ndarray) -> pa.Array:
    return pa.LargeListArray.from_arrays(
        arr.offsets, arr.values, mask=pa.array(~validity)
    )


def _roaring_encode(validity: np.ndarray) -> bytes | None:
    """Roaring-style single-container nullmap for one <=65536-row block
    (mirrors the reference's Roaring usage incl. FLIPPED mode,
    ``btrblocks/extern/RoaringBitmap.cpp:117-159``): encode whichever
    side (nulls or valids) is the minority, as either a sorted uint16
    position array (<= 4096 entries) or (start, len-1) uint16 run pairs
    — whichever is smaller. Returns None when neither beats giving up
    (caller falls back to the bitmap kinds).

    Layout: ``u8 container(0=array,1=runs) | u8 flipped | u16 count |
    u16 payload[]`` — little-endian, O(1)-seekable, no bit twiddling on
    decode (positions scatter straight into a bool array)."""
    n = len(validity)
    if n > 65536:
        return None
    n_valid = int(validity.sum())
    flipped = n_valid < n - n_valid  # minority = valids -> flip
    minority = validity if flipped else ~validity
    pos = np.flatnonzero(minority).astype(np.uint16)
    k = len(pos)
    # runs of the minority side
    breaks = np.flatnonzero(np.diff(pos.astype(np.int64)) > 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [k - 1]))
    r = len(starts)
    arr_bytes, run_bytes = 2 * k, 4 * r
    if min(arr_bytes, run_bytes) + 4 >= n // 8:  # bitmap wins
        return None
    if arr_bytes <= run_bytes:
        # explicit little-endian so the on-disk layout matches the spec
        # on big-endian hosts too (files stay portable)
        payload = pos.astype("<u2").tobytes()
        container, count = 0, k
    else:
        pairs = np.empty(2 * r, np.uint16)
        pairs[0::2] = pos[starts]
        pairs[1::2] = (pos[ends].astype(np.int64)
                       - pos[starts].astype(np.int64)).astype(np.uint16)
        payload = pairs.astype("<u2").tobytes()
        container, count = 1, r
    # count < n/2 <= 32768 (minority side), so u16 never wraps
    return struct.pack("<BBH", container, int(flipped), count) + payload


def _roaring_decode(payload: memoryview, n: int) -> np.ndarray:
    container, flipped, count = struct.unpack_from("<BBH", payload, 0)
    body = np.frombuffer(payload, "<u2", offset=4)
    minority = np.zeros(n, bool)
    if container == 0:
        minority[body.astype(np.int64)] = True
    else:
        starts = body[0::2].astype(np.int64)
        lens = body[1::2].astype(np.int64) + 1
        # vectorized run scatter: one diff array + cumsum
        d = np.zeros(n + 1, np.int64)
        np.add.at(d, starts, 1)
        np.add.at(d, starts + lens, -1)
        minority = np.cumsum(d[:-1]) > 0
    return minority if flipped else ~minority


def _encode_validity(arr: pa.Array) -> tuple[int, bytes, np.ndarray | None]:
    n = len(arr)
    if arr.null_count == 0:
        return NULL_ALLONES, b"", None
    if arr.null_count == n:
        return NULL_ALLZEROS, b"", np.zeros(n, bool)
    validity = np.asarray(arr.is_valid())
    roar = _roaring_encode(validity)
    packed = np.packbits(validity).tobytes()
    z = zlib.compress(packed, 1)
    best_kind, best = NULL_BITMAP, packed
    if len(z) < len(best):
        best_kind, best = NULL_BITMAP_Z, z
    if roar is not None and len(roar) < len(best):
        best_kind, best = NULL_ROARING, roar
    return best_kind, best, validity


def _decode_validity(
    kind: int, payload: memoryview, n: int
) -> np.ndarray | None:
    if kind == NULL_ALLONES:
        return None
    if kind == NULL_ALLZEROS:
        return np.zeros(n, bool)
    if kind == NULL_ROARING:
        return _roaring_decode(payload, n)
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
        type_code = _list_type_code(atype)
    if type_code is None:
        raise TypeError(f"unsupported block type {atype}")
    n = len(arr)
    null_kind, null_payload, _ = _encode_validity(arr)

    if type_code in (T_LIST_F32, T_LIST_F64, T_LIST_I64):
        payload = _encode_list_pieces(arr, type_code, level, seed)
    elif type_code in (T_STRING, T_BINARY):
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
    if buf.format != "B":  # pyarrow buffers view as signed 'b'
        buf = buf.cast("B")
    magic, type_code, null_kind, n, null_len = struct.unpack_from("<HBBII", buf, 0)
    if magic != MAGIC:
        raise ValueError("bad block magic")
    pos = 12
    validity = _decode_validity(null_kind, buf[pos : pos + null_len], n)
    pos += null_len

    if type_code in (T_LIST_F32, T_LIST_F64, T_LIST_I64):
        arr = _decode_list(buf, pos, type_code, n)
        if validity is not None:
            arr = _rebuild_list_with_nulls(arr, validity)
        return arr
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
    if buf.format != "B":  # pyarrow buffers view as signed 'b'
        buf = buf.cast("B")
    _, type_code, null_kind, n, null_len = struct.unpack_from("<HBBII", buf, 0)
    pos = 12 + null_len
    if type_code in (T_STRING, T_BINARY):
        tree = strings.scheme_tree(buf, pos)
    else:
        tree = numeric.scheme_tree(buf, pos)
    return {
        "type": {
            0: "int32", 1: "int64", 2: "double", 3: "string", 4: "binary",
            5: "list<f32>", 6: "list<f64>", 7: "list<i64>",
        }[type_code],
        "rows": n,
        "null_kind": null_kind,
        **tree,
    }
