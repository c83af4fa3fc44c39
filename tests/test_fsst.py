"""FSST codec: roundtrip, format edge cases, determinism, scheme plumbing.

The reference links libfsst in as its string scheme
(``/root/reference/btrblocks/scheme/string/Fsst.cpp``); codec/fsst.py is a
real numpy FSST (symbol table + escape-255 format). These tests pin the
format invariants the vectorized decoder depends on — especially escape
runs, where consecutive 0xFF bytes must parse as escape pairs.
"""

import numpy as np
import pyarrow as pa
import pytest

from btrblocks_spark.codec import block, fsst, strings


def _roundtrip(data: bytes):
    blob = fsst.compress(data)
    assert fsst.decompress(blob) == data
    return blob


def test_text_roundtrip_and_ratio():
    rng = np.random.default_rng(7)
    vocab = "photo image cat dog tree mountain river sky red blue green".split()
    text = " ".join(vocab[i] for i in rng.integers(0, len(vocab), 40000)).encode()
    blob = _roundtrip(text)
    assert len(blob) < len(text) / 2  # natural language compresses >2x


def test_edge_cases():
    _roundtrip(b"")
    _roundtrip(b"x")
    _roundtrip(b"\xff")
    _roundtrip(b"\xff" * 3)
    _roundtrip(b"\xff" * 4096)  # long escape runs (all parity paths)
    _roundtrip(bytes(range(256)) * 10)
    _roundtrip(b"\xfe\xff" * 1000)  # escapes adjacent to high bytes


def test_random_bytes_roundtrip():
    rng = np.random.default_rng(3)
    _roundtrip(bytes(rng.integers(0, 256, 50000, dtype=np.uint8)))
    _roundtrip(bytes(rng.integers(250, 256, 20000, dtype=np.uint8)))


def test_deterministic():
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(97, 110, 30000, dtype=np.uint8))
    assert fsst.compress(data) == fsst.compress(data)


def test_symbol_table_roundtrip():
    rng = np.random.default_rng(9)
    data = ("abcdefgh " * 200 + "xy " * 500).encode()
    table = fsst.train(np.frombuffer(data, np.uint8))
    ser = table.serialize()
    back, consumed = fsst.SymbolTable.deserialize(memoryview(ser), 0)
    assert consumed == len(ser)
    assert (back.values == table.values).all()
    assert (back.lengths == table.lengths).all()
    assert len(table.values) <= fsst.MAX_SYMBOLS
    assert (table.lengths >= 1).all() and (table.lengths <= 8).all()


def test_string_scheme_fsst_forced():
    vals = [f"a photo of a {w} in the {p}" for w in ("cat", "dog", "car") for p in ("sky", "city", "park")] * 300
    arr = pa.array(vals, pa.large_binary())
    offs, pool = strings.from_arrow(arr)
    blob = strings.encode(offs, pool, 3, 42, force_scheme=strings.FSST)
    o2, p2, consumed = strings.decode(memoryview(blob), 0)
    assert consumed == len(blob)
    assert (o2 == offs).all()
    assert bytes(p2) == bytes(pool)
    assert strings.scheme_tree(memoryview(blob))["scheme"] == "FSST"


def test_block_layer_fsst():
    vals = ["caption text with words %d" % (i % 50) for i in range(3000)]
    arr = pa.array(vals, pa.large_string())
    blob = block.encode_block(arr, force_scheme=strings.FSST)
    out = block.decode_block(blob)
    assert out.cast(pa.string()).to_pylist() == vals


def test_picker_considers_fsst_on_unique_text():
    # high-unique natural text over the 16 KiB gate: candidates are
    # POOL_COMPRESS and FSST; whichever wins, the roundtrip must hold
    rng = np.random.default_rng(11)
    vocab = "mountain river city street person sky cloud tree".split()
    vals = [
        " ".join(vocab[j] for j in rng.integers(0, len(vocab), 12)) + f" #{i}"
        for i in range(2000)
    ]
    arr = pa.array(vals, pa.large_binary())
    offs, pool = strings.from_arrow(arr)
    picked = strings.pick_string(offs, pool, 3, 42)
    assert picked in (strings.POOL_COMPRESS, strings.FSST)
    blob = strings.encode(offs, pool, 3, 42)
    o2, p2, _ = strings.decode(memoryview(blob), 0)
    assert bytes(p2) == bytes(pool)


def test_decode_from_signed_memoryview_large_symbol_table():
    """Zero-copy scan slices are pyarrow-buffer memoryviews, which view
    as SIGNED 'b': a symbol table with >= 128 symbols then read a
    negative count via single-byte indexing (r4 regression — corrupted
    whole-file decodes for FSST pools with large tables)."""
    rng = np.random.default_rng(11)
    # many distinct frequent pairs -> large trained symbol table
    vocab = [bytes([a, b]) for a in range(65, 91) for b in range(97, 122)]
    data = b" ".join(
        vocab[i] * 4 for i in rng.integers(0, len(vocab), 30000)
    )
    table = fsst.train(np.frombuffer(data, np.uint8))
    assert len(table.values) >= 128, "fixture must exercise count >= 128"
    blob = fsst.compress(data)
    # present the blob through a SIGNED memoryview, as pyarrow buffers do
    buf = pa.py_buffer(blob)
    signed = memoryview(buf)
    assert signed.format == "b"
    assert fsst.decompress(signed) == data

    # and through the block layer, as decode_batches slices blobs
    arr = pa.array([data[:2000]] * 64, pa.binary())
    enc = block.encode_block(arr)
    signed_block = memoryview(pa.py_buffer(enc))
    assert block.decode_block(signed_block).equals(
        block.decode_block(enc)
    )
