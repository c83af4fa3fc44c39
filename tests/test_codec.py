"""Codec round-trip + picker tests.

Mirrors the reference's test strategy (SURVEY.md §5): scheme-targeted
synthetic distributions (test/DatasetGenerator.cpp analogs), forced-scheme
round trips (test/test-cases/V1.cpp, V2.cpp), and picker assertions.
All seeds fixed; exact equality required.
"""

import numpy as np
import pyarrow as pa
import pytest

from btrblocks_spark.codec import block, numeric, strings
from btrblocks_spark.codec.picker import pick_numeric

N = 65536


def rng(seed=42):
    return np.random.default_rng(seed)


# ------------------------------------------------------- fixture columns
def int_one_value():
    return np.full(N, 100, np.int64)  # DatasetGenerator.cpp:44-49


def int_dict8():
    RNG = rng(1)
    return RNG.integers(0, 255, N).astype(np.int64) * 7 + 1000


def int_rle():
    # runs of ~20, 70% repeat probability (DatasetGenerator.cpp:269-289)
    RNG = rng(2)
    runs = RNG.integers(1, 40, 6000)
    vals = RNG.integers(0, 1000, 6000)
    return np.repeat(vals, runs)[:N].astype(np.int64)


def int_frequency():
    RNG = rng(3)
    v = np.full(N, 7777, np.int64)  # 98% top value (:290-306)
    idx = RNG.choice(N, N // 50, replace=False)
    v[idx] = RNG.integers(0, 10**6, len(idx))
    return v


def int_truncate():
    RNG = rng(4)
    return (RNG.integers(0, 200, N) + 10**9).astype(np.int64)


def int_sorted_delta():
    RNG = rng(5)
    return np.cumsum(RNG.integers(0, 5, N)).astype(np.int64)


def int64_phash_like():
    RNG = rng(6)
    base = RNG.integers(0, 2**62, N, dtype=np.int64)
    return np.sort(base)


def double_one_value():
    return np.full(N, 3.25, np.float64)


def double_dict():
    RNG = rng(7)
    pool = RNG.uniform(-1000, 1000, 255)
    return pool[RNG.integers(0, 255, N)]


def double_decimal():
    RNG = rng(8)
    return RNG.integers(-10**6, 10**6, N).astype(np.float64) / 100.0


def double_decimal_patched():
    RNG = rng(9)
    v = double_decimal()
    idx = RNG.choice(N, N // 20, replace=False)
    v[idx] = RNG.standard_normal(len(idx)) * np.pi
    return v


def double_frequency():
    RNG = rng(10)
    v = np.full(N, 0.5, np.float64)
    idx = RNG.choice(N, N // 50, replace=False)
    v[idx] = RNG.uniform(-1, 1, len(idx))
    return v


def double_random():
    RNG = rng(11)
    return RNG.uniform(-999999, 999999, N)


NUMERIC_FIXTURES = {
    "int_one_value": (int_one_value, numeric.ONE_VALUE),
    "int_dict8": (int_dict8, numeric.DICT),
    "int_rle": (int_rle, numeric.RLE),
    "int_frequency": (int_frequency, None),  # FREQUENCY or DICT both fine
    "int_truncate": (int_truncate, numeric.FOR_BP),
    "int_sorted_delta": (int_sorted_delta, numeric.DELTA_BP),
    "int64_phash_like": (int64_phash_like, None),
    "double_one_value": (double_one_value, numeric.ONE_VALUE),
    "double_dict": (double_dict, numeric.DICT),
    "double_decimal": (double_decimal, numeric.PSEUDODECIMAL),
    "double_decimal_patched": (double_decimal_patched, numeric.PSEUDODECIMAL),
    "double_frequency": (double_frequency, None),
    "double_random": (double_random, numeric.UNCOMPRESSED),
}


@pytest.mark.parametrize("name", NUMERIC_FIXTURES)
def test_numeric_roundtrip_picked(name):
    gen, expected_scheme = NUMERIC_FIXTURES[name]
    v = gen()
    blob = numeric.encode(v, level=3, seed=42)
    out, consumed = numeric.decode(
        memoryview(blob), 0, "f" if v.dtype == np.float64 else "i"
    )
    assert consumed == len(blob)
    np.testing.assert_array_equal(out, v)
    if expected_scheme is not None:
        assert blob[0] == expected_scheme, (
            f"{name}: picked {numeric.SCHEME_NAMES[blob[0]]}, "
            f"expected {numeric.SCHEME_NAMES[expected_scheme]}"
        )
    # compression must never be materially worse than raw (TestHelper.cpp:22)
    if expected_scheme not in (numeric.UNCOMPRESSED, None):
        assert len(blob) < v.nbytes


FORCED = [numeric.UNCOMPRESSED, numeric.DICT, numeric.RLE, numeric.FOR_BP,
          numeric.FREQUENCY]


@pytest.mark.parametrize("scheme", FORCED)
def test_numeric_forced_scheme(scheme):
    v = int_rle()
    blob = numeric.encode(v, level=3, seed=42, force_scheme=scheme)
    assert blob[0] == scheme
    out, _ = numeric.decode(memoryview(blob), 0, "i")
    np.testing.assert_array_equal(out, v)


def test_delta_bp_forced_sorted():
    v = int_sorted_delta()
    blob = numeric.encode(v, 3, 42, force_scheme=numeric.DELTA_BP)
    out, _ = numeric.decode(memoryview(blob), 0, "i")
    np.testing.assert_array_equal(out, v)


def test_pseudodecimal_patches_nan_inf():
    v = np.array([1.25, np.nan, np.inf, -np.inf, 0.1, 1e300], np.float64)
    blob = numeric.encode(v, 3, 42, force_scheme=numeric.PSEUDODECIMAL)
    out, _ = numeric.decode(memoryview(blob), 0, "f")
    np.testing.assert_array_equal(out, v)


# ------------------------------------------------------- string fixtures
def _make_strings(values):
    arr = pa.array(values, pa.large_binary())
    return strings.from_arrow(arr)


def string_one_value():
    return _make_strings([b"Hello Compression !"] * 5000)


def string_dict():
    pool = [f"val-{i:04d}".encode() for i in range(255)]
    RNG = rng(12)
    idx = RNG.integers(0, 255, 20000)
    return _make_strings([pool[i] for i in idx])


def string_fsst_like():
    words = ["spark", "columnar", "block", "codec", "lake", "house", "image"]
    vals = [
        " ".join(words[j % len(words)] for j in range(i, i + 8)).encode()
        + f"-{i}".encode()
        for i in range(8000)
    ]
    return _make_strings(vals)


STRING_FIXTURES = {
    "string_one_value": (string_one_value, strings.ONE_VALUE),
    "string_dict": (string_dict, strings.DICT),
    "string_fsst_like": (string_fsst_like, strings.POOL_COMPRESS),
}


@pytest.mark.parametrize("name", STRING_FIXTURES)
def test_string_roundtrip_picked(name):
    gen, expected = STRING_FIXTURES[name]
    offsets, pool = gen()
    blob = strings.encode(offsets, pool, level=3, seed=42)
    out_off, out_pool, consumed = strings.decode(memoryview(blob), 0)
    assert consumed == len(blob)
    np.testing.assert_array_equal(out_off, offsets)
    assert out_pool == pool
    assert blob[0] == expected, f"{name}: got {strings.SCHEME_NAMES[blob[0]]}"
    if expected != strings.UNCOMPRESSED:
        assert len(blob) < len(pool) + offsets.nbytes


# ------------------------------------------------------- block container
@pytest.mark.parametrize(
    "arr",
    [
        pa.array(np.arange(1000, dtype=np.int32)),
        pa.array(np.arange(1000, dtype=np.int64) * 1000),
        pa.array(rng(14).uniform(0, 1, 1000)),
        pa.array([f"cap {i % 17}" for i in range(1000)], pa.large_string()),
        pa.array([bytes([i % 250]) * (i % 50) for i in range(1000)], pa.large_binary()),
    ],
    ids=["int32", "int64", "double", "string", "binary"],
)
def test_block_roundtrip(arr):
    blob = block.encode_block(arr)
    out = block.decode_block(blob)
    assert out.cast(arr.type).equals(arr)


def test_block_nulls_mixed():
    # 30% nulls interleaved (FIXTURES.md nulls_mixed)
    n = 10000
    RNG = rng(13)
    mask = RNG.uniform(0, 1, n) < 0.3
    ints = pa.array(
        [None if m else int(i % 100) for i, m in enumerate(mask)], pa.int32()
    )
    strs = pa.array(
        [None if m else f"s{i % 50}" for i, m in enumerate(mask)], pa.large_string()
    )
    for arr in (ints, strs):
        out = block.decode_block(block.encode_block(arr))
        assert out.cast(arr.type).equals(arr)


def test_block_all_nulls():
    arr = pa.array([None] * 100, pa.int64())
    out = block.decode_block(block.encode_block(arr))
    assert out.cast(arr.type).equals(arr)


def test_block_scheme_tree():
    arr = pa.array(np.repeat(np.arange(10, dtype=np.int64), 1000))
    tree = block.block_scheme_tree(block.encode_block(arr))
    assert tree["type"] == "int64"
    assert tree["scheme"] in ("RLE", "DICT", "FOR_BP")


def test_picker_one_value_short_circuit():
    assert pick_numeric(np.full(100, 5, np.int64), 3, 42) == numeric.ONE_VALUE


def test_picker_level0_uncompressed():
    assert pick_numeric(int_rle(), 0, 42) == numeric.UNCOMPRESSED


def test_empty_arrays():
    for arr in (pa.array([], pa.int64()), pa.array([], pa.large_string())):
        out = block.decode_block(block.encode_block(arr))
        assert len(out) == 0


def test_split_by_partition_null_keys():
    import json

    import pyarrow as pa

    from btrblocks_spark.sources.blockfile import split_by_partition

    t = pa.table(
        {
            "fmt": ["png", None, "png", None],
            "v": [1, 2, 3, 4],
        }
    )
    groups = split_by_partition(t, ["fmt"])
    by_key = {json.loads(p)["fmt"]: sub for p, sub in groups}
    assert set(by_key) == {"png", None}
    assert by_key[None].column("v").to_pylist() == [2, 4]
    assert by_key["png"].column("v").to_pylist() == [1, 3]


def test_pfor_patched_roundtrip_and_picker():
    """Patched PFOR (PBP.cpp:18-57 semantics): outlier-salted ints pack
    at the narrow base width with exceptions patched; the picker must
    choose PFOR there and it must beat plain FOR_BP by a wide margin."""
    import numpy as np

    from btrblocks_spark.codec import numeric
    from btrblocks_spark.codec.picker import pick_numeric

    rng = np.random.default_rng(7)
    v = rng.integers(0, 200, 65536).astype(np.int64)
    v[rng.choice(65536, 30, replace=False)] = 2**40  # stray sentinels

    blob = numeric.encode(v, 3, 42, force_scheme=numeric.PFOR)
    out, consumed = numeric.decode(memoryview(blob), 0, "i")
    assert np.array_equal(out, v) and consumed == len(blob)

    for_blob = numeric.encode(v, 3, 42, force_scheme=numeric.FOR_BP)
    assert len(for_blob) > 4 * len(blob)
    assert pick_numeric(v, 3, 42) == numeric.PFOR

    # no-outlier column: FOR_BP (fewer headers) still wins
    v2 = rng.integers(0, 1000, 65536).astype(np.int64)
    assert pick_numeric(v2, 3, 42) == numeric.FOR_BP

    # negative + extreme ranges round-trip
    v3 = rng.integers(-(2**62), 2**62, 4096).astype(np.int64)
    b3 = numeric.encode(v3, 3, 42, force_scheme=numeric.PFOR)
    o3, c3 = numeric.decode(memoryview(b3), 0, "i")
    assert np.array_equal(o3, v3) and c3 == len(b3)


def test_dict_pool_fsst_wins_on_caption_text():
    """The DICT dictionary pool competes FSST vs zlib (the reference
    FSSTs dict pools >= 16 KiB, DynamicDictionary.cpp:54-56). On
    natural-language-like caption pools (diverse short-range structure,
    little long-range repetition) FSST must win and round-trip."""
    import random

    import pyarrow as pa

    from btrblocks_spark.codec import strings

    random.seed(1)
    syll = ["ka", "ro", "mi", "ta", "lu", "en", "so", "vi", "ne", "da",
            "pol", "gra", "shi", "tem"]

    def word():
        return "".join(random.choices(syll, k=random.randint(2, 4)))

    caps = [" ".join(word() for _ in range(10)).encode() for _ in range(4000)]
    vals = [random.choice(caps) for _ in range(40000)]
    arr = pa.array(vals, pa.large_binary())
    off, pool = strings.from_arrow(arr)
    blob = strings.encode(off, pool, 3, 42, force_scheme=strings.DICT)
    tree = strings.scheme_tree(memoryview(blob))
    assert tree["pool_codec"] == "fsst", tree
    o2, p2, _ = strings.decode(memoryview(blob), 0)
    assert strings.to_arrow(o2, p2).equals(arr)
    assert len(blob) < int(pool.nbytes) if hasattr(pool, "nbytes") else True


def test_dict_pool_zlib_wins_on_repetitive_text():
    """Highly repetitive pools (tiny vocabulary) stay with zlib — the
    probe competition must not regress them."""
    import random

    import pyarrow as pa

    from btrblocks_spark.codec import strings

    random.seed(3)
    words = "the quick brown fox jumps over a lazy dog".split()
    caps = [" ".join(random.choices(words, k=12)).encode()
            for _ in range(3000)]
    vals = [random.choice(caps) for _ in range(30000)]
    arr = pa.array(vals, pa.large_binary())
    off, pool = strings.from_arrow(arr)
    blob = strings.encode(off, pool, 3, 42, force_scheme=strings.DICT)
    tree = strings.scheme_tree(memoryview(blob))
    assert tree["pool_codec"] == "zlib", tree
    o2, p2, _ = strings.decode(memoryview(blob), 0)
    assert strings.to_arrow(o2, p2).equals(arr)


def test_roaring_nullmap_containers():
    """Roaring-style nullmap (RoaringBitmap.cpp:117-159 flipping parity):
    sparse nulls -> uint16 position array, clustered nulls -> run pairs,
    mostly-null -> flipped minority; dense random nulls fall back to the
    bitmap kinds. All round-trip exactly."""
    import numpy as np
    import pyarrow as pa

    from btrblocks_spark.codec.block import (
        NULL_BITMAP,
        NULL_BITMAP_Z,
        NULL_ROARING,
        decode_block,
        encode_block,
    )
    from btrblocks_spark.codec import block as blockmod

    def kind_of(blob):
        import struct

        return struct.unpack_from("<HBBII", blob, 0)[2]

    n = 65536
    rng = np.random.default_rng(7)

    def roundtrip(mask):
        vals = rng.integers(0, 1000, n)
        arr = pa.array(
            [None if m else int(v) for m, v in zip(mask, vals)],
            pa.int64(),
        )
        blob = encode_block(arr)
        back = decode_block(blob)
        assert back.equals(arr)
        return kind_of(blob)

    # sparse scattered nulls -> array container
    sparse = np.zeros(n, bool)
    sparse[rng.choice(n, 50, replace=False)] = True
    assert roundtrip(sparse) == NULL_ROARING

    # clustered nulls -> run container beats 100 positions
    clustered = np.zeros(n, bool)
    clustered[1000:3000] = True
    clustered[60000:61000] = True
    assert roundtrip(clustered) == NULL_ROARING

    # mostly-null block -> flipped minority (valids) container
    mostly = np.ones(n, bool)
    mostly[rng.choice(n, 40, replace=False)] = False
    assert roundtrip(mostly) == NULL_ROARING

    # dense random nulls -> roaring loses to the packed bitmap kinds
    dense = rng.random(n) < 0.5
    assert roundtrip(dense) in (NULL_BITMAP, NULL_BITMAP_Z)

    # direct container checks
    blob = blockmod._roaring_encode(~sparse)
    assert blob is not None and blob[0] == 0  # array container
    blob = blockmod._roaring_encode(~clustered)
    assert blob is not None and blob[0] == 1  # run container
