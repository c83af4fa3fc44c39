"""Property-based roundtrip invariants for the codec stack (hypothesis).

The reference pins its schemes with targeted gtest cases
(``/root/reference/test/test-cases/``); these go further: any int64 /
float64 / byte-string content, any null pattern, any forced or picked
scheme must decode to exactly what was encoded.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from btrblocks_spark.codec import block, fsst, numeric, strings

_SETTINGS = dict(max_examples=60, deadline=None)


@settings(**_SETTINGS)
@given(
    arrays(
        np.int64,
        st.integers(0, 400),
        elements=st.integers(-(2**62), 2**62),
    )
)
def test_numeric_int_roundtrip(v):
    blob = numeric.encode(v, 3, 42)
    out, consumed = numeric.decode(memoryview(blob), 0, "i")
    assert consumed == len(blob)
    assert (out == v).all()


@settings(**_SETTINGS)
@given(
    arrays(
        np.float64,
        st.integers(0, 400),
        elements=st.floats(allow_nan=True, allow_infinity=True, width=64),
    )
)
def test_numeric_double_roundtrip(v):
    blob = numeric.encode(v, 3, 42)
    out, consumed = numeric.decode(memoryview(blob), 0, "f")
    assert consumed == len(blob)
    # NaN-stable bit-pattern equality
    assert (out.view(np.int64) == v.view(np.int64)).all()


@settings(**_SETTINGS)
@given(st.lists(st.binary(min_size=0, max_size=60), max_size=200))
def test_string_roundtrip(vals):
    arr = pa.array(vals, pa.large_binary())
    offs, pool = strings.from_arrow(arr)
    blob = strings.encode(offs, pool, 3, 42)
    o2, p2, consumed = strings.decode(memoryview(blob), 0)
    assert consumed == len(blob)
    assert (o2 == offs).all()
    assert bytes(p2) == bytes(pool)


@settings(**_SETTINGS)
@given(st.binary(min_size=0, max_size=4000))
def test_fsst_roundtrip(data):
    assert fsst.decompress(fsst.compress(data)) == data


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)), max_size=200
    )
)
def test_block_nullable_int_roundtrip(vals):
    arr = pa.array(vals, pa.int64())
    out = block.decode_block(block.encode_block(arr))
    assert out.to_pylist() == vals


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=30)), max_size=150
    )
)
def test_block_nullable_string_roundtrip(vals):
    arr = pa.array(vals, pa.large_string())
    out = block.decode_block(block.encode_block(arr))
    assert out.to_pylist() == vals


@given(
    arrays(np.bool_, st.integers(min_value=2, max_value=3000)),
)
@settings(max_examples=60, deadline=None)
def test_roaring_validity_roundtrip(validity):
    """Any mixed validity mask round-trips through the roaring
    container when it qualifies; decode is exact either way."""
    n = len(validity)
    blob = block._roaring_encode(validity)
    if blob is None:
        return  # bitmap kinds win; covered by other round-trips
    back = block._roaring_decode(memoryview(blob), n)
    assert np.array_equal(back, validity)


@given(
    st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=300),
    st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=50),
)
@settings(max_examples=40, deadline=None)
def test_bloom_never_false_negative_ints(keys, probes):
    import numpy as np

    from btrblocks_spark.codec.bloom import (
        bloom_may_contain_any,
        build_bloom,
    )

    bl = build_bloom(np.asarray(keys, np.int64))
    # every inserted key must probe positive, alone and in any batch
    for k in keys[:20]:
        assert bloom_may_contain_any(bl, np.asarray([k], np.int64))
    assert bloom_may_contain_any(
        bl, np.asarray(probes + [keys[0]], np.int64)
    )


@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_bloom_never_false_negative_strings(keys):
    import numpy as np

    from btrblocks_spark.codec.bloom import (
        bloom_may_contain_any,
        build_bloom,
    )

    bl = build_bloom(np.asarray(keys, dtype=object))
    for k in keys[:20]:
        assert bloom_may_contain_any(bl, np.asarray([k], dtype=object))


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.text(
                alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                max_size=20,
            ),
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=64),
)
def test_transform_literal_matches_arrow(vals, param):
    """The Python and pyarrow hidden-partitioning transforms must be
    value-identical (the Spark expression is pinned separately in
    test_hidden_partitioning) — bucket over any scalar, truncate over
    homogeneous ints or strings."""
    from btrblocks_spark.sources.table import (
        _transform_arrow,
        _transform_literal,
    )

    t = {"kind": "bucket", "param": param, "col": "c"}
    tbl = pa.table({"c": pa.array([str(v) for v in vals])})
    got = _transform_arrow(t, tbl).to_pylist()
    want = [_transform_literal(t, str(v)) for v in vals]
    assert got == want

    tr = {"kind": "truncate", "param": param, "col": "c"}
    ints = [v for v in vals if isinstance(v, int)]
    if ints:
        tbl_i = pa.table({"c": pa.array(ints, pa.int64())})
        got_i = _transform_arrow(tr, tbl_i).to_pylist()
        assert got_i == [_transform_literal(tr, v) for v in ints]
    strs = [v for v in vals if isinstance(v, str)]
    if strs:
        tbl_s = pa.table({"c": pa.array(strs)})
        got_s = _transform_arrow(tr, tbl_s).to_pylist()
        assert got_s == [_transform_literal(tr, v) for v in strs]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1970, 1, 1),
            max_value=__import__("datetime").datetime(2100, 1, 1),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_days_transform_literal_matches_arrow(dts):
    from btrblocks_spark.sources.table import (
        _transform_arrow,
        _transform_literal,
    )

    t = {"kind": "days", "param": None, "col": "c"}
    tbl = pa.table({"c": pa.array(dts, pa.timestamp("us"))})
    got = _transform_arrow(t, tbl).to_pylist()
    assert got == [_transform_literal(t, d) for d in dts]


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=90, max_value=100),
)
def test_jpd_psnr_gate_any_shape(h, w, seed, quality):
    """The DCT codec clears PSNR >= 40 dB for ANY image shape (incl.
    non-multiple-of-8 edges, 1-pixel strips) at quality >= 98, and its
    quantization error stays bounded at every quality >= 90."""
    from btrblocks_spark.functions.images import psnr
    from btrblocks_spark.functions.jpeg_pure import decode_jpd, encode_jpd

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpd(encode_jpd(px, quality))
    assert out.shape == px.shape
    p = psnr(px, out)
    if quality >= 98:
        assert p >= 40.0
    else:
        assert p >= 25.0  # bounded error even at q90 on pure noise


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=300),
    dup=st.integers(min_value=1, max_value=5),
)
def test_hilbert_key_bijective_on_coords(n, dup):
    """Distinct (a,b,c) coordinates map to distinct Hilbert keys (the
    transform is a bijection), repeated coordinates to equal keys."""
    from btrblocks_spark.operators.cluster import hilbert3

    rng = np.random.default_rng(n * 7 + dup)
    a = rng.integers(0, 1 << 21, n).astype(np.int64)
    b = rng.integers(0, 1 << 21, n).astype(np.int64)
    c = rng.integers(0, 1 << 21, n).astype(np.int64)
    ar = np.tile(a, dup)
    br = np.tile(b, dup)
    cr = np.tile(c, dup)
    k = hilbert3(ar, br, cr)
    coords = set(zip(a.tolist(), b.tolist(), c.tolist()))
    assert len(set(k.tolist())) == len(coords)
