"""Hilbert-curve clustering key: verified against an independent scalar
Skilling (2004) implementation and the defining adjacency property
(consecutive curve positions differ by exactly one step in one axis)."""

import numpy as np
import pytest

from btrblocks_spark.operators.cluster import Z_BITS, hilbert3

BITS = Z_BITS  # 21


def _axes_to_index_scalar(x: int, y: int, z: int) -> int:
    """Independent scalar Skilling AxesToTranspose + bit interleave."""
    X = [x, y, z]
    M = 1 << (BITS - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(3):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    X[1] ^= X[0]
    X[2] ^= X[1]
    t = 0
    Q = M
    while Q > 1:
        if X[2] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(3):
        X[i] ^= t
    # interleave: bit j of X[0] is the most significant of each group
    h = 0
    for j in range(BITS - 1, -1, -1):
        for i in range(3):
            h = (h << 1) | ((X[i] >> j) & 1)
    return h


def _index_to_axes_scalar(h: int) -> tuple[int, int, int]:
    """Inverse: de-interleave + Skilling TransposeToAxes."""
    X = [0, 0, 0]
    for pos in range(3 * BITS):
        bit = (h >> (3 * BITS - 1 - pos)) & 1
        X[pos % 3] = (X[pos % 3] << 1) | bit
    # Gray decode
    t = X[2] >> 1
    for i in (2, 1):
        X[i] ^= X[i - 1]
    X[0] ^= t
    Q = 2
    M = 1 << (BITS - 1)
    while Q != (M << 1):
        P = Q - 1
        for i in (2, 1, 0):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q <<= 1
    return X[0], X[1], X[2]


def test_matches_independent_scalar_implementation():
    rng = np.random.default_rng(5)
    n = 200
    a = rng.integers(0, 1 << BITS, n).astype(np.int64)
    b = rng.integers(0, 1 << BITS, n).astype(np.int64)
    c = rng.integers(0, 1 << BITS, n).astype(np.int64)
    got = hilbert3(a, b, c)
    exp = [
        _axes_to_index_scalar(int(x), int(y), int(z))
        for x, y, z in zip(a, b, c)
    ]
    assert got.tolist() == exp


def test_scalar_roundtrip_is_bijective():
    rng = np.random.default_rng(6)
    for _ in range(50):
        x, y, z = (int(v) for v in rng.integers(0, 1 << BITS, 3))
        h = _axes_to_index_scalar(x, y, z)
        assert _index_to_axes_scalar(h) == (x, y, z)


def test_adjacent_curve_positions_are_grid_neighbors():
    """THE Hilbert property (what Z-order lacks): walking the curve one
    step moves exactly one axis by exactly 1 — no diagonal jumps."""
    rng = np.random.default_rng(7)
    hs = rng.integers(0, 1 << (3 * BITS), 100, dtype=np.uint64)
    for h in hs:
        p0 = _index_to_axes_scalar(int(h))
        p1 = _index_to_axes_scalar(int(h) + 1)
        diffs = [abs(a - b) for a, b in zip(p0, p1)]
        assert sorted(diffs) == [0, 0, 1], (h, p0, p1)


def test_cluster_with_hilbert_curve(spark, tmp_path):
    from pyspark.sql import functions as F

    from btrblocks_spark.operators.cluster import cluster
    from btrblocks_spark.sources.table import BtrTable
    from btrblocks_spark.fixtures import image_caption_table

    pdf = image_caption_table(200, seed=21)
    t = BtrTable.create(
        spark, str(tmp_path / "h"), spark.createDataFrame(pdf),
        num_files=3, job_id="hc0",
    )
    before = t.scan().count()
    res = cluster(t, curve="hilbert", job_id="hc1")
    assert res.get("files_written", 1) >= 1
    assert t.scan().count() == before
    keys = {r["sort_key"] for r in t.data_files()}
    assert "hilbert(phash,w,h)" in keys
    # clustered content identical to the source
    back = t.scan().select("image_id").toPandas()
    assert sorted(back["image_id"].astype(str)) == sorted(
        str(v) for v in pdf["image_id"]
    )
