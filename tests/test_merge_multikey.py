"""Composite-key MERGE INTO: the key is the TUPLE — matching one
component must never count — across all three write strategies, with
bloom pruning, delete mode, and the unsupported-type fallback."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.sources.table import BtrTable

N = 400


def _mk_table(spark, root, bloom=None, num_files=4):
    # key tuple (k1, k2) = (id % 10, id // 10) is unique per id and
    # both components collide heavily on their own
    df = spark.range(N).select(
        (F.col("id") % 10).alias("k1"),
        (F.col("id") / 10).cast("long").alias("k2"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    return BtrTable.create(
        spark, root, df, num_files=num_files, job_id="mk0",
        bloom_cols=bloom,
    )


def _source(spark, tuples, tag="NEW"):
    return spark.createDataFrame(
        [(a, b, f"{tag}{a}_{b}") for a, b in tuples],
        "k1 long, k2 long, val string",
    )


def _rows(t):
    return {(r.k1, r.k2): r.val for r in t.scan().collect()}


@pytest.mark.parametrize("strategy", ["staged", "shuffle", "mor"])
def test_update_insert_tuple_semantics(spark, tmp_path, strategy):
    t = _mk_table(spark, str(tmp_path / f"t-{strategy}"))
    # (1,2)=id 21 exists; (2,1)=id 12 exists; source carries ONLY (1,2)
    # plus one brand-new tuple (every in-range combo is taken; k1=9
    # exists everywhere, k2=99 is out of range)
    src = _source(spark, [(1, 2), (9, 99)])
    res = merge_into(t, src, on=["k1", "k2"], strategy=strategy,
                     job_id=f"m-{strategy}")
    got = _rows(t)
    assert len(got) == N + 1
    assert got[(1, 2)] == "NEW1_2"
    assert got[(2, 1)] == "v12"  # swapped tuple untouched
    assert got[(9, 99)] == "NEW9_99"  # insert (k1=9 and k2=99... k2 max 39)
    assert got[(9, 9)] == "v99"  # component-collision rows untouched
    assert res["snapshot_id"] > 0


@pytest.mark.parametrize("strategy", ["staged", "shuffle", "mor"])
def test_delete_mode(spark, tmp_path, strategy):
    t = _mk_table(spark, str(tmp_path / f"d-{strategy}"))
    src = _source(spark, [(3, 0), (7, 7), (5, 999)])  # last: no match
    merge_into(t, src, on=["k1", "k2"], when_matched="delete",
               when_not_matched="ignore", strategy=strategy,
               job_id=f"dm-{strategy}")
    got = _rows(t)
    assert len(got) == N - 2
    assert (3, 0) not in got and (7, 7) not in got
    assert (0, 3) in got and (5, 30) in got


def test_multikey_bloom_prunes(spark, tmp_path):
    # blooms on BOTH key columns; two populations with OVERLAPPING
    # ranges split on k2 parity — only the k2 bloom separates them, so
    # a file is skipped because ONE component's bloom rejects all its
    # source values even though the other component hits everywhere
    even = spark.range(200).select(
        (F.col("id") % 10).alias("k1"),
        (F.col("id") * 2).alias("k2"),
        F.lit("e").alias("val"),
    )
    odd = spark.range(200).select(
        (F.col("id") % 10).alias("k1"),
        (F.col("id") * 2 + 1).alias("k2"),
        F.lit("o").alias("val"),
    )
    t = BtrTable.create(
        spark, str(tmp_path / "bl"), even, num_files=2, job_id="mb0",
        bloom_cols=["k1", "k2"],
    )
    t.append(odd, num_files=2, job_id="mb0b")
    src = _source(spark, [(4, 8), (3, 106)])  # even k2 only
    res = merge_into(t, src, on=["k1", "k2"], job_id="mb1")
    assert res["bloom_skipped_files"] >= 1  # odd files never opened
    got = _rows(t)
    assert got[(4, 8)] == "NEW4_8" and got[(3, 106)] == "NEW3_106"
    assert got[(4, 9)] == "o" and len(got) == 400


def test_staged_owner_map_single_replacement(spark, tmp_path):
    # the same tuple in MULTIPLE files must yield exactly ONE
    # replacement row (owner-file dedup on the key tuple)
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b")], "k1 long, k2 long, val string"
    )
    t = BtrTable.create(spark, str(tmp_path / "own"), df, job_id="ow0")
    t.append(
        spark.createDataFrame([(1, 1, "a2")], "k1 long, k2 long, val string"),
        job_id="ow1",
    )  # duplicate tuple now lives in two files
    merge_into(t, _source(spark, [(1, 1)]), on=["k1", "k2"], job_id="ow2")
    rows = [r for r in t.scan().collect() if (r.k1, r.k2) == (1, 1)]
    assert len(rows) == 1 and rows[0].val == "NEW1_1"


def test_unsupported_type_falls_back_to_shuffle(spark, tmp_path):
    # float key components canonicalize differently across engines —
    # the staged path must hand off to shuffle, result unchanged
    df = spark.createDataFrame(
        [(1, 0.5, "a"), (2, 1.5, "b")], "k1 long, kf double, val string"
    )
    t = BtrTable.create(spark, str(tmp_path / "fl"), df, job_id="fl0")
    src = spark.createDataFrame(
        [(1, 0.5, "A"), (3, 2.5, "C")], "k1 long, kf double, val string"
    )
    res = merge_into(t, src, on=["k1", "kf"], strategy="staged",
                     job_id="fl1")
    got = {(r.k1, r.kf): r.val for r in t.scan().collect()}
    assert got == {(1, 0.5): "A", (2, 1.5): "b", (3, 2.5): "C"}
    assert "strategy" not in res or res.get("strategy") != "staged"


def test_string_int_composite(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")],
        "s string, k long, val string",
    )
    t = BtrTable.create(spark, str(tmp_path / "si"), df, job_id="si0")
    src = spark.createDataFrame(
        [("a", 2, "Y"), ("b", 2, "W")], "s string, k long, val string"
    )
    merge_into(t, src, on=["s", "k"], job_id="si1")
    got = {(r.s, r.k): r.val for r in t.scan().collect()}
    assert got == {("a", 1): "x", ("a", 2): "Y", ("b", 1): "z",
                   ("b", 2): "W"}
