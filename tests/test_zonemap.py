"""Block-level zone-map predicate skipping (decode-time pruning).

The reference declares predicate ``scan()`` / point ``lookup()`` on
compressed data but leaves every implementation UNREACHABLE
(``/root/reference/btrblocks/scheme/integer/PBP.cpp:51-56``); these tests
pin down the working analog: per-block min/max zone maps written by
``encode_table`` let ``decode_batches`` skip blocks before decode.
"""

import numpy as np
import pyarrow as pa
import pytest

from btrblocks_spark.sources.blockfile import decode_batches, encode_table


def _sorted_table(n=8000):
    return pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array((np.arange(n) * 7 % 1000).astype(np.float64)),
            "s": pa.array([f"s{i // 100:04d}" for i in range(n)]),
        }
    )


def test_zone_column_written():
    import json

    t = _sorted_table(4000)
    bt, _ = encode_table(t, block_rows=1000)
    assert "zone" in bt.schema.names
    assert bt.num_rows == 4
    z0 = json.loads(bt.column("zone")[0].as_py())
    assert z0["k"] == {"min": "0", "max": "999"}
    assert z0["s"]["min"] == "s0000"


def test_decode_skips_blocks_outside_predicate():
    t = _sorted_table(8000)
    bt, _ = encode_table(t, block_rows=1000)  # 8 blocks, k-ranges of 1000
    schema = t.schema

    full = list(decode_batches(bt.to_batches(), schema))
    assert len(full) == 8

    pruned = list(
        decode_batches(
            bt.to_batches(), schema, predicate={"k": (2500, 3499)}
        )
    )
    # blocks [2000,3000) and [3000,4000) survive; six are skipped undecoded
    assert len(pruned) == 2
    got = pa.Table.from_batches(pruned)
    ks = got.column("k").to_pylist()
    assert min(ks) == 2000 and max(ks) == 3999
    # advisory semantics: the caller's row filter yields exactly the range
    import pyarrow.compute as pc

    exact = got.filter(
        pc.and_(
            pc.greater_equal(got.column("k"), 2500),
            pc.less_equal(got.column("k"), 3499),
        )
    )
    assert exact.num_rows == 1000


def test_decode_skip_set_predicate_and_strings():
    t = _sorted_table(8000)
    bt, _ = encode_table(t, block_rows=1000)
    schema = t.schema
    # discrete set: only the blocks whose [min,max] covers a value decode
    pruned = list(
        decode_batches(
            bt.to_batches(), schema, predicate={"k": [10, 7500]}
        )
    )
    assert len(pruned) == 2
    # string bounds prune lexically, same as manifest stats
    pruned_s = list(
        decode_batches(
            bt.to_batches(), schema, predicate={"s": ("s0070", "s0071")}
        )
    )
    assert len(pruned_s) == 1


def test_decode_without_zone_column_decodes_everything():
    t = _sorted_table(3000)
    bt, _ = encode_table(t, block_rows=1000)
    legacy = bt.drop_columns(["zone"])  # files written before zone maps
    out = list(
        decode_batches(
            legacy.to_batches(), t.schema, predicate={"k": (0, 10)}
        )
    )
    assert len(out) == 3


def test_with_pos_positions_are_file_global():
    t = _sorted_table(3000)
    bt, _ = encode_table(t, block_rows=1000)
    out = pa.Table.from_batches(
        list(decode_batches(bt.to_batches(), t.schema, with_pos=True))
    )
    assert out.column("_pos").to_pylist() == list(range(3000))
    # with a skipping predicate, surviving rows keep their true positions
    out2 = pa.Table.from_batches(
        list(
            decode_batches(
                bt.to_batches(),
                t.schema,
                predicate={"k": (1000, 1999)},
                with_pos=True,
            )
        )
    )
    assert out2.column("_pos").to_pylist() == list(range(1000, 2000))


def test_deletes_drop_positions():
    t = _sorted_table(3000)
    bt, _ = encode_table(t, block_rows=1000)
    dels = np.array([0, 999, 1000, 2500], np.int64)
    out = pa.Table.from_batches(
        list(
            decode_batches(
                bt.to_batches(), t.schema, with_pos=True, deletes=dels
            )
        )
    )
    assert out.num_rows == 3000 - 4
    kept = set(out.column("_pos").to_pylist())
    assert kept.isdisjoint(set(dels.tolist()))


@pytest.mark.usefixtures("spark")
def test_table_scan_block_skip_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from btrblocks_spark.sources.table import BtrTable

    df = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    root = str(tmp_path / "ztab")
    # sorted input, 2 files x ~5 blocks so both file- and block-level
    # pruning are exercised
    table = BtrTable.create(
        spark, root, df.orderBy("k").coalesce(1), num_files=2,
        max_rows_per_file=10000, block_rows=2048, job_id="z0",
    )
    got = (
        table.scan(prune={"k": (4100, 4200)})
        .filter((F.col("k") >= 4100) & (F.col("k") <= 4200))
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("sv"),
        )
        .collect()[0]
    )
    exp = (
        df.filter((F.col("k") >= 4100) & (F.col("k") <= 4200))
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
        .collect()[0]
    )
    assert (got.n, got.sv) == (exp.n, exp.sv)


@pytest.mark.usefixtures("spark")
def test_table_scan_with_pos_unique_per_file(spark, tmp_path):
    from pyspark.sql import functions as F

    from btrblocks_spark.sources.table import BtrTable

    df = spark.range(5000).select(F.col("id").alias("k"))
    root = str(tmp_path / "ptab")
    table = BtrTable.create(
        spark, root, df, num_files=3, block_rows=512, job_id="p0"
    )
    out = table.scan(with_file=True, with_pos=True)
    n = out.count()
    assert n == 5000
    assert (
        out.select("_file", "_pos").distinct().count() == 5000
    )
    # per file: positions are exactly 0..rows-1
    per = (
        out.groupBy("_file")
        .agg(
            F.count("*").alias("rows"),
            F.min("_pos").alias("lo"),
            F.max("_pos").alias("hi"),
        )
        .collect()
    )
    for r in per:
        assert r.lo == 0 and r.hi == r.rows - 1


@pytest.mark.usefixtures("spark")
def test_point_lookup_three_skip_levels(spark, tmp_path):
    """lookup() = the reference's declared-but-UNREACHABLE point lookup:
    manifest range prune + key bloom + block zone maps, then row filter."""
    from pyspark.sql import functions as F

    from btrblocks_spark.sources.table import BtrTable

    # overlapping ranges, disjoint key populations -> blooms do real work
    even = spark.range(2000).select(
        (F.col("id") * 2).alias("k"), F.lit("e").alias("v")
    )
    odd = spark.range(2000).select(
        (F.col("id") * 2 + 1).alias("k"), F.lit("o").alias("v")
    )
    root = str(tmp_path / "lk")
    t = BtrTable.create(
        spark, root, even.orderBy("k").coalesce(1), num_files=2,
        block_rows=256, job_id="ev", bloom_cols=["k"],
    )
    t.append(odd.orderBy("k").coalesce(1), num_files=2, job_id="od",
             block_rows=256)

    got = t.lookup("k", 1234).collect()
    assert len(got) == 1 and got[0].v == "e" and got[0].k == 1234
    assert t.lookup("k", 3999).collect()[0].v == "o"
    assert t.lookup("k", 999_999).count() == 0
    # column projection with the key column not requested
    vals = t.lookup("k", 10, columns=["v"]).collect()
    assert [r.v for r in vals] == ["e"]
