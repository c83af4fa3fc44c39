"""Focused tests for the round-7 optimization internals.

Each optimization that changed an operator's internals gets an
equivalence/behavior test here:

- widen(): repartitions narrow inputs to default parallelism, passes
  wide inputs through untouched (the scale-safety contract);
- minhash_signatures_fast: the row-local array_min(transform(...))
  formulation is bit-identical to the explode+distinct+groupBy shape
  it replaced (min is duplicate-insensitive);
- _write_files hash fan-out: the deterministic row-hash repartition
  still fans a write out to many files and round-trips content,
  including on a constant-valued (single-hash-bucket) table.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_widen_repartitions_narrow_input(spark):
    from btrblocks_spark.functions.util import widen

    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = widen(df, "id")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 1000


def test_widen_passes_wide_input_through(spark):
    from btrblocks_spark.functions.util import widen

    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target * 4)
    out = widen(df, "id")
    # untouched: same object, no extra exchange
    assert out is df


def test_minhash_rowlocal_equals_explode_groupby(spark, docs):
    """The r7 zero-shuffle signature path must reproduce the original
    explode + distinct-shingle + groupBy(min(xxhash64)) bit-for-bit."""
    from btrblocks_spark.functions.dedup import (
        MINHASH_K,
        minhash_signatures_fast,
        shingles,
    )

    old = (
        shingles(docs)
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(
                    f"mh_{i}"
                )
                for i in range(MINHASH_K)
            ]
        )
    )
    new = minhash_signatures_fast(docs)
    assert new.columns == ["doc_id"] + [
        f"mh_{i}" for i in range(MINHASH_K)
    ]
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_minhash_signature_plan_has_no_aggregate_shuffle(spark, docs):
    """Signatures are a narrow projection: no explode, no aggregate —
    the only exchange allowed is widen()'s input repartition."""
    plan = (
        spark.sparkContext._jvm.PythonSQLUtils.explainString(
            __import__(
                "btrblocks_spark.functions.dedup", fromlist=["x"]
            )
            .minhash_signatures_fast(docs)
            ._jdf.queryExecution(),
            "formatted",
        )
    )
    assert "HashAggregate" not in plan
    assert "Generate" not in plan  # no explode
    assert plan.count("Exchange") <= 2  # widen repartition only


def test_lsh_salt_split_pairs_identical(spark, docs, monkeypatch):
    """The hot-bucket salt-split self-join must produce exactly the
    plain self-join's candidate pair set. Forcing the threshold to 0
    routes every bucket through the salted path; the default threshold
    routes this small corpus through the plain path — both compared."""
    import btrblocks_spark.functions.dedup as dd

    sigs = dd.minhash_signatures_fast(docs)
    plain = dd.lsh_candidate_pairs(sigs)  # default: under threshold
    monkeypatch.setattr(dd, "LSH_SALT_THRESHOLD", 0)
    salted = dd.lsh_candidate_pairs(sigs)
    assert salted.columns == ["doc_a", "doc_b"]
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_encode_file_stats_fold_from_zones():
    """File-level min/max are folded from the per-block zone scalars
    (no second full-column pass) and must equal a direct full-column
    pc.min_max — including the all-NaN-block sentinel edges."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from btrblocks_spark.sources.blockfile import encode_table

    nan = float("nan")
    cases = [
        pa.table({"a": pa.array([nan, nan, 1.0, 5.0])}),  # all-NaN block
        pa.table({"a": pa.array([nan, nan, nan, nan])}),  # all-NaN column
        pa.table({"a": pa.array([nan, None, 2.0, None])}),
        pa.table({"a": pa.array([float("inf"), 1.0, -float("inf"), 2.0])}),
        pa.table({"s": pa.array(["z", None, "a", "é"])}),
        pa.table({"i": pa.array([7, -3, None, 40], type=pa.int64())}),
    ]
    for t in cases:
        _, stats = encode_table(t, seed=42, block_rows=2)
        for cname in t.schema.names:
            col = t.column(cname)
            entry = stats["columns"][cname]
            if col.null_count == t.num_rows:
                assert entry["min"] is None and entry["max"] is None
                continue
            mm = pc.min_max(col)
            assert entry["min"] == str(mm["min"].as_py())
            assert entry["max"] == str(mm["max"].as_py())


def test_write_files_hash_fanout_constant_table(spark, tmp_path):
    """All-identical rows hash to ONE partition — the write must still
    produce a correct table (fan-out collapses, content round-trips)."""
    from btrblocks_spark.sources.table import BtrTable

    df = spark.range(500).select(
        F.lit(7).alias("k"), F.lit("same").alias("v")
    )
    t = BtrTable.create(
        spark, str(tmp_path / "const"), df, num_files=4, job_id="c0"
    )
    out = t.scan()
    assert out.count() == 500
    assert out.filter((F.col("k") == 7) & (F.col("v") == "same")).count() == 500


def test_write_files_hash_fanout_spreads_distinct_rows(spark, tmp_path):
    from btrblocks_spark.sources.table import BtrTable

    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 13).alias("m")
    )
    t = BtrTable.create(
        spark, str(tmp_path / "spread"), df, num_files=4, job_id="s0"
    )
    files = t.data_files()
    assert len(files) >= 3  # distinct rows spread across tasks
    got = t.scan().agg(F.sum("id")).collect()[0][0]
    assert got == sum(range(4000))
