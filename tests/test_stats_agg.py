"""Metadata-only aggregates: COUNT/MIN/MAX answered from manifest
stats with zero data-file I/O (Iceberg metadata-table trick; the
reference stores per-column min/max in its file metadata,
``/root/reference/btrblocks/storage/MetaData.hpp``, but has no
aggregate pushdown over it)."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.sources import fs
from btrblocks_spark.sources.table import BtrTable

N = 300


@pytest.fixture()
def table(spark, tmp_path):
    t = image_caption_table(N, seed=21)
    df = spark.createDataFrame(t)
    return BtrTable.create(
        spark, str(tmp_path / "t"), df, num_files=3, job_id="sa0"
    )


def _no_data_reads(monkeypatch):
    """Fail the test if any DATA file is opened (manifest parquet
    reads under manifests/ stay allowed)."""
    real = fs.read_parquet

    def guard(path, *a, **k):
        if "/data/" in path:
            raise AssertionError(f"data file opened: {path}")
        return real(path, *a, **k)

    monkeypatch.setattr(fs, "read_parquet", guard)


def test_exact_and_zero_io(spark, table, monkeypatch):
    truth = (
        table.scan(columns=["w", "h"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("w").alias("min_w"),
            F.max("w").alias("max_w"),
            F.max("h").alias("max_h"),
        )
        .collect()[0]
    )
    _no_data_reads(monkeypatch)
    got = table.stats_agg(
        [
            ("count", "*", "cnt"),
            ("min", "w", "min_w"),
            ("max", "w", "max_w"),
            ("max", "h", "max_h"),
        ]
    ).collect()[0]
    assert got.cnt == truth.cnt == N
    assert got.min_w == truth.min_w
    assert got.max_w == truth.max_w
    assert got.max_h == truth.max_h


def test_string_minmax_and_count_col(spark, table, monkeypatch):
    truth = (
        table.scan(columns=["image_id", "caption"])
        .agg(
            F.min("image_id").alias("mn"),
            F.max("image_id").alias("mx"),
            F.count("caption").alias("c"),
        )
        .collect()[0]
    )
    _no_data_reads(monkeypatch)
    got = table.stats_agg(
        [
            ("min", "image_id", "mn"),
            ("max", "image_id", "mx"),
            ("count", "caption", "c"),
        ]
    ).collect()[0]
    assert (got.mn, got.mx, got.c) == (truth.mn, truth.mx, truth.c)


def test_add_column_nulls(spark, table, monkeypatch):
    table.add_column("score", "double")
    more = spark.createDataFrame(image_caption_table(40, seed=5))
    more = more.withColumn(
        "image_id", F.concat(F.lit("x-"), F.col("image_id"))
    ).withColumn("score", F.col("w").cast("double"))
    table.append(more, job_id="sa1")
    _no_data_reads(monkeypatch)
    got = table.stats_agg(
        [
            ("count", "*", "cnt"),
            ("count", "score", "c_score"),
            ("null_count", "score", "n_score"),
            ("max", "score", "mx"),
        ]
    ).collect()[0]
    assert got.cnt == N + 40
    assert got.c_score == 40  # pre-add files contribute all-null
    assert got.n_score == N
    assert got.mx == float(
        more.agg(F.max("score")).collect()[0][0]
    )


def test_rename_folds_alias(spark, table, monkeypatch):
    truth = table.scan(columns=["caption"]).agg(
        F.min("caption").alias("mn"), F.count("caption").alias("c")
    ).collect()[0]
    table.rename_column("caption", "text")
    _no_data_reads(monkeypatch)
    got = table.stats_agg(
        [("min", "text", "mn"), ("count", "text", "c")]
    ).collect()[0]
    assert (got.mn, got.c) == (truth.mn, truth.c)


def test_mor_deletes_fall_back_to_scan(spark, table):
    from btrblocks_spark.operators.rowops import delete_where

    delete_where(table, "w >= 512", strategy="mor", job_id="sa2")
    truth = (
        table.scan(columns=["w"])
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("w").alias("mx"))
        .collect()[0]
    )
    got = table.stats_agg(
        [("count", "*", "cnt"), ("max", "w", "mx")]
    ).collect()[0]
    # file stats still carry the shadowed rows; the fallback must not
    assert got.cnt == truth.cnt < N
    assert got.mx == truth.mx < 512


def test_unknown_column_and_bad_fn(table):
    with pytest.raises(KeyError):
        table.stats_agg([("min", "nope", "x")])
    with pytest.raises(ValueError):
        table.stats_agg([("avg", "w", "x")])
    with pytest.raises(ValueError):
        table.stats_agg([("min", "*", "x")])


@pytest.fixture()
def ndv_table(spark, tmp_path):
    t = image_caption_table(N, seed=33)
    df = spark.createDataFrame(t)
    return BtrTable.create(
        spark,
        str(tmp_path / "n"),
        df,
        num_files=3,
        job_id="nv0",
        ndv_cols=["w", "image_id"],
    )


def test_approx_ndv_exact_below_k(spark, ndv_table, monkeypatch):
    # w has 5 distinct values (< k=256): merged sketch is exact
    _no_data_reads(monkeypatch)
    got = ndv_table.stats_agg(
        [("approx_ndv", "w", "ndv_w"), ("count", "*", "cnt")]
    ).collect()[0]
    assert got.ndv_w == 5
    assert got.cnt == N


def test_approx_ndv_estimator_above_k(spark, ndv_table, monkeypatch):
    # image_id has N=300 distinct string keys (> k=256): estimator path,
    # stderr ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma (deterministic seed)
    _no_data_reads(monkeypatch)
    got = ndv_table.stats_agg(
        [("approx_ndv", "image_id", "ndv_id")]
    ).collect()[0]
    assert abs(got.ndv_id - N) / N < 0.25
    assert got.ndv_id > 256  # not clamped at the sketch size


def test_approx_ndv_survives_compaction_and_appends(
    spark, ndv_table, monkeypatch
):
    from btrblocks_spark.operators.compact import compact

    # append overlapping + new keys, compact, sketch still folds right
    more = spark.createDataFrame(image_caption_table(60, seed=34))
    more = more.withColumn(
        "image_id", F.concat(F.lit("y-"), F.col("image_id"))
    )
    ndv_table.append(more, job_id="nv1")
    compact(ndv_table, job_id="nv2", min_input_files=2)
    _no_data_reads(monkeypatch)
    got = ndv_table.stats_agg(
        [("approx_ndv", "image_id", "ndv")]
    ).collect()[0]
    assert abs(got.ndv - (N + 60)) / (N + 60) < 0.25


def test_approx_ndv_requires_declared_col(ndv_table):
    with pytest.raises(ValueError):
        ndv_table.stats_agg([("approx_ndv", "h", "x")])


def test_approx_ndv_mor_fallback_is_exact(spark, ndv_table):
    from btrblocks_spark.operators.rowops import delete_where

    delete_where(ndv_table, "w >= 512", strategy="mor", job_id="nv3")
    truth = (
        ndv_table.scan(columns=["w"])
        .agg(F.countDistinct("w").alias("d"))
        .collect()[0]
        .d
    )
    got = ndv_table.stats_agg([("approx_ndv", "w", "d")]).collect()[0]
    assert got.d == truth == 4


def test_approx_quantile_metadata_only(spark, tmp_path):
    """approx_quantile folds per-file equi-depth histograms — zero data
    I/O — and must land within one within-file bucket of the exact
    quantile; q=0/1 hit min/max exactly."""
    from pyspark.sql import functions as F

    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") * F.col("id") % 997).cast("double").alias("v"),
    )
    t = BtrTable.create(spark, root, df, ndv_cols=["v"], num_files=6)
    row = t.stats_agg(
        [
            ("approx_quantile:0.5", "v", "p50"),
            ("approx_quantile:0.9", "v", "p90"),
            ("approx_quantile:0.0", "v", "p0"),
            ("approx_quantile:1.0", "v", "p100"),
            ("count", "*", "n"),
        ]
    ).first()
    exact = df.select(
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 0.9)").alias("p90"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).first()
    assert row.n == 4000
    assert abs(row.p50 - exact.p50) <= 997 * 0.05
    assert abs(row.p90 - exact.p90) <= 997 * 0.05
    # q=0 returns the first bucket's UPPER bound — within one bucket
    assert exact.mn <= row.p0 <= exact.mn + 997 * 0.05
    assert row.p100 == exact.mx


def test_approx_quantile_mor_fallback_and_guard(spark, tmp_path):
    from pyspark.sql import functions as F

    from btrblocks_spark.operators.rowops import delete_where
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    t = BtrTable.create(spark, root, df, ndv_cols=["v"])
    delete_where(t, "k >= 50", strategy="mor")
    # MOR deletes present -> exact-percentile fallback over live rows
    got = t.stats_agg([("approx_quantile:1.0", "v", "mx")]).first().mx
    assert got == 49.0

    import pytest as _pt

    with _pt.raises(ValueError):
        t.stats_agg([("approx_quantile:0.5", "k", "x")])  # k not in ndv_cols
    with _pt.raises(ValueError):
        t.stats_agg([("approx_quantile:1.5", "v", "x")])


def test_cli_stats_approx_quantile(spark, tmp_path, capsys):
    import json as _json

    from pyspark.sql import functions as F

    from btrblocks_spark import jobs
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    df = spark.range(500).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    BtrTable.create(spark, root, df, ndv_cols=["v"], num_files=4)
    assert jobs.main(
        ["stats", "--table", root, "--agg", "approx_quantile:1.0:v:mx",
         "--agg", "count:*"]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mx"] == 499.0 and out["count_all"] == 500


def test_approx_quantile_missing_hist_errors(spark, tmp_path):
    """Files written before the column had a histogram must make the
    aggregate ERROR, never silently average a subset."""
    from pyspark.sql import functions as F

    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    t = BtrTable.create(spark, root, df, ndv_cols=["v"])
    # simulate a legacy file: strip hist from one manifest row's stats
    import json as _json

    import pyarrow.parquet as pq

    mname = t._manifest_list(t.current_snapshot_id())[0]["name"]
    import os

    mpath = os.path.join(root, "manifests", mname)
    mt = pq.read_table(mpath).to_pylist()
    st = _json.loads(mt[0]["stats"])
    st["v"].pop("hist", None)
    mt[0]["stats"] = _json.dumps(st)
    import pyarrow as pa

    pq.write_table(pa.Table.from_pylist(mt), mpath)
    t._manifest_rows_cache = {}  # bust any cache if present

    import pytest as _pt

    with _pt.raises(ValueError, match="no histogram"):
        t.stats_agg([("approx_quantile:0.5", "v", "p50")])
    with _pt.raises(ValueError, match="suffix"):
        t.stats_agg([("approx_quantile", "v", "x")])


def test_partition_scoped_stats(spark, tmp_path, monkeypatch):
    """partition= scopes the fold to files of that partition EXACTLY
    (manifest partition spec, not advisory stats) — zero data I/O on
    the clean path, row-filtered scan fallback under MOR deletes."""
    from btrblocks_spark.operators.rowops import delete_where

    pdf = image_caption_table(N, seed=33)
    df = spark.createDataFrame(pdf)
    t = BtrTable.create(
        spark, str(tmp_path / "p"), df, partition_by=["fmt"],
        num_files=2, job_id="ps0",
    )
    _no_data_reads(monkeypatch)
    got = t.stats_agg(
        [("count", "*", "n"), ("max", "w", "max_w")],
        partition={"fmt": "png"},
    ).collect()[0]
    exp = (
        df.filter(F.col("fmt") == "png")
        .agg(F.count("*").alias("n"), F.max("w").alias("max_w"))
        .collect()[0]
    )
    assert (got.n, got.max_w) == (exp.n, exp.max_w)
    with pytest.raises(KeyError, match="not partition"):
        t.stats_agg([("count", "*", "n")], partition={"w": 1})
    monkeypatch.undo()
    # MOR deletes -> exact scan fallback, still partition-scoped
    delete_where(
        t, f"image_id = '{pdf['image_id'][0]}'", strategy="mor",
        job_id="psd",
    )
    got2 = t.stats_agg(
        [("count", "*", "n")], partition={"fmt": "png"}
    ).collect()[0]
    exp2 = t.scan().filter(F.col("fmt") == "png").count()
    assert got2.n == exp2


def test_partition_scoped_stats_pre_spec_files(spark, tmp_path):
    """Files written BEFORE evolve_partition_spec carry a partition
    JSON without the new key — the fold must route them through the
    exact scan fallback (recomputing the transform from the source
    column) instead of silently dropping them (ADVICE r5 high)."""
    pdf = image_caption_table(100, seed=44)
    df = spark.createDataFrame(pdf)
    root = str(tmp_path / "ev")
    t = BtrTable.create(spark, root, df, num_files=3, job_id="pre0")
    t.evolve_partition_spec(["bucket(4, fmt)"])
    more = spark.createDataFrame(image_caption_table(20, seed=45))
    t.append(more, job_id="post0")

    import zlib

    for fmt in ("png", "jpeg"):
        b = zlib.crc32(fmt.encode()) % 4
        got = t.stats_agg(
            [("count", "*", "n"), ("max", "w", "max_w")],
            partition={"_p_bucket_fmt": b},
        ).collect()[0]
        union = df.unionByName(more)
        exp = (
            union.filter(
                (F.crc32(F.col("fmt").cast("binary")) % 4) == b
            )
            .agg(F.count("*").alias("n"), F.max("w").alias("max_w"))
            .collect()[0]
        )
        assert (got.n, got.max_w) == (exp.n, exp.max_w), fmt

    # plain-column scoping on a current-spec table stays exact too
    got3 = t.stats_agg(
        [("count", "*", "n")], partition={"_p_bucket_fmt": 99}
    ).collect()[0]
    assert got3.n == 0


def test_partition_scoped_stats_pre_spec_distributed_path(
    spark, tmp_path, monkeypatch
):
    """Same pre-spec detection on the distributed manifest-DataFrame
    branch (>= DISTRIBUTED_META_MIN files): the Spark-side NULL probe
    must route to the scan fold too."""
    monkeypatch.setattr(BtrTable, "DISTRIBUTED_META_MIN", 1)
    pdf = image_caption_table(60, seed=46)
    df = spark.createDataFrame(pdf)
    t = BtrTable.create(
        spark, str(tmp_path / "evd"), df, num_files=2, job_id="pred0"
    )
    t.evolve_partition_spec(["bucket(4, fmt)"])
    t.append(
        spark.createDataFrame(image_caption_table(15, seed=47)),
        job_id="pred1",
    )
    import zlib

    b = zlib.crc32(b"png") % 4
    got = t.stats_agg(
        [("count", "*", "n")], partition={"_p_bucket_fmt": b}
    ).collect()[0]
    union = df.unionByName(
        spark.createDataFrame(image_caption_table(15, seed=47))
    )
    exp = union.filter(
        (F.crc32(F.col("fmt").cast("binary")) % 4) == b
    ).count()
    assert got.n == exp
