"""Per-file token blooms: substring-search file skipping for text cols."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.codec.bloom import build_token_bloom, tokenize
from btrblocks_spark.sources.table import BtrTable, _file_may_match


def test_tokenizer_and_bloom_roundtrip():
    import numpy as np

    from btrblocks_spark.codec.bloom import bloom_may_contain_any

    assert tokenize("A photo of 2 Dogs, running!") == [
        "a", "photo", "of", "2", "dogs", "running",
    ]
    bl = build_token_bloom(["red cat on mat", None, "blue dog"])
    for tok in ("red", "cat", "mat", "blue", "dog", "on"):
        assert bloom_may_contain_any(bl, np.array([tok], dtype=object))
    misses = sum(
        bloom_may_contain_any(bl, np.array([f"zz{i}q"], dtype=object))
        for i in range(200)
    )
    assert misses <= 6  # ~1% FP at 10 bits/key


@pytest.fixture()
def table(spark, tmp_path):
    # 4 files with disjoint vocabularies via sequential slices of ONE
    # sorted task (round-robin would smear every word over every file)
    vocab = ["alpha", "bravo", "charlie", "delta"]
    rows = [
        (i, f"the {vocab[i // 25]} item number {i} of corpus")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, caption string")
    return BtrTable.create(
        spark,
        str(tmp_path / "t"),
        df.orderBy("id").coalesce(1),
        num_files=1,
        max_rows_per_file=25,
        job_id="tb0",
        token_bloom_cols=["caption"],
    )


def test_scan_skips_files_and_stays_correct(table):
    prune = {"caption": {"tokens_all": ["bravo"]}}
    surviving = [
        r
        for r in table.data_files()
        if _file_may_match(r, prune)
    ]
    assert len(table.data_files()) == 4
    assert len(surviving) == 1  # only the bravo file may match
    got = (
        table.scan(columns=["id", "caption"], prune=prune)
        .filter(F.col("caption").contains("bravo"))
        .count()
    )
    assert got == 25


def test_multi_token_and_semantics(table):
    # 'alpha' and 'bravo' never co-occur in one file -> zero survivors
    prune = {"caption": {"tokens_all": ["alpha", "bravo"]}}
    surviving = [
        r for r in table.data_files() if _file_may_match(r, prune)
    ]
    assert surviving == []
    # common token survives everywhere
    prune2 = {"caption": {"tokens_all": ["corpus"]}}
    assert len(
        [r for r in table.data_files() if _file_may_match(r, prune2)]
    ) == 4


def test_blooms_survive_compaction(spark, table):
    from btrblocks_spark.operators.compact import compact

    compact(table, job_id="tb1", min_input_files=2)
    rows = table.data_files()
    assert rows and all(
        "token_bloom" in __import__("json").loads(r["stats"])["caption"]
        for r in rows
    )
    prune = {"caption": {"tokens_all": ["delta"]}}
    got = (
        table.scan(columns=["caption"], prune=prune)
        .filter(F.col("caption").contains("delta"))
        .count()
    )
    assert got == 25


def test_token_bloom_col_rename_refused(table):
    with pytest.raises(ValueError):
        table.rename_column("caption", "text")
    with pytest.raises(ValueError):
        table.drop_column("caption")
