"""Composite-key equality-delete upsert (multi-column on)."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(d, h, f"v1-{d}-{h}") for d in range(10) for h in range(6)],
        "day long, host long, val string",
    )
    return BtrTable.create(
        spark, str(tmp_path / "mk"), df, num_files=3, job_id="mk0"
    )


def test_multikey_upsert_and_absorb(spark, table):
    ups = spark.createDataFrame(
        [(d, h, f"v2-{d}-{h}") for d in range(3) for h in range(2)]
        + [(99, 0, "new")],
        "day long, host long, val string",
    )
    res = upsert_eq(table, ups, on=["day", "host"], job_id="mk1")
    assert res["eq_delete_keys"] == 7
    got = {(r.day, r.host): r.val for r in table.scan().collect()}
    assert len(got) == 61
    assert got[(0, 0)] == "v2-0-0" and got[(2, 1)] == "v2-2-1"
    assert got[(5, 5)] == "v1-5-5" and got[(99, 0)] == "new"
    # projection without either key column still masks correctly
    vals = set(
        r.val for r in table.scan(columns=["val"]).collect()
    )
    assert "v1-0-0" not in vals and "v2-0-0" in vals
    compact(table, job_id="mk2", min_input_files=99)
    assert table.eq_delete_files() == []
    got2 = {(r.day, r.host): r.val for r in table.scan().collect()}
    assert got2 == got


def test_multikey_duplicate_detection(spark, table):
    dup = spark.createDataFrame(
        [(1, 1, "a"), (1, 1, "b")], "day long, host long, val string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        upsert_eq(table, dup, on=["day", "host"], job_id="mk3")
