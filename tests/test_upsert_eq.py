"""upsert_eq — Iceberg-v2 equality deletes + data sequence numbers.

Covers: correctness of the delete semantics (old versions disappear,
same-commit rows survive, chained upserts order by seq), the O(change)
write claim (no data file rewritten), compaction absorption with
bloom/range pruning (untouched files are NOT rewritten), interplay with
positional deletes, projection scans that don't request the key column,
the changelog representation, and the guard rails on physical
rewriters."""

import json

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable

N = 240


def _expected(spark, base, ups_list):
    """Reference upsert semantics in plain DataFrame algebra."""
    cur = base
    for ups in ups_list:
        keys = ups.select("image_id")
        cur = cur.join(keys, "image_id", "left_anti").unionByName(ups)
    return cur


def _sorted_pdf(df):
    return (
        df.toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(image_caption_table(N, seed=51))


@pytest.fixture()
def table(spark, tmp_path, base_df):
    return BtrTable.create(
        spark,
        str(tmp_path / "u"),
        base_df,
        num_files=4,
        job_id="up0",
        bloom_cols=[],
    )


def _mk_upsert(spark, base_df, n_overlap, n_new, tag):
    overlap = (
        base_df.orderBy("image_id")
        .limit(n_overlap)
        .withColumn("caption", F.concat(F.lit(f"{tag}:"), F.col("caption")))
    )
    new = (
        spark.createDataFrame(image_caption_table(n_new, seed=hash(tag) % 97 + 1))
        .withColumn("image_id", F.concat(F.lit(f"{tag}-"), F.col("image_id")))
    )
    return overlap.unionByName(new)


def test_upsert_semantics_and_o_change_writes(spark, table, base_df):
    ups = _mk_upsert(spark, base_df, 30, 10, "u1")
    res = upsert_eq(table, ups, on="image_id", job_id="up1")
    assert res["eq_delete_keys"] == 40
    # O(change): the commit replaced nothing — pure additions
    snap = table._snapshot(res["snapshot_id"])
    assert snap["summary"]["removed_files"] == 0
    got = _sorted_pdf(table.scan())
    want = _sorted_pdf(_expected(spark, base_df, [ups]))
    assert got.equals(want)
    assert len(got) == N + 10


def test_chained_upserts_order_by_seq(spark, table, base_df):
    u1 = _mk_upsert(spark, base_df, 25, 5, "a")
    u2 = _mk_upsert(spark, base_df, 25, 5, "b")  # re-touches same keys
    upsert_eq(table, u1, on="image_id", job_id="upA")
    upsert_eq(table, u2, on="image_id", job_id="upB")
    got = _sorted_pdf(table.scan())
    want = _sorted_pdf(_expected(spark, base_df, [u1, u2]))
    assert got.equals(want)
    # the 25 overlapping keys must show u2's caption, not u1's
    caps = got.set_index("image_id")["caption"]
    assert (caps.str.startswith("b:")).sum() == 25
    assert not caps.str.startswith("a:").any()


def test_projection_scan_without_key_column(spark, table, base_df):
    ups = _mk_upsert(spark, base_df, 20, 0, "p")
    upsert_eq(table, ups, on="image_id", job_id="upP")
    # caption-only scan: the key column is decoded internally for the
    # delete mask but must not leak into the output
    df = table.scan(columns=["caption"])
    assert df.columns == ["caption"]
    n_tagged = df.filter(F.col("caption").startswith("p:")).count()
    assert n_tagged == 20
    assert df.count() == N


def test_compact_absorbs_and_prunes(spark, tmp_path):
    # two key-disjoint populations in separate files: id range prune
    # must keep the z-population files un-rewritten
    a = image_caption_table(60, seed=7)
    spark_a = spark.createDataFrame(a)
    t = BtrTable.create(
        spark, str(tmp_path / "c"), spark_a, num_files=2, job_id="c0"
    )
    z = (
        spark.createDataFrame(image_caption_table(40, seed=8))
        .withColumn("image_id", F.concat(F.lit("zzz-"), F.col("image_id")))
    )
    t.append(z, num_files=2, job_id="c1")
    before = {r["file_path"]: r for r in t.data_files()}
    ups = (
        spark_a.orderBy("image_id")
        .limit(15)
        .withColumn("caption", F.lit("v2"))
    )
    upsert_eq(t, ups, on="image_id", job_id="c2")
    assert len(t.eq_delete_files()) >= 1
    expect = _sorted_pdf(_expected(spark, spark_a.unionByName(z), [ups]))
    res = compact(t, job_id="c3", min_input_files=99)  # absorb-only run
    assert t.eq_delete_files() == []
    after = {r["file_path"]: r for r in t.data_files()}
    got = _sorted_pdf(t.scan())
    assert got.equals(expect)
    # z-population files survived untouched (range-pruned, not rewritten)
    z_files_before = {
        p
        for p, r in before.items()
        if json.loads(r["stats"])["image_id"]["min"].startswith("zzz")
    }
    assert z_files_before and z_files_before <= set(after)
    # and a second compact is a no-op for deletes
    assert t.eq_delete_files() == []
    assert res["job_id"] == "c3"


def test_compact_bloom_prunes_interleaved_keys(spark, tmp_path):
    # overlapping ranges but disjoint keys: only the bloom can prove the
    # even-key file unaffected by an odd-key upsert
    import pyarrow as pa

    def ids(parity):
        return [f"k{i:06d}" for i in range(0, 200) if i % 2 == parity]

    def tbl(id_list, cap):
        base = image_caption_table(len(id_list), seed=11)
        return base.set_column(
            base.schema.get_field_index("image_id"),
            "image_id",
            pa.array(id_list),
        ).set_column(
            base.schema.get_field_index("caption"),
            "caption",
            pa.array([cap] * len(id_list)),
        )

    even = spark.createDataFrame(tbl(ids(0), "even")).coalesce(1)
    odd = spark.createDataFrame(tbl(ids(1), "odd")).coalesce(1)
    t = BtrTable.create(
        spark,
        str(tmp_path / "b"),
        even,
        num_files=1,
        job_id="b0",
        bloom_cols=["image_id"],
    )
    t.append(odd, num_files=1, job_id="b1")
    even_files = {
        r["file_path"]
        for r in t.data_files()
        if r["job_id"] == "b0"
    }
    ups = odd.limit(10).withColumn("caption", F.lit("odd2"))
    upsert_eq(t, ups, on="image_id", job_id="b2")
    compact(t, job_id="b3", min_input_files=99)
    assert t.eq_delete_files() == []
    # the even file's range [k000000,k000198] overlaps the odd keys but
    # its bloom rejects them all — it must not have been rewritten
    live = {r["file_path"] for r in t.data_files()}
    assert even_files <= live
    assert t.scan().filter(F.col("caption") == "odd2").count() == 10


def test_same_commit_rows_survive_own_delete(spark, table, base_df):
    # a key upserted with IDENTICAL values must still appear exactly once
    ups = base_df.orderBy("image_id").limit(12)
    upsert_eq(table, ups, on="image_id", job_id="id1")
    assert table.scan().count() == N
    assert (
        table.scan(columns=["image_id"]).distinct().count() == N
    )


def test_duplicate_source_keys_raise(spark, table, base_df):
    dup = base_df.limit(5).unionByName(base_df.limit(5))
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_eq(table, dup, on="image_id", job_id="dup1")
    # failed upsert left no partial state behind
    assert table.eq_delete_files() == []
    assert table.scan().count() == N


def test_interplay_with_positional_deletes(spark, table, base_df):
    from btrblocks_spark.operators.rowops import delete_where

    delete_where(table, "w >= 1024", strategy="mor", job_id="pd1")
    kept = base_df.filter(~F.coalesce(F.expr("w >= 1024"), F.lit(False)))
    ups = _mk_upsert(spark, kept, 10, 5, "x")
    upsert_eq(table, ups, on="image_id", job_id="pd2")
    got = _sorted_pdf(table.scan())
    want = _sorted_pdf(_expected(spark, kept, [ups]))
    assert got.equals(want)


def test_guards_until_compacted(spark, table, base_df):
    from btrblocks_spark.operators.cluster import cluster
    from btrblocks_spark.operators.merge import merge_into

    upsert_eq(
        table, _mk_upsert(spark, base_df, 5, 0, "g"), on="image_id",
        job_id="g1",
    )
    with pytest.raises(RuntimeError, match="compact"):
        cluster(table, job_id="g2")
    with pytest.raises(RuntimeError, match="compact"):
        merge_into(table, base_df.limit(3), on="image_id", job_id="g3")
    compact(table, job_id="g4", min_input_files=99)
    cluster(table, job_id="g5")  # now fine


def test_stats_agg_falls_back_under_eq_deletes(spark, table, base_df):
    ups = _mk_upsert(spark, base_df, 8, 4, "s")
    upsert_eq(table, ups, on="image_id", job_id="s1")
    got = table.stats_agg([("count", "*", "cnt")]).collect()[0]
    assert got.cnt == N + 4


def test_scan_changes_changelog(spark, table, base_df):
    sid0 = table.current_snapshot_id()
    ups = _mk_upsert(spark, base_df, 6, 3, "cl")
    upsert_eq(table, ups, on="image_id", job_id="cl1")
    ch = table.scan_changes(sid0).toPandas()
    ins = ch[ch._change_type == "insert"]
    dels = ch[ch._change_type == "delete"]
    assert len(ins) == 9  # 6 new versions + 3 brand-new keys
    assert len(dels) == 6  # old images of the overwritten keys
    assert set(dels.image_id) <= set(ins.image_id)
    assert not dels.caption.str.startswith("cl:").any()
    assert ins[ins.image_id.isin(dels.image_id)].caption.str.startswith(
        "cl:"
    ).all()


def test_null_key_upsert_replaces_null_rows(spark, tmp_path):
    """Iceberg null=null equality-delete semantics: an upsert whose key
    is NULL replaces the existing NULL-keyed rows (and the changelog
    reports their old images as deletes)."""
    df = spark.createDataFrame([(None, 1), (2, 2), (3, 3)], "k long, v long")
    t = BtrTable.create(spark, str(tmp_path / "nk"), df, job_id="nk0")
    sid0 = t.current_snapshot_id()
    upsert_eq(
        t, spark.createDataFrame([(None, 100)], "k long, v long"),
        on="k", job_id="nk1",
    )
    rows = {(r.k, r.v) for r in t.scan().collect()}
    assert rows == {(None, 100), (2, 2), (3, 3)}
    ch = {
        (r.k, r.v, r._change_type)
        for r in t.scan_changes(sid0).collect()
    }
    assert ch == {(None, 100, "insert"), (None, 1, "delete")}


def test_null_in_multikey_upsert(spark, tmp_path):
    """Multi-column equality deletes match exact None tuples."""
    df = spark.createDataFrame(
        [(1, None, "a"), (1, 2, "b"), (None, None, "c")],
        "k1 long, k2 long, v string",
    )
    t = BtrTable.create(spark, str(tmp_path / "nk2"), df, job_id="nm0")
    upsert_eq(
        t,
        spark.createDataFrame(
            [(1, None, "A"), (None, None, "C")], "k1 long, k2 long, v string"
        ),
        on=["k1", "k2"],
        job_id="nm1",
    )
    rows = {(r.k1, r.k2, r.v) for r in t.scan().collect()}
    assert rows == {(1, None, "A"), (1, 2, "b"), (None, None, "C")}
