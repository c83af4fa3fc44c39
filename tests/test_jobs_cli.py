"""Jobs CLI E2E: the spark-submit entrypoints driven in-process.

Mirrors the reference's tool surface (csvtobtr / btrtocsv / btrmeta /
decompression_speed, ``/root/reference/tools/conversion/``): create,
compact, verify, meta, export round-trip on one small table.
"""

import json

import pyarrow.parquet as pq
import pytest

from btrblocks_spark import jobs
from btrblocks_spark.fixtures import image_caption_table

N = 200


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    inp = str(base / "input.parquet")
    pq.write_table(image_caption_table(N, seed=3), inp)
    root = str(base / "tbl")
    rc = jobs.main(
        ["create", "--table", root, "--input", inp,
         "--partition-by", "fmt", "--num-files", "3"]
    )
    assert rc == 0
    return base, inp, root


def test_cli_describe_and_meta(setup, capsys):
    _, _, root = setup
    assert jobs.main(["describe", "--table", root]) == 0
    desc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert desc["rows"] == N
    assert jobs.main(["meta", "--table", root]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta and "schemes" in meta[0]
    assert "caption" in meta[0]["schemes"]


def test_cli_compact_verify_export(setup, spark, capsys):
    base, inp, root = setup
    before_snapshot = 1
    assert jobs.main(
        ["compact", "--table", root, "--target-file-bytes", str(64 * 2**20)]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["bins"] >= 1
    assert jobs.main(
        ["verify", "--table", root, "--before", str(before_snapshot)]
    ) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["ok"] is True

    out = str(base / "export.parquet")
    assert jobs.main(["export", "--table", root, "--output", out]) == 0
    exported = spark.read.parquet(out)
    original = spark.read.parquet(inp)
    assert exported.count() == N
    assert original.exceptAll(exported).count() == 0

    # column-pruned export
    out2 = str(base / "export2.parquet")
    assert jobs.main(
        ["export", "--table", root, "--output", out2,
         "--columns", "image_id,phash"]
    ) == 0
    assert spark.read.parquet(out2).columns == ["image_id", "phash"]


def test_cli_rewrite_manifests(setup, spark, capsys):
    from btrblocks_spark.sources.table import BtrTable

    _, _, root = setup
    assert jobs.main(["rewrite-manifests", "--table", root]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["manifests_after"] == 1
    t = BtrTable.load(spark, root)
    assert t.scan().count() == N  # contents unchanged


def test_entry_queries_and_oracles_consistent():
    """Every oracle_sql key must have a queries() twin, and the known
    rows-only set is exactly the non-SQL-expressible fast paths."""
    import __spark_entry__ as e

    q = set(e.queries())
    o = set(e.oracle_sql())
    assert o <= q, o - q
    rows_only = q - o
    assert rows_only == {
        "minhash_lsh_pairs",
        "simhash",
        "simhash_near_pairs",
        "knn_lsh",
        "knn_ivf",
        "knn_ivf_sq8",
        "knn_pq",
        "knn_ivf_pq",
        "embedding_near_dup_lsh",
    }


def test_cli_rollup_create_and_refresh(setup, spark, capsys):
    from pyspark.sql import functions as F

    base, inp, root = setup
    dst = str(base / "rollup_w")
    assert jobs.main(
        ["rollup", "--src", root, "--dst", dst,
         "--keys", "fmt", "--sum", "total_w=w", "--create"]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["created"] == dst and res["groups"] >= 1

    # no source change -> refresh is a watermark no-op
    assert jobs.main(
        ["rollup", "--src", root, "--dst", dst,
         "--keys", "fmt", "--sum", "total_w=w"]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["noop"] is True

    # append more source rows -> refresh folds them in
    from btrblocks_spark.sources.table import BtrTable

    src_t = BtrTable.load(spark, root)
    src_t.append(
        src_t.scan()
        .limit(37)
        .withColumn("image_id", F.concat_ws("-", F.col("image_id"), F.lit("x"))),
        job_id="cli-extra",
    )
    assert jobs.main(
        ["rollup", "--src", root, "--dst", dst,
         "--keys", "fmt", "--sum", "total_w=w"]
    ) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["noop"] is False and res["upserted_keys"] >= 1

    dst_t = BtrTable.load(spark, dst)
    got = {r.fmt: (r.total_w, r.n_rows) for r in dst_t.scan().collect()}
    exp = {
        r.fmt: (r.tw, r.n)
        for r in src_t.scan()
        .groupBy("fmt")
        .agg(F.sum("w").alias("tw"), F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_cli_curate(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps for it was a fine day in the "
                "park and all of the dogs ran to the gate " * 2),
            (2, "der hund und die katze sind von den nicht ein haus"),
        ],
        "doc_id long, text string",
    )
    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "curated")
    docs.write.parquet(inp)
    assert jobs.main(
        ["curate", "--input", inp, "--out", out, "--min-quality", "0.1",
         "--report"]
    ) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["docs_in"] == 2 and metrics["docs_out"] == 1
    top = [r for r in metrics["report"]
           if r["lang"] == "<all>" and r["source"] == "<all>"]
    assert top and top[0]["n_docs"] == 1
    kept = spark.read.parquet(out).collect()
    assert len(kept) == 1 and kept[0].doc_id == 1


def test_cli_multikey_merge_and_evolve_spec(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    base = tmp_path
    inp = str(base / "in.parquet")
    pq2.write_table(
        pa.table({
            "k1": [1, 1, 2, 2],
            "k2": [1, 2, 1, 2],
            "v": ["a", "b", "c", "d"],
        }),
        inp,
    )
    root = str(base / "t")
    assert jobs.main(["create", "--table", root, "--input", inp]) == 0
    src = str(base / "src.parquet")
    pq2.write_table(
        pa.table({"k1": [1, 9], "k2": [2, 9], "v": ["B", "NEW"]}), src
    )
    rc = jobs.main([
        "merge", "--table", root, "--source", src, "--on", "k1,k2",
    ])
    assert rc == 0
    from btrblocks_spark.sources.table import BtrTable

    t = BtrTable(spark, root)
    got = {(r.k1, r.k2): r.v for r in t.scan().collect()}
    assert got == {(1, 1): "a", (1, 2): "B", (2, 1): "c",
                   (2, 2): "d", (9, 9): "NEW"}

    rc = jobs.main([
        "evolve-spec", "--table", root, "--partition-by", "bucket(4, k1)",
    ])
    assert rc == 0
    assert [tf["kind"] for tf in t.metadata()["partition_transforms"]] \
        == ["bucket"]
    capsys.readouterr()


def test_cli_incremental_curation(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    inp = str(tmp_path / "docs.parquet")
    pq2.write_table(
        pa.table({
            "doc_id": ["a", "b"],
            "text": [
                "the quick brown fox and the lazy dog words",
                "the quick brown fox and the lazy dog words",
            ],
        }),
        inp,
    )
    src_root = str(tmp_path / "src")
    assert jobs.main(["create", "--table", src_root, "--input", inp]) == 0
    out_root = str(tmp_path / "cur")
    rc = jobs.main([
        "curate-init", "--src", src_root, "--out", out_root,
        "--min-quality", "0.01",
    ])
    assert rc == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["docs"] == 1  # exact dup collapsed

    more = str(tmp_path / "more.parquet")
    pq2.write_table(
        pa.table({
            "doc_id": ["c"],
            "text": ["the completely fresh words of doc c and the rest"],
        }),
        more,
    )
    assert jobs.main(
        ["append", "--table", src_root, "--input", more]
    ) == 0
    rc = jobs.main(["curate-refresh", "--src", src_root, "--out", out_root])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["upserted_docs"] == 1 and not res["noop"]


def test_cli_rollup_create_refresh(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    inp = str(tmp_path / "ev.parquet")
    pq2.write_table(
        pa.table({
            "grp": [1, 1, 2],
            "value": [10, 20, 5],
        }),
        inp,
    )
    src_root = str(tmp_path / "src")
    assert jobs.main(["create", "--table", src_root, "--input", inp]) == 0
    out_root = str(tmp_path / "roll")
    rc = jobs.main([
        "rollup-create", "--src", src_root, "--out", out_root,
        "--keys", "grp", "--aggs", "total=sum:value,hi=max:value,n=count",
    ])
    assert rc == 0
    created = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert created["groups"] == 2

    more = str(tmp_path / "more.parquet")
    pq2.write_table(pa.table({"grp": [2], "value": [99]}), more)
    assert jobs.main(["append", "--table", src_root, "--input", more]) == 0
    rc = jobs.main([
        "rollup-refresh", "--src", src_root, "--out", out_root,
        "--keys", "grp", "--aggs", "total=sum:value,hi=max:value,n=count",
    ])
    assert rc == 0
    from btrblocks_spark.sources.table import BtrTable

    dst = BtrTable(spark, out_root)
    got = {r.grp: (r.total, r.hi, r.n) for r in dst.scan().collect()}
    assert got == {1: (30, 20, 2), 2: (104, 99, 2)}
    capsys.readouterr()


def test_cli_stats_partition_scope(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    inp = str(tmp_path / "in.parquet")
    pq2.write_table(
        pa.table({
            "k": [1, 2, 3, 4],
            "fmt": ["png", "png", "jpeg", "jpeg"],
            "w": [10, 20, 30, 40],
        }),
        inp,
    )
    root = str(tmp_path / "t")
    assert jobs.main([
        "create", "--table", root, "--input", inp,
        "--partition-by", "fmt",
    ]) == 0
    rc = jobs.main([
        "stats", "--table", root, "--agg", "count:*:n",
        "--agg", "max:w:mw", "--partition", "fmt=png",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"n": 2, "mw": 20}


def test_cli_history_and_net_changes(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    inp = str(tmp_path / "in.parquet")
    pq2.write_table(pa.table({"id": [1, 2], "v": ["a", "b"]}), inp)
    root = str(tmp_path / "t")
    assert jobs.main(["create", "--table", root, "--input", inp]) == 0
    more = str(tmp_path / "m.parquet")
    pq2.write_table(pa.table({"id": [3], "v": ["c"]}), more)
    assert jobs.main(["append", "--table", root, "--input", more]) == 0

    assert jobs.main(["history", "--table", root]) == 0
    hist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # CLI create commits create(+append); exact count is incidental
    assert len(hist) >= 2 and all(r["is_current_ancestor"] for r in hist)

    out = str(tmp_path / "net")
    rc = jobs.main([
        "net-changes", "--table", root, "--from", "1",
        "--keys", "id", "--out", out,
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 1
    rows = spark.read.parquet(out).collect()
    assert rows[0].id == 3 and rows[0]._change_type == "insert"


def test_cli_bucket_join(spark, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq2

    a_in = str(tmp_path / "a.parquet")
    pq2.write_table(
        pa.table({
            "k": [1, 2, 3, 4, 5],
            "v": [10, 20, 30, 40, 50],
        }),
        a_in,
    )
    b_in = str(tmp_path / "b.parquet")
    pq2.write_table(
        pa.table({"k": [2, 4], "name": ["two", "four"]}), b_in
    )
    ra, rb = str(tmp_path / "ta"), str(tmp_path / "tb")
    assert jobs.main([
        "create", "--table", ra, "--input", a_in,
        "--partition-by", "bucket(4, k)",
    ]) == 0
    assert jobs.main([
        "create", "--table", rb, "--input", b_in,
        "--partition-by", "bucket(4, k)",
    ]) == 0
    out_dir = str(tmp_path / "joined")
    rc = jobs.main([
        "bucket-join", "--left", ra, "--right", rb, "--on", "k",
        "--output", out_dir,
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 2
    back = {
        r.k: (r.v, r.name)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert back == {2: (20, "two"), 4: (40, "four")}
