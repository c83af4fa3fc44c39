"""Structured Streaming: windowed ingest matches batch twin; sessionize."""

import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_hourly_matches_batch(spark, tmp_path):
    from btrblocks_spark.plans.codec_queries import events_hourly
    from btrblocks_spark.streaming.ingest import run_events_stream

    src = str(tmp_path / "events_in")
    shutil.copytree(f"{SF}", src, ignore=shutil.ignore_patterns("*"))
    shutil.copy(f"{SF}/events.parquet", f"{src}/events.parquet")
    run_events_stream(
        spark, src, str(tmp_path / "ckpt"), query_name="t_stream"
    )
    got = spark.sql(
        "SELECT hour, event_type, n_events, sum_value FROM t_stream"
    )
    want = events_hourly(spark, SF)
    assert got.count() == want.count()
    assert want.exceptAll(got).count() == 0


def test_sessionize_batch_semantics(spark, tmp_path):
    """Drive the stateful sessionizer with availableNow over a file source."""
    import pandas as pd

    from btrblocks_spark.streaming.ingest import (
        EVENT_SCHEMA,
        read_events_stream,
        sessionize,
    )

    from datetime import datetime, timedelta

    rows = []
    base = datetime(2025, 1, 1, 0, 0, 0)
    # user 1: two sessions separated by 2h; user 2: one session
    for i, mins in enumerate([0, 5, 10, 130, 135]):
        rows.append((i, base + timedelta(minutes=mins), 1, "click", 1.0, "{}"))
    rows.append((10, base, 2, "click", 2.0, "{}"))
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    src = str(tmp_path / "sess_in")
    df.coalesce(1).write.parquet(src)

    stream = read_events_stream(spark, src)
    sessions = sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM t_sessions").collect()
    # only *closed* sessions are emitted in append mode before timeout:
    # user 1's first session closes when the 130-min event arrives
    u1 = [r for r in got if r.user_id == 1]
    assert len(u1) == 1
    assert u1[0].n_events == 3 and u1[0].total_value == 3.0


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Incremental exact dedup over two micro-batches must converge to
    the batch exact_dedup answer (keep = min doc_id, dup_count = total)."""
    from btrblocks_spark.functions.dedup import exact_dedup
    from btrblocks_spark.streaming.ingest import streaming_dedup

    rows = [
        (1, "hello world"),
        (2, "goodbye moon"),
        (3, "Hello   World"),  # dup of 1 after normalization
        (4, "unique text here"),
        (5, "goodbye moon"),  # dup of 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "docs_in")
    # two files -> with maxFilesPerTrigger=1 the drain runs 2 micro-batches
    df.filter("doc_id <= 3").coalesce(1).write.parquet(src)
    df.filter("doc_id > 3").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: last row per hash is the converged state
    got = spark.sql(
        """SELECT content_hash, doc_id, dup_count FROM (
             SELECT *, row_number() OVER (
               PARTITION BY content_hash ORDER BY dup_count DESC) rn
             FROM t_dedup) WHERE rn = 1"""
    ).collect()
    want = {
        r.content_hash: (r.keep_doc_id, r.dup_count)
        for r in exact_dedup(df).collect()
    }
    assert len(got) == len(want) == 3
    for r in got:
        assert want[r.content_hash] == (r.doc_id, r.dup_count)


def test_stream_upsert_into_table(spark, tmp_path):
    """CDC-apply: a parquet-file stream of keyed updates/inserts merged
    into a BtrTable per micro-batch (MOR), exactly-once on replay."""
    from btrblocks_spark.sources.table import BtrTable
    from btrblocks_spark.streaming.ingest import stream_upsert_into_table

    base = spark.range(100).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    root = str(tmp_path / "t")
    t = BtrTable.create(spark, root, base, num_files=2, job_id="base")

    # source stream: updates for 0..9 (twice: key 5 duplicated in-batch),
    # inserts for 200..204
    src_dir = str(tmp_path / "updates")
    upd = spark.createDataFrame(
        [(i, f"U{i}") for i in range(10)]
        + [(5, "U5b")]
        + [(i, f"N{i}") for i in range(200, 205)],
        "id long, val string",
    )
    upd.coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema("id long, val string").parquet(src_dir)
    q = stream_upsert_into_table(
        stream, root, str(tmp_path / "ckpt"), on="id", query_name="up1"
    )
    q.awaitTermination(120)

    got = {r.id: r.val for r in t.scan().collect()}
    assert len(got) == 105
    assert got[0] == "U0" and got[9] == "U9" and got[200] == "N200"
    assert got[5] in ("U5", "U5b")  # in-batch dup reduced to one row
    assert got[10] == "v10"  # untouched
    # MOR: base data files not rewritten
    assert any(r["job_id"] == "base" for r in t.data_files())
    assert t.delete_files()

    # replay safety: calling the same batch again is a no-op
    sid = t.current_snapshot_id()
    stream2 = spark.readStream.schema("id long, val string").parquet(src_dir)
    q2 = stream_upsert_into_table(
        stream2, root, str(tmp_path / "ckpt"), on="id", query_name="up1"
    )
    q2.awaitTermination(120)
    assert t.current_snapshot_id() == sid
    assert t.scan().count() == 105


def test_streaming_curation_stateless_stages(spark, tmp_path):
    """The stateless curation stages (features, gates, PII scrub) run
    unchanged on a stream — same built-in expressions, no state store —
    and the streamed result equals the batch result."""
    from btrblocks_spark.functions.text import corpus_features, scrub_pii

    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps for it was a fine day in the "
                "park and all of the dogs ran to the gate " * 2),
            (2, "der hund und die katze sind von den nicht ein haus"),
            (3, "mail me at someone@example.com for that prize it is the "
                "best of all the prizes and you want it " * 2),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(src)

    def curate(df):
        feats = corpus_features(df, keep=["text"]).filter(
            (F.col("pred_lang") == "en") & (F.col("quality") >= 0.1)
        )
        return scrub_pii(feats).select("doc_id", "n_email", "text")

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        r.doc_id: r for r in spark.sql("SELECT * FROM curated_stream").collect()
    }
    want = {r.doc_id: r for r in curate(docs).collect()}
    assert set(got) == set(want) == {1, 3}
    assert got[3].n_email == 2 and "<EMAIL>" in got[3].text  # doc text is x2
    for k in want:
        assert got[k].text == want[k].text
