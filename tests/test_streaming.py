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
