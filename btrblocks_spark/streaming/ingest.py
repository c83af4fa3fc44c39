"""Streaming ingest: file-source events → watermarked windowed aggregates.

The streaming twin of ``plans.codec_queries.events_hourly``: same logical
aggregation, expressed as an incremental plan with a watermark for late
data. ``run_events_stream`` uses ``availableNow`` so tests and backfills
drain the source and stop — the identical query keeps running on a live
directory in production.

Also: ``sessionize`` — a custom stateful operator
(``applyInPandasWithState``) building per-user sessions with an
inactivity gap, the pattern for stateful ops Spark lacks built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window per event_type with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_events_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "events_hourly_stream",
) -> None:
    """Drain the source with availableNow into an in-memory sink."""
    stream = read_events_stream(spark, input_dir)
    agg = hourly_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_into_table(
    stream: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    query_name: str = "btr_ingest",
):
    """Continuously ingest a stream into a BtrTable via foreachBatch.

    Each micro-batch becomes one block-encoded append snapshot; the
    streaming checkpoint gives exactly-once batch ids and the table's
    per-task markers make each append idempotent — killed mid-batch, the
    retry skips finished tasks (checkpoint-resumable commits, north rule).
    """
    from btrblocks_spark.sources.table import BtrTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = BtrTable.load(batch_df.sparkSession, table_root)
        table.append(
            batch_df,
            job_id=f"{query_name}-b{batch_id}",
            operation="stream-append",
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert_into_table(
    stream: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    on: str,
    query_name: str = "btr_upsert",
    strategy: str = "mor",
):
    """Continuously UPSERT a stream into a BtrTable (CDC apply).

    Each micro-batch runs MERGE INTO (default merge-on-read: matched
    rows -> positional deletes + new data files, written bytes scale
    with the batch, not the table). Exactly-once: the merge snapshot
    carries (query_name, batch_id) in its summary; a replayed batch
    (restart after crash between commit and checkpoint advance) finds
    the marker and skips — MERGE is not idempotent on its own (re-
    appending update rows would duplicate), unlike plain appends.

    Batches with duplicate keys are reduced to the LAST row per key
    first (arbitrary-but-deterministic max over payload at equal keys),
    since MERGE semantics require a unique source key set.
    """
    from pyspark.sql import Window

    from btrblocks_spark.operators.merge import merge_into
    from btrblocks_spark.sources.table import BtrTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = BtrTable.load(batch_df.sparkSession, table_root)
        for s in table.snapshots():
            sm = s.get("summary") or {}
            if (
                sm.get("stream_upsert") == query_name
                and sm.get("stream_batch_id") == batch_id
            ):
                return  # replayed batch: already committed
        w = Window.partitionBy(on).orderBy(
            *[F.col(c).desc_nulls_last() for c in batch_df.columns]
        )
        unique = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merge_into(
            table,
            unique,
            on=on,
            strategy=strategy,
            job_id=f"{query_name}-b{batch_id}",
            extra_summary={
                "stream_upsert": query_name,
                "stream_batch_id": batch_id,
            },
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


DEDUP_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("doc_id", LongType()),
        StructField("first_seen_batch", LongType()),
        StructField("dup_count", LongType()),
    ]
)

_DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("keep_doc_id", LongType()),
        StructField("seen", LongType()),
    ]
)


def streaming_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup — the incremental twin of
    ``functions.dedup.exact_dedup``.

    Groups by the normalized-content md5 (computed JVM-side) and keeps
    per-hash state (first doc id + running count) in
    ``applyInPandasWithState``. Emits one row per hash per micro-batch
    only when NEW duplicates arrive, so a continuously-ingesting corpus
    keeps an exact, incrementally-maintained duplicate registry without
    ever re-scanning history — at 10^12 docs the state store holds one
    small row per distinct document. Keys are hashes, so state is
    uniformly partitioned (no hot keys).
    """
    import pandas as pd

    hashed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        ).alias("content_hash"),
    )

    def fn(key, pdfs, state: GroupState):
        (content_hash,) = key
        rows = pd.concat(list(pdfs))
        batch_min = int(rows["doc_id"].min())
        n_new = len(rows)
        if state.exists:
            keep, seen = state.get
            first = 0
        else:
            keep, seen = batch_min, 0
            first = 1
        keep = min(keep, batch_min)
        seen += n_new
        state.update((keep, seen))
        yield pd.DataFrame(
            {
                "content_hash": [content_hash],
                "doc_id": [keep],
                "first_seen_batch": [first],
                "dup_count": [seen],
            }
        )

    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize(
    stream: DataFrame, gap_minutes: int = 30, use_timeout: bool = False
) -> DataFrame:
    """Per-user sessions split on inactivity gaps (custom stateful op).

    ``use_timeout=True`` additionally flushes idle sessions via
    ProcessingTimeTimeout — for live streams only (an availableNow drain
    never fires processing-time timeouts and would wait forever).
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if use_timeout and state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000
        vals = rows["value"].to_numpy()
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us, end_us, n, total = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0, 0.0
        out = []
        for t, v in zip(ts_us, vals):
            if t - end_us > gap_us and n > 0:
                out.append((user_id, start_us, end_us, n, total))
                start_us, n, total = int(t), 0, 0.0
            end_us = int(t)
            n += 1
            total += float(v)
        state.update((start_us, end_us, n, total))
        if use_timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
