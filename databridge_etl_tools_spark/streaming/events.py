"""Structured Streaming over the events table (SURVEY §2.8).

The reference has no streaming operators — its incrementality is
upsert-over-snapshots. This module adds the Spark-native streaming
shapes a DataBridge-style pipeline grows into: micro-batch ingestion
of a staging directory (``availableNow`` drains what exists, then
stops — the S3-staging-bucket pattern), watermarked event-time
windows for late data, and batch/stream-parity sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """File-source stream over a staging directory (one file per
    micro-batch by default; at scale: maxFilesPerTrigger tuning)."""
    return (
        spark.readStream.schema(schema or EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type: late rows
    beyond the watermark are dropped, state is bounded."""
    return (
        stream.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", watermark)
        .groupBy(F.window("ts_ltz", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain everything currently staged (Trigger.AvailableNow), then
    stop — the batch-ish execution mode for bucket ingestion. Returns
    the materialized result from the memory sink."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def sessionize_batch(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the
    previous event of the same user exceeds ``gap_minutes``. lag +
    running-sum of boundary flags — one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev = F.lag("ts").over(w)
    # microsecond arithmetic: exact in every engine (MINUTE units count
    # either boundary crossings or full intervals depending on engine)
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col("ts"))
    is_new = F.when(prev.isNull() | (gap_us >= gap_minutes * 60_000_000), 1).otherwise(0)
    with_sess = df.withColumn("session_seq", F.sum(is_new).over(w))
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per
    user, a running (events, value) total carried across micro-batches
    in state. Emits one row per user per batch that saw that user.

    The shape to note for scale: state is keyed by user_id (hash-
    distributed), each batch touches only the keys present in it, and
    the pandas function sees Arrow batches — the Spark-native form of
    'custom stateful operator' (SURVEY §2.8 is empty in the
    reference; this is the extension point)."""
    import pandas as pd

    def update(key, pdfs, state):
        user_id = key[0]
        n = 0
        total = 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        if state.exists:
            (prev_n, prev_total) = state.get
        else:
            prev_n, prev_total = 0, 0.0
        state.update((prev_n + n, prev_total + total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_events": [n],
                "cum_events": [prev_n + n],
                "cum_value": [prev_total + total],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, batch_events long, cum_events long, cum_value double",
        stateStructType="n long, total double",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def sessionize_stream(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization via the native session_window —
    state-backed, watermark-bounded (the stream twin of
    ``sessionize_batch``)."""
    return (
        stream.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "2 hours")
        .groupBy(F.session_window("ts_ltz", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
