"""Streaming Markov transitions: the stateful last-event-type
operator must emit exactly the batch lead-window pairs — including
the pairs that bridge micro-batch boundaries — when drained with
availableNow over time-ordered staged files."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from databridge_etl_tools_spark.registry import table as load_table
from databridge_etl_tools_spark.streaming import events as SE


def _stage_by_time(spark, tmp_path, n_files=3):
    """Stage events as n_files time-ordered parquet files (sequential
    appends → increasing mtimes → the file stream source replays them
    in event-time order, one per micro-batch)."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # split by ts percentile: equal-ts events always land in the same
    # file, so cross-file order is strictly time-monotone per user
    ts_bounds = [
        r["q"]
        for r in ev.selectExpr(
            f"percentile(unix_micros(CAST(ts AS TIMESTAMP)), array({','.join(str((i + 1) / n_files) for i in range(n_files - 1))})) AS qa"
        )
        .selectExpr("explode(qa) AS q")
        .collect()
    ]
    staging = str(tmp_path / "staging")
    lo = None
    cuts = ts_bounds + [None]
    for hi in cuts:
        part = ev
        if lo is not None:
            part = part.where(F.unix_micros(F.col("ts").cast("timestamp")) > F.lit(lo))
        if hi is not None:
            part = part.where(F.unix_micros(F.col("ts").cast("timestamp")) <= F.lit(hi))
        part.coalesce(1).write.mode("append").parquet(staging)
        lo = hi
    return ev, staging


def test_stream_transitions_equals_batch_pairs(spark, tmp_path):
    ev, staging = _stage_by_time(spark, tmp_path)
    out = SE.run_available_now(
        SE.stream_transitions(SE.read_event_stream(spark, staging)),
        "stream_transitions",
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in out.groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exp = {(r["prev_type"], r["next_type"]): r["n"] for r in batch.collect()}
    assert got == exp
    # sanity: pairs = events - users (one chain per user)
    n_users = ev.select("user_id").distinct().count()
    assert sum(got.values()) == ev.count() - n_users
