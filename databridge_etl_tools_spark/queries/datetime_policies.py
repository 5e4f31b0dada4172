"""Timezone-policy queries (SURVEY §2.7 F7-F9, §2.8 batch windows).

The oracles use DuckDB's instant-based ``timezone()`` nesting —
independent of either engine's session timezone, matching the
engine's ``convert_timezone``-on-NTZ implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import datetimes as DT
from ..registry import query, table

DEC2 = "decimal(38,2)"


@query(
    "tz_policies",
    oracle="""
    SELECT o_orderkey,
           o_orderdate AS naive_ts,
           timezone('UTC', timezone('America/New_York', o_orderdate)) AS utc_ts,
           epoch_ms(timezone('America/New_York', o_orderdate)) AS esri_ms
    FROM orders
    """,
)
def tz_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 + F9 in one projection: the extract policy — naive
    timestamps are Eastern wall clock, rendered as the UTC instant
    (postgres/postgres.py:837-857) — and the Esri/AGO date policy —
    the same instant as epoch milliseconds (ago/ago.py:460-476).
    Orderdates span 1995-2001, so both EST and EDT offsets are
    actually exercised."""
    # deliberately NOT access="scan": the per-row tz conversion is
    # CPU-dense, so the bucketed copy's file fan-out buys scan
    # parallelism here (the opposite trade from pricing_summary)
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("naive_ts"),
        DT.localize_naive_eastern("o_orderdate").alias("utc_ts"),
        DT.naive_eastern_to_epoch_ms("o_orderdate").alias("esri_ms"),
    )


@query(
    "tz_carto_midnight",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS d,
           timezone('UTC', timezone('America/New_York', date_trunc('day', o_orderdate))) AS eastern_midnight_utc
    FROM orders
    """,
    gate=False,
)
def tz_carto_midnight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: the Carto date policy — date → Eastern midnight rendered
    in UTC (carto/carto_.py:338-351)."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderdate").cast("date").alias("d"),
        DT.date_to_eastern_midnight_utc("o_orderdate").alias("eastern_midnight_utc"),
    ).distinct()


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time hourly rollup — the batch shape of the streaming
    windowed aggregation (same plan Structured Streaming would run
    incrementally with a watermark; see streaming/)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            DT.truncate_ntz("ts", "HOUR").alias("hour_bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC2)).cast("double").alias("total_value"),
        )
    )


@query(
    "events_trending_types",
    oracle="""
    WITH w AS (
      SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT hour_bucket, event_type, n,
             CAST(row_number() OVER (PARTITION BY hour_bucket
                  ORDER BY n DESC, event_type) AS INTEGER) AS rank,
             CAST(n - COALESCE(lag(n) OVER (PARTITION BY event_type
                  ORDER BY hour_bucket), 0) AS BIGINT) AS delta
      FROM w)
    SELECT hour_bucket, event_type, n, rank, delta FROM r WHERE rank <= 3
    """,
    gate=False,
)
def events_trending_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending leaderboard: top-3 event types per hour with momentum
    (``delta`` = count minus the type's previous OBSERVED hour; first
    appearance counts from 0). Both windows run over the HOURLY
    AGGREGATE — hours × types rows, tiny next to the event stream —
    so the leaderboard costs one rollup shuffle plus two cheap window
    passes; the same shape Structured Streaming maintains
    incrementally with a watermark."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = ev.groupBy(
        DT.truncate_ntz("ts", "HOUR").alias("hour_bucket"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rk = Window.partitionBy("hour_bucket").orderBy(F.desc("n"), F.asc("event_type"))
    lg = Window.partitionBy("event_type").orderBy("hour_bucket")
    return (
        w.withColumn("rank", F.row_number().over(rk).cast("int"))
        .withColumn(
            "delta",
            (F.col("n") - F.coalesce(F.lag("n").over(lg), F.lit(0))).cast("bigint"),
        )
        .where(F.col("rank") <= 3)
        .select("hour_bucket", "event_type", "n", "rank", "delta")
    )
