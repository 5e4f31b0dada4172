"""Extended analytics queries: sessionization, pivot, cube, as-of
join, binary-column stats — Spark built-ins the reference lacks
entirely (SURVEY §2.5 'absent' list) plus the multimodal metadata
pass. Each has an independent DuckDB oracle (DuckDB's native ASOF
JOIN checks our window-based as-of implementation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.multimodal import binary_stats
from ..registry import query, table
from ..streaming.events import sessionize_batch


@query(
    "events_sessionize",
    oracle="""
    WITH w AS (
      SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    flags AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) >= 30*60*1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM w),
    sess AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM flags)
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY 1, 2
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + running boundary sum,
    one shuffle on user_id. The streaming twin is
    ``streaming.events.sessionize_stream`` (session_window)."""
    ev = table(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=30)


@query(
    "pivot_priority_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_pending
    FROM orders GROUP BY 1
    """,
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) — map-side combinable,
    single shuffle on the group key."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .withColumnsRenamed({"O": "n_open", "F": "n_filled", "P": "n_pending"})
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(38,2))) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations incl. grand total)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("qty"),
    )


@query(
    "asof_purchase_last_view",
    oracle="""
    WITH views AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase, the
    most recent view of the same user at ts ≤ purchase time.

    Implementation: union-tag both streams, order by (ts, tag) per
    user, carry the last non-null view timestamp forward — one
    shuffle on user_id, no range join. DuckDB's native ASOF JOIN is
    the independent oracle."""
    ev = table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts"), F.lit(None).cast("bigint").alias("event_id"), F.lit(0).alias("tag")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.col("event_id"), F.lit(1).alias("tag")
    )
    tagged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_view_ts",
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("tag") == 1).select(
        "event_id", "user_id", "ts", "last_view_ts"
    )


@query(
    "mm_binary_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata pass on an opaque binary column (here the
    UTF-8 bytes of text standing in for media content): byte length +
    content hash, never leaving the JVM."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    return binary_stats(docs, "content", "doc_id")
