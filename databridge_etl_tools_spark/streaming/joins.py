"""Watermarked stream-stream joins (SURVEY §2.8 extension).

The reference has no streaming joins; its nearest shape is the
batch AIS-geocoder enrichment left join (ais_geocoder/
ais_geocoder.py:40-114). This module is the streaming analogue a
DataBridge-style pipeline grows into: two live event streams joined
on a key within an event-time interval, with watermarks bounding
BOTH sides' state.

State story (the 100 TB concern): a stream-stream join buffers each
side until the watermark proves no future match can arrive. Spark
derives the eviction bound from (a) both inputs' watermarks and
(b) the time-interval join condition — so the interval below is not
just semantics, it is what makes state finite. Without the interval
bounds the right side would buffer forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_attributed_view(
    events: DataFrame,
    attribution_window: str = "2 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream attribution join: each purchase joined to the
    same user's view events in the preceding ``attribution_window``.

    Works identically on a batch frame (plain interval join) and on a
    watermarked stream (state-backed stream-stream join) — the
    batch/stream parity contract every operator in this package keeps,
    so the batch run is the oracle for the streaming run.

    ``how='left_outer'`` keeps unattributed purchases (NULL view
    columns) — outer results emit only once the watermark closes the
    match interval.
    """
    src = events.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts_ltz", watermark)
    views = src.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts_ltz").alias("v_ts"),
    )
    purchases = src.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ltz").alias("p_ts"),
        F.col("value"),
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {attribution_window}"))
    )
    joined = purchases.join(views, cond, how)
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.col("p_ts").alias("purchase_ts"),
        "value",
        "view_id",
        F.col("v_ts").alias("view_ts"),
    )
