"""Streaming count-min sketch: the frequency summary as a running
Structured Streaming aggregate.

CMS counters are ADDITIVE (each token occurrence increments one
bucket per lane), so the whole sketch is one streaming
``groupBy(lane, bucket).count()`` over the exploded token stream —
Spark's state store IS the sketch. That is the textbook reason
sketches exist: bounded (L×W counters), mergeable state that an
incremental job can maintain forever, while the exact vocabulary
count grows without bound. Drained with ``availableNow`` the result
is IDENTICAL to the batch sketch over the same files (pinned in
tests/test_streaming_sketch.py against
``operators.sketch.countmin_table``).

Cost note: the stream pays lanes× md5 per token OCCURRENCE; the
batch builder pays it per VOCABULARY entry (it pre-aggregates, which
a streaming plan cannot — multiple chained aggregations are not
allowed). That is the honest streaming tax, and it is map-side only;
the shuffled state is still just (lane, bucket) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketch import _bucket
from ..operators.textstats import tokens


def stream_countmin(
    stream: DataFrame,
    *,
    text_col: str = "text",
    lanes: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Running CMS over a document stream: ``(lane, bucket,
    bucket_n)``, one row per non-empty counter. Use output mode
    ``complete`` (the counter table is bounded — L×W rows — so
    complete mode is cheap by construction) or ``update`` for
    incremental sinks."""
    lane = F.explode(F.sequence(F.lit(0), F.lit(lanes - 1))).alias("lane")
    toks = stream.select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        toks.select("token", lane)
        .select("lane", _bucket(F.col("lane"), F.col("token"), width).alias("bucket"))
        .groupBy("lane", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bucket_n"))
    )


def stream_kmv(
    stream: DataFrame,
    col: str,
    *,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Running distinct-count sketch over a stream: the per-bucket
    hash MINIMUM (``operators.sketch.bucketmin_table`` semantics) as
    a pure streaming aggregate — ``groupBy(hv % k).min(hv)`` is
    bounded (≤ k rows of state), mergeable, and needs no watermark.
    True bottom-k KMV is NOT streaming-expressible (order-by-limit
    is not an aggregate); this is its stochastic-averaging sibling,
    drained with ``availableNow`` it is IDENTICAL to the batch
    bucket-min table over the same files (pinned in
    tests/test_streaming_sketch.py). Estimate downstream with
    ``bucketmin_estimate``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        stream.where(F.col(col).isNotNull())
        .select(h.alias("hv"))
        .groupBy((F.col("hv") % k).alias("bucket"))
        .agg(F.min("hv").alias("min_hv"))
    )


def stream_windowed_distinct(
    stream: DataFrame,
    col: str = "user_id",
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Approximate distinct-count per tumbling time window as a
    running sketch: ``(window, bucket, min_hv)`` — the bucket-min
    distinct sketch keyed by event-time window, watermarked so state
    for closed windows is dropped (the unbounded-state trap of exact
    windowed count-distinct is the entire reason this operator
    exists: exact per-window distinct holds every key in state
    forever at 100 TB/day; this holds ≤ k minima per window).
    Feed each window's rows to ``operators.sketch.bucketmin_estimate``
    downstream. availableNow drain == batch per-window bucket-min
    table (pinned in tests/test_streaming_sketch.py)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        stream.withColumn("_ts_ltz", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts_ltz", watermark)
        .where(F.col(col).isNotNull())
        .select(F.window("_ts_ltz", window).alias("win"), h.alias("hv"))
        .groupBy("win", (F.col("hv") % k).alias("bucket"))
        .agg(F.min("hv").alias("min_hv"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "bucket",
            "min_hv",
        )
    )


def stream_quantile_histogram(
    stream: DataFrame,
    col: str = "value",
    *,
    ts_col: str = "ts",
    watermark: str = "2 days",
    gmin: int = 0,
    width: int = 1,
    bins: int = 256,
) -> DataFrame:
    """Running per-day fixed-bin HISTOGRAM sketch over a value
    stream — the incremental builder for the batch
    ``sketch_quantile_rollup`` summaries: one row of state per
    (day, bin), counters ADDITIVE, so Spark's state store IS the
    mergeable quantile sketch (≤ days·bins rows; the watermark drops
    closed days). Bin arithmetic is the batch query's exact integer
    recipe — ``(floor(value·1e6) − gmin) DIV width`` — so an
    ``availableNow`` drain over the same files equals the batch
    (day, bin) table bit-for-bit (pinned in tests).

    Bounds are CALLER-FIXED: a streaming job cannot re-scan history
    to re-bin, so the domain comes from config/batch calibration;
    out-of-range values CLAMP to the edge bins (state stays bounded
    and every merge of shards built with the same (gmin, width,
    bins) remains exact)."""
    raw_bin = F.expr(
        f"(cast(floor({col} * 1000000.0) as bigint) - {int(gmin)})"
        f" DIV {int(width)}"
    )
    clamped = F.least(
        F.greatest(raw_bin, F.lit(0).cast("bigint")),
        F.lit(int(bins) - 1).cast("bigint"),
    )
    return (
        stream.withColumn("_ts_ltz", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts_ltz", watermark)
        .where(F.col(col).isNotNull() & ~F.isnan(F.col(col)))
        .select(
            F.to_date("_ts_ltz").alias("day"), clamped.alias("bin")
        )
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def stream_key_census(
    stream: DataFrame,
    key_col: str,
) -> DataFrame:
    """Running per-key occurrence counts ``(key, n)`` — the streaming
    state behind the join-skew pre-flight (r8 verdict stretch #8):
    maintain the key histogram incrementally on the event stream, so
    the skew report is current BEFORE the big batch join launches
    instead of requiring its own full scan.

    Counts are ADDITIVE, so the aggregate is a pure streaming
    ``groupBy(key).count()`` — Spark's state store holds one row per
    DISTINCT key (the honest state bound of any exact census; for a
    join-key audit the key domain is the dimension being audited, and
    a heavy-hitter sketch — ``stream_countmin`` — is the fallback when
    even that is too wide). An ``availableNow`` drain equals the batch
    key count over the same files bit-for-bit, so feeding the drained
    snapshot to ``operators.profile.key_census`` reproduces the batch
    ``join_skew_diagnostics`` report exactly (pinned in
    tests/test_streaming_sketch.py)."""
    return (
        stream.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
