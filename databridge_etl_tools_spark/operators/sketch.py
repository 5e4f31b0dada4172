"""Count-min sketch over the corpus token stream.

The mergeable fixed-size frequency summary (Cormode & Muthukrishnan
2005): L hash lanes × W buckets of counters; estimate(t) = min over
lanes of t's bucket — always ≥ the true count (one-sided error
≤ N/W with high probability). The streaming/approximate sibling of
the exact vocabulary count: at 100 TB you keep the 4×1024-counter
sketch, not the 10⁹-row exact table.

Engine-deterministic by construction: bucket assignment is the
repo's standard md5-prefix hash (``CAST('0x'||substr(md5(…),1,8) AS
BIGINT)`` reproduces it in DuckDB), and every counter is an exact
integer SUM — so unlike Spark's built-in
``count_min_sketch`` aggregate (seeded murmur, opaque binary), this
one is oracle-checkable bit-for-bit.

Scale shape: ONE token-keyed count shuffle (vocabulary-sized
output); the sketch itself is built from the vocabulary counts (not
the raw stream — same result, since the bucket sum is additive), so
lanes explode L× over the vocabulary, never over the corpus; the
L×W bucket table is bounded (KBs) and broadcast back for estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize
from .textstats import tokens


def _bucket(lane, token, width: int):
    """md5-prefix bucket in [0, width): lane-salted, engine-portable."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cms"), lane.cast("string"), F.lit(":"), token)),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return h % width


def countmin_table(counts: DataFrame, *, lanes: int = 4, width: int = 1024) -> DataFrame:
    """The L×W counter table ``(lane, bucket, bucket_n)`` from a
    ``(token, c)`` count table. Bucket sums are ADDITIVE, so building
    from the vocabulary counts (not the raw token stream) yields the
    identical sketch at vocabulary×L cost — and the same additivity
    is what makes the sketch a valid running STREAMING aggregate
    (``streaming.sketch.stream_countmin``)."""
    lane = F.explode(F.sequence(F.lit(0), F.lit(lanes - 1))).alias("lane")
    return (
        counts.select("token", "c", lane)
        .select(
            "c", "lane", _bucket(F.col("lane"), F.col("token"), width).alias("bucket")
        )
        .groupBy("lane", "bucket")
        .agg(F.sum("c").cast("bigint").alias("bucket_n"))
    )


def countmin_topk(
    docs: DataFrame,
    *,
    text_col: str = "text",
    lanes: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> DataFrame:
    """Build an L×W count-min sketch of the corpus token frequencies
    and report, for the exact top-``top_k`` tokens, the true count vs
    the sketch estimate: ``(rank, token, exact_n, cms_est, overest)``
    with ``overest = cms_est − exact_n ≥ 0`` (the one-sided error).

    The exact top-k is the honesty anchor (and compiles to
    TakeOrderedAndProject); the sketch is what survives at scale."""
    counts = materialize(
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lane = F.explode(F.sequence(F.lit(0), F.lit(lanes - 1))).alias("lane")
    cms = countmin_table(counts, lanes=lanes, width=width)
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    top = counts.withColumn("rank", F.row_number().over(w).cast("int")).where(
        F.col("rank") <= top_k
    )
    est = (
        top.select("rank", "token", F.col("c").alias("exact_n"), lane)
        .select(
            "rank",
            "token",
            "exact_n",
            "lane",
            _bucket(F.col("lane"), F.col("token"), width).alias("bucket"),
        )
        .join(F.broadcast(cms), ["lane", "bucket"])
        .groupBy("rank", "token", "exact_n")
        .agg(F.min("bucket_n").alias("cms_est"))
    )
    return est.select(
        "rank",
        "token",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("overest"),
    )
