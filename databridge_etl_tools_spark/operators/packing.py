"""Sequence packing for pretraining dataloaders.

GPT-style corpora are assembled by concatenating documents in a
stable order and cutting the token stream every ``budget`` tokens; a
document belongs to the training sequence where it STARTS
(concat-and-chunk). The bin assignment is therefore a pure function
of (order, token counts) — ``floor(exclusive_prefix_sum / budget)`` —
independent of physical partitioning, which is what makes it
oracle-checkable and retry-stable.

The prefix sum is computed with the standard two-pass distributed
recipe, NOT a global single-partition window (the classic 100 TB
scale-killer: ``Window.orderBy`` without ``partitionBy`` funnels the
corpus through one task):

1. range-partition by the order key, cumsum WITHIN each partition
   (window partitioned by ``spark_partition_id``);
2. collect the per-partition totals (``n_parts`` scalars — bounded,
   like k-means centroids), prefix-sum them on the driver, and
   broadcast the offsets back.

The result is identical for ANY partition boundaries — the offsets
cancel the arbitrariness — pinned by the single-partition-twin test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    size_col: Column | str,
    id_col: str = "doc_id",
    budget: int = 256,
    n_parts: int = 32,
) -> DataFrame:
    """Assign each row to its training sequence: df + ``seq_id``,
    ``seq_start`` (the row's global token offset). Rows are ordered by
    ``id_col``; ``size_col`` is the row's token count."""
    from .materialize import materialize

    size = F.col(size_col) if isinstance(size_col, str) else size_col
    base = df.withColumn("_n", size.cast("bigint"))
    parts = base.repartitionByRange(n_parts, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # materialized: the totals job and the final plan must see the
    # SAME partition assignment — repartitionByRange's sampled
    # boundaries are not re-execution-stable (r7: the running_sum
    # oracle caught a 3-row boundary shift skewing every offset;
    # same two-consumer shape here)
    local = materialize(
        parts.withColumn("_local_start", F.coalesce(F.sum("_n").over(w), F.lit(0)))
    )
    totals = (
        local.groupBy("_pid").agg(F.sum("_n").alias("_total")).orderBy("_pid").collect()
    )
    acc = 0
    offsets = []
    for r in totals:
        offsets.append((r["_pid"], acc))
        acc += r["_total"]
    off_df = local.sparkSession.createDataFrame(offsets, "_pid int, _offset bigint")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("seq_start", F.col("_offset") + F.col("_local_start"))
        .withColumn("seq_id", F.expr(f"seq_start DIV {budget}"))
        .drop("_pid", "_local_start", "_offset", "_n")
    )
