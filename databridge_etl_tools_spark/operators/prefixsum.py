"""Scale-safe GLOBAL ordered aggregation (running totals).

``SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` with no
PARTITION BY is the canonical single-task killer: Spark plans an
``Exchange SinglePartition`` and sorts the entire input in one task.
The distributed classic is the two-pass prefix sum (the same shape
``packing.pack_sequences`` uses for token offsets, generalized here):

1. ``repartitionByRange`` on the order keys — disjoint, ordered key
   ranges, each sorted LOCALLY by its own task;
2. per-partition running sum (a window keyed by the partition id —
   every partition is a bounded task);
3. per-partition totals → driver cumulative offsets (n_parts rows —
   a bounded collect) → broadcast join adds each partition's offset.

The partition-tagged running frame is MATERIALIZED before the totals
collect: the totals job and the final plan must see the SAME
partition assignment, and ``repartitionByRange``'s sampled boundaries
are not re-execution-stable (observed: a 10 k-row input shifted a
boundary by 3 rows between the two jobs, skewing every downstream
offset — caught by the oracle). The checkpoint also means the window
pass runs once, not twice.

Determinism for oracle parity: feed an INTEGER value column
(fixed-point if the source is double) — integer addition is
order-independent, so the running values are engine-identical under
any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_sum(
    df: DataFrame,
    order_cols: "list[str]",
    value_col: str,
    *,
    n_parts: int = 32,
    out_col: str = "running",
) -> DataFrame:
    """Add ``out_col`` = cumulative sum of ``value_col`` over the
    TOTAL order given by ``order_cols`` (inclusive frame — the row's
    own value counts), without a single-partition sort. The order
    must be total (include a unique tiebreaker column) or rows tied
    on all keys get frame-order-dependent running values — the same
    contract every deterministic ORDER BY window carries here."""
    from .materialize import materialize

    base = df.withColumn("_v", F.col(value_col).cast("bigint"))
    parts = base.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = materialize(parts.withColumn("_local", F.sum("_v").over(w)))
    totals = (
        local.groupBy("_pid").agg(F.sum("_v").alias("_total")).orderBy("_pid").collect()
    )
    acc = 0
    offsets = []
    for r in totals:
        offsets.append((int(r["_pid"]), acc))
        acc += int(r["_total"])
    off_df = local.sparkSession.createDataFrame(offsets, "_pid int, _offset bigint")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_local")).cast("bigint"))
        .drop("_pid", "_local", "_offset", "_v")
    )
