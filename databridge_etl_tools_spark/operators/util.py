"""Operator-level scaling utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Fan a DataFrame out to ~cluster parallelism before CPU-heavy
    per-row work (shingling, hashing, vector folds).

    Spark sizes scan partitions by BYTES (maxPartitionBytes), so a
    small-but-compute-dense table (600 KB of text, 64-dim vectors)
    arrives as a single partition and serializes the whole operator
    onto one core. The few-MB shuffle this forces is noise next to
    the compute it parallelizes; at real scale the input is already
    many partitions and this becomes a cheap no-op-ish rebalance.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df
