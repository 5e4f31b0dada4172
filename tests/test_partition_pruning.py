"""Partition-pruning proof: date-partitioned writes let a day-filter
scan only that day's files — the SCALE.md layout claim for event
data, asserted from the executed plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from databridge_etl_tools_spark.registry import table as load_table


def test_date_partitioned_scan_prunes(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_day")
    (
        ev.withColumn("dt", F.col("ts").cast("date"))
        .write.partitionBy("dt")
        .parquet(out)
    )

    df = spark.read.parquet(out).where(F.col("dt") == "2024-01-05")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the date predicate lands in PartitionFilters (directory pruning),
    # not as a data filter over all files
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "dt" in pf and "2024-01-05" in pf

    expected = ev.where(F.col("ts").cast("date") == "2024-01-05").count()
    assert df.count() == expected and expected > 0
