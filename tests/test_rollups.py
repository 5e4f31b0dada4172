"""Incremental rollup cascade + store compaction tests."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from databridge_etl_tools_spark.functions.datetimes import truncate_ntz
from databridge_etl_tools_spark.plans.rollups import DAILY, HOURLY, refresh_rollups
from databridge_etl_tools_spark.registry import table as load_table
from databridge_etl_tools_spark.sources.table_store import TableStore


def test_incremental_rollups_match_full_aggregation(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    ev = load_table(spark, "/root/testdata/sf0.001", "events").cache()

    # two batches interleaved over the SAME hours (parity split) —
    # the combine path, not just disjoint appends
    b1 = ev.where(F.col("event_id") % 2 == 0)
    b2 = ev.where(F.col("event_id") % 2 == 1)
    refresh_rollups(spark, store, b1)
    stats = refresh_rollups(spark, store, b2)
    assert stats["hourly_rows"] > 0 and stats["daily_rows"] > 0

    expect_hourly = {
        (str(r.bucket), r.event_type): (r.n, r.total_value)
        for r in ev.groupBy(
            truncate_ntz("ts", "HOUR").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,2)")).alias("total_value"),
        )
        .collect()
    }
    got_hourly = {
        (str(r.bucket), r.event_type): (r.n, r.total_value)
        for r in store.read(HOURLY).collect()
    }
    assert got_hourly == expect_hourly

    expect_daily = {
        (str(r.bucket), r.event_type): (r.n, r.total_value)
        for r in ev.groupBy(
            truncate_ntz("ts", "DAY").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,2)")).alias("total_value"),
        )
        .collect()
    }
    got_daily = {
        (str(r.bucket), r.event_type): (r.n, r.total_value)
        for r in store.read(DAILY).collect()
    }
    assert got_daily == expect_daily


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    from pathlib import Path

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(0, 1000).repartition(16)
    store.overwrite("t", df)

    def n_files():
        return len(list(Path(store._current_data_dir("t")).glob("*.parquet")))

    assert n_files() == 16  # small-file accretion
    n = store.compact("t")
    assert n == 1 and n_files() == 1
    after = store.read("t")
    assert after.count() == 1000
    assert {r.id for r in after.collect()} == set(range(1000))
