"""Watermarked stream-stream join: batch/stream parity + the outer
emission contract (streaming/joins.py)."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

from databridge_etl_tools_spark.registry import table as load_table
from databridge_etl_tools_spark.streaming import events as SE
from databridge_etl_tools_spark.streaming.joins import purchases_with_attributed_view

SF = "/root/testdata/sf0.001"


def _stage_three_batches(ev, tmp_path, name):
    """Three event-time-ordered files → three micro-batches."""
    staging = str(tmp_path / name)
    day = F.dayofmonth("ts")
    now = time.time()
    parts = (ev.where(day <= 10), ev.where((day > 10) & (day <= 20)), ev.where(day > 20))
    for i, b in enumerate(parts):
        b.coalesce(1).write.mode("append").parquet(staging)
        for f in glob.glob(os.path.join(staging, "*.parquet")):
            if os.path.getmtime(f) > now - 1:
                os.utime(f, (now - 60 + i, now - 60 + i))
    return staging


def _run(stream_df, name):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_stream_stream_inner_join_matches_batch(spark, tmp_path):
    """Inner interval join across two live streams equals the batch
    run over the same events — matched pairs emit as soon as both
    sides arrive, so in-order staging gives exact parity."""
    ev = load_table(spark, SF, "events").cache()
    staging = _stage_three_batches(ev, tmp_path, "ssj_inner")

    batch = {
        tuple(r)
        for r in purchases_with_attributed_view(ev).collect()
    }
    _run(
        purchases_with_attributed_view(SE.read_event_stream(spark, staging)),
        "ssj_inner_out",
    )
    stream = {tuple(r) for r in spark.sql("SELECT * FROM ssj_inner_out").collect()}
    assert stream == batch
    assert len(batch) > 0


def test_stream_stream_left_outer_emission_contract(spark, tmp_path):
    """Left-outer stream-stream contract: matched rows equal the
    inner join; emitted NULL-view rows are genuinely unmatched in the
    batch oracle; unmatched purchases whose interval the final
    watermark never closed are withheld (streaming ⊆ batch)."""
    ev = load_table(spark, SF, "events").cache()
    staging = _stage_three_batches(ev, tmp_path, "ssj_outer")

    batch_rows = purchases_with_attributed_view(ev, how="left_outer").collect()
    batch = {tuple(r) for r in batch_rows}
    batch_matched = {t for t in batch if t[4] is not None}
    batch_unmatched_ids = {t[0] for t in batch if t[4] is None}

    _run(
        purchases_with_attributed_view(
            SE.read_event_stream(spark, staging), how="left_outer"
        ),
        "ssj_outer_out",
    )
    stream = {tuple(r) for r in spark.sql("SELECT * FROM ssj_outer_out").collect()}
    s_matched = {t for t in stream if t[4] is not None}
    s_null = {t for t in stream if t[4] is None}

    assert s_matched == batch_matched
    assert stream <= batch
    # the final no-data batch advances the watermark past most of the
    # month, so unmatched purchases DO surface with NULL views
    assert len(s_null) > 0
    assert {t[0] for t in s_null} <= batch_unmatched_ids
