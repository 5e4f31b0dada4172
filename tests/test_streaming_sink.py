"""Streaming depth (ROADMAP 4): exactly-once foreachBatch upsert into
the TableStore, and dynamic-gap sessionization with an independent
first-principles twin cross-checking the native session_window."""

from __future__ import annotations

from pyspark.sql import functions as F

from databridge_etl_tools_spark.registry import table as load_table
from databridge_etl_tools_spark.sources.table_store import TableStore
from databridge_etl_tools_spark.streaming import events as SE

SF = "/root/testdata/sf0.001"
GAPS = {"purchase": "90 minutes", "error": "5 minutes"}


def test_dynamic_gap_session_window_matches_first_principles(spark):
    ev = load_table(spark, SF, "events")
    native = SE.sessionize_dynamic(ev, SE.dynamic_gap("30 minutes", GAPS))
    twin = SE.sessionize_batch_dynamic(ev, SE.dynamic_gap_us("30 minutes", GAPS))
    n = {(r.user_id, str(r.session_start)): r.n_events for r in native.collect()}
    t = {(r.user_id, str(r.session_start)): r.n_events for r in twin.collect()}
    assert n == t
    # the policy actually bites: a uniform 30-minute gap sessionizes
    # differently than the per-type policy
    uniform = SE.sessionize_dynamic(ev, SE.dynamic_gap("30 minutes", {}))
    u = {(r.user_id, str(r.session_start)): r.n_events for r in uniform.collect()}
    assert u != n


def test_dynamic_gap_stream_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    staging = str(tmp_path / "dyn_staging")
    # stage in event-time order (3 files = 3 micro-batches): batches
    # arriving wildly out of order would be dropped by the watermark —
    # the correct streaming behavior, but not what this parity asserts
    day = F.dayofmonth("ts")
    ev.where(day <= 10).coalesce(1).write.parquet(staging)
    ev.where((day > 10) & (day <= 20)).coalesce(1).write.mode("append").parquet(staging)
    ev.where(day > 20).coalesce(1).write.mode("append").parquet(staging)

    batch = SE.sessionize_dynamic(ev, SE.dynamic_gap("30 minutes", GAPS))
    b = {(r.user_id, str(r.session_start)): r.n_events for r in batch.collect()}

    stream = SE.read_event_stream(spark, staging)
    q = (
        SE.sessionize_dynamic(stream, SE.dynamic_gap("30 minutes", GAPS))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("dyn_sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    s = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in spark.sql("SELECT * FROM dyn_sess_out").collect()
    }
    assert b == s


def test_stream_upsert_into_store_exactly_once(spark, tmp_path):
    ev = load_table(spark, SF, "events").limit(300).cache()
    staging = str(tmp_path / "upsert_staging")
    ckpt = str(tmp_path / "upsert_ckpt")
    # 3 files → 3 micro-batches; event_id%100 makes later batches
    # OVERWRITE earlier rows (a real upsert, not a pure append)
    staged = ev.withColumn("event_id", F.col("event_id") % 100)
    staged.where(F.col("user_id") % 3 == 0).coalesce(1).write.parquet(staging)
    staged.where(F.col("user_id") % 3 == 1).coalesce(1).write.mode("append").parquet(staging)
    staged.where(F.col("user_id") % 3 == 2).coalesce(1).write.mode("append").parquet(staging)

    store = TableStore(spark, str(tmp_path / "store"))
    SE.stream_upsert_into_store(
        SE.read_event_stream(spark, staging),
        store,
        "events_live",
        keys=["event_id"],
        checkpoint_dir=ckpt,
        staging_order=[F.col("ts").desc(), F.col("user_id")],
    )

    got = store.read("events_live")
    # exactly one row per key, and every staged key arrived
    assert got.count() == got.select("event_id").distinct().count()
    assert (
        got.select("event_id").distinct().count()
        == staged.select("event_id").distinct().count()
    )
    epochs_done = store.properties("events_live")["last_epoch"]
    assert epochs_done >= 2  # three micro-batches committed

    # replayed epoch (crash between store commit and checkpoint write)
    # is skipped before any write: same version, same rows
    before = store._read_manifest("events_live")["current"]
    assert store.commit_epoch("events_live", got.limit(0), epochs_done) is False
    assert store._read_manifest("events_live")["current"] == before

    # restarting the drained stream with the same checkpoint is a no-op
    SE.stream_upsert_into_store(
        SE.read_event_stream(spark, staging),
        store, "events_live", keys=["event_id"], checkpoint_dir=ckpt,
    )
    assert store.read("events_live").count() == got.count()
    assert store.properties("events_live")["last_epoch"] == epochs_done
