"""Streaming count-min sketch: the running (lane, bucket) aggregate
drained with availableNow must equal the batch sketch over the same
files — the additivity/mergeability property that justifies sketches
as streaming state."""

from __future__ import annotations

from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.sketch import countmin_table
from databridge_etl_tools_spark.streaming import curation as C
from databridge_etl_tools_spark.streaming.sketch import stream_countmin

SF = "/root/testdata/sf0.001"


def _stage(spark, tmp_path, n_files=3):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    staging = str(tmp_path / "doc_staging")
    n = docs.count()
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        (
            docs.where((F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per))
            .coalesce(1)
            .write.mode("append")
            .parquet(staging)
        )
    return docs, staging


def test_stream_cms_equals_batch_cms(spark, tmp_path):
    docs, staging = _stage(spark, tmp_path)
    cms = stream_countmin(C.read_document_stream(spark, staging), width=64)
    q = (
        cms.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["lane"], r["bucket"]): r["bucket_n"]
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    counts = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exp = {
        (r["lane"], r["bucket"]): r["bucket_n"]
        for r in countmin_table(counts, width=64).collect()
    }
    assert got == exp
    assert len(got) <= 4 * 64  # bounded state: never more than L×W counters
    # total mass conservation: every token occurrence lands in each lane
    n_tok = counts.agg(F.sum("c")).collect()[0][0]
    for lane in range(4):
        assert sum(v for (l, _), v in got.items() if l == lane) == n_tok


def test_stream_kmv_equals_batch_bucketmin(spark, tmp_path):
    """Per-bucket hash minima are a pure streaming aggregate: the
    availableNow drain must equal the batch bucket-min table, and the
    estimate must land in the stochastic-averaging error band."""
    from databridge_etl_tools_spark.operators.sketch import (
        bucketmin_estimate,
        bucketmin_table,
    )
    from databridge_etl_tools_spark.streaming.sketch import stream_kmv

    docs, staging = _stage(spark, tmp_path)
    sk = stream_kmv(C.read_document_stream(spark, staging), "doc_id", k=16)
    q = (
        sk.writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_kmv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["min_hv"])
        for r in spark.sql("SELECT * FROM kmv_stream").collect()
    }
    exp = {
        (r["bucket"], r["min_hv"])
        for r in bucketmin_table(docs, "doc_id", k=16).collect()
    }
    assert got == exp
    assert len(got) <= 16  # bounded state
    n = docs.select("doc_id").distinct().count()
    est = bucketmin_estimate(bucketmin_table(docs, "doc_id", k=16), k=16)
    # mean-of-minima estimator, ~1/sqrt(16) = 25% std error band
    assert abs(est - n) / n < 0.75


def test_stream_windowed_distinct_equals_batch(spark, tmp_path):
    """Per-window bucket-min sketch drained availableNow must equal
    the batch per-window bucket-min table, and each window's estimate
    must track its exact distinct count."""
    from databridge_etl_tools_spark.operators.sketch import bucketmin_estimate
    from databridge_etl_tools_spark.registry import table as load_table
    from databridge_etl_tools_spark.streaming import events as SE
    from databridge_etl_tools_spark.streaming.sketch import stream_windowed_distinct

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path / "ev_staging")
    ev.repartition(3).write.parquet(staging)

    sk = stream_windowed_distinct(
        SE.read_event_stream(spark, staging), "user_id", window="6 hours", k=16
    )
    q = (
        sk.writeStream.format("memory")
        .queryName("wd_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_wd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["bucket"]): r["min_hv"]
        for r in spark.sql("SELECT * FROM wd_stream").collect()
    }
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    batch = (
        ev.select(F.window(F.col("ts").cast("timestamp"), "6 hours").alias("win"), hv.alias("hv"))
        .groupBy(F.col("win.start").alias("ws"), (F.col("hv") % 16).alias("bucket"))
        .agg(F.min("hv").alias("min_hv"))
    )
    exp = {(r["ws"], r["bucket"]): r["min_hv"] for r in batch.collect()}
    assert got == exp
    # estimate sanity on the largest window
    ws_top = max({w for w, _ in exp})
    one = spark.sql(
        f"SELECT bucket, min_hv FROM wd_stream WHERE win_start = '{ws_top}'"
    )
    n = (
        ev.select(F.window(F.col("ts").cast("timestamp"), "6 hours").alias("win"), "user_id")
        .where(F.col("win.start") == F.lit(ws_top))
        .select("user_id")
        .distinct()
        .count()
    )
    est = bucketmin_estimate(one, k=16)
    assert abs(est - n) / max(n, 1) < 1.0


def test_stream_quantile_histogram_equals_batch(spark, tmp_path):
    """Per-day histogram sketch drained availableNow must equal the
    batch (day, bin) table built with the same (gmin, width) — the
    incremental builder for sketch_quantile_rollup — and out-of-range
    values must clamp to the edge bins instead of growing state."""
    from databridge_etl_tools_spark.registry import table as load_table
    from databridge_etl_tools_spark.streaming import events as SE
    from databridge_etl_tools_spark.streaming.sketch import (
        stream_quantile_histogram,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    v = ev.where(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
    gmin, gmax = [
        int(x)
        for x in v.select(
            F.min(F.floor(F.col("value") * 1e6).cast("long")),
            F.max(F.floor(F.col("value") * 1e6).cast("long")),
        ).first()
    ]
    width = (gmax - gmin) // 256 + 1

    staging = str(tmp_path / "ev_staging_q")
    ev.repartition(3).write.parquet(staging)
    sk = stream_quantile_histogram(
        SE.read_event_stream(spark, staging), "value",
        gmin=gmin, width=width, bins=256,
    )
    q = (
        sk.writeStream.format("memory")
        .queryName("qh_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_qh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["day"], r["bin"]): r["cnt"]
        for r in spark.sql("SELECT * FROM qh_stream").collect()
    }
    batch = (
        v.select(
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            F.expr(
                f"(cast(floor(value * 1000000.0) as bigint) - {gmin})"
                f" DIV {width}"
            ).alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    exp = {(r["day"], r["bin"]): r["cnt"] for r in batch.collect()}
    assert got == exp
    assert all(0 <= b < 256 for _, b in got)

    # clamping: values far outside [gmin, gmax] land in bins 0/255
    extreme = spark.createDataFrame(
        [("2024-01-01 00:00:00", -1e9), ("2024-01-01 00:00:00", 1e12)],
        "ts string, value double",
    )
    st2 = str(tmp_path / "ev_extreme")
    extreme.select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    ).write.parquet(st2)
    sk2 = stream_quantile_histogram(
        spark.readStream.schema("ts timestamp, value double").parquet(st2),
        "value", gmin=gmin, width=width, bins=256,
    )
    q2 = (
        sk2.writeStream.format("memory")
        .queryName("qh_extreme")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_qh2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    bins2 = {r["bin"] for r in spark.sql("SELECT * FROM qh_extreme").collect()}
    assert bins2 == {0, 255}


def test_stream_key_census_equals_batch_skew_report(spark, tmp_path):
    """The running key census drained availableNow equals the batch
    key count bit-for-bit, and key_census() over the drained snapshot
    reproduces the batch join_skew_diagnostics report exactly."""
    from databridge_etl_tools_spark.operators.profile import key_census
    from databridge_etl_tools_spark.registry import table as load_table
    from databridge_etl_tools_spark.streaming import events as SE
    from databridge_etl_tools_spark.streaming.sketch import stream_key_census

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path / "ev_staging_census")
    ev.repartition(3).write.parquet(staging)

    cs = stream_key_census(SE.read_event_stream(spark, staging), "user_id")
    q = (
        cs.writeStream.format("memory")
        .queryName("census_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_census"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.sql("SELECT * FROM census_stream")
    batch_counts = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    got = {(r["user_id"], r["n"]) for r in drained.collect()}
    exp = {(r["user_id"], r["n"]) for r in batch_counts.collect()}
    assert got == exp

    rep_stream = [
        tuple(r)
        for r in key_census(drained, "user_id").orderBy("rank").collect()
    ]
    rep_batch = [
        tuple(r)
        for r in key_census(batch_counts, "user_id").orderBy("rank").collect()
    ]
    assert rep_stream == rep_batch
    assert len(rep_stream) == 10
    # shares are exact integer ppm of the total occurrence mass
    total = sum(n for _, n in exp)
    for _, _, n, ppm, salt in rep_stream:
        assert ppm == n * 1000000 // total
        assert salt == (32 * n + total - 1) // total
