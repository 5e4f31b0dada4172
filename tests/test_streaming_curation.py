"""Streaming corpus curation: batch/stream parity of the curation
plan fragment, exactly-once store commits, and replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from databridge_etl_tools_spark.sources.table_store import TableStore
from databridge_etl_tools_spark.streaming import curation as C

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


def test_stream_matches_batch_curation(spark, tmp_path):
    docs, staging = _stage(spark, tmp_path)
    store = TableStore(spark, str(tmp_path / "store"))
    C.curate_stream_into_store(
        C.read_document_stream(spark, staging),
        store,
        "curated_docs",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = store.read("curated_docs")
    batch = C.curate_docs(docs).dropDuplicates(["fp"])
    # same fingerprint set and per-fp curated text; chosen doc_id for a
    # duplicate group may differ (stream keeps first ARRIVAL)
    g = {(r.fp, r.text) for r in got.collect()}
    b = {(r.fp, r.text) for r in batch.collect()}
    assert g == b
    assert got.count() == batch.count()
    # the gate actually gated: fewer docs than input
    assert 0 < got.count() < docs.count()


def test_restart_with_new_data_is_incremental(spark, tmp_path):
    docs, staging = _stage(spark, tmp_path, n_files=2)
    store = TableStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")
    stream = C.read_document_stream(spark, staging)
    C.curate_stream_into_store(stream, store, "curated_docs", checkpoint_dir=ckpt)
    n1 = store.read("curated_docs").count()

    # drain again with no new files: no new epochs, same rows
    C.curate_stream_into_store(
        C.read_document_stream(spark, staging), store, "curated_docs",
        checkpoint_dir=ckpt,
    )
    assert store.read("curated_docs").count() == n1

    # land a new file with one fresh doc and one exact duplicate of an
    # existing doc: only the fresh one adds a row (fp-keyed upsert)
    first = docs.orderBy("doc_id").first()
    fresh_text = (
        "the quick brown fox jumps over the lazy dog and then it sat "
        "down with a friendly cat to have a long talk about plans"
    )
    new_rows = spark.createDataFrame(
        [
            (100001, fresh_text, "en", "late", len(fresh_text)),
            (100002, first.text, first.lang, "late", len(first.text)),
        ],
        C.DOC_SCHEMA,
    )
    new_rows.coalesce(1).write.mode("append").parquet(staging)
    C.curate_stream_into_store(
        C.read_document_stream(spark, staging), store, "curated_docs",
        checkpoint_dir=ckpt,
    )
    final = store.read("curated_docs")
    assert final.where(F.col("doc_id") == 100001).count() == 1
    # the duplicate replaced its fp row (upsert), never duplicated it
    assert final.count() == n1 + 1


def test_segment_stream_matches_batch_dedup(spark, tmp_path):
    """Streaming segment dedup drains to the same distinct-fingerprint
    set as the batch first-occurrence operator, and a later file whose
    segments were all seen adds nothing."""
    from databridge_etl_tools_spark.operators.chunking import dedup_segments

    docs, staging = _stage(spark, tmp_path)
    store = TableStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt_seg")
    C.segment_stream_into_store(
        C.read_document_stream(spark, staging), store, "segments",
        checkpoint_dir=ckpt, size=4,
    )
    got = store.read("segments")
    batch = dedup_segments(docs, size=4).where("is_first")
    g = {r.seg_fp for r in got.select("seg_fp").collect()}
    b = {r.seg_fp for r in batch.select("seg_fp").collect()}
    assert g == b
    assert got.count() == batch.count()
    n1 = got.count()

    # a re-sent document: every segment fingerprint already in state →
    # zero new rows
    first = docs.orderBy("doc_id").first()
    spark.createDataFrame(
        [(200001, first.text, first.lang, "late", len(first.text))], C.DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(staging)
    C.segment_stream_into_store(
        C.read_document_stream(spark, staging), store, "segments",
        checkpoint_dir=ckpt, size=4,
    )
    assert store.read("segments").count() == n1


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Stream-static join: drained enrichment equals the batch join;
    unmatched stream rows survive a left join with nulls."""
    from databridge_etl_tools_spark.streaming import events as E

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    staging = str(tmp_path / "ev_staging")
    ev.coalesce(2).write.mode("overwrite").parquet(staging)
    static_schema = spark.read.parquet(staging).schema
    dim = spark.createDataFrame(
        [("click", 1.5), ("purchase", 9.0), ("view", 0.5)],
        "event_type string, weight double",
    )
    stream = spark.readStream.schema(static_schema).parquet(staging)
    enriched = E.enrich_stream(stream, dim, "event_type", how="left")
    got = E.run_available_now(enriched, "enriched_events")
    batch = spark.read.parquet(staging).join(dim, "event_type", "left")
    g = {(r.event_id, r.weight) for r in got.select("event_id", "weight").collect()}
    b = {(r.event_id, r.weight) for r in batch.select("event_id", "weight").collect()}
    assert g == b and len(g) == ev.count()
    # unmatched types (signup/error) kept with null weight
    assert any(w is None for _, w in g)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        E.enrich_stream(stream, dim, "event_type", how="full")


def test_stream_scd2_evolves_history_exactly_once(spark, tmp_path):
    """Two snapshot files drained through the streaming SCD2 sink give
    the same history as chaining the batch operator; a re-drain with
    no new files changes nothing; mixed-date batches are rejected."""
    import datetime as dt

    from databridge_etl_tools_spark.operators.merge import scd2_apply
    from databridge_etl_tools_spark.sources.table_store import TableStore
    from databridge_etl_tools_spark.streaming.events import stream_scd2_into_store

    staging = str(tmp_path / "snaps")
    s1 = spark.createDataFrame(
        [(1, 10.0, dt.date(2024, 1, 1)), (2, 20.0, dt.date(2024, 1, 1))],
        "k long, v double, snapshot_date date",
    )
    s1.coalesce(1).write.mode("append").parquet(staging)
    schema = spark.read.parquet(staging).schema

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        stream_scd2_into_store(
            stream, store, "dim_hist", ["k"], ["v"],
            checkpoint_dir=str(tmp_path / "ckpt"),
        )

    store = TableStore(spark, str(tmp_path / "store"))
    drain()
    h1 = {(r.k, r.v, r.valid_from, r.valid_to)
          for r in store.read("dim_hist").collect()}
    assert h1 == {
        (1, 10.0, dt.date(2024, 1, 1), None),
        (2, 20.0, dt.date(2024, 1, 1), None),
    }

    # second snapshot: key 2 changes, key 1 unchanged, key 3 appears
    s2 = spark.createDataFrame(
        [(1, 10.0, dt.date(2024, 2, 1)), (2, 21.0, dt.date(2024, 2, 1)),
         (3, 30.0, dt.date(2024, 2, 1))],
        "k long, v double, snapshot_date date",
    )
    s2.coalesce(1).write.mode("append").parquet(staging)
    drain()
    got = {(r.k, r.v, r.valid_from, r.valid_to)
           for r in store.read("dim_hist").collect()}
    # twin: chain the batch operator
    hist0 = spark.createDataFrame(
        [], "k long, v double, valid_from date, valid_to date"
    )
    want_df = scd2_apply(
        scd2_apply(hist0, s1.drop("snapshot_date"), ["k"], ["v"], "2024-01-01"),
        s2.drop("snapshot_date"), ["k"], ["v"], "2024-02-01",
    )
    want = {(r.k, r.v, r.valid_from, r.valid_to) for r in want_df.collect()}
    assert got == want

    # idle re-drain: nothing changes
    drain()
    assert {(r.k, r.v, r.valid_from, r.valid_to)
            for r in store.read("dim_hist").collect()} == got


def test_score_stream_matches_batch_scoring(spark, tmp_path):
    """Trained-classifier scoring is a pure column fragment: an
    availableNow drain over staged files produces EXACTLY the batch
    scores (same doc set, same doubles), and the threshold gate
    passes organic docs while failing planted-junk ones."""
    from databridge_etl_tools_spark.operators.quality import (
        JUNK_SUFFIX,
        hashed_tf_features,
        quality_classifier_fit,
        quality_prediction_col,
    )

    docs, staging = _stage(spark, tmp_path)
    model = quality_classifier_fit(docs)

    scored = C.score_stream(
        C.read_document_stream(spark, staging), model, threshold=0.5
    )
    out = str(tmp_path / "scored_out")
    (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_score"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["doc_id"]: (r["score"], r["passes"])
        for r in spark.read.parquet(out).collect()
    }

    batch = hashed_tf_features(docs).withColumn(
        "score", quality_prediction_col(model)
    )
    want = {
        r["doc_id"]: (r["score"], r["score"] >= 0.5)
        for r in batch.collect()
    }
    assert got == want  # bit-identical doubles, same doc set

    # behavioral: junk-degraded text scores strictly below organic
    degraded = C.score_stream(
        C.read_document_stream(spark, staging).withColumn(
            "text", F.concat(F.col("text"), F.lit(JUNK_SUFFIX))
        ),
        model,
    )
    out2 = str(tmp_path / "scored_deg")
    (
        degraded.writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ckpt_deg"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    deg = {r["doc_id"]: r["score"] for r in spark.read.parquet(out2).collect()}
    worse = sum(1 for i, (s, _) in got.items() if deg[i] < s)
    assert worse == len(got)
