"""Incremental decontamination vs the persisted benchmark n-gram
store: epoch exactly-once semantics + contamination behavior.

The relational screen is oracle-gated
(``decontam_incremental_vs_store``); these drive the persistence
choreography the oracle can't see: replayed benchmark waves must not
double-ingest, later waves must accumulate (earliest wave wins per
gram), and planted benchmark text inside a crawl document must be
flagged with the right wave."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databridge_etl_tools_spark.plans.pipelines import (
    register_benchmark_epoch,
    screen_batch_against_store,
)
from databridge_etl_tools_spark.registry import table
from databridge_etl_tools_spark.sources.table_store import TableStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def _bench(spark, lo, hi):
    return (
        table(spark, SF, "documents")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def test_wave_replay_does_not_double_ingest(spark, store):
    b0 = _bench(spark, 0, 40)
    assert register_benchmark_epoch(store, "bench", b0, epoch_id=0)
    n0 = store.read("bench").count()
    assert n0 > 0
    # replayed wave: watermark rejects before any write
    assert not register_benchmark_epoch(store, "bench", b0, epoch_id=0)
    assert store.read("bench").count() == n0
    # a later wave accumulates new grams on top
    b1 = _bench(spark, 40, 80)
    assert register_benchmark_epoch(store, "bench", b1, epoch_id=1)
    n1 = store.read("bench").count()
    assert n1 > n0
    # earliest wave wins for grams both waves contain
    eps = {
        r["epoch"]
        for r in store.read("bench").select("epoch").distinct().collect()
    }
    assert eps <= {0, 1}


def test_planted_benchmark_text_is_flagged_with_its_wave(spark, store):
    register_benchmark_epoch(store, "bench", _bench(spark, 0, 40), epoch_id=0)
    register_benchmark_epoch(store, "bench", _bench(spark, 40, 80), epoch_id=1)
    # batch: clean docs from far outside the benchmark slice, plus one
    # doc embedding a wave-1 benchmark document verbatim
    docs = table(spark, SF, "documents")
    leak_text = docs.filter(F.col("doc_id") == 41).select("text").first()["text"]
    clean = docs.filter(F.col("doc_id") >= 400).select("doc_id", "text")
    leak = spark.createDataFrame(
        [(9001, "intro words before the leak " + leak_text)],
        "doc_id long, text string",
    )
    verdicts, res = screen_batch_against_store(
        store, "bench", clean.unionByName(leak)
    )
    by = {r["doc"]: r for r in verdicts.collect()}
    assert not by[9001]["clean"]
    assert by[9001]["n_gram_hits"] > 0
    assert by[9001]["first_epoch"] == 1
    assert res.n_contaminated >= 1
    assert res.n_batch == len(by)
    # screening is read-only: the store is unchanged
    assert res.store_grams == store.read("bench").count()


def test_stream_screen_matches_batch_and_is_exactly_once(spark, store, tmp_path):
    """availableNow screening over staged files leaves the verdict
    table exactly as the batch screen computes it, and replays
    (fresh checkpoint, same files) never duplicate verdict rows."""
    from databridge_etl_tools_spark.operators.dedup import (
        decontaminate_vs_store,
    )
    from databridge_etl_tools_spark.streaming.curation import (
        DOC_SCHEMA,
        decontam_stream_screen,
        read_document_stream,
    )

    register_benchmark_epoch(store, "bench", _bench(spark, 0, 40), epoch_id=0)
    docs = (
        table(spark, SF, "documents")
        .filter(F.col("doc_id") >= 300)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    staging = str(tmp_path / "stage")
    docs.coalesce(2).write.mode("overwrite").parquet(staging)

    decontam_stream_screen(
        read_document_stream(spark, staging, DOC_SCHEMA),
        store,
        "bench",
        "verdicts",
        str(tmp_path / "ck1"),
    )
    got = {
        r["doc"]: (r["n_gram_hits"], r["first_epoch"], r["clean"])
        for r in store.read("verdicts").collect()
    }
    want = {
        r["doc"]: (r["n_gram_hits"], r["first_epoch"], r["clean"])
        for r in decontaminate_vs_store(
            docs, store.read("bench")
        ).collect()
    }
    assert got == want and got

    # fresh checkpoint, same staged files: watermark rejects, no dupes
    decontam_stream_screen(
        read_document_stream(spark, staging, DOC_SCHEMA),
        store,
        "bench",
        "verdicts",
        str(tmp_path / "ck2"),
    )
    assert store.read("verdicts").count() == len(got)


def test_stream_screen_fresh_checkpoint_new_files_not_skipped(
    spark, store, tmp_path
):
    """The r12-advice data-loss scenario: a FRESH checkpoint pointed
    at a staging dir that accumulated new files. Epoch ids restart at
    0; an unscoped watermark would skip the new batches silently. The
    checkpoint-scoped watermark screens them; replayed files re-screen
    to identical verdicts and contribute no delta."""
    from databridge_etl_tools_spark.streaming.curation import (
        DOC_SCHEMA,
        decontam_stream_screen,
        read_document_stream,
    )

    register_benchmark_epoch(store, "bench", _bench(spark, 0, 40), epoch_id=0)
    all_docs = table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    staging = tmp_path / "stage"
    all_docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 350)
    ).coalesce(1).write.mode("overwrite").parquet(str(staging / "f1"))

    decontam_stream_screen(
        read_document_stream(spark, str(staging) + "/*", DOC_SCHEMA),
        store,
        "bench",
        "verdicts",
        str(tmp_path / "ck1"),
    )
    n1 = store.read("verdicts").count()
    assert n1 == 50

    # new file lands, then a FRESH checkpoint drains the directory
    all_docs.filter(
        (F.col("doc_id") >= 350) & (F.col("doc_id") < 400)
    ).coalesce(1).write.mode("overwrite").parquet(str(staging / "f2"))
    decontam_stream_screen(
        read_document_stream(spark, str(staging) + "/*", DOC_SCHEMA),
        store,
        "bench",
        "verdicts",
        str(tmp_path / "ck_fresh"),
    )
    verdicts = store.read("verdicts")
    assert verdicts.count() == 100, "new file was skipped by a stale watermark"
    assert (
        verdicts.groupBy("doc").count().filter(F.col("count") > 1).count() == 0
    )


def test_stream_screen_common_path_appends_delta_segments(
    spark, store, tmp_path
):
    """O(delta) discipline: all-new doc batches APPEND verdict
    segments (manifest segment list grows), never rewrite the
    accumulated ledger — and a re-send whose verdict CHANGED (gram
    store grew between runs) takes the keyed-rewrite fallback,
    keeping ``doc`` unique with the updated verdict."""
    from databridge_etl_tools_spark.streaming.curation import (
        DOC_SCHEMA,
        decontam_stream_screen,
        read_document_stream,
    )

    register_benchmark_epoch(store, "bench", _bench(spark, 0, 10), epoch_id=0)
    all_docs = table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    staging = tmp_path / "stage"
    for i, (lo, hi) in enumerate([(300, 330), (330, 360)]):
        all_docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(
            str(staging / f"f{i}")
        )
        decontam_stream_screen(
            read_document_stream(spark, str(staging) + "/*", DOC_SCHEMA),
            store,
            "bench",
            "verdicts",
            str(tmp_path / f"ck{i}"),
        )
    segs = store._segments("verdicts")
    assert len(segs) >= 2, "second batch rewrote the ledger instead of appending"
    assert store.read("verdicts").count() == 60

    # grow the gram store so a re-sent doc's verdict changes → the
    # rare keyed-rewrite fallback fires and updates in place
    before = {
        r["doc"]: r["clean"] for r in store.read("verdicts").collect()
    }
    register_benchmark_epoch(
        store,
        "bench",
        all_docs.filter(
            (F.col("doc_id") >= 300) & (F.col("doc_id") < 330)
        ).select("doc_id", "text"),
        epoch_id=1,
    )
    decontam_stream_screen(
        read_document_stream(spark, str(staging) + "/*", DOC_SCHEMA),
        store,
        "bench",
        "verdicts",
        str(tmp_path / "ck_rescreen"),
    )
    verdicts = store.read("verdicts")
    assert verdicts.count() == 60
    assert (
        verdicts.groupBy("doc").count().filter(F.col("count") > 1).count() == 0
    )
    after = {r["doc"]: r["clean"] for r in verdicts.collect()}
    flipped = {d for d in before if before[d] and not after[d]}
    assert flipped, "re-screen against the grown gram store changed no verdict"
