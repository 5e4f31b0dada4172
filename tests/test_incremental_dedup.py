"""Incremental dedup vs the persisted signature store: epoch
exactly-once semantics + batch screening behavior.

The relational batch semantics are oracle-gated
(``dedup_incremental_vs_store``); these tests drive the PERSISTENCE
choreography the oracle can't see: replayed epochs must not
double-insert, later batches must be screened against earlier
survivors, and planted near-duplicates must be dropped."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databridge_etl_tools_spark.plans.pipelines import incremental_dedup_pipeline
from databridge_etl_tools_spark.registry import table
from databridge_etl_tools_spark.sources.table_store import TableStore

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "store"))


def _batch(spark, lo: int, hi: int):
    docs = table(spark, SF, "documents")
    return docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))


def test_epoch_replay_does_not_double_insert(spark, store):
    b1 = _batch(spark, 0, 100)
    r1 = incremental_dedup_pipeline(store, "sigs", b1, epoch_id=1)
    assert r1.committed and r1.n_kept > 0
    assert r1.store_size == r1.n_kept

    # replay the SAME epoch (retried micro-batch / re-run task): the
    # screen runs against the CURRENT store (which now contains this
    # batch's own signatures, so every doc reads as dup_store), but
    # the epoch watermark rejects the commit — no double insert.
    r2 = incremental_dedup_pipeline(store, "sigs", b1, epoch_id=1)
    assert not r2.committed
    assert store.read("sigs").count() == r1.store_size
    assert r2.n_dup_store == r2.n_batch

    # a LATER epoch with new docs appends survivors on top
    b2 = _batch(spark, 100, 200)
    r3 = incremental_dedup_pipeline(store, "sigs", b2, epoch_id=2)
    assert r3.committed
    assert r3.store_size == r1.store_size + r3.n_kept
    ids = {r["doc"] for r in store.read("sigs").select("doc").collect()}
    assert ids and all(i < 200 for i in ids)


def test_resubmitted_batch_is_screened_out(spark, store):
    """Submitting the same documents again under a NEW epoch must be
    rejected by CONTENT (every doc near-matches the store), not by
    the epoch watermark."""
    b1 = _batch(spark, 0, 100)
    r1 = incremental_dedup_pipeline(store, "sigs", b1, epoch_id=1)
    assert r1.n_kept > 0
    r2 = incremental_dedup_pipeline(store, "sigs", b1, epoch_id=2)
    assert r2.committed  # new epoch → the commit itself goes through
    assert r2.n_kept == 0
    assert r2.n_dup_store == r2.n_batch
    assert r2.store_size == r1.store_size


def test_planted_near_duplicate_dropped_within_batch(spark, store):
    """A doc plus a lightly-perturbed twin in ONE batch: the
    higher-id twin must be dropped as dup_batch (keep-first-by-id)."""
    base = _batch(spark, 0, 50)
    twins = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    b = base.select("doc_id", "text").unionByName(twins)
    r = incremental_dedup_pipeline(store, "sigs", b, epoch_id=1)
    assert r.n_dup_batch >= 40  # nearly every twin caught
    kept = {x["doc"] for x in store.read("sigs").select("doc").collect()}
    assert all(i < 1_000_000 for i in kept if i < 2_000_000) or any(
        i < 1_000_000 for i in kept
    )
    # keep-first-by-id: every original survives, twins mostly don't
    originals = {x for x in kept if x < 1_000_000}
    assert len(originals) >= 40
