"""The composed streaming curation funnel (r13 verdict item 1):
availableNow drain of a staged document corpus through
``streaming.funnel.curation_funnel_stream_into_store`` (registry-
loaded models, three exactly-once tables) followed by
``curation_funnel_finalize`` must equal the one-shot batch v10 stack
on the same corpus — plus restart and fresh-checkpoint scenarios.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.lid import (
    LANGS,
    char_trigram_features,
    lid_fit,
    plant_markers,
)
from databridge_etl_tools_spark.operators.materialize import materialize
from databridge_etl_tools_spark.operators.models import save_models
from databridge_etl_tools_spark.operators.quality import (
    hashed_tf_features,
    quality_classifier_fit,
)
from databridge_etl_tools_spark.sources.table_store import TableStore
from databridge_etl_tools_spark.streaming.funnel import (
    curation_funnel_finalize,
    curation_funnel_stream_into_store,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def registry(spark, tmp_path_factory, corpus):
    """Train offline once (the fitting job), persist both models."""
    reg = TableStore(spark, str(tmp_path_factory.mktemp("reg")))
    planted = materialize(
        char_trigram_features(plant_markers(corpus), d=16, cap=240)
    )
    lid_models = lid_fit(
        corpus, d=16, cap=240, lam=1, holdout_mod=5, feats=planted
    )
    for m, lg in zip(lid_models, LANGS):
        m["label"] = lg
    qfeats = materialize(hashed_tf_features(corpus, d=16))
    qmodel = quality_classifier_fit(corpus, d=16, lam=1, feats=qfeats)
    save_models(reg, "models", "lid", lid_models)
    save_models(reg, "models", "quality", [qmodel])
    return reg


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory, corpus):
    """The corpus staged as multiple files — each ≈ one micro-batch
    under maxFilesPerTrigger=1."""
    stage = tmp_path_factory.mktemp("stage")
    for w in (0, 1, 2):
        corpus.filter(F.col("doc_id") % 3 == w).coalesce(1).write.parquet(
            str(stage / f"wave-{w}")
        )
    return stage


def _drain(spark, store, registry, staged, ck):
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(staged) + "/*")
    )
    curation_funnel_stream_into_store(
        stream, store, registry, str(ck)
    )


@pytest.fixture(scope="module")
def batch_report(spark, corpus):
    """One-shot batch v10 over the same corpus (fit → screen →
    finalize through the same shared operators the funnel uses, via
    the gate query's implementation)."""
    from databridge_etl_tools_spark.queries.quality import _curation_v10_impl

    rows = _curation_v10_impl(spark, SF_DIR, use_registry=False).collect()
    return sorted(map(tuple, rows))


def test_funnel_drain_plus_finalize_equals_batch_v10(
    spark, tmp_path_factory, corpus, registry, staged, batch_report
):
    store = TableStore(spark, str(tmp_path_factory.mktemp("store")))
    ck = tmp_path_factory.mktemp("ck") / "ck1"
    _drain(spark, store, registry, staged, ck)
    # three epoch-fenced tables accumulated across 3 micro-batches
    n_docs = corpus.count()
    assert store.read("funnel_fps").count() == n_docs
    assert store.read("funnel_flags").count() == n_docs
    got = curation_funnel_finalize(spark, store, corpus)
    assert sorted(map(tuple, got.collect())) == batch_report

    # restart of the SAME checkpoint with nothing new staged: every
    # epoch replays, all fenced — state unchanged
    flags_before = sorted(
        map(tuple, store.read("funnel_flags").collect())
    )
    _drain(spark, store, registry, staged, ck)
    assert sorted(map(tuple, store.read("funnel_flags").collect())) == flags_before

    # FRESH checkpoint over the same staged files (checkpoint reset):
    # new scope, epochs renumber from 0 — every file re-screens, the
    # doc-keyed upserts overwrite idempotently, the sketch re-merge
    # is content-idempotent; finalize output unchanged
    ck2 = tmp_path_factory.mktemp("ck") / "ck2"
    _drain(spark, store, registry, staged, ck2)
    got2 = curation_funnel_finalize(spark, store, corpus)
    assert sorted(map(tuple, got2.collect())) == batch_report


def test_funnel_two_stage_ingest_matches_late_arrivals(
    spark, tmp_path_factory, corpus, registry, batch_report
):
    """Drain part of the corpus, finalize (intermediate report runs
    without error), stage the remainder, drain the SAME checkpoint
    again — the availableNow re-run picks up only the new files, and
    the final report equals the one-shot batch."""
    store = TableStore(spark, str(tmp_path_factory.mktemp("store")))
    stage = tmp_path_factory.mktemp("stage2")
    corpus.filter(F.col("doc_id") % 3 != 2).coalesce(1).write.parquet(
        str(stage / "early")
    )
    ck = tmp_path_factory.mktemp("ck") / "ck"
    _drain(spark, store, registry, stage, ck)
    early = curation_funnel_finalize(
        spark, store, corpus.filter(F.col("doc_id") % 3 != 2)
    )
    assert early.count() > 0  # the periodic selection job runs mid-ingest
    corpus.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.parquet(
        str(stage / "late")
    )
    _drain(spark, store, registry, stage, ck)
    got = curation_funnel_finalize(spark, store, corpus)
    assert sorted(map(tuple, got.collect())) == batch_report


def test_funnel_requires_registered_models(spark, tmp_path, corpus):
    empty_reg = TableStore(spark, str(tmp_path / "reg"))
    store = TableStore(spark, str(tmp_path / "store"))
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(str(tmp_path / "nothing") + "/*")
    with pytest.raises(Exception):
        curation_funnel_stream_into_store(
            stream, store, empty_reg, str(tmp_path / "ck")
        )
    shutil.rmtree(str(tmp_path / "ck"), ignore_errors=True)


def test_funnel_finalize_single_source_empty_affinity(
    spark, tmp_path_factory, corpus, registry
):
    """Mid-ingest finalize with ONE source drained so far: the
    affinity graph is empty (no source pairs), which must degrade to
    the batch stack's edgeless-source semantics (zero weights, zero
    allocation) — never crash the selection job (r14 review
    finding)."""
    store = TableStore(spark, str(tmp_path_factory.mktemp("store")))
    one_src = corpus.limit(1).select("source").collect()[0]["source"]
    sub = corpus.filter(F.col("source") == one_src)
    stage = tmp_path_factory.mktemp("stage1src")
    sub.coalesce(1).write.parquet(str(stage / "only"))
    ck = tmp_path_factory.mktemp("ck") / "ck"
    _drain(spark, store, registry, stage, ck)
    got = curation_funnel_finalize(spark, store, sub).collect()
    assert len(got) == 1
    row = got[0]
    assert row["source"] == one_src
    assert row["rank_q"] == 0 and row["alloc"] == 0 and row["n_kept"] == 0
    assert row["n_docs"] == sub.count()
