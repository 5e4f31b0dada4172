"""Model registry (operators/models.py) + streaming LID scoring:
persist trained heads, reload bit-exactly, and predict on a stream
identically to batch."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databridge_etl_tools_spark.operators.lid import (
    LANGS,
    char_trigram_features,
    lid_fit,
    lid_predict_col,
    lid_score_cols,
    plant_markers,
)
from databridge_etl_tools_spark.operators.models import (
    load_models,
    save_models,
)
from databridge_etl_tools_spark.registry import table
from databridge_etl_tools_spark.sources.table_store import TableStore
from databridge_etl_tools_spark.streaming import curation as C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fitted(spark):
    models = lid_fit(table(spark, SF, "documents"))
    for m, lg in zip(models, LANGS):
        m["label"] = lg
    return models


def test_save_load_roundtrip_is_exact(spark, tmp_path, fitted):
    store = TableStore(spark, str(tmp_path / "reg"))
    assert save_models(store, "models", "lid_v1", fitted) == len(LANGS)
    loaded = load_models(store, "models", "lid_v1")
    assert [m["label"] for m in loaded] == list(LANGS)
    for a, b in zip(fitted, loaded):
        assert a["b_int"] == b["b_int"]
        assert a["s_int"] == b["s_int"]
        assert a["sy_int"] == b["sy_int"]
        assert a["intercept"] == b["intercept"]  # IEEE bit-exact
        assert a["n"] == b["n"]
    # replacing a name keeps other names intact
    save_models(store, "models", "other", fitted[:1])
    save_models(store, "models", "lid_v1", fitted)
    assert len(load_models(store, "models", "lid_v1")) == len(LANGS)
    assert len(load_models(store, "models", "other")) == 1
    with pytest.raises(KeyError):
        load_models(store, "models", "missing")


def test_driver_io_roundtrip_equals_store_roundtrip(spark, tmp_path, fitted):
    """roundtrip_models (driver parquet I/O — the in-query fast path)
    must return models bit-identical to the TableStore save→load
    path: same integer state, same IEEE doubles, same label order,
    same dict shape for single-head and multiclass inputs."""
    from databridge_etl_tools_spark.operators.models import (
        roundtrip_models,
    )

    quality = {k: v for k, v in fitted[0].items() if k != "label"}
    via_io = roundtrip_models(spark, {"lid": fitted, "quality": quality})
    store = TableStore(spark, str(tmp_path / "reg2"))
    save_models(store, "models", "lid", fitted)
    save_models(store, "models", "quality", quality)
    via_store = {
        "lid": load_models(store, "models", "lid"),
        "quality": load_models(store, "models", "quality")[0],
    }
    assert isinstance(via_io["quality"], dict)
    assert via_io["quality"] == via_store["quality"]
    assert [m["label"] for m in via_io["lid"]] == list(LANGS)
    for a, b in zip(via_io["lid"], via_store["lid"]):
        assert a == b
    with pytest.raises(KeyError):
        roundtrip_models(spark, {"lid": []})


def test_loaded_model_predicts_identically(spark, tmp_path, fitted):
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    loaded = load_models(store, "models", "lid_v1")
    held = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") % 5 == 0)
    )
    cols = [f"_s_{lg}" for lg in LANGS]

    def preds(models):
        feats = char_trigram_features(held)
        return {
            r["doc_id"]: r["p"]
            for r in feats.select("doc_id", *lid_score_cols(models))
            .select("doc_id", lid_predict_col(cols).alias("p"))
            .collect()
        }

    assert preds(fitted) == preds(loaded)


def test_lid_stream_equals_batch(spark, tmp_path, fitted):
    docs = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") < 200)
    ).select("doc_id", "text", "lang", "source", "n_chars")
    staging = str(tmp_path / "stage")
    docs.coalesce(2).write.mode("overwrite").parquet(staging)

    # persist + reload: the production shape (train offline, load
    # in the scoring job)
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    models = load_models(store, "models", "lid_v1")

    scored = C.lid_score_stream(
        C.read_document_stream(spark, staging),
        models,
        margin_threshold=0.25,
    )
    out = str(tmp_path / "lid_out")
    (
        scored.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["doc_id"]: (r["pred_lang"], r["confident"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["pred_lang"], r["confident"])
        for r in C.lid_score_stream(
            docs, models, margin_threshold=0.25
        ).collect()
    }
    assert got == want
    assert got  # stream produced rows
    # predictions follow the planted metadata-derived markers
    truth = {r["doc_id"]: r["lang"] for r in docs.collect()}
    agree = sum(1 for k, (p, _) in got.items() if p == truth[k])
    assert agree / len(got) >= 0.95


def test_lid_stream_preserves_subtrigram_docs_as_abstain(
    spark, tmp_path, fitted
):
    """Row-preservation contract (r12 advice): documents too short to
    carry a trigram must NOT vanish from the scored stream — they
    come through with pred_lang NULL / confident false so the
    abstain/quarantine path sees them."""
    docs = spark.createDataFrame(
        [
            (1, "ab", "en", "s", 2),
            (2, None, "en", "s", 0),
            (3, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staging = str(tmp_path / "stage")
    docs.coalesce(1).write.mode("overwrite").parquet(staging)
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    models = load_models(store, "models", "lid_v1")

    got = {
        r["doc_id"]: (r["pred_lang"], r["confident"])
        for r in C.lid_score_stream(
            docs, models, margin_threshold=0.25
        ).collect()
    }
    assert set(got) == {1, 2, 3}, "short/null docs dropped from scored stream"
    assert got[1] == (None, False)
    assert got[2] == (None, False)
    assert got[3][0] is not None

    # no-margin variant: short docs still present, pred NULL
    got2 = {
        r["doc_id"]: r["pred_lang"]
        for r in C.lid_score_stream(docs, models).collect()
    }
    assert set(got2) == {1, 2, 3} and got2[1] is None


def test_loaded_models_score_identically_across_session_boundary(
    spark, tmp_path, fitted
):
    """The registry's reason to exist: a model saved in THIS session
    must score bit-identically when loaded by a DIFFERENT process
    with its own fresh SparkSession (train-offline/score-online).
    The subprocess loads the heads from the on-disk store, scores a
    fixed doc slice, and writes its predictions; we compare against
    the fitted heads' predictions here."""
    import subprocess
    import sys

    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    cols = [f"_s_{lg}" for lg in LANGS]
    docs = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") < 100)
    ).select("doc_id", "text")
    want = {
        r["doc_id"]: r["p"]
        for r in char_trigram_features(docs)
        .select("doc_id", *lid_score_cols(fitted))
        .select("doc_id", lid_predict_col(cols).alias("p"))
        .collect()
    }
    out = tmp_path / "preds"
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = SparkSession.builder.master("local[4]").getOrCreate()
from databridge_etl_tools_spark.operators.lid import (
    LANGS, char_trigram_features, lid_predict_col, lid_score_cols,
    plant_markers,
)
from databridge_etl_tools_spark.operators.models import load_models
from databridge_etl_tools_spark.registry import table
from databridge_etl_tools_spark.sources.table_store import TableStore

models = load_models(TableStore(spark, {str(tmp_path / "reg")!r}), "models", "lid_v1")
docs = plant_markers(
    table(spark, {SF!r}, "documents").filter(F.col("doc_id") < 100)
).select("doc_id", "text")
cols = [f"_s_{{lg}}" for lg in LANGS]
(
    char_trigram_features(docs)
    .select("doc_id", *lid_score_cols(models))
    .select("doc_id", lid_predict_col(cols).alias("p"))
    .write.mode("overwrite").parquet({str(out)!r})
)
"""
    subprocess.run(
        [sys.executable, "-c", script], check=True, capture_output=True
    )
    got = {
        r["doc_id"]: r["p"] for r in spark.read.parquet(str(out)).collect()
    }
    assert got == want and len(got) == 100


def test_lid_stream_quarantines_abstained_rows_exactly_once(
    spark, tmp_path, fitted
):
    """Abstain telemetry (K7 pattern): low-margin + sub-trigram docs
    land in the quarantine store table, confident docs in the scored
    table, the split is exhaustive, and a fresh-checkpoint replay
    never duplicates either side."""
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    models = load_models(store, "models", "lid_v1")

    docs = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") < 150)
    ).select("doc_id", "text", "lang", "source", "n_chars")
    shorts = spark.createDataFrame(
        [(9001, "ab", "en", "s", 2), (9002, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staged = docs.unionByName(shorts)
    staging = str(tmp_path / "stage")
    staged.coalesce(2).write.mode("overwrite").parquet(staging)

    # a high margin forces a real abstained population
    thr = 0.5
    C.lid_stream_into_store(
        C.read_document_stream(spark, staging),
        models,
        store,
        "lid_scored",
        "lid_quarantine",
        str(tmp_path / "ck1"),
        margin_threshold=thr,
    )
    scored = {r["doc_id"] for r in store.read("lid_scored").collect()}
    quar = {r["doc_id"] for r in store.read("lid_quarantine").collect()}
    assert scored | quar == {r["doc_id"] for r in staged.collect()}
    assert scored.isdisjoint(quar)
    assert {9001, 9002} <= quar, "sub-trigram docs must be quarantined"
    q_rows = {
        r["doc_id"]: (r["pred_lang"], r["confident"])
        for r in store.read("lid_quarantine").collect()
    }
    assert q_rows[9001] == (None, False)
    # batch twin: same split
    want = C.lid_score_stream(staged, models, margin_threshold=thr)
    want_q = {
        r["doc_id"] for r in want.filter(~F.col("confident")).collect()
    }
    assert quar == want_q

    # fresh checkpoint, same files: content-keyed upsert, no dupes
    n_s, n_q = store.read("lid_scored").count(), store.read(
        "lid_quarantine"
    ).count()
    C.lid_stream_into_store(
        C.read_document_stream(spark, staging),
        models,
        store,
        "lid_scored",
        "lid_quarantine",
        str(tmp_path / "ck2"),
        margin_threshold=thr,
    )
    assert store.read("lid_scored").count() == n_s
    assert store.read("lid_quarantine").count() == n_q


def test_lid_stream_confidence_flip_evicts_old_side(spark, tmp_path, fitted):
    """Cross-run disjointness: a re-sent document whose confidence
    FLIPPED must leave its old table in the same epoch it lands on
    the new side — scored and quarantine never both hold a doc."""
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    models = load_models(store, "models", "lid_v1")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    # run 1: doc 9001 is sub-trigram -> quarantine
    r1 = spark.createDataFrame(
        [(9001, "ab", "en", "s", 2), (1, "the quick brown fox jumps", "en", "s", 25)],
        schema,
    )
    s1 = str(tmp_path / "stage1")
    r1.coalesce(1).write.mode("overwrite").parquet(s1)
    C.lid_stream_into_store(
        C.read_document_stream(spark, s1), models, store,
        "sc", "quar", str(tmp_path / "ck1"), margin_threshold=0.0,
    )
    assert 9001 in {r["doc_id"] for r in store.read("quar").collect()}

    # run 2: doc 9001 re-sent with real text -> confident
    long_text = " ".join(["the quick brown fox jumps over the lazy dog"] * 3)
    r2 = spark.createDataFrame([(9001, long_text, "en", "s", 120)], schema)
    s2 = str(tmp_path / "stage2")
    r2.coalesce(1).write.mode("overwrite").parquet(s2)
    C.lid_stream_into_store(
        C.read_document_stream(spark, s2), models, store,
        "sc", "quar", str(tmp_path / "ck2"), margin_threshold=0.0,
    )
    sc_ids = {r["doc_id"] for r in store.read("sc").collect()}
    quar_ids = {r["doc_id"] for r in store.read("quar").collect()}
    assert 9001 in sc_ids
    assert 9001 not in quar_ids, "flipped doc left a stale quarantine row"
    assert sc_ids.isdisjoint(quar_ids)


def test_requalify_quarantine_promotes_with_better_model(
    spark, tmp_path, fitted
):
    """The quarantine drain (r14): after a better/relaxed model lands
    in the registry, ``requalify_quarantine`` re-scores the abstained
    docs, promotes the now-confident ones into the scored table
    exactly-once, keeps the rest quarantined, and preserves
    scored/quarantine disjointness. A replayed pass (same scope+epoch)
    changes nothing."""
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    models = load_models(store, "models", "lid_v1")

    docs = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") < 150)
    ).select("doc_id", "text", "lang", "source", "n_chars")
    shorts = spark.createDataFrame(
        [(9001, "ab", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staged = docs.unionByName(shorts)
    staging = str(tmp_path / "stage")
    staged.coalesce(1).write.mode("overwrite").parquet(staging)

    # strict first pass: large abstained population
    C.lid_stream_into_store(
        C.read_document_stream(spark, staging),
        models,
        store,
        "sc",
        "quar",
        str(tmp_path / "ck"),
        margin_threshold=0.5,
    )
    all_ids = {r["doc_id"] for r in staged.collect()}
    quar0 = {r["doc_id"] for r in store.read("quar").collect()}
    assert quar0, "test needs a non-empty quarantine"

    # "better model lands": same heads, production-calibrated margin
    # — the drain mechanism under test is identical for a re-fit
    stats = C.requalify_quarantine(
        store, models, "sc", "quar", epoch_id=0, margin_threshold=0.25
    )
    sc1 = {r["doc_id"] for r in store.read("sc").collect()}
    quar1 = {r["doc_id"] for r in store.read("quar").collect()}
    assert stats["promoted"] == len(quar0 - quar1) > 0
    assert stats["remaining"] == len(quar1)
    assert 9001 in quar1, "sub-trigram doc can never be promoted"
    assert sc1 | quar1 == all_ids and sc1.isdisjoint(quar1)
    # promoted rows carry their refreshed prediction
    preds = {
        r["doc_id"]: r["pred_lang"] for r in store.read("sc").collect()
    }
    assert all(preds[d] is not None for d in quar0 - quar1)

    # replayed pass: same (scope, epoch) — both tables fenced
    stats2 = C.requalify_quarantine(
        store, models, "sc", "quar", epoch_id=0, margin_threshold=0.0
    )
    assert {r["doc_id"] for r in store.read("quar").collect()} == quar1
    assert {r["doc_id"] for r in store.read("sc").collect()} == sc1
    # a NEW pass with threshold 0 drains everything scoreable
    C.requalify_quarantine(
        store, models, "sc", "quar", epoch_id=1, margin_threshold=0.0
    )
    quar2 = {r["doc_id"] for r in store.read("quar").collect()}
    assert quar2 == {9001}
    assert stats2  # shape sanity: dict returned on the fenced path


def test_requalify_crash_recovery_is_model_independent(
    spark, tmp_path, fitted
):
    """Crash between the two requalify commits, then a re-run with a
    DIFFERENT threshold (the operator deployed a newer model in
    between): disjointness must survive, because the quarantine
    commit anti-joins against the post-promotion scored state rather
    than trusting the re-run's promotion set to match."""
    store = TableStore(spark, str(tmp_path / "reg"))
    save_models(store, "models", "lid_v1", fitted)
    models = load_models(store, "models", "lid_v1")
    docs = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") < 80)
    ).select("doc_id", "text", "lang", "source", "n_chars")
    staging = str(tmp_path / "stage")
    docs.coalesce(1).write.mode("overwrite").parquet(staging)
    C.lid_stream_into_store(
        C.read_document_stream(spark, staging), models, store,
        "sc", "quar", str(tmp_path / "ck"), margin_threshold=0.6,
    )
    quar0 = {r["doc_id"] for r in store.read("quar").collect()}
    assert quar0

    # simulate the crash: run the SCORED half of epoch 0 by hand
    # (margin 0.25 promotes a set P), leaving quarantine uncommitted
    from databridge_etl_tools_spark.operators.merge import upsert as _up

    rescored = C.lid_score_stream(
        store.read("quar").drop("pred_lang", "confident"),
        models,
        margin_threshold=0.25,
    ).localCheckpoint()
    promoted = rescored.filter(F.col("confident"))
    assert promoted.count() > 0
    existing = store.read("sc")
    store.commit_epoch(
        "sc",
        _up(existing, promoted.select(*existing.columns), ["doc_id"]),
        0,
        scope="requalify",
    )

    # recovery re-run with a DIFFERENT (stricter) threshold: some of
    # P would not be promoted under it — they must still leave quar
    stats = C.requalify_quarantine(
        store, models, "sc", "quar", epoch_id=0, margin_threshold=0.45
    )
    sc_ids = {r["doc_id"] for r in store.read("sc").collect()}
    quar_ids = {r["doc_id"] for r in store.read("quar").collect()}
    assert sc_ids.isdisjoint(quar_ids), "recovery broke disjointness"
    assert stats["promoted"] == 0  # scored commit was fenced
    assert stats["replayed"] is False
    # fully-fenced replay reports honestly
    stats2 = C.requalify_quarantine(
        store, models, "sc", "quar", epoch_id=0, margin_threshold=0.0
    )
    assert stats2["replayed"] is True and stats2["promoted"] == 0
