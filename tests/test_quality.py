"""Trained quality classifier: behavioral + contract tests.

The oracle gate (quality_classifier_score / corpus_curation_v6)
proves cross-engine exactness; these tests prove the model is a
MODEL — planted-degraded text must score below organic text on
documents the fit never labeled."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databridge_etl_tools_spark.operators.quality import (
    JUNK_SUFFIX,
    hashed_tf_features,
    labeled_slice,
    quality_classifier_fit,
    quality_prediction_col,
)
from databridge_etl_tools_spark.registry import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def model(spark):
    return quality_classifier_fit(table(spark, SF, "documents"))


def test_features_are_normalized_frequencies(spark):
    docs = table(spark, SF, "documents").limit(20)
    row = (
        hashed_tf_features(docs)
        .select(
            F.aggregate(
                "feat", F.lit(0.0), lambda a, x: a + x
            ).alias("total"),
            F.size("feat").alias("d"),
        )
        .collect()
    )
    assert row, "no featurized docs"
    for r in row:
        assert r.d == 16
        # Σ c_j/n = n/n = 1 up to float associativity
        assert abs(r.total - 1.0) < 1e-9


def test_labeled_slice_is_disjoint_and_labeled(spark):
    docs = table(spark, SF, "documents")
    sl = labeled_slice(docs)
    agg = sl.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("doc_id") % 7 == 0).cast("int")).alias("n_mod0"),
    )
    by = {r["label"]: r for r in agg.collect()}
    assert set(by) == {0.0, 1.0}
    assert by[0.0]["n_mod0"] == by[0.0]["n"]  # negatives: exactly the mod-0 slice
    assert by[1.0]["n_mod0"] == 0  # positives never overlap it


def test_degraded_docs_score_below_organic(spark, model):
    """Held-out check: docs the fit never saw as negatives
    (doc_id % 7 == 5), organic vs junk-degraded twin — the planted
    failure mode must rank strictly lower, pairwise."""
    docs = table(spark, SF, "documents").filter(F.col("doc_id") % 7 == 5)
    organic = hashed_tf_features(docs).select(
        "doc_id", quality_prediction_col(model).alias("s_org")
    )
    degraded = hashed_tf_features(
        docs.withColumn("text", F.concat("text", F.lit(JUNK_SUFFIX)))
    ).select("doc_id", quality_prediction_col(model).alias("s_deg"))
    pairs = organic.join(degraded, "doc_id").collect()
    assert len(pairs) >= 5
    worse = sum(1 for r in pairs if r.s_deg < r.s_org)
    assert worse == len(pairs), (
        f"degraded text out-scored organic on {len(pairs) - worse}/"
        f"{len(pairs)} held-out docs"
    )
    mean_org = sum(r.s_org for r in pairs) / len(pairs)
    mean_deg = sum(r.s_deg for r in pairs) / len(pairs)
    assert mean_org - mean_deg > 0.3, (mean_org, mean_deg)


def test_model_shape_and_training_fit(model):
    assert len(model["b_int"]) == 16
    assert model["n"] >= 20
    # labels are {0,1}; a useful model fits well inside the trivial
    # predict-the-mean RMSE (~0.35 for an ~85/15 split)
    assert 0.0 <= model["rmse"] < 0.3


def test_curation_v7_funnel_monotone_and_perplexity_gate(spark):
    """v7's funnel must be monotone per (source, lang) — raw >=
    unique >= gopher >= classifier >= kept — and the CCNet gate must
    actually bite somewhere (kept < classifier in aggregate: by
    construction roughly the tail tercile of scorable docs drops)."""
    from databridge_etl_tools_spark.queries.quality import corpus_curation_v7

    rows = corpus_curation_v7(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert (
            r["n_docs"] >= r["n_unique"] >= r["n_gopher"]
            >= r["n_classifier"] >= r["n_kept"] >= 0
        ), r
        if r["n_kept"] == 0:
            assert r["kept_tokens"] == 0
    total_cls = sum(r["n_classifier"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    assert total_kept < total_cls, "perplexity gate dropped nothing"
    assert total_kept > 0, "perplexity gate dropped everything"


def test_ccnet_buckets_partition_each_language(spark):
    """head/middle/tail bucket doc counts per language must sum to
    the number of KN-scorable docs of that language, and the head
    bucket's max perplexity must not exceed the tail's."""
    from databridge_etl_tools_spark.queries.textops import (
        text_ccnet_perplexity_buckets,
    )

    rows = text_ccnet_perplexity_buckets(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    assert by_lang
    for lang, bs in by_lang.items():
        assert set(bs) <= {"head", "middle", "tail"}, (lang, set(bs))
        if "head" in bs and "tail" in bs:
            assert bs["head"]["max_pq"] <= bs["tail"]["max_pq"], lang
        # terciles: no bucket is empty when all three exist, and the
        # three are within one of each other only for tiny langs —
        # just require every reported bucket non-empty
        for b in bs.values():
            assert b["n_docs"] > 0
