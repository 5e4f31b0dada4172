"""Stage-level timing harness for the expensive composed queries
(guide §1: isolate each expensive piece with the noop sink and label
the jobs).

Times each STAGE of the curation-v10 stack in isolation — featurize
passes, model fits, registry round-trip, screen, KN doc scores,
source sketch, finalize — so optimization effort lands on the
dominant term instead of a guess. Every stage is timed with the same
warm-run + median-of-3 protocol as bench.py where it is a DataFrame,
and wall-clock where it is driver work (fits, round-trip).

Usage: python tools/profile_stages.py [v10|v10_incremental|kn|graph]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, runs=3):
    fn()  # warm
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{med:7.3f}s  {label}", flush=True)
    return med


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "v10"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from databridge_etl_tools_spark import layout
    from databridge_etl_tools_spark.operators.curation import (
        curation_finalize,
        curation_screen,
        doc_identity,
        source_token_sketch,
    )
    from databridge_etl_tools_spark.operators.lid import (
        char_trigram_features,
        lid_fit,
        plant_markers,
    )
    from databridge_etl_tools_spark.operators.materialize import materialize
    from databridge_etl_tools_spark.operators.quality import (
        hashed_tf_features,
        quality_classifier_fit,
    )
    from databridge_etl_tools_spark.queries.quality import (
        _registry_roundtrip,
        D,
        LAM,
    )
    from databridge_etl_tools_spark.queries.textops import _kn_doc_scores
    from databridge_etl_tools_spark.registry import table
    from databridge_etl_tools_spark.session import get_session

    spark = get_session("profile_stages")
    layout.build_all(spark, sf_dir)
    sc = spark.sparkContext
    docs = table(spark, sf_dir, "documents")
    # warm the worker pool
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()

    if which == "v10":
        sc.setJobDescription("stage: planted featurize")
        timed(
            "char_trigram_features(plant_markers(docs)) noop",
            lambda: noop(char_trigram_features(plant_markers(docs), d=16, cap=240)),
        )
        planted = materialize(
            char_trigram_features(plant_markers(docs), d=16, cap=240)
        )
        sc.setJobDescription("stage: lid_fit")
        timed(
            "lid_fit (shared feats)",
            lambda: lid_fit(docs, d=16, cap=240, lam=1, holdout_mod=5, feats=planted),
        )
        lid_models = lid_fit(
            docs, d=16, cap=240, lam=1, holdout_mod=5, feats=planted
        )
        sc.setJobDescription("stage: qfeats featurize")
        timed(
            "hashed_tf_features(docs) noop",
            lambda: noop(hashed_tf_features(docs, d=D)),
        )
        qfeats = materialize(hashed_tf_features(docs, d=D))
        sc.setJobDescription("stage: quality_fit")
        timed(
            "quality_classifier_fit (shared feats)",
            lambda: quality_classifier_fit(docs, d=D, lam=LAM, feats=qfeats),
        )
        model = quality_classifier_fit(docs, d=D, lam=LAM, feats=qfeats)
        sc.setJobDescription("stage: registry roundtrip")
        timed(
            "_registry_roundtrip",
            lambda: _registry_roundtrip(spark, lid_models, model),
        )
        sc.setJobDescription("stage: screen")
        timed(
            "curation_screen (shared feats) noop",
            lambda: noop(
                curation_screen(docs, lid_models, model, planted=planted, qfeats=qfeats)
            ),
        )
        flags = materialize(
            curation_screen(docs, lid_models, model, planted=planted, qfeats=qfeats)
        )
        sc.setJobDescription("stage: kn_doc_scores")
        timed(
            "_kn_doc_scores noop",
            lambda: noop(_kn_doc_scores(spark, sf_dir)),
        )
        sc.setJobDescription("stage: doc_identity")
        timed("doc_identity noop", lambda: noop(doc_identity(docs)))
        sc.setJobDescription("stage: source_token_sketch")
        timed(
            "source_token_sketch noop",
            lambda: noop(source_token_sketch(docs, k=64)),
        )
        sc.setJobDescription("stage: finalize")
        timed(
            "curation_finalize noop",
            lambda: noop(
                curation_finalize(
                    spark,
                    flags,
                    doc_identity(docs),
                    _kn_doc_scores(spark, sf_dir),
                    source_token_sketch(docs, k=64),
                )
            ),
        )
    elif which == "screen_unshared":
        planted = materialize(
            char_trigram_features(plant_markers(docs), d=16, cap=240)
        )
        qfeats = materialize(hashed_tf_features(docs, d=D))
        lid_models = lid_fit(
            docs, d=16, cap=240, lam=1, holdout_mod=5, feats=planted
        )
        model = quality_classifier_fit(docs, d=D, lam=LAM, feats=qfeats)
        waves = [docs.filter(F.col("doc_id") % 2 == w) for w in (0, 1)]
        sc.setJobDescription("stage: wave screens unshared")
        timed(
            "screen(wave0)+screen(wave1) unshared noop",
            lambda: noop(
                curation_screen(waves[0], lid_models, model).unionByName(
                    curation_screen(waves[1], lid_models, model)
                )
            ),
        )
        sc.setJobDescription("stage: wave screens shared")
        timed(
            "screen(waves) sharing planted/qfeats noop",
            lambda: noop(
                curation_screen(
                    waves[0],
                    lid_models,
                    model,
                    planted=planted.filter(F.col("doc_id") % 2 == 0),
                    qfeats=qfeats.filter(F.col("doc_id") % 2 == 0),
                ).unionByName(
                    curation_screen(
                        waves[1],
                        lid_models,
                        model,
                        planted=planted.filter(F.col("doc_id") % 2 == 1),
                        qfeats=qfeats.filter(F.col("doc_id") % 2 == 1),
                    )
                )
            ),
        )
    elif which == "kn":
        sc.setJobDescription("stage: kn_doc_scores")
        timed("_kn_doc_scores noop", lambda: noop(_kn_doc_scores(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
