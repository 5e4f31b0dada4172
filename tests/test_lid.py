"""Trained language-ID classifier: behavioral + contract tests.

The oracle gate (lid_predict_eval) proves cross-engine exactness;
these tests prove the model is a MODEL — it must classify by text
CONTENT, not metadata: a document carrying the wrong language's
marker must be predicted as that language regardless of its ``lang``
column, and held-out accuracy must be perfect on the planted corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from databridge_etl_tools_spark.operators import intlin as IL
from databridge_etl_tools_spark.operators.lid import (
    LANGS,
    MARK_REPEAT,
    MARKERS,
    char_trigram_features,
    lid_fit,
    lid_predict_col,
    lid_score_cols,
    plant_markers,
)
from databridge_etl_tools_spark.operators.linear import (
    ridge_fit,
    ridge_fit_multi,
)
from databridge_etl_tools_spark.registry import table

SF = "/root/testdata/sf0.001"
SCORE_COLS = [f"_s_{lg}" for lg in LANGS]


@pytest.fixture(scope="module")
def models(spark):
    return lid_fit(table(spark, SF, "documents"))


def _predict(spark, models, df):
    feats = char_trigram_features(df)
    scored = feats.select("doc_id", "lang", *lid_score_cols(models))
    return scored.withColumn("pred", lid_predict_col(SCORE_COLS))


def test_gauss_solve_multi_single_rhs_bit_identical():
    """L=1 multi-solve must equal gauss_solve_fixed bit-for-bit —
    the augmented rows are identical, so every renorm and pivot is."""
    import random

    rng = random.Random(11)
    d = 8
    a = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            a[i][j] = a[j][i] = rng.randint(-(10**6), 10**6)
        a[i][i] += 10**8
    b = [rng.randint(-(10**9), 10**9) for _ in range(d)]
    assert IL.gauss_solve_multi(a, [b])[0] == IL.gauss_solve_fixed(a, b)


def test_gauss_solve_multi_matches_each_rhs():
    """Every class head of the shared elimination solves its own
    system to fixed-point accuracy (vs float Gaussian elimination)."""
    import random

    import numpy as np

    rng = random.Random(23)
    d, nl = 10, 4
    a = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            a[i][j] = a[j][i] = rng.randint(-(10**5), 10**5)
        a[i][i] += 10**7
    bs = [
        [rng.randint(-(10**8), 10**8) for _ in range(d)]
        for _ in range(nl)
    ]
    multi = IL.gauss_solve_multi(a, bs)
    an = np.array(a, dtype=float)
    for c in range(nl):
        want = np.linalg.solve(an, np.array(bs[c], dtype=float))
        got = np.array(multi[c]) / float(1 << 30)
        scale = float(np.max(np.abs(want))) + 1e-30
        assert float(np.max(np.abs(got - want))) / scale < 1e-6


def test_ridge_fit_multi_matches_binary_fits(spark):
    """Each one-vs-rest head's weights agree with an independent
    binary ridge_fit on the same slice (not bit-identical — the
    multi elimination renorms over the wider augmented row — but
    well inside fixed-point tolerance)."""
    docs = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") % 5 != 0)
    )
    feats = char_trigram_features(docs)
    for lg in LANGS:
        feats = feats.withColumn(
            f"_y_{lg}", (F.col("lang") == lg).cast("double")
        )
    feats = feats.cache()
    try:
        multi = ridge_fit_multi(
            feats, [f"_y_{lg}" for lg in LANGS], "feat", lam=1
        )
        solo = ridge_fit(feats, "_y_de", "feat", lam=1)
    finally:
        feats.unpersist()
    m = multi[0]
    assert m["label"] == "_y_de"
    assert m["n"] == solo["n"]
    for wm, ws in zip(m["weights"], solo["weights"]):
        assert abs(wm - ws) < 1e-5
    assert abs(m["intercept"] - solo["intercept"]) < 1e-7


def test_heldout_confusion_is_diagonal(spark, models):
    """Perfect held-out accuracy on the planted corpus: every
    (truth, prediction) cell off the diagonal must be empty."""
    held = plant_markers(
        table(spark, SF, "documents").filter(F.col("doc_id") % 5 == 0)
    )
    rows = (
        _predict(spark, models, held)
        .groupBy("lang", "pred")
        .count()
        .collect()
    )
    assert rows
    assert all(r["lang"] == r["pred"] for r in rows)
    assert {r["lang"] for r in rows} == set(LANGS)


def test_classifies_by_content_not_metadata(spark, models):
    """The behavioral contract: cross-plant the WRONG language's
    marker (metadata says ``en``, content says ``de``/``zh``/…) —
    the model must follow the content for every language pair."""
    base = (
        table(spark, SF, "documents")
        .filter((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0))
        .limit(8)
    )
    for planted in LANGS:
        crossed = base.withColumn(
            "text",
            F.concat(F.lit(MARKERS[planted] * MARK_REPEAT), F.col("text")),
        )
        preds = [
            r["pred"] for r in _predict(spark, models, crossed).collect()
        ]
        assert preds and all(p == planted for p in preds), (
            f"cross-planted {planted} predicted {preds}"
        )


def test_confidence_margin_separates_planted_from_cross_tie(spark, models):
    """Margin semantics: a cleanly-marked document has a large
    top-two margin; a document carrying TWO languages' markers in
    equal measure sits in the low-confidence band."""
    import pyspark.sql.functions as F

    base = (
        table(spark, SF, "documents")
        .filter((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0))
        .limit(6)
    )
    clean = plant_markers(base)
    mixed = base.withColumn(
        "text",
        F.concat(
            F.lit(MARKERS["de"] * (MARK_REPEAT // 2)),
            F.lit(MARKERS["fr"] * (MARK_REPEAT // 2)),
            F.col("text"),
        ),
    )

    def margins(df):
        feats = char_trigram_features(df)
        arr = F.array_sort(
            F.array(*[F.col(c) for c in SCORE_COLS])
        )
        return [
            r["m"]
            for r in feats.select(*lid_score_cols(models))
            .select(
                (
                    F.element_at(arr, len(LANGS))
                    - F.element_at(arr, len(LANGS) - 1)
                ).alias("m")
            )
            .collect()
        ]

    m_clean = margins(clean)
    m_mixed = margins(mixed)
    assert min(m_clean) > max(m_mixed)
