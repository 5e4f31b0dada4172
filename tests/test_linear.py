"""Closed-form distributed ridge regression vs a numpy twin:
coefficient parity, training-RMSE-from-moments parity, map-side
prediction, and intercept/penalty conventions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.linear import ridge_fit, ridge_predict
from databridge_etl_tools_spark.registry import table

SF = "/root/testdata/sf0.001"


def _numpy_ridge(X, y, lam):
    n, d = X.shape
    mu, ybar = X.mean(axis=0), y.mean()
    Xc, yc = X - mu, y - ybar
    w = np.linalg.solve(Xc.T @ Xc + lam * np.eye(d), Xc.T @ yc)
    b = ybar - mu @ w
    return w, b


def test_ridge_fit_matches_numpy_twin(spark):
    emb = table(spark, SF, "embeddings")
    rows = emb.select("embedding", "label").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    y = np.array([r["label"] for r in rows], dtype=np.float64)

    model = ridge_fit(emb, "label", lam=2.5)
    w, b = _numpy_ridge(X, y, 2.5)
    assert model["n"] == len(rows)
    assert abs(model["intercept"] - b) < 1e-8
    assert np.allclose(model["weights"], w, atol=1e-8)
    pred = X @ w + b
    rmse = float(np.sqrt(((y - pred) ** 2).mean()))
    assert abs(model["rmse"] - rmse) < 1e-8


def test_ridge_predict_is_map_side_and_matches(spark):
    emb = table(spark, SF, "embeddings")
    model = ridge_fit(emb, "label", lam=1.0)
    out = emb.select("vec_id", "embedding", ridge_predict(emb, model))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring adds zero shuffles
    rows = out.limit(50).collect()
    for r in rows:
        exp = float(
            np.dot(np.array(r["embedding"], dtype=np.float64), model["weights"])
            + model["intercept"]
        )
        assert abs(r["prediction"] - exp) < 1e-9


def test_ridge_partitioning_stability(spark):
    emb = table(spark, SF, "embeddings")
    m1 = ridge_fit(emb.repartition(1), "label", lam=1.0)
    m8 = ridge_fit(emb.repartition(8), "label", lam=1.0)
    # float partials differ across layouts only in reduction order —
    # solutions agree to high precision
    assert np.allclose(m1["weights"], m8["weights"], atol=1e-9)
    assert abs(m1["intercept"] - m8["intercept"]) < 1e-9


def test_ridge_empty_input_raises(spark):
    emb = table(spark, SF, "embeddings").where(F.lit(False))
    with pytest.raises(ValueError):
        ridge_fit(emb, "label")
