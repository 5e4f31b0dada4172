"""Distributed ridge regression: integer fixed-point solve (r9 —
replaced np.linalg.solve so the probe is oracle-replayable, see
operators/intlin.py) vs the numpy closed form (quality tolerance set
by the ~40-bit elimination arithmetic), exact python-core replay,
map-side prediction, layout invariance, and conventions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators import intlin as IL
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

    model = ridge_fit(emb, "label", lam=2.0)
    w, b = _numpy_ridge(X, y, 2.0)
    assert model["n"] == len(rows)
    # ~40-bit fixed-point elimination: error ≈ 2⁻⁴⁰·cond·d ≪ 1e-4
    assert abs(model["intercept"] - b) < 1e-4
    assert np.allclose(model["weights"], w, atol=1e-4)
    pred = X @ w + b
    rmse = float(np.sqrt(((y - pred) ** 2).mean()))
    assert abs(model["rmse"] - rmse) < 1e-5


def test_ridge_fit_is_exact_python_replay(spark):
    """The distributed fit equals the pure-python integer core on the
    collected corpus BIT-FOR-BIT — the invariant the DuckDB twin
    relies on."""
    emb = table(spark, SF, "embeddings")
    rows = emb.select("embedding", "label").orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    xi = np.floor(X * (1 << 20)).astype(np.int64).astype(object)
    yi = np.floor(y * (1 << 20)).astype(np.int64).astype(object)
    n, d = X.shape
    s = [int(v) for v in xi.sum(axis=0)]
    sy = int(yi.sum())
    g = xi.T @ xi
    scat = IL.scatter(n, s, [[int(g[i][j]) for j in range(d)] for i in range(d)])
    lam = 1
    a = [
        [scat[i][j] + (lam * n * (1 << 40) if i == j else 0) for j in range(d)]
        for i in range(d)
    ]
    xty = [int(v) for v in (xi.T @ yi)]
    bvec = [n * xty[j] - s[j] * sy for j in range(d)]
    want = IL.gauss_solve_fixed(a, bvec)

    model = ridge_fit(emb, "label", lam=1.0)
    assert model["b_int"] == want
    assert model["s_int"] == s
    assert model["sy_int"] == sy


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
        # integer fold vs float dot: q20 quantization, ~1e-4 on d=64
        assert abs(r["prediction"] - exp) < 1e-3


def test_ridge_partitioning_stability(spark):
    emb = table(spark, SF, "embeddings")
    m1 = ridge_fit(emb.repartition(1), "label", lam=1.0)
    m8 = ridge_fit(emb.repartition(8), "label", lam=1.0)
    # integer moments: layouts cannot change a single bit
    assert m1 == m8


def test_ridge_lam_must_be_integer(spark):
    emb = table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="integer"):
        ridge_fit(emb, "label", lam=2.5)


def test_ridge_empty_input_raises(spark):
    emb = table(spark, SF, "embeddings").where(F.lit(False))
    with pytest.raises(ValueError):
        ridge_fit(emb, "label")
