"""Closed-form distributed ridge regression over an embedding column.

The supervised sibling of ``operators.pca``: quality-score
regressors, probe heads over frozen embeddings, feature-importance
audits — the linear models a training-data pipeline fits on corpus
features. Same Spark-first shape as the PCA fit:

- **fit** is ONE Arrow pass of per-partition sufficient statistics
  (n, Σx, Σy, XᵀX, Xᵀy): executors reduce any corpus to
  ``num_partitions`` bounded rows of d² + 2d + 2 doubles; the driver
  sums the partials in partition-id order (run-deterministic float
  reduction) and solves the (d+ridge)×d normal equations locally —
  d is the embedding width, tiny next to the data. Centering is
  algebraic (XcᵀXc = XᵀX − n·μμᵀ), so no second pass.
- **predict** is pure map-side JVM: the weight vector becomes a
  literal-array fold (the ANN dot product), intercept a scalar —
  zero shuffles, zero Python in the scoring plan.

Rows-only in the catalog (a matrix solve is not SQL-expressible);
numerics are pinned against a numpy closed-form twin in
tests/test_linear.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot_fold


def ridge_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    lam: float = 1.0,
) -> dict:
    """Fit ``y ≈ intercept + x·w`` with L2 penalty ``lam`` on ``w``
    (intercept unpenalized — the standard convention). Returns
    ``{"weights", "intercept", "n", "rmse"}`` as plain python values
    (broadcast-safe). ``rmse`` is the training error, computed from
    the same sufficient statistics (no second data pass)."""
    import numpy as np

    def partials(it: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        n, sx, sy, syy, xtx, xty = 0, None, 0.0, 0.0, None, None
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            y = np.asarray(pdf[label_col], dtype=np.float64)
            n += m.shape[0]
            sx = m.sum(axis=0) if sx is None else sx + m.sum(axis=0)
            sy += float(y.sum())
            syy += float((y * y).sum())
            g = m.T @ m
            xtx = g if xtx is None else xtx + g
            v = m.T @ y
            xty = v if xty is None else xty + v
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": [TaskContext.get().partitionId()],
                "n": [n],
                "sx": [sx.tolist()],
                "sy": [sy],
                "syy": [syy],
                "xtx": [xtx.reshape(-1).tolist()],
                "xty": [xty.tolist()],
            }
        )

    rows = (
        df.select(vec_col, label_col)
        .mapInPandas(
            partials,
            "pid int, n long, sx array<double>, sy double, syy double, "
            "xtx array<double>, xty array<double>",
        )
        .collect()
    )
    if not rows:
        raise ValueError("ridge_fit: empty input")
    rows = sorted(rows, key=lambda r: r["pid"])
    d = len(rows[0]["sx"])
    n = sum(r["n"] for r in rows)
    sx = np.zeros(d)
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    sy = syy = 0.0
    for r in rows:
        sx += np.array(r["sx"])
        sy += r["sy"]
        syy += r["syy"]
        xtx += np.array(r["xtx"]).reshape(d, d)
        xty += np.array(r["xty"])
    mu = sx / n
    ybar = sy / n
    xc = xtx - n * np.outer(mu, mu)
    yc = xty - n * mu * ybar
    w = np.linalg.solve(xc + lam * np.eye(d), yc)
    intercept = ybar - float(mu @ w)
    # training SSE from the same moments:
    # Σ(y−ŷ)² = Σyc² − 2 wᵀXcᵀyc + wᵀ XcᵀXc w, with Σyc² = Σy² − n·ȳ²
    syy_c = syy - n * ybar * ybar
    sse = syy_c - 2.0 * float(w @ yc) + float(w @ xc @ w)
    rmse = float(np.sqrt(max(sse, 0.0) / n))
    return {
        "weights": [float(v) for v in w],
        "intercept": intercept,
        "n": int(n),
        "rmse": rmse,
    }


def ridge_predict(
    df: DataFrame, model: dict, vec_col: str = "embedding"
) -> Column:
    """Score column ``intercept + x·w`` — a literal-array JVM fold,
    no shuffle, no Python."""
    w = F.array(*[F.lit(float(v)) for v in model["weights"]])
    return (
        dot_fold(F.col(vec_col), w) + F.lit(model["intercept"])
    ).alias("prediction")
