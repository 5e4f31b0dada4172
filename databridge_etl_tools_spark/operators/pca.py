"""Distributed PCA over an embedding column.

Dimensionality reduction for embedding pipelines (compaction before
ANN indexing, decorrelation before quantization — the classic
pre-processing in front of the IVF/PQ operators in
``operators.similarity``). The reference engine has no linear-algebra
surface at all; this is a Spark-first design:

- **fit** is ONE distributed pass computing per-partition second
  moments (count, Σx, ΣxxT) via Arrow-batched ``mapInPandas`` — the
  executors reduce 100 TB of vectors to ``num_partitions`` rows of
  d + d² doubles; the driver sums those bounded partials (in
  partition-id order, so the float reduction is deterministic) and
  eigendecomposes the d×d covariance locally (d is the embedding
  width — tiny next to the data);
- **project** is pure map-side JVM column expressions: each component
  becomes a literal array folded against the vector with the same
  ``aggregate``/``zip_with`` dot product the ANN operators use
  (sequential fold — deterministic), with the mean-centering folded
  into a precomputed scalar offset (``(x-μ)·c = x·c - μ·c``), so
  projection adds zero shuffles and zero Python to the query plan.

Eigenvector sign is fixed (largest-magnitude coordinate made
positive) so fits are reproducible across runs and cluster layouts.

No DuckDB oracle is possible — eigendecomposition is not
SQL-expressible — so the catalog query registers rows-only; the
numerics are pinned against a full numpy twin in
``tests/test_pca.py`` instead.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot_fold


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 4) -> dict:
    """Fit a PCA model; returns ``{"mean", "components",
    "explained_variance", "total_variance", "n"}`` with plain-python
    lists (broadcast-safe, JSON-serializable)."""
    import numpy as np

    def partials(it: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        n, s, xtx = 0, None, None
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            g = m.T @ m
            xtx = g if xtx is None else xtx + g
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": [TaskContext.get().partitionId()],
                "n": [n],
                "s": [s.tolist()],
                "xtx": [xtx.reshape(-1).tolist()],
            }
        )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "pid int, n long, s array<double>, xtx array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    # driver-side reduction of <= num_partitions bounded partials, in
    # partition-id order so the float sum is run-deterministic
    rows.sort(key=lambda r: r.pid)
    n = sum(r.n for r in rows)
    d = len(rows[0].s)
    if not 1 <= k <= d:
        raise ValueError(f"k={k} outside [1, {d}]")
    if n < 2:
        raise ValueError("pca_fit: need >= 2 vectors")
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r.s)
        xtx += np.asarray(r.xtx).reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for j in order:
        v = evecs[:, j]
        if v[np.argmax(np.abs(v))] < 0:  # sign convention: dominant coord > 0
            v = -v
        comps.append(v.tolist())
    return {
        "mean": mean.tolist(),
        "components": comps,
        "explained_variance": [float(evals[j]) for j in order],
        "total_variance": float(evals.sum()),
        "n": int(n),
    }


def pca_project_cols(model: dict, vec_col: str | Column) -> list[Column]:
    """One JVM column per principal component: ``(x - μ)·cⱼ`` computed
    as ``x·cⱼ - μ·cⱼ`` with the μ·cⱼ offset precomputed driver-side —
    the vector is folded once per component, never centered into an
    intermediate array."""
    import numpy as np

    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    mean = np.asarray(model["mean"])
    cols = []
    for j, comp in enumerate(model["components"]):
        lit = F.array(*[F.lit(float(c)) for c in comp])
        offset = float(np.dot(mean, np.asarray(comp)))
        cols.append((dot_fold(vec, lit) - F.lit(offset)).alias(f"pc{j + 1}"))
    return cols


def pca_project(
    df: DataFrame, model: dict, vec_col: str = "embedding"
) -> DataFrame:
    """Append ``pc1..pck`` projection columns (map-side only)."""
    return df.select("*", *pca_project_cols(model, vec_col))
