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


def pca_prefilter_topk(
    emb: DataFrame,
    model: dict,
    k: int = 5,
    shortlist: int = 20,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dimensionality-reduced ANN: coarse top-``shortlist`` search in
    the PCA-projected space (d′ ≪ d — the fold cost per candidate
    drops by d/d′), then EXACT cosine rerank of the shortlist on the
    full vectors. The classic recall/throughput dial: shortlist →
    corpus size reproduces the exact result (pinned by test);
    production shortlists trade a measured recall for the cheap
    coarse pass.

    The rerank joins the (queries × shortlist)-row candidate set —
    broadcast — against the full-vector table twice; the corpus is
    never reshuffled. Projection itself is map-side (see
    ``pca_project_cols``)."""
    from pyspark.sql import Window

    from .similarity import dot_fold, with_norm

    pcs = pca_project_cols(model, vec_col)
    # keep the original columns so query_pred can reference any of
    # them; cosine_topk applies the predicate BEFORE the candidate
    # join, so only the query subset pays the coarse ranking
    proj = emb.select("*", F.array(*[c for c in pcs]).alias("_pc"))
    from .similarity import cosine_topk

    coarse = cosine_topk(
        proj, k=shortlist, query_pred=query_pred, id_col=id_col, vec_col="_pc"
    )
    full = with_norm(emb, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), F.col("_norm")
    )
    pairs = (
        coarse.select("query_id", "neighbor_id")
        .join(
            full.select(
                F.col("_id").alias("query_id"),
                F.col("_v").alias("_qv"),
                F.col("_norm").alias("_qn"),
            ),
            "query_id",
        )
        .join(
            full.select(
                F.col("_id").alias("neighbor_id"),
                F.col("_v").alias("_cv"),
                F.col("_norm").alias("_cn"),
            ),
            "neighbor_id",
        )
    )
    cos = dot_fold(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
