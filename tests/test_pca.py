"""Distributed PCA vs a full numpy twin: moments, eigenstructure,
projection numerics, determinism, and parameter validation."""

from __future__ import annotations

import numpy as np
import pytest

from databridge_etl_tools_spark.operators.pca import pca_fit, pca_project


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.asarray(
        [r.embedding for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    return df, x


def _np_pca(x, k):
    mean = x.mean(axis=0)
    c = x - mean
    cov = c.T @ c / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for j in order:
        v = evecs[:, j]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v)
    return mean, np.array(comps), evals[order][::1], evals.sum()


def test_fit_matches_numpy(emb):
    df, x = emb
    m = pca_fit(df, "embedding", k=4)
    mean, comps, evals, total = _np_pca(x, 4)
    assert np.allclose(m["mean"], mean, atol=1e-9)
    assert np.allclose(m["explained_variance"], sorted(evals, reverse=True), atol=1e-9)
    assert m["total_variance"] == pytest.approx(total, abs=1e-9)
    assert m["n"] == len(x)
    # same components up to the shared sign convention
    assert np.allclose(np.abs(m["components"]), np.abs(comps), atol=1e-7)
    assert np.allclose(m["components"], comps, atol=1e-7)
    # orthonormality
    cm = np.asarray(m["components"])
    assert np.allclose(cm @ cm.T, np.eye(4), atol=1e-9)


def test_projection_matches_numpy(emb):
    df, x = emb
    m = pca_fit(df, "embedding", k=3)
    got = {
        r.vec_id: (r.pc1, r.pc2, r.pc3)
        for r in pca_project(df, m, "embedding").collect()
    }
    mean, comps, _, _ = _np_pca(x, 3)
    want = (x - mean) @ comps.T
    ids = sorted(got)
    assert np.allclose([got[i] for i in ids], want, atol=1e-6)
    # projected coordinates are centered
    assert abs(np.mean([got[i][0] for i in ids])) < 1e-6


def test_variance_ordering_and_capture(emb):
    df, x = emb
    m = pca_fit(df, "embedding", k=8)
    ev = m["explained_variance"]
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    assert 0 < sum(ev) <= m["total_variance"] + 1e-9


def test_fit_deterministic(emb):
    df, _ = emb
    a = pca_fit(df, "embedding", k=2)
    b = pca_fit(df, "embedding", k=2)
    assert a == b


def test_fit_validation(spark, emb):
    df, _ = emb
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", k=0)
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", k=1000)
    empty = df.where("vec_id < 0")
    with pytest.raises(ValueError):
        pca_fit(empty, "embedding", k=2)


def test_pca_prefilter_recall_and_exactness_anchor(emb):
    """PCA-coarse + exact-rerank ANN: a corpus-sized shortlist
    reproduces exact brute force EXACTLY; a small shortlist keeps
    useful recall at a fraction of the fold cost."""
    from databridge_etl_tools_spark.operators.pca import pca_fit, pca_prefilter_topk
    from databridge_etl_tools_spark.operators.similarity import cosine_topk
    from pyspark.sql import functions as F

    df, x = emb
    pred = F.col("vec_id") % 50 == 0
    exact = {}
    for r in cosine_topk(df, k=5, query_pred=pred).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    m = pca_fit(df, "embedding", k=8)
    full = {}
    for r in pca_prefilter_topk(df, m, k=5, shortlist=len(x) - 1, query_pred=pred).collect():
        full.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert full == exact  # exactness anchor

    small = {}
    for r in pca_prefilter_topk(df, m, k=5, shortlist=50, query_pred=pred).collect():
        small.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(small.get(q, set()) & n) for q, n in exact.items())
    recall = hits / sum(len(n) for n in exact.values())
    assert recall >= 0.5, recall  # random near-orthogonal vectors are the
    # worst case for dim reduction; real embedding manifolds do far better
