"""Distributed PCA: integer power-iteration fit (r9 — replaced the
LAPACK eigh so the fit is oracle-replayable, see operators/intlin.py)
vs numpy eigh on a spiked well-conditioned fixture (quality), vs a
pure-python integer replay on the real corpus (bit-exactness of the
distributed moment pass + driver solve), plus projection numerics,
determinism, validation, and the prefilter exactness/recall anchors."""

from __future__ import annotations

import numpy as np
import pytest

from databridge_etl_tools_spark.operators import intlin as IL
from databridge_etl_tools_spark.operators.pca import (
    int_moments,
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.asarray(
        [r.embedding for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    return df, x


@pytest.fixture(scope="module")
def spiked(spark):
    """Well-separated planted spectrum (1.0, 0.5, 0.05² noise floor):
    power iteration converges geometrically here, so directions must
    match LAPACK eigh to high tolerance — the QUALITY pin that
    complements the oracle's exact replay."""
    rng = np.random.RandomState(11)
    n, d = 600, 24
    base = rng.randn(n, d) * 0.05
    base[:, 0] += rng.randn(n) * 1.0
    base[:, 1] += rng.randn(n) * 0.5
    x = base @ np.linalg.qr(rng.randn(d, d))[0]
    x = np.clip(x, -1.9, 1.9)  # keep |x| < 2 for the q20 audit bound
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    xf = np.asarray(
        [r.embedding for r in df.orderBy("vec_id").collect()],
        dtype=np.float64,
    )  # float32 round-trip — what the fit actually sees
    return df, xf


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
    return mean, np.array(comps), evals[order], evals.sum()


def test_fit_matches_numpy_on_spiked_spectrum(spiked):
    df, x = spiked
    m = pca_fit(df, "embedding", k=2, iters=16)
    mean, comps, evals, total = _np_pca(x, 2)
    assert np.allclose(m["mean"], mean, atol=2e-6)  # q20 floor bias
    cm = np.asarray(m["components"])
    # converged directions: |cos angle| vs eigh ~ 1 (same sign conv.)
    for c in range(2):
        cos = float(cm[c] @ comps[c]) / np.linalg.norm(cm[c])
        assert cos > 0.9999, (c, cos)
    assert np.allclose(
        m["explained_variance"], evals, rtol=1e-3
    )
    assert m["total_variance"] == pytest.approx(total, rel=1e-4)
    assert m["n"] == len(x)
    # unit-normalized, near-orthogonal (q15 quantization tolerance)
    assert np.allclose(cm @ cm.T, np.eye(2), atol=5e-3)


def test_fit_is_exact_python_replay(emb):
    """The distributed fit must equal the pure-python integer core on
    the collected corpus BIT-FOR-BIT — the invariant the DuckDB
    oracle twin relies on (same moments, same trunc arithmetic)."""
    df, x = emb
    m = pca_fit(df, "embedding", k=3, iters=16)
    xi = np.floor(x * (1 << 20)).astype(np.int64).astype(object)
    n, d = x.shape
    s = [int(v) for v in xi.sum(axis=0)]
    g = xi.T @ xi
    cp = IL.scatter(n, s, [[int(g[i][j]) for j in range(d)] for i in range(d)])
    comps = IL.power_components(cp, 3, 16)
    assert m["s_int"] == s
    assert m["w_int"] == [c["w"] for c in comps]
    assert m["explained_variance"] == [
        float(c["rq_num"]) / float(c["rq_den"]) / n / (n - 1) / float(1 << 40)
        for c in comps
    ]


def test_int_moments_partition_invariant(emb):
    df, _ = emb
    a = int_moments(df, "embedding")
    b = int_moments(df.repartition(13), "embedding")
    assert a == b  # exact ints: layout cannot change a single bit


def test_projection_matches_numpy(spiked):
    df, x = spiked
    m = pca_fit(df, "embedding", k=2, iters=16)
    got = {
        r.vec_id: (r.pc1, r.pc2)
        for r in pca_project(df, m, "embedding").collect()
    }
    mean, comps, _, _ = _np_pca(x, 2)
    want = (x - mean) @ comps.T
    ids = sorted(got)
    assert np.allclose([got[i] for i in ids], want, atol=2e-3)
    # projected coordinates are centered
    assert abs(np.mean([got[i][0] for i in ids])) < 1e-4


def test_variance_capture(emb):
    """On this near-isotropic corpus (spectrum gaps ~0) a fixed
    iteration count cannot rank the clustered eigenvalues — the
    honest invariant is that every direction captures ABOVE-AVERAGE
    variance (> tv/d: better than a random axis) and the set stays
    inside the total. Strict ordering + eigenvalue equality are
    pinned on the spiked fixture where convergence is geometric."""
    df, x = emb
    m = pca_fit(df, "embedding", k=8)
    ev = m["explained_variance"]
    d = x.shape[1]
    avg = m["total_variance"] / d
    assert all(e > avg for e in ev), (ev, avg)
    assert 0 < sum(ev) <= m["total_variance"] + 1e-9


def test_fit_deterministic(emb):
    df, _ = emb
    a = pca_fit(df, "embedding", k=2)
    b = pca_fit(df.repartition(7), "embedding", k=2)
    assert a == b  # across cluster layouts, not just reruns


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
    from databridge_etl_tools_spark.operators.pca import pca_prefilter_topk
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