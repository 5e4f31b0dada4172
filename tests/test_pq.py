"""Product-quantization contract tests: exactness on codebook-aligned
vectors, chunk-count invariance, and a recall floor vs exact L2."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.similarity import (
    pq_encode,
    pq_fit,
    pq_topk_adc,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_exact_on_codebook_aligned_vectors(spark):
    """With iters=0 the codebooks ARE the 16 lowest-id vectors'
    sub-slices, so those vectors quantize losslessly: ADC distance
    must equal the true squared L2 between the original floats."""
    emb = _emb(spark).orderBy("vec_id").limit(16)
    books = pq_fit(emb, m=8, ksub=16, iters=0)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    # every vector's code is its own seed index in EVERY subspace
    codes = {r.id: list(r.codes) for r in pq_encode(emb, books).collect()}
    seed_order = sorted(vecs)
    for idx, vid in enumerate(seed_order):
        assert codes[vid] == [idx] * 8, (vid, codes[vid])
    got = pq_topk_adc(emb, books, k=3).collect()
    for r in got:
        true = float(((vecs[r.query_id] - vecs[r.neighbor_id]) ** 2).sum())
        # r8: ADC is integer fixed point (q20 coords) — exactness is
        # now up to the quantization bound, ~2·d·2·2^-20 ≈ 2.5e-4 for
        # unit-range coords, not float ulps
        assert abs(r.adc_dist - true) < 1e-3


def test_pq_chunk_invariance(spark):
    emb = _emb(spark)
    books = pq_fit(emb, m=8, ksub=16, iters=1)
    pred = F.col("vec_id") % 25 == 0
    a = {(r.query_id, r.rank): r.neighbor_id
         for r in pq_topk_adc(emb, books, k=5, query_pred=pred, n_chunks=1).collect()}
    b = {(r.query_id, r.rank): r.neighbor_id
         for r in pq_topk_adc(emb, books, k=5, query_pred=pred, n_chunks=8).collect()}
    assert a == b and len(a) > 0


def test_pq_recall_floor_vs_exact(spark):
    emb = _emb(spark)
    books = pq_fit(emb, m=8, ksub=16, iters=2)
    pred = F.col("vec_id") % 10 == 0
    approx = pq_topk_adc(emb, books, k=5, query_pred=pred)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    qids = [v for v in vecs if v % 10 == 0]
    hits = total = 0
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid in qids:
        d = {vid: float(((vecs[qid] - v) ** 2).sum())
             for vid, v in vecs.items() if vid != qid}
        exact = {vid for vid, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:5]}
        hits += len(exact & ap.get(qid, set()))
        total += 5
    recall = hits / total
    # 8 bytes against 64 floats of near-orthogonal noise: structure is
    # minimal, but PQ must still beat random chance by a wide margin
    assert recall >= 0.2, recall


def test_pq_fit_rejects_bad_m(spark):
    import pytest

    with pytest.raises(ValueError):
        pq_fit(_emb(spark), m=7)


def test_q40_overflow_audit_fires():
    # ADVICE r8: the int64 q40 mean sum wraps silently past ~2^23
    # unit-ish rows per group; the audit must raise before a wrapped
    # sum corrupts a codebook. count * max|q40| >= 2^63 triggers.
    import pytest

    from databridge_etl_tools_spark.operators.similarity import _audit_q40_sum

    ok = [{"_n": 1 << 23, "_ma": (1 << 40) - 1}]
    _audit_q40_sum(ok, "test")  # bound not exceeded: no raise
    bad = [{"_n": (1 << 23) + 1, "_ma": 1 << 40}]
    with pytest.raises(ValueError, match="wrapped"):
        _audit_q40_sum(bad, "test")
