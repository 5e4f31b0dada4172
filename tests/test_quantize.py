"""int8 scalar quantization: numpy twin, code range, reconstruction
bound, constant-dimension edge case."""

from __future__ import annotations

import numpy as np

from databridge_etl_tools_spark.operators.quantize import quantize_minmax_int8


def test_quantize_matches_numpy_twin(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    x = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    m = np.stack([x[i] for i in sorted(x)])
    mn, mx = m.min(axis=0), m.max(axis=0)
    out = quantize_minmax_int8(emb, "embedding", "vec_id").collect()
    for r in out:
        xv = x[r.vec_id][r.pos]
        span = mx[r.pos] - mn[r.pos]
        want = 0 if span == 0 else int(np.floor((xv - mn[r.pos]) / span * 255.0)) - 128
        assert r.code == want, (r.vec_id, r.pos)
        assert -128 <= r.code <= 127
        # midpoint dequantization error is bounded by one bucket
        assert abs(r.x - r.xhat) <= 0.5 * span / 255.0 + 1e-12


def test_quantize_constant_dimension(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])], "vec_id long, embedding array<float>"
    )
    out = {(r.vec_id, r.pos): r for r in quantize_minmax_int8(df).collect()}
    # dim 0 constant: code 0, exact reconstruction
    assert out[(1, 0)].code == 0 and out[(1, 0)].xhat == 1.0
    assert out[(2, 1)].code == 127  # max of the varying dim
    assert out[(1, 1)].code == -128  # min of the varying dim


def test_segment_overlap_matrix_planted(spark):
    from databridge_etl_tools_spark.operators.chunking import segment_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "a b c d x1 y1 z1 w1", "s1"),
            (2, "a b c d x2 y2 z2 w2", "s2"),  # shares segment 'a b c d' with s1
            (3, "p q r s t u v w", "s3"),  # shares nothing
            (4, "a b c d m n o p", "s1"),  # same shared segment, same group
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.group_a, r.group_b): r.n_shared_segments
        for r in segment_overlap_matrix(docs, "source", size=4).collect()
    }
    assert out == {("s1", "s2"): 1}
