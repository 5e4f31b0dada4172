"""KMV distinct-count sketch: merge property (partial sketches union
to the full sketch), exact path under k, estimator accuracy band."""

from __future__ import annotations

import hashlib

from databridge_etl_tools_spark.operators.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_minhashes,
)


def _h(v, salt="kmv"):
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:8], 16)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def test_kmv_matches_python_twin_and_exact_path(spark):
    vals = list(range(40))  # fewer distinct than k
    sk = sorted(r["hv"] for r in kmv_minhashes(_df(spark, vals * 3), "x", k=64).collect())
    assert sk == sorted({_h(v) for v in vals})
    nk, est = kmv_estimate(kmv_minhashes(_df(spark, vals * 3), "x", k=64), k=64)
    assert (nk, est) == (40, 40.0)  # under k → exact


def test_kmv_merge_equals_sketch_of_union(spark):
    a, b = list(range(0, 400)), list(range(300, 700))  # overlapping
    sa = kmv_minhashes(_df(spark, a), "x", k=32)
    sb = kmv_minhashes(_df(spark, b), "x", k=32)
    merged = sorted(r["hv"] for r in kmv_merge([sa, sb], k=32).collect())
    full = sorted(r["hv"] for r in kmv_minhashes(_df(spark, a + b), "x", k=32).collect())
    assert merged == full


def test_kmv_estimate_within_error_band(spark):
    n = 5000
    sk = kmv_minhashes(_df(spark, list(range(n))), "x", k=256)
    nk, est = kmv_estimate(sk, k=256)
    assert nk == 256
    # std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """Two-pass MG candidates + exact recount must equal the brute
    force answer on a skewed stream, for any partition layout."""
    import pyspark.sql.functions as F

    from databridge_etl_tools_spark.operators.sketch import heavy_hitters

    rows = (
        [("hot",)] * 400
        + [("warm",)] * 60
        + [(f"cold{i}",) for i in range(540)]
    )
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "v string").repartition(parts)
        got = {(r["item"], r["n"]) for r in heavy_hitters(df, "v", denom=20).collect()}
        n = len(rows)
        brute = {
            (r["v"], r["count"])
            for r in df.groupBy("v").count().where(F.col("count") * 20 >= n).collect()
        }
        assert got == brute
        assert ("hot", 400) in got and ("warm", 60) in got
