"""Scalar (min-max) int8 quantization for embedding columns.

Storage/bandwidth compression for embedding tables: 4 bytes/dim
float32 → 1 byte/dim int8 ahead of ANN serving (the coarse cousin of
the product quantizer in ``operators.similarity.pq_fit``; PQ
compresses harder, scalar quantization keeps per-dimension decode
trivial and SQL-expressible).

Scale design: calibration is a d-row aggregate (posexplode →
groupBy(pos) min/max — one shuffle whose key space is the embedding
width), broadcast back onto the exploded stream; encoding is then
pure map-side arithmetic. All numerics avoid engine-specific
rounding: codes use ``floor`` (IEEE-exact, identical in any engine,
unlike round() whose half-way rule differs between Java and C), and
error sums are decimal-cast so the reduction is order-independent —
which is what lets the catalog query carry a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_minmax_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize each vector dimension to int8 against per-dimension
    corpus min/max.

    Returns the exploded stream ``(<id_col>, pos INT, x DOUBLE,
    code INT, xhat DOUBLE)`` — ``code`` ∈ [-128, 127] and ``xhat``
    the midpoint dequantization — one row per (vector, dimension).
    Callers aggregate (reconstruction error), reassemble
    (``array_sort(collect_list(struct(pos, code)))``) or write the
    exploded layout directly. A constant dimension (max == min)
    encodes as 0 with exact reconstruction."""
    ex = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "_xf")
    ).withColumn("x", F.col("_xf").cast("double"))
    dims = ex.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = ex.join(F.broadcast(dims), "pos")
    span = F.col("mx") - F.col("mn")
    code = F.when(span == 0, F.lit(0)).otherwise(
        (F.floor((F.col("x") - F.col("mn")) / span * F.lit(255.0)) - F.lit(128)).cast(
            "int"
        )
    )
    out = j.withColumn("code", code)
    # least(·, mx): the top code (127, produced only by x == mx) is a
    # degenerate half-width bucket — the midpoint formula would
    # dequantize it to mn + 255.5/255·span, overshooting the
    # calibrated max by span/510. Clamping keeps every xhat inside
    # [mn, mx] (round-4 advisor finding; mirrored in the
    # emb_quantize_int8 oracle).
    xhat = F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
        F.least(
            F.col("mn")
            + (F.col("code") + F.lit(128) + F.lit(0.5))
            * (F.col("mx") - F.col("mn"))
            / F.lit(255.0),
            F.col("mx"),
        )
    )
    return out.withColumn("xhat", xhat).select(id_col, "pos", "x", "code", "xhat")


def standardize_dims(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fp_scale: int = 10_000,
) -> DataFrame:
    """Per-dimension feature standardization report — the z-score
    calibration pass (mean/variance per embedding dimension) that
    precedes whitening, scalar quantization, or outlier scrubbing.

    Returns one row per dimension: ``(pos, n, mean, var,
    n_outliers)`` with ``n_outliers`` the count of values beyond
    mean ± 3σ.

    Determinism (the integer-moment recipe, same as the behavioral
    anomaly detector): each value is fixed-pointed once
    (``xi = floor(x·fp_scale)`` — map-side, exact), the aggregation
    sums only INTEGERS (Σxi, Σxi² as BIGINT — order-independent,
    so the reduction can't perturb a hash), and mean/var are single
    deterministic double expressions over those exact sums:
    ``var = (n·Σxi² − (Σxi)²) / (n·(n−1)) / fp_scale²``. Bound:
    n·(x_max·fp_scale)² must stay under 2⁶³ — at |x| ≤ 1 and
    fp_scale = 1e4 that allows ~9·10¹⁰ vectors·dims; larger corpora
    should move the two moment sums to DECIMAL(38,0).

    Scale: one posexplode + ONE pos-keyed aggregate (key space = the
    embedding width — tiny); the outlier pass re-joins the d-row
    stats table broadcast. Two passes over the exploded stream, zero
    corpus-keyed shuffles."""
    ex = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "_xf")
    ).select(
        id_col,
        "pos",
        F.col("_xf").cast("double").alias("x"),
        F.floor(F.col("_xf").cast("double") * fp_scale).cast("bigint").alias("_xi"),
    )
    stats = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_xi").cast("bigint").alias("_s"),
        F.sum(F.col("_xi") * F.col("_xi")).cast("bigint").alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("n") / fp_scale
    var = (
        (F.col("n") * F.col("_ss") - F.col("_s") * F.col("_s")).cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1))
        / F.lit(float(fp_scale) * fp_scale)
    )
    enriched = stats.select("pos", "n", mean.alias("mean"), var.alias("var"))
    out = (
        ex.join(F.broadcast(enriched), "pos")
        .select(
            "pos",
            (
                F.abs(F.col("x") - F.col("mean")) > 3.0 * F.sqrt(F.col("var"))
            ).cast("int").alias("_o"),
        )
        .groupBy("pos")
        .agg(F.sum("_o").cast("bigint").alias("n_outliers"))
    )
    return enriched.join(out, "pos").select("pos", "n", "mean", "var", "n_outliers")
