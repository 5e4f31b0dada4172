"""Closed-form distributed ridge regression over an embedding column.

The supervised sibling of ``operators.pca``: quality-score
regressors, probe heads over frozen embeddings, feature-importance
audits — the linear models a training-data pipeline fits on corpus
features. Same Spark-first shape as the PCA fit:

- **fit** is ONE Arrow pass of per-partition INTEGER sufficient
  statistics (n, Σxᵢ, Σyᵢ, Σyᵢ², XᵀX, Xᵀy over q20-quantized values
  ``xi = floor(x·2^20)``, ``yi = floor(y·2^20)``): executors reduce
  any corpus to ``num_partitions`` bounded rows; the driver sums the
  partials in exact Python ints and solves the (d+ridge)×d normal
  equations with fraction-free Gaussian elimination in replayable
  integer fixed point (``operators.intlin.gauss_solve_fixed`` — the
  r8 promotion discipline replacing ``np.linalg.solve``, r8 verdict
  task #4: every elimination and back-substitution step is integer
  arithmetic + trunc division, so a DuckDB twin unrolls the d pivots
  into CTE levels and reproduces the coefficients bit-for-bit).
  Centering is algebraic (``n·XcᵀXc = n·XᵀX − s·sᵀ``), so no second
  pass.
- **predict** is pure map-side JVM: the q30 integer weight vector
  becomes a literal-array integer fold (exact int64 per row), one
  power-of-two division and one IEEE addition of the intercept —
  zero shuffles, zero Python, bit-reproducible scoring.

The catalog query (``ridge_probe_embeddings``) is full
DuckDB-oracle-backed (promoted from rows-only in r9); coefficient
quality vs the numpy closed form is additionally pinned in
``tests/test_linear.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import intlin as IL

_Q20 = 1 << IL.Q_COORD
_Q40 = 1 << (2 * IL.Q_COORD)
_Q50 = 1 << (IL.Q_COORD + IL.Q_BETA)
_Q70 = 1 << (2 * IL.Q_COORD + IL.Q_BETA)


def _int_xy_moments(df: DataFrame, label_col: str, vec_col: str):
    """ONE Arrow pass → exact integer sufficient statistics
    ``(n, s, sy, syy, G, xty)`` over q20-quantized x and y, int64
    partials per partition (overflow-audited) reduced driver-side in
    unbounded Python ints."""
    import numpy as np

    def partials(it: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        n, s, sy, syy, g, xty, ma = 0, None, 0, 0, None, None, 1
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            y = np.asarray(pdf[label_col], dtype=np.float64)
            xi = np.floor(x * _Q20).astype(np.int64)
            yi = np.floor(y * _Q20).astype(np.int64)
            n += xi.shape[0]
            ma = max(
                ma,
                int(np.abs(xi).max(initial=0)),
                int(np.abs(yi).max(initial=0)),
            )
            if n > (1 << 63) // (ma * ma):
                raise ValueError(
                    "ridge_fit: partition too large for exact int64 "
                    f"moment partials (rows={n}, max|quantized|={ma}); "
                    "repartition the input or rescale features/labels"
                )
            s = xi.sum(axis=0) if s is None else s + xi.sum(axis=0)
            sy += int(yi.sum())
            syy += int((yi * yi).sum())
            gg = xi.T @ xi
            g = gg if g is None else g + gg
            v = xi.T @ yi
            xty = v if xty is None else xty + v
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": [TaskContext.get().partitionId()],
                "n": [n],
                "s": [s.tolist()],
                "sy": [sy],
                "syy": [syy],
                "g": [g.reshape(-1).tolist()],
                "xty": [xty.tolist()],
                "ma": [ma],
            }
        )

    rows = (
        df.select(vec_col, label_col)
        .mapInPandas(
            partials,
            "pid int, n long, s array<long>, sy long, syy long, "
            "g array<long>, xty array<long>, ma long",
        )
        .collect()
    )
    if not rows:
        raise ValueError("ridge_fit: empty input")
    d = len(rows[0].s)
    n, sy, syy, maxq = 0, 0, 0, 1
    s = [0] * d
    xty = [0] * d
    g = [[0] * d for _ in range(d)]
    for r in rows:
        n += r.n
        sy += int(r.sy)
        syy += int(r.syy)
        maxq = max(maxq, int(r.ma))
        for j in range(d):
            s[j] += int(r.s[j])
            xty[j] += int(r.xty[j])
        flat = r.g
        for i in range(d):
            base = i * d
            gi = g[i]
            for j in range(d):
                gi[j] += int(flat[base + j])
    return n, s, sy, syy, g, xty, maxq


def ridge_fit(
    df: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    lam: float = 1.0,
) -> dict:
    """Fit ``y ≈ intercept + x·w`` with L2 penalty ``lam`` on ``w``
    (intercept unpenalized — the standard convention; ``lam`` must be
    integer-valued so the ridge term stays exact integer arithmetic).
    Returns ``{"weights", "intercept", "n", "rmse"}`` as plain python
    values (broadcast-safe) plus the integer state ``{"b_int",
    "s_int", "sy_int"}`` for oracle-replayable scoring. ``rmse`` is
    the training error, computed from the same sufficient statistics
    (no second data pass)."""
    if lam != int(lam) or lam < 0:
        raise ValueError(f"lam must be a non-negative integer, got {lam}")
    lam_i = int(lam)
    n, s, sy, syy, g, xty, maxq = _int_xy_moments(df, label_col, vec_col)
    d = len(s)
    if n < 2:
        raise ValueError("ridge_fit: need >= 2 rows")
    # n·XcᵀXc (q40) and n·Xcᵀyc (q40), exact; + λ·n·2^40 on the diag
    scat = IL.scatter(n, s, g)
    a = [
        [scat[i][j] + (lam_i * n * _Q40 if i == j else 0) for j in range(d)]
        for i in range(d)
    ]
    bvec = [n * xty[j] - s[j] * sy for j in range(d)]
    b_int = IL.gauss_solve_fixed(a, bvec)
    mb = max(abs(v) for v in b_int)
    # int64 prediction-fold audit against the OBSERVED quantized
    # feature magnitude (r9 advice: the old constant-2^20 bound
    # silently assumed |x| ≤ 1, which nothing validated). The bound
    # certifies scoring data from the fitted distribution; the model
    # records max_abs_q so ridge_pq_col's contract is checkable.
    if mb and d * max(maxq, _Q20) * mb >= 1 << 62:
        raise ValueError(
            f"ridge_fit: solution magnitude max|B|={mb} with observed "
            f"max|quantized x|={maxq} would overflow int64 prediction "
            "folds — the probe is ill-conditioned; raise lam or "
            "rescale features"
        )
    # every float below mirrors the DuckDB twin's op sequence exactly
    sb = sum(s[j] * b_int[j] for j in range(d))
    intercept = float(sy) / n / float(_Q20) - float(sb) / n / float(_Q50)
    # n²·sse from exact moments + B̂ (all ints until the final divides):
    # n·Σ(y−ŷ)² = n·Σyc²/.. computed in the twin's exact sequence
    t1 = float(n * syy - sy * sy) / float(_Q40)
    t2 = float(sum(b_int[j] * bvec[j] for j in range(d))) / float(_Q70)
    z = [
        IL.tdiv(
            sum(scat[i][j] * b_int[j] for j in range(d)), 1 << IL.Q_BETA
        )
        for i in range(d)
    ]
    t3 = float(sum(b_int[i] * z[i] for i in range(d))) / float(_Q70)
    nsse = (t1 - 2.0 * t2) + t3
    import math

    rmse = math.sqrt(max(nsse, 0.0) / n / n)
    return {
        "weights": [v / float(1 << IL.Q_BETA) for v in b_int],
        "intercept": intercept,
        "n": int(n),
        "rmse": rmse,
        "b_int": b_int,
        "s_int": s,
        "sy_int": sy,
        "max_abs_q": maxq,
    }


def ridge_pq_col(model: dict, vec_col: str | Column) -> Column:
    """The EXACT integer prediction fold ``Σ_j floor(x_j·2^20)·B_j``
    (q50) — bit-reproducible on any engine; ``prediction =
    intercept + pq/2^50``. CONTRACT: the fit's audit certifies the
    int64 bound for inputs whose quantized magnitude stays within
    ``model["max_abs_q"]`` (the fit pass's observed maximum) — i.e.
    scoring data from the fitted distribution. Scoring inputs beyond
    it needs a caller-side re-audit: d·max|x_q|·max|B| < 2^62."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    blit = F.array(*[F.lit(int(v)).cast("long") for v in model["b_int"]])
    prod = F.zip_with(
        vec,
        blit,
        lambda x, bj: F.floor(x.cast("double") * F.lit(float(_Q20)))
        .cast("long")
        * bj,
    )
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)


def ridge_predict(
    df: DataFrame, model: dict, vec_col: str = "embedding"
) -> Column:
    """Score column ``intercept + x·w`` — an integer literal-array JVM
    fold + one exact power-of-two division + one IEEE addition; no
    shuffle, no Python, engine-independent doubles."""
    return (
        F.lit(float(model["intercept"]))
        + ridge_pq_col(model, vec_col).cast("double") / F.lit(float(_Q50))
    ).alias("prediction")


def _int_xym_moments(df: DataFrame, label_cols: list[str], vec_col: str):
    """Multi-label sibling of ``_int_xy_moments``: ONE Arrow pass →
    ``(n, s, sy[c], syy[c], G, xty[c], maxq)`` for L label columns
    over the SAME feature matrix. G (and therefore the whole
    normal-equation matrix) is label-independent, so the L-class
    one-vs-rest fit costs exactly the binary fit's single pass plus
    L·d extra int64 partial sums per partition."""
    import numpy as np

    nl = len(label_cols)

    def partials(it: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        n, s, g, ma = 0, None, None, 1
        sy = [0] * nl
        syy = [0] * nl
        xty = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            ys = [
                np.asarray(pdf[c], dtype=np.float64) for c in label_cols
            ]
            xi = np.floor(x * _Q20).astype(np.int64)
            yi = [np.floor(y * _Q20).astype(np.int64) for y in ys]
            n += xi.shape[0]
            ma = max(
                ma,
                int(np.abs(xi).max(initial=0)),
                max(int(np.abs(v).max(initial=0)) for v in yi),
            )
            if n > (1 << 63) // (ma * ma):
                raise ValueError(
                    "ridge_fit_multi: partition too large for exact "
                    f"int64 moment partials (rows={n}, "
                    f"max|quantized|={ma}); repartition the input or "
                    "rescale features/labels"
                )
            s = xi.sum(axis=0) if s is None else s + xi.sum(axis=0)
            for c in range(nl):
                sy[c] += int(yi[c].sum())
                syy[c] += int((yi[c] * yi[c]).sum())
            gg = xi.T @ xi
            g = gg if g is None else g + gg
            v = np.stack([xi.T @ yi[c] for c in range(nl)])
            xty = v if xty is None else xty + v
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": [TaskContext.get().partitionId()],
                "n": [n],
                "s": [s.tolist()],
                "sy": [sy],
                "syy": [syy],
                "g": [g.reshape(-1).tolist()],
                "xty": [xty.reshape(-1).tolist()],
                "ma": [ma],
            }
        )

    rows = (
        df.select(vec_col, *label_cols)
        .mapInPandas(
            partials,
            "pid int, n long, s array<long>, sy array<long>, "
            "syy array<long>, g array<long>, xty array<long>, ma long",
        )
        .collect()
    )
    if not rows:
        raise ValueError("ridge_fit_multi: empty input")
    d = len(rows[0].s)
    n, maxq = 0, 1
    s = [0] * d
    sy = [0] * nl
    syy = [0] * nl
    xty = [[0] * d for _ in range(nl)]
    g = [[0] * d for _ in range(d)]
    for r in rows:
        n += r.n
        maxq = max(maxq, int(r.ma))
        for j in range(d):
            s[j] += int(r.s[j])
        for c in range(nl):
            sy[c] += int(r.sy[c])
            syy[c] += int(r.syy[c])
            base = c * d
            for j in range(d):
                xty[c][j] += int(r.xty[base + j])
        flat = r.g
        for i in range(d):
            base = i * d
            gi = g[i]
            for j in range(d):
                gi[j] += int(flat[base + j])
    return n, s, sy, syy, g, xty, maxq


def ridge_fit_multi(
    df: DataFrame,
    label_cols: list[str],
    vec_col: str = "embedding",
    lam: float = 1.0,
) -> list[dict]:
    """One-vs-rest multiclass ridge: fit ``y_c ≈ ic_c + x·w_c`` for
    every label column with ONE Arrow moments pass and ONE shared
    fraction-free elimination (``intlin.gauss_solve_multi`` — the
    normal-equation matrix is label-independent). Returns one
    ``ridge_fit``-shaped model dict per label column; each is
    bit-replayable by a DuckDB twin that augments the elimination
    with the same L RHS columns."""
    if lam != int(lam) or lam < 0:
        raise ValueError(f"lam must be a non-negative integer, got {lam}")
    lam_i = int(lam)
    n, s, sy, syy, g, xty, maxq = _int_xym_moments(df, label_cols, vec_col)
    d = len(s)
    nl = len(label_cols)
    if n < 2:
        raise ValueError("ridge_fit_multi: need >= 2 rows")
    scat = IL.scatter(n, s, g)
    a = [
        [scat[i][j] + (lam_i * n * _Q40 if i == j else 0) for j in range(d)]
        for i in range(d)
    ]
    bvecs = [
        [n * xty[c][j] - s[j] * sy[c] for j in range(d)] for c in range(nl)
    ]
    b_ints = IL.gauss_solve_multi(a, bvecs)
    import math

    out = []
    for c in range(nl):
        b_int = b_ints[c]
        mb = max(abs(v) for v in b_int) if b_int else 0
        if mb and d * max(maxq, _Q20) * mb >= 1 << 62:
            raise ValueError(
                f"ridge_fit_multi[{label_cols[c]}]: solution magnitude "
                f"max|B|={mb} with observed max|quantized x|={maxq} "
                "would overflow int64 prediction folds — raise lam or "
                "rescale features"
            )
        sb = sum(s[j] * b_int[j] for j in range(d))
        intercept = (
            float(sy[c]) / n / float(_Q20) - float(sb) / n / float(_Q50)
        )
        t1 = float(n * syy[c] - sy[c] * sy[c]) / float(_Q40)
        t2 = float(
            sum(b_int[j] * bvecs[c][j] for j in range(d))
        ) / float(_Q70)
        z = [
            IL.tdiv(
                sum(scat[i][j] * b_int[j] for j in range(d)),
                1 << IL.Q_BETA,
            )
            for i in range(d)
        ]
        t3 = float(sum(b_int[i] * z[i] for i in range(d))) / float(_Q70)
        nsse = (t1 - 2.0 * t2) + t3
        out.append(
            {
                "label": label_cols[c],
                "weights": [v / float(1 << IL.Q_BETA) for v in b_int],
                "intercept": intercept,
                "n": int(n),
                "rmse": math.sqrt(max(nsse, 0.0) / n / n),
                "b_int": b_int,
                "s_int": s,
                "sy_int": sy[c],
                "max_abs_q": maxq,
            }
        )
    return out
