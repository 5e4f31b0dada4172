"""Integer fixed-point linear algebra — the promotion core that
dissolved the LAPACK rows-only blockers (r8 verdict tasks #2/#4).

Why integers: ``np.linalg.eigh`` / ``np.linalg.solve`` are
engine-internal factorizations — not a loop an oracle can replay.
These routines ARE replayable loops: every step is integer
arithmetic (exact in Python ints driver-side and in DuckDB HUGEINT
oracle-side) plus trunc-toward-zero division (``a // b`` in DuckDB
truncates toward zero for integers; :func:`tdiv` mirrors that in
Python), so a DuckDB twin unrolls the fixed iteration count into CTE
levels and reproduces every intermediate bit-for-bit — the same move
that promoted BPE and k-means in r8.

Numerically these are the classic methods in ~40-bit fixed-point
arithmetic: power iteration + Hotelling deflation for the top-k
eigenvectors of a symmetric scatter matrix, and fraction-free
(single-step Bareiss) Gaussian elimination with per-row magnitude
renormalization for an SPD solve. Precision is ~2⁻³⁰..2⁻⁴⁰ relative
per step — far tighter than any downstream tolerance — while the
renormalization stops Bareiss's determinant-sized entry growth, so
every intermediate fits int128 (the DuckDB HUGEINT bound; Python
ints are unbounded, and DuckDB RAISES on int128 overflow rather than
wrapping, so a bound violation in the oracle is loud).

Scale design: these run DRIVER-side on d×d integer moment matrices
(d = embedding width — tiny). The corpus-sized work is the single
distributed moments pass in ``operators.pca`` / ``operators.linear``;
everything here is O(d²·iters) on bounded state.
"""

from __future__ import annotations

Q_COORD = 20  #: coordinate fixed point: xi = floor(x · 2^20)
Q_VEC = 15  #: power-iterate fixed point (max |w| normalized to 2^15)
Q_MAT = 40  #: matrix renormalization target (max |A| → 2^40)
Q_BETA = 30  #: solution fixed point for the linear solve


def tdiv(a: int, b: int) -> int:
    """Trunc-toward-zero integer division — EXACTLY DuckDB's ``//``
    on integers (Python's ``//`` floors, which differs on negatives:
    -7 // 2 is -4 in Python but -3 in DuckDB)."""
    if b == 0:
        return 0
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def renorm(vals: list[int], target: int = 1 << Q_MAT) -> list[int]:
    """Magnitude-renormalize ints so max |v| becomes ``target``
    (scaling never changes eigenvectors or linear-system solutions).

    Two-step so the oracle's HUGEINT intermediates stay in int128
    even when |v| is huge: first a coarse divide by ``max(m //
    target, 1)`` (brings the magnitude near ``target`` without the
    ``v * target`` product that could overflow), then the exact
    ``(v * target) // m1`` on the now-small values. Replay:
    ``v // greatest(m // target, 1)`` then ``(v * target) // m1`` —
    both plain ``//``."""
    m = max(abs(v) for v in vals)
    if m == 0:
        return list(vals)
    coarse = max(m // target, 1)
    v1 = [tdiv(v, coarse) for v in vals]
    m1 = max(abs(v) for v in v1)
    return [tdiv(v * target, m1) for v in v1]


def scatter(n: int, s: list[int], g: list[list[int]]) -> list[list[int]]:
    """Centered scatter ∝ covariance: ``C' = n·G − s·sᵀ`` (exact ints;
    C' = n·(n−1)·2^(2·Q_COORD)·cov for q-quantized coordinates)."""
    d = len(s)
    return [[n * g[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)]


def _matvec(a: list[list[int]], w: list[int]) -> list[int]:
    return [sum(ai[j] * w[j] for j in range(len(w))) for ai in a]


def _seed(a: list[list[int]]) -> list[int]:
    """Unit basis vector (scaled 2^Q_VEC) at the largest diagonal
    entry, ties to the lowest index — replay: ``ORDER BY a DESC, j
    LIMIT 1`` over the diagonal."""
    d = len(a)
    jmax = 0
    for j in range(1, d):
        if a[j][j] > a[jmax][jmax]:
            jmax = j
    return [(1 << Q_VEC) if j == jmax else 0 for j in range(d)]


def _sign_fix(w: list[int]) -> list[int]:
    """Make the largest-|coordinate| positive (ties lowest index) —
    replay: ``ORDER BY ABS(w) DESC, j LIMIT 1``."""
    jm = 0
    for j in range(1, len(w)):
        if abs(w[j]) > abs(w[jm]):
            jm = j
    return [-v for v in w] if w[jm] < 0 else list(w)


def power_components(
    cp: list[list[int]], k: int, iters: int
) -> list[dict]:
    """Top-k directions of the symmetric integer matrix ``cp`` by
    fixed-count power iteration + Hotelling deflation, entirely in
    replayable integer arithmetic.

    Per component: seed at the dominant diagonal, ``iters`` rounds of
    ``w ← trunc(A·w · 2^Q_VEC / max|A·w|)`` (if ``A·w = 0`` the
    iterate is kept — same guard in the twin), sign-fix, then deflate
    ``A ← renorm(ssum²·A − t·w·wᵀ)`` with ``ssum = wᵀw``, ``t = wᵀAw``
    (Hotelling ``A − λ·wwᵀ/ssum`` with ``λ = t/ssum``, cleared of
    denominators — scaling is free). Fixed ``iters`` means the twin
    unrolls into exactly ``iters`` CTE levels; early convergence needs
    no special case because converged levels recompute identically.

    Returns per component: ``w`` (q15 ints), ``rq_num``/``rq_den``
    (exact Rayleigh numerator ``wᵀ·cp·w`` and denominator ``wᵀw`` on
    the ORIGINAL scatter — the variance report), computed on the
    undeflated matrix so truncated deflation noise never taints the
    reported eigenvalue estimates."""
    d = len(cp)
    a = renorm([v for row in cp for v in row])
    a = [a[i * d : (i + 1) * d] for i in range(d)]
    out = []
    for _ in range(k):
        w = _seed(a)
        for _ in range(iters):
            u = _matvec(a, w)
            m = max(abs(v) for v in u)
            if m == 0:
                break
            w = [tdiv(v * (1 << Q_VEC), m) for v in u]
        w = _sign_fix(w)
        rq_num = sum(
            w[i] * cp[i][j] * w[j] for i in range(d) for j in range(d)
        )
        rq_den = sum(v * v for v in w)
        out.append({"w": w, "rq_num": rq_num, "rq_den": rq_den})
        # deflate for the next component
        u = _matvec(a, w)
        ssum = rq_den
        t = sum(w[j] * u[j] for j in range(d))
        b = [
            [
                ssum * ssum * a[i][j] - t * w[i] * w[j]
                for j in range(d)
            ]
            for i in range(d)
        ]
        flat = renorm([v for row in b for v in row])
        a = [flat[i * d : (i + 1) * d] for i in range(d)]
    return out


def gauss_solve_fixed(
    a: list[list[int]], b: list[int]
) -> list[int]:
    """Solve ``A·β = b`` (A symmetric positive definite, integers) by
    fraction-free Gaussian elimination with per-row magnitude
    renormalization, returning β as q30 ints (``β_i ≈ B_i / 2^30``).

    Each pivot step is the single-step Bareiss update ``rowᵢ ←
    rowᵢ·a_pp − row_p·a_ip`` (exact — eliminates column p), followed
    by :func:`renorm` of every updated row (row scaling never changes
    the solution; it stops Bareiss's determinant growth so the twin's
    HUGEINT intermediates stay in int128). No pivoting — the
    deterministic order is part of the replay contract; an SPD system
    with a ridge term never needs row swaps, and a zero pivot yields
    a zero coefficient identically on both engines. Back-substitution
    runs in the same integer discipline: ``B_i = (c_i·2^30 −
    Σ_{j>i} U_ij·B_j) // U_ii`` with trunc-toward-zero division.

    Precision: ordinary Gaussian elimination in ~40-bit arithmetic —
    relative error ~2⁻⁴⁰·cond(A)·d, orders of magnitude inside any
    model-quality tolerance."""
    d = len(b)
    rows = [renorm(list(a[i]) + [b[i]]) for i in range(d)]
    for p in range(d - 1):
        rp = rows[p]
        app = rp[p]
        for i in range(p + 1, d):
            ri = rows[i]
            aip = ri[p]
            rows[i] = renorm(
                [ri[j] * app - rp[j] * aip for j in range(d + 1)]
            )
    beta = [0] * d
    for i in range(d - 1, -1, -1):
        num = rows[i][d] * (1 << Q_BETA) - sum(
            rows[i][j] * beta[j] for j in range(i + 1, d)
        )
        beta[i] = tdiv(num, rows[i][i])
    return beta


def gauss_solve_multi(
    a: list[list[int]], bs: list[list[int]]
) -> list[list[int]]:
    """Solve ``A·β_c = b_c`` for ``L`` right-hand sides SHARING one
    fraction-free elimination (the one-vs-rest multiclass case:
    the normal-equation matrix depends only on X, never on the
    labels, so L class heads cost ONE elimination instead of L).

    Same contract as :func:`gauss_solve_fixed` — single-step Bareiss
    pivots + per-row :func:`renorm` over the FULL augmented row
    ``[A | b_0 … b_{L-1}]`` (the renorm maximum may come from any
    RHS column; that scaling is part of the replay contract, so the
    DuckDB twin augments with the same L columns), then L
    independent trunc-division back-substitution chains. For
    ``L = 1`` the augmented row equals ``gauss_solve_fixed``'s and
    the outputs are bit-identical (pinned in tests)."""
    d = len(a)
    nl = len(bs)
    rows = [
        renorm(list(a[i]) + [bs[c][i] for c in range(nl)])
        for i in range(d)
    ]
    width = d + nl
    for p in range(d - 1):
        rp = rows[p]
        app = rp[p]
        for i in range(p + 1, d):
            ri = rows[i]
            aip = ri[p]
            rows[i] = renorm(
                [ri[j] * app - rp[j] * aip for j in range(width)]
            )
    out = []
    for c in range(nl):
        beta = [0] * d
        for i in range(d - 1, -1, -1):
            num = rows[i][d + c] * (1 << Q_BETA) - sum(
                rows[i][j] * beta[j] for j in range(i + 1, d)
            )
            beta[i] = tdiv(num, rows[i][i])
        out.append(beta)
    return out
