"""Cross-engine deterministic transcendentals in Q40 fixed point.

The reference's datum pipeline (db2/db2.py:731-819) reprojects
through Lambert Conformal Conic + Web Mercator, whose closed forms
need sin/atan/ln/exp.  Those are the ONLY non-deterministic seam
between Spark's JVM and DuckDB's libm: IEEE-754 ``+ - * /`` and
``sqrt`` are correctly rounded (bit-identical across engines), while
``pow/ln/tan/atan/sin`` differ in the last ulp.  This module replays
the r9 intlin.py discipline (operators/intlin.py) at per-ROW scale:
each transcendental is evaluated as *integer* Q40 fixed-point
arithmetic — quantize (exact: power-of-two multiply + floor), Horner
over int128 (Spark DECIMAL(38,0), DuckDB HUGEINT) with
trunc-toward-zero division (Spark ``DIV`` == DuckDB ``//``, probed:
-7/2 → -3 on both), dequantize (exact: int < 2^53 → double, then
power-of-two divide).  Every operation is bit-identical across
engines BY CONSTRUCTION, because both sides execute SQL emitted by
the same generator (dialect differences limited to the int128 type
name and the trunc-div operator).

Unlike intlin's driver-side fixpoints (bounded d×d state), these are
per-row column expressions: they run distributed inside the scan
projection, no Python, no collect — at 100 TB each executor evaluates
its own partition's rows with zero coordination.

Plan-cost discipline (measured r10): each emitted step becomes one
projection level, and Spark's fixed cost per level (analysis +
codegen) dwarfs the per-row arithmetic at demo scale — so only
MULTIPLY-REFERENCED intermediates get a step; single-use values are
inlined into the consuming expression (no duplication, fewer levels).
``apply_steps_spark`` applies the whole step list as ONE selectExpr
using lateral column aliases (one py4j round-trip, one analysis pass)
after raising ``spark.sql.analyzer.maxIterations`` to cover the
alias-chain depth.

Accuracy (vs true libm, pinned in tests/test_fixtrig.py):
- ``sin``  |x| ≤ π/2        : ≤ 2e-10 abs (deg-19 Taylor + Q40 trunc)
- ``atan`` halvings=3, any x: ≤ 2e-11 abs (sqrt-halvings → |u|<0.199,
  deg-17 Taylor, ×2^halvings); halvings=2 needs |u| ≤ 1
- ``ln``   x ∈ [2^lo, 2^hi) : ≤ 4e-11 abs (power-of-two CASE ladder →
  m ∈ [1,2), 2·atanh((m-1)/(m+1)) deg-19, + k·ln2; ladder
  parametrized — default [2^-5, 32), lo_exp=-60 for probabilities)
- ``exp``  |x| ≤ 4          : ≤ 1e-10 rel (x/4 exact, deg-15 Taylor,
  two integer squarings); pass ``degree=11`` when |x| ≤ 1
- ``atanh_small`` |z| ≤ 0.11: ≤ 3e-11 abs (deg-9 odd Taylor)

Q40 keeps every Horner intermediate ≤ ~2^84 — comfortably inside both
int128 ranges (DECIMAL(38,0) ≈ 1.7e38 ≈ 2^127); overflow would THROW
on both engines (Spark ANSI, DuckDB HUGEINT), never wrap silently.
"""

from __future__ import annotations

import math

from .intlin import tdiv

Q_BITS = 40
Q = 1 << Q_BITS
_QF = float(Q)

#: Taylor coefficients, quantized once in Python (exact ints, embedded
#: as literals in both dialects).
SIN_C = [round((-1) ** k / math.factorial(2 * k + 1) * Q) for k in range(10)]
ATAN_C = [round((-1) ** k / (2 * k + 1) * Q) for k in range(9)]
ATANH_C = [round(1 / (2 * k + 1) * Q) for k in range(10)]
ATANH_SMALL_C = ATANH_C[:5]  #: |z| ≤ 0.11 → deg-9 suffices (3e-11)
EXP_C = [round(Q / math.factorial(k)) for k in range(16)]
EXP_C_UNIT = [round(Q / math.factorial(k)) for k in range(18)]

_LN2 = math.log(2.0)


_BARE_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _is_bare_column(expr: str) -> bool:
    return bool(_BARE_RE.match(expr.strip()))


def dlit(v: float) -> str:
    """A double literal both engines parse to the identical bit
    pattern (bare decimals parse as DECIMAL on both — the verify
    gotcha — so always E-notation + explicit cast)."""
    return f"CAST({float(v):.17e} AS DOUBLE)"


class StepBuilder:
    """Emits a shared-arithmetic step list ``[(col_name, sql_expr)]``
    for one of the two dialects.  Only multiply-referenced
    intermediates become steps (columns — cheap attribute refs);
    single-use values stay inline in the consuming expression, so the
    level count (≈ Spark projection depth ≈ DuckDB CTE depth) stays
    near the information-theoretic minimum."""

    def __init__(self, dialect: str, prefix: str = "_fx"):
        if dialect not in ("spark", "duckdb"):
            raise ValueError(f"unknown dialect {dialect!r}")
        self.dialect = dialect
        self.prefix = prefix
        self.steps: list[tuple[str, str]] = []

    # --- dialect seams -------------------------------------------------
    def _big(self, s: str) -> str:
        t = "DECIMAL(38,0)" if self.dialect == "spark" else "HUGEINT"
        return f"CAST({s} AS {t})"

    def _tdiv_q(self, a: str) -> str:
        """Trunc-toward-zero divide an int128 product by 2^40."""
        op = "DIV" if self.dialect == "spark" else "//"
        return f"(({a}) {op} {Q})"

    # --- step plumbing -------------------------------------------------
    def emit(self, expr: str) -> str:
        name = f"{self.prefix}{len(self.steps)}"
        self.steps.append((name, expr))
        return name

    def quant(self, dexpr: str) -> str:
        """double → Q40 int (an EXPRESSION, not a step).  x·2^40 is an
        exact exponent shift; FLOOR is exact; casting an integral
        double to int is exact on both (Spark truncates, DuckDB
        rounds — integral value, same)."""
        return f"CAST(FLOOR(({dexpr}) * {dlit(_QF)}) AS BIGINT)"

    def dequant(self, qexpr: str) -> str:
        """Q40 int → double; exact for |q| < 2^53 (all our outputs)."""
        return f"(CAST({qexpr} AS DOUBLE) / {dlit(_QF)})"

    def _mulq(self, a: str, b: str) -> str:
        return self._tdiv_q(f"{self._big(a)} * {self._big(b)}")

    def _horner(self, xq: str, coefs: list[int]) -> str:
        """c0 + (c1 + (...)·x >> 40)·x >> 40 as one nested expression
        over the COLUMN xq (cheap to reference ``len(coefs)`` times)."""
        acc = str(coefs[-1])
        for c in reversed(coefs[:-1]):
            acc = f"({c} + {self._mulq(f'({acc})', xq)})"
        return acc

    def _odd_poly(
        self, z_dexpr: str, coefs: list[int], postscale: float = 1.0
    ) -> str:
        """z·P(z²)·postscale in Q40 — the shared shape of
        sin/atan/atanh.  Emits zq and wq (multiply-referenced),
        returns the result column. 3 levels."""
        zq = self.emit(self.quant(z_dexpr))
        wq = self.emit(self._mulq(zq, zq))
        res = self.dequant(self._mulq(self._horner(wq, coefs), zq))
        if postscale != 1.0:
            res = f"(({res}) * {dlit(postscale)})"
        return self.emit(res)

    # --- transcendentals ------------------------------------------------
    def sin(self, z_dexpr: str) -> str:
        """sin(z) for |z| ≤ π/2, as z·P(z²). 3 levels."""
        return self._odd_poly(z_dexpr, SIN_C)

    def atanh_small(self, z_dexpr: str) -> str:
        """atanh(z) for |z| ≤ 0.11 (deg-9). 3 levels."""
        return self._odd_poly(z_dexpr, ATANH_SMALL_C)

    def atan(self, u_dexpr: str, halvings: int = 3) -> str:
        """atan(u): ``halvings`` angle-halvings u ← u/(1+sqrt(1+u²))
        (sqrt is IEEE-exact), then deg-17 Taylor, ×2^halvings.
        halvings=3 covers any finite u (|u₃| < 0.199, tail < 3e-14);
        halvings=2 needs |u| ≤ 1 (|u₂| ≤ 0.207); halvings=1 keeps the
        tail < 2e-12 for |u| ≤ 0.5 and < 1.5e-9 up to |u| = 1. A
        bare-column input skips its alias level. 3+halvings(+1)
        levels."""
        u = u_dexpr if _is_bare_column(u_dexpr) else self.emit(u_dexpr)
        for _ in range(halvings):
            u = self.emit(
                f"(({u}) / ({dlit(1.0)} + SQRT({dlit(1.0)} + ({u}) * ({u}))))"
            )
        return self._odd_poly(u, ATAN_C, postscale=float(1 << halvings))

    def ln(self, u_dexpr: str, lo_exp: int = -5, hi_exp: int = 5) -> str:
        """ln(u) for u ∈ [2^lo_exp, 2^hi_exp): CASE ladder picks the
        power-of-two scale (comparisons + power-of-two divides are
        exact), then ln(m) = 2·atanh((m-1)/(m+1)) on m ∈ [1,2), plus
        k·ln2. Widen the ladder for small probabilities (e.g.
        lo_exp=-60 covers p ≥ 8.7e-19 — each extra octave is one CASE
        branch, zero extra levels). 6 levels."""
        u = self.emit(u_dexpr)
        ladder = [(2.0 ** k, k) for k in range(hi_exp - 1, lo_exp, -1)]
        k_expr = "CASE " + " ".join(
            f"WHEN ({u}) >= {dlit(b)} THEN {dlit(float(k))}"
            for b, k in ladder
        ) + f" ELSE {dlit(float(lo_exp))} END"
        s_expr = "CASE " + " ".join(
            f"WHEN ({u}) >= {dlit(b)} THEN {dlit(b)}"
            for b, k in ladder
        ) + f" ELSE {dlit(2.0 ** lo_exp)} END"
        m = self.emit(f"(({u}) / ({s_expr}))")
        at = self._odd_poly(
            f"((({m}) - {dlit(1.0)}) / (({m}) + {dlit(1.0)}))", ATANH_C
        )
        return self.emit(f"(({k_expr}) * {dlit(_LN2)} + {dlit(2.0)} * ({at}))")

    def exp(self, x_dexpr: str, degree: int = 15) -> str:
        """exp(x) for |x| ≤ 4: r = x/4 (exact), deg-``degree`` Taylor
        in Q40, two integer squarings (trunc — replayed identically).
        4 levels."""
        rq = self.emit(self.quant(f"(({x_dexpr}) * {dlit(0.25)})"))
        acc = self.emit(self._horner(rq, EXP_C[: degree + 1]))
        sq1 = self.emit(self._mulq(acc, acc))
        return self.emit(self.dequant(self._mulq(sq1, sq1)))

    def exp_unit(self, x_dexpr: str) -> str:
        """exp(x) for |x| ≤ 1: direct deg-17 Taylor, no range
        reduction, no squarings (their two extra levels cost more than
        the longer Horner — levels are the scarce resource, per-row
        multiplies are not). 2 levels."""
        xq = self.emit(self.quant(x_dexpr))
        return self.emit(self.dequant(self._horner(xq, EXP_C_UNIT)))

    def exp_wide(self, x_dexpr: str) -> str:
        """exp(x) for x ∈ [−16, 1]: r = x/16 (exact), deg-17 Taylor,
        FOUR integer squarings. The non-positive-leaning domain keeps
        every squaring carrier ≤ e·2^40 (results ≤ e ≈ 2.72 → q40
        < 2^42), so the int64 stages never overflow — the shape for
        temperature weights exp(α·(ln n − ln n_max)) ≤ 1. Accuracy
        degrades with the RESULT's magnitude (the q40 carrier of a
        tiny value keeps few bits): ≤ 1e-10 rel for results ≥ 1e-3,
        ~1e-5 rel at exp(−16) ≈ 1e-7 — replay exactness is unaffected
        (both engines run the same integers). 7 levels."""
        rq = self.emit(self.quant(f"(({x_dexpr}) * {dlit(1.0 / 16.0)})"))
        acc = self.emit(self._horner(rq, EXP_C_UNIT))
        for _ in range(4):
            acc = self.emit(self._mulq(acc, acc))
        return self.emit(self.dequant(acc))

    def pow(self, u_dexpr: str, c: float, unit: bool = False) -> str:
        """u^c = exp(c·ln u) for u ∈ [2^-5, 32) with |c·ln u| ≤ 4;
        pass ``unit=True`` when |c·ln u| ≤ 1 (2 fewer levels)."""
        lnu = self.ln(u_dexpr)
        arg = f"(({lnu}) * {dlit(c)})"
        return self.exp_unit(arg) if unit else self.exp(arg)


def apply_steps_spark(df, sb: StepBuilder, keep: "list[str] | None" = None,
                      prune_batch: int = 12):
    """Apply a step list to a Spark DataFrame as selectExpr levels
    using lateral column aliases — one py4j round-trip per batch and
    one analysis pass instead of len(steps) chained withColumns
    (measured: the chained form cost ~2.5 s construct + ~3 s codegen
    at 196 levels).  The analyzer resolves one alias-chain level per
    Resolution iteration, so raise its iteration cap to the step
    depth first (runtime conf — works under the driver's vanilla
    session).

    ``keep``: the step names the CALLER still needs after the chain.
    When given, emission is batched (``prune_batch`` lateral-alias
    steps per selectExpr) and every batch boundary projects away dead
    intermediates — names no later step expression references and the
    caller did not ask to keep.  Why this matters (guide §2.3/§5,
    measured r14): the analyzer rewrites an N-step lateral-alias chain
    into N nested Projects, and WITHOUT pruning each level carries
    every column born so far, so one output row pays O(N · width) =
    O(N²) column copies through the chain — the 104-level datum
    pipeline spent 5.1 s of its 5.5 s total moving dead DECIMAL(38,0)
    columns through UnsafeRow writers (15 k input rows!).  With
    liveness pruning the per-level width stays at the live frontier
    (~5–10 for a linear pipeline): same expressions, same evaluation
    order, bit-identical output — only dead columns leave the row
    earlier.  Default (keep=None) preserves the legacy contract:
    every step column present in the result."""
    spark = df.sparkSession
    if keep is None:
        need = 3 * len(sb.steps) + 100
        cur = int(spark.conf.get("spark.sql.analyzer.maxIterations", "100"))
        if cur >= need:
            return df.selectExpr("*", *[f"({e}) AS {n}" for n, e in sb.steps])
        # raise the cap only for THIS analysis: selectExpr analyzes
        # the plan eagerly, and the lateral aliases are rewritten into
        # nested Projects during that pass, so downstream re-analysis
        # never needs the deep iteration count again — restore the
        # session value (r10 advice: the cap used to leak)
        spark.conf.set("spark.sql.analyzer.maxIterations", str(need))
        try:
            return df.selectExpr("*", *[f"({e}) AS {n}" for n, e in sb.steps])
        finally:
            spark.conf.set("spark.sql.analyzer.maxIterations", str(cur))

    import re as _re

    pat = _re.compile(rf"\b{_re.escape(sb.prefix)}\d+\b")
    step_names = [n for n, _ in sb.steps]
    name_set = set(step_names)
    missing = set(keep) - name_set
    if missing:
        raise ValueError(f"apply_steps_spark: keep names not in steps: {sorted(missing)}")
    # last index at which each step name is still referenced
    last_use = {n: (len(sb.steps) if n in keep else -1) for n in step_names}
    for i, (_, e) in enumerate(sb.steps):
        for r in set(pat.findall(e)) & name_set:
            last_use[r] = max(last_use[r], i)
    base_cols = [c for c in df.columns]  # caller's columns: always carried
    need = 3 * prune_batch + 100
    cur = int(spark.conf.get("spark.sql.analyzer.maxIterations", "100"))
    raised = cur < need
    if raised:
        spark.conf.set("spark.sql.analyzer.maxIterations", str(need))
    try:
        out = df
        born: list[str] = []
        for lo in range(0, len(sb.steps), prune_batch):
            batch = sb.steps[lo : lo + prune_batch]
            hi = lo + len(batch)
            live = [n for n in born if last_use[n] >= lo]
            out = out.selectExpr(
                *base_cols, *live, *[f"({e}) AS {n}" for n, e in batch]
            )
            born = [n for n in born + [n for n, _ in batch] if last_use[n] >= hi]
        return out.selectExpr(*base_cols, *born)
    finally:
        if raised:
            spark.conf.set("spark.sql.analyzer.maxIterations", str(cur))


# --- Python twin (bit-exact replay of the emitted arithmetic) ---------
def _pq(x: float) -> int:
    return math.floor(x * _QF)


def _dq(q: int) -> float:
    return float(q) / _QF


def _py_horner(xq: int, coefs: list[int]) -> int:
    acc = coefs[-1]
    for c in reversed(coefs[:-1]):
        acc = c + tdiv(acc * xq, Q)
    return acc


def _py_odd(z: float, coefs: list[int]) -> float:
    zq = _pq(z)
    wq = tdiv(zq * zq, Q)
    return _dq(tdiv(_py_horner(wq, coefs) * zq, Q))


def py_sin(z: float) -> float:
    return _py_odd(z, SIN_C)


def py_atanh_small(z: float) -> float:
    return _py_odd(z, ATANH_SMALL_C)


def py_atan(u: float, halvings: int = 3) -> float:
    for _ in range(halvings):
        u = u / (1.0 + math.sqrt(1.0 + u * u))
    return _py_odd(u, ATAN_C) * float(1 << halvings)


def py_ln(u: float, lo_exp: int = -5, hi_exp: int = 5) -> float:
    k = lo_exp
    for kk in range(hi_exp - 1, lo_exp, -1):
        if u >= 2.0 ** kk:
            k = kk
            break
    m = u / (2.0 ** k)
    at = _py_odd((m - 1.0) / (m + 1.0), ATANH_C)
    return float(k) * _LN2 + 2.0 * at


def py_exp(x: float, degree: int = 15) -> float:
    rq = _pq(x * 0.25)
    acc = _py_horner(rq, EXP_C[: degree + 1])
    sq1 = tdiv(acc * acc, Q)
    return _dq(tdiv(sq1 * sq1, Q))


def py_exp_unit(x: float) -> float:
    return _dq(_py_horner(_pq(x), EXP_C_UNIT))


def py_exp_wide(x: float) -> float:
    acc = _py_horner(_pq(x * (1.0 / 16.0)), EXP_C_UNIT)
    for _ in range(4):
        acc = tdiv(acc * acc, Q)
    return _dq(acc)


def py_pow(u: float, c: float, unit: bool = False) -> float:
    arg = py_ln(u) * c
    return py_exp_unit(arg) if unit else py_exp(arg)
