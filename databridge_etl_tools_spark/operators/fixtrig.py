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

Accuracy (vs true libm, pinned in tests/test_fixtrig.py):
- ``sin``  |x| ≤ π/2       : ≤ 2e-11 abs (deg-19 Taylor + Q40 trunc)
- ``atan`` any finite x     : ≤ 2e-11 abs (3 sqrt-halvings → |u|<0.2,
  deg-17 Taylor, ×8)
- ``ln``   x ∈ [2^-5, 32)   : ≤ 4e-11 abs (power-of-two CASE ladder →
  m ∈ [1,2), 2·atanh((m-1)/(m+1)) deg-19, + k·ln2)
- ``exp``  |x| ≤ 4          : ≤ 1e-11 rel (x/4 exact, deg-15 Taylor,
  two integer squarings)

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
EXP_C = [round(Q / math.factorial(k)) for k in range(16)]

_LN2 = math.log(2.0)


def dlit(v: float) -> str:
    """A double literal both engines parse to the identical bit
    pattern (bare decimals parse as DECIMAL on both — the verify
    gotcha — so always E-notation + explicit cast)."""
    return f"CAST({float(v):.17e} AS DOUBLE)"


class StepBuilder:
    """Emits a shared-arithmetic step list ``[(col_name, sql_expr)]``
    for one of the two dialects.  Each transcendental call spans a few
    steps so multiply-referenced intermediates become COLUMNS (cheap
    attribute refs) instead of duplicated subtrees — Spark's
    CollapseProject keeps non-cheap aliases un-inlined, DuckDB inlines
    single-reference CTEs; either way no exponential expression
    blowup."""

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
        """double → Q40 int.  x·2^40 is an exact exponent shift; FLOOR
        is exact; casting an integral double to int is exact on both
        (Spark truncates, DuckDB rounds — integral value, same)."""
        return self.emit(f"CAST(FLOOR(({dexpr}) * {dlit(_QF)}) AS BIGINT)")

    def dequant(self, qexpr: str) -> str:
        """Q40 int → double; exact for |q| < 2^53 (all our outputs)."""
        return f"(CAST({qexpr} AS DOUBLE) / {dlit(_QF)})"

    def _mulq(self, a: str, b: str) -> str:
        return self._tdiv_q(f"{self._big(a)} * {self._big(b)}")

    def _horner(self, xq: str, coefs: list[int]) -> str:
        """acc = c0 + (c1 + (... )·x >> 40)·x >> 40, emitted as one
        nested expression over the COLUMN xq (cheap to reference)."""
        acc = str(coefs[-1])
        for c in reversed(coefs[:-1]):
            acc = f"({c} + {self._mulq(f'({acc})', xq)})"
        return acc

    # --- transcendentals ------------------------------------------------
    def sin(self, z_dexpr: str) -> str:
        """sin(z) for |z| ≤ π/2, as z·P(z²)."""
        zq = self.quant(z_dexpr)
        wq = self.emit(self._mulq(zq, zq))
        acc = self.emit(self._horner(wq, SIN_C))
        return self.emit(self.dequant(self._mulq(acc, zq)))

    def atan(self, u_dexpr: str) -> str:
        """atan(u), any finite u: three angle-halvings
        u ← u/(1+sqrt(1+u²)) (sqrt is IEEE-exact) bring |u| < 0.199,
        then deg-17 Taylor, ×8."""
        u = self.emit(u_dexpr)
        for _ in range(3):
            u = self.emit(
                f"(({u}) / ({dlit(1.0)} + SQRT({dlit(1.0)} + ({u}) * ({u}))))"
            )
        zq = self.quant(u)
        wq = self.emit(self._mulq(zq, zq))
        acc = self.emit(self._horner(wq, ATAN_C))
        res = self.emit(self.dequant(self._mulq(acc, zq)))
        return self.emit(f"(({res}) * {dlit(8.0)})")

    def ln(self, u_dexpr: str) -> str:
        """ln(u) for u ∈ [2^-5, 32): CASE ladder picks the power-of-two
        scale (comparisons + power-of-two divides are exact), then
        ln(m) = 2·atanh((m-1)/(m+1)) on m ∈ [1,2), plus k·ln2."""
        u = self.emit(u_dexpr)
        ladder = [(16.0, 4), (8.0, 3), (4.0, 2), (2.0, 1), (1.0, 0),
                  (0.5, -1), (0.25, -2), (0.125, -3), (0.0625, -4)]
        k_expr = "CASE " + " ".join(
            f"WHEN ({u}) >= {dlit(b)} THEN {dlit(float(k))}" for b, k in ladder
        ) + f" ELSE {dlit(-5.0)} END"
        s_expr = "CASE " + " ".join(
            f"WHEN ({u}) >= {dlit(b)} THEN {dlit(2.0 ** k)}" for b, k in ladder
        ) + f" ELSE {dlit(2.0 ** -5)} END"
        k = self.emit(k_expr)
        m = self.emit(f"(({u}) / ({s_expr}))")
        z = self.emit(f"((({m}) - {dlit(1.0)}) / (({m}) + {dlit(1.0)}))")
        zq = self.quant(z)
        wq = self.emit(self._mulq(zq, zq))
        acc = self.emit(self._horner(wq, ATANH_C))
        at = self.emit(self.dequant(self._mulq(acc, zq)))
        return self.emit(
            f"(({k}) * {dlit(_LN2)} + {dlit(2.0)} * ({at}))"
        )

    def exp(self, x_dexpr: str) -> str:
        """exp(x) for |x| ≤ 4: r = x/4 (exact), deg-15 Taylor in Q40,
        two integer squarings (trunc — replayed identically)."""
        rq = self.quant(f"(({x_dexpr}) * {dlit(0.25)})")
        acc = self.emit(self._horner(rq, EXP_C))
        sq1 = self.emit(self._mulq(acc, acc))
        sq2 = self.emit(self._mulq(sq1, sq1))
        return self.emit(self.dequant(sq2))

    def pow(self, u_dexpr: str, c: float) -> str:
        """u^c = exp(c·ln u) for u ∈ [2^-5, 32) with |c·ln u| ≤ 4."""
        lnu = self.ln(u_dexpr)
        return self.exp(f"(({lnu}) * {dlit(c)})")


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


def py_sin(z: float) -> float:
    zq = _pq(z)
    wq = tdiv(zq * zq, Q)
    return _dq(tdiv(_py_horner(wq, SIN_C) * zq, Q))


def py_atan(u: float) -> float:
    for _ in range(3):
        u = u / (1.0 + math.sqrt(1.0 + u * u))
    zq = _pq(u)
    wq = tdiv(zq * zq, Q)
    return _dq(tdiv(_py_horner(wq, ATAN_C) * zq, Q)) * 8.0


def py_ln(u: float) -> float:
    ladder = [(16.0, 4), (8.0, 3), (4.0, 2), (2.0, 1), (1.0, 0),
              (0.5, -1), (0.25, -2), (0.125, -3), (0.0625, -4)]
    k = -5
    for b, kk in ladder:
        if u >= b:
            k = kk
            break
    m = u / (2.0 ** k)
    z = (m - 1.0) / (m + 1.0)
    zq = _pq(z)
    wq = tdiv(zq * zq, Q)
    at = _dq(tdiv(_py_horner(wq, ATANH_C) * zq, Q))
    return float(k) * _LN2 + 2.0 * at


def py_exp(x: float) -> float:
    rq = _pq(x * 0.25)
    acc = _py_horner(rq, EXP_C)
    sq1 = tdiv(acc * acc, Q)
    sq2 = tdiv(sq1 * sq1, Q)
    return _dq(sq2)


def py_pow(u: float, c: float) -> float:
    return py_exp(py_ln(u) * c)
