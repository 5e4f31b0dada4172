"""Property tests for the integer fixed-point linear-algebra core
(operators/intlin.py) — the replay contract every r9 oracle promotion
rests on: tdiv ≡ DuckDB ``//``, renorm bounds/invariance, and
power-iteration determinism. Pure python + duckdb (no Spark)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from databridge_etl_tools_spark.operators import intlin as IL

ints = st.integers(min_value=-(10**30), max_value=10**30)
divs = st.integers(min_value=-(10**15), max_value=10**15).filter(lambda x: x != 0)


@settings(max_examples=200, deadline=None)
@given(ints, divs)
def test_tdiv_matches_duckdb_integer_division(a, b):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT CAST('{a}' AS HUGEINT) // CAST('{b}' AS HUGEINT)"
    ).fetchone()[0]
    assert IL.tdiv(a, b) == int(got)


def test_tdiv_zero_divisor_guard():
    assert IL.tdiv(7, 0) == 0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**120), max_value=2**120),
                min_size=1, max_size=32))
def test_renorm_bounds_and_invariance(vals):
    out = IL.renorm(vals)
    m = max(abs(v) for v in vals)
    if m == 0:
        assert out == vals
        return
    # max magnitude lands exactly on the target
    assert max(abs(v) for v in out) == 1 << IL.Q_MAT
    # signs preserved, zero stays zero
    for a, b in zip(vals, out):
        assert (a == 0) == (b == 0) or abs(b) <= 1  # trunc can zero tiny vals
        if a > 0:
            assert b >= 0
        if a < 0:
            assert b <= 0
    # the oracle-side HUGEINT bound: nothing in the two-step path
    # exceeds int128 (replay would raise otherwise)
    coarse = max(m // (1 << IL.Q_MAT), 1)
    v1max = max(abs(IL.tdiv(v, coarse)) for v in vals)
    assert v1max * (1 << IL.Q_MAT) < 1 << 127


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=2**32))
def test_power_components_deterministic_and_symmetric_input(d, seed):
    # synthesize a small symmetric positive matrix from the seed
    import hashlib

    def h(i, j):
        x = int.from_bytes(
            hashlib.md5(f"{seed}:{min(i,j)}:{max(i,j)}".encode()).digest()[:4],
            "big",
        )
        return x % 1000

    cp = [[h(i, j) + (2000 if i == j else 0) for j in range(d)] for i in range(d)]
    a = IL.power_components(cp, k=min(2, d), iters=8)
    b = IL.power_components(cp, k=min(2, d), iters=8)
    assert a == b
    for comp in a:
        assert max(abs(v) for v in comp["w"]) == 1 << IL.Q_VEC
        assert comp["rq_den"] > 0


def test_gauss_solve_identity_system():
    # A = 2^40·I, b = 2^40·x  =>  beta == x (exactly, in q30)
    d = 5
    x = [3, -2, 7, 0, 1]
    a = [[(1 << 40) if i == j else 0 for j in range(d)] for i in range(d)]
    b = [(1 << 40) * v for v in x]
    beta = IL.gauss_solve_fixed(a, b)
    assert beta == [v << IL.Q_BETA for v in x]
