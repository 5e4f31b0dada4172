"""Q40 fixed-point transcendentals (operators/fixtrig.py): accuracy
vs libm, bit-exact replay across Python/Spark/DuckDB, and the F14
datum-pipeline agreement with the double-precision path."""

from __future__ import annotations

import math

import duckdb
import pytest

from databridge_etl_tools_spark.functions import geoproj as GP
from databridge_etl_tools_spark.operators import fixtrig as FX

# inputs exercising every range-reduction branch (atan halvings, ln
# power-of-two ladder, exp sign/magnitude, sin sign)
GRID = {
    "sin": [x / 64.0 for x in range(-100, 101, 7)],
    "atan": [-37.5, -5.0, -1.0, -0.51, -0.007, 0.0, 0.013, 0.47, 1.0, 8.25, 44.0],
    "ln": [2.0**-5, 0.04, 0.11, 0.26, 0.53, 0.99, 1.0, 1.7, 2.0, 3.9, 4.6, 9.3, 18.0, 31.9],
    "exp": [x / 8.0 for x in range(-32, 33, 3)],
    "atanh_small": [x / 1000.0 for x in range(-110, 111, 13)],
    "exp_unit": [x / 16.0 for x in range(-16, 17, 3)],
}
PY = {"sin": FX.py_sin, "atan": FX.py_atan, "ln": FX.py_ln, "exp": FX.py_exp,
      "atanh_small": FX.py_atanh_small, "exp_unit": FX.py_exp_unit}
REF = {"sin": math.sin, "atan": math.atan, "ln": math.log, "exp": math.exp,
       "atanh_small": math.atanh, "exp_unit": math.exp}


def test_wide_ladder_ln_small_probabilities():
    """The parametrized ladder (lo_exp=-60) tracks libm down to the
    probability floor — each octave is one CASE branch."""
    for e in range(-58, 1, 3):
        for frac in (1.0, 1.31, 1.97):
            u = frac * 2.0**e
            got = FX.py_ln(u, lo_exp=-60, hi_exp=2)
            assert abs(got - math.log(u)) <= 2e-11, u


def test_atan_two_halvings_unit_domain():
    """halvings=2 is the in-pipeline variant (|u| ≤ 1)."""
    for u in [x / 40.0 for x in range(-40, 41)]:
        got = FX.py_atan(u, halvings=2)
        assert abs(got - math.atan(u)) <= 2e-9, u


def test_python_twin_accuracy_vs_libm():
    for fn, xs in GRID.items():
        for x in xs:
            got, want = PY[fn](x), REF[fn](x)
            tol = 1e-9 * max(1.0, abs(want))
            assert abs(got - want) <= tol, (fn, x, got, want)


def _steps_eval_duckdb(fn: str, xs: list[float]) -> list[float]:
    sb = FX.StepBuilder("duckdb")
    out = getattr(sb, fn)("x")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g AS SELECT unnest(?::DOUBLE[]) AS x", [xs]
    )
    sql = "WITH s0 AS (SELECT x FROM g)"
    prev = "s0"
    for i, (name, expr) in enumerate(sb.steps):
        sql += f", t{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})"
        prev = f"t{i}"
    sql += f" SELECT {out} FROM {prev} ORDER BY x"
    return [r[0] for r in con.execute(sql).fetchall()]


def test_duckdb_replay_bit_exact():
    for fn, xs in GRID.items():
        xs = sorted(xs)
        got = _steps_eval_duckdb(fn, xs)
        want = [PY[fn](x) for x in xs]
        assert got == want, fn  # EXACT float equality — integer replay


def test_spark_replay_bit_exact(spark):
    for fn, xs in GRID.items():
        xs = sorted(xs)
        sb = FX.StepBuilder("spark")
        out = getattr(sb, fn)("x")
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        for name, expr in sb.steps:
            df = df.selectExpr("*", f"({expr}) AS {name}")
        got = [r[0] for r in df.orderBy("x").select(out).collect()]
        want = [PY[fn](x) for x in xs]
        assert got == want, fn


def test_pow_matches_libm():
    # the LCC t-parameter path: ratio^(1/N) over the PA-South domain
    for u in (0.55, 0.60, 0.6211, 0.64, 0.70):
        for c in (1.586, 0.0409, -0.5, 2.0):
            got, want = FX.py_pow(u, c), u**c
            assert abs(got - want) <= 1e-9 * max(1.0, abs(want)), (u, c)


def _py_pipeline(e_ft: float, n_ft: float) -> dict[str, float]:
    """Drive pa_south_fixed_steps through a Python evaluator — the
    steps are plain SQL-ish exprs, so evaluate the same math with the
    fixtrig Python twins by re-deriving the closed form."""
    FT = GP.FT_US
    x = e_ft * FT - GP._FE_M
    y = GP._RHO0 - (n_ft * FT - GP._FN_M)
    rho = math.sqrt(x * x + y * y)
    t_ = FX.py_pow(rho / (GP._A * GP._BIGF), 1.0 / GP._N, unit=True)
    theta = FX.py_atan(x / y, halvings=1)
    lam = theta / GP._N + GP._LON0
    lon = lam * (180.0 / math.pi)
    phi = math.pi / 2 - 2.0 * FX.py_atan(t_, halvings=1)
    for _ in range(4):
        s = FX.py_sin(phi)
        w = FX.py_exp_unit(-GP._E * FX.py_atanh_small(GP._E * s))
        phi = math.pi / 2 - 2.0 * FX.py_atan(t_ * w, halvings=1)
    lat = phi * (180.0 / math.pi)
    mx = lam * GP._A
    sfin = FX.py_sin(phi)
    my = (GP._A * 0.5) * FX.py_ln((1.0 + sfin) / (1.0 - sfin))
    return {"lon": lon, "lat": lat, "mx": mx + -0.20, "my": my + 1.18}


def test_pipeline_matches_double_path(spark):
    """fixtrig pipeline vs the float (libm) path: ≤1e-8° lon/lat,
    ≤1e-2 m mercator, across the synthetic coordinate patch."""
    from pyspark.sql import functions as F

    pts = [(2690000.0 + i * 7000.0, 230000.0 + i * 3900.0) for i in range(8)]
    pts.append((2712205.71, 259685.27))  # the reference fixture point
    df = spark.createDataFrame(pts, "e_ft double, n_ft double")
    lon, lat = GP.pa_south_ft_to_lonlat(F.col("e_ft"), F.col("n_ft"))
    mx, my = GP.pa_south_to_webmercator(F.col("e_ft"), F.col("n_ft"))
    rows = df.select(
        "e_ft", "n_ft", lon.alias("lon"), lat.alias("lat"),
        mx.alias("mx"), my.alias("my"),
    ).collect()
    for r in rows:
        got = _py_pipeline(r["e_ft"], r["n_ft"])
        assert abs(got["lon"] - r["lon"]) <= 1e-8, r
        assert abs(got["lat"] - r["lat"]) <= 1e-8, r
        assert abs(got["mx"] - r["mx"]) <= 1e-2, r
        assert abs(got["my"] - r["my"]) <= 1e-2, r
    # fixture point lands in Philadelphia
    fix = _py_pipeline(2712205.71, 259685.27)
    assert -75.5 < fix["lon"] < -74.8 and 39.8 < fix["lat"] < 40.2


def test_pipeline_spark_equals_python_twin(spark):
    """The engine-side step evaluation equals the Python twin EXACTLY
    (same integer ops) — the same property the DuckDB oracle relies
    on, pinned here at unit level."""
    sb = FX.StepBuilder("spark")
    cols = GP.pa_south_fixed_steps(sb, "e_ft", "n_ft")
    df = spark.createDataFrame(
        [(2712205.71, 259685.27), (2690000.0, 230000.0)],
        "e_ft double, n_ft double",
    )
    for name, expr in sb.steps:
        df = df.selectExpr("*", f"({expr}) AS {name}")
    rows = df.select(
        "e_ft", "n_ft",
        *[c for c in (cols["lon"], cols["lat"], cols["merc_x_nudged"], cols["merc_y_nudged"])],
    ).collect()
    for r in rows:
        want = _py_pipeline(r["e_ft"], r["n_ft"])
        assert r[cols["lon"]] == want["lon"]
        assert r[cols["lat"]] == want["lat"]
        assert r[cols["merc_x_nudged"]] == want["mx"]
        assert r[cols["merc_y_nudged"]] == want["my"]


def test_stepbuilder_rejects_unknown_dialect():
    with pytest.raises(ValueError):
        FX.StepBuilder("postgres")


def test_exp_wide_accuracy_and_replay(spark):
    """exp_wide tracks libm to ~1e-10 rel for results ≥ 1e-3 (the
    temperature-weight range) and replays bit-exact on both engines."""
    xs = sorted([x / 8.0 for x in range(-56, 9, 5)])
    for x in xs:
        got, want = FX.py_exp_wide(x), math.exp(x)
        assert abs(got - want) <= 1e-9 * max(want, 1e-3), x
    got_d = _steps_eval_duckdb("exp_wide", xs)
    sb = FX.StepBuilder("spark")
    out = sb.exp_wide("x")
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    for name, expr in sb.steps:
        df = df.selectExpr("*", f"({expr}) AS {name}")
    got_s = [r[0] for r in df.orderBy("x").select(out).collect()]
    want = [FX.py_exp_wide(x) for x in xs]
    assert got_d == want and got_s == want


def test_apply_steps_spark_restores_analyzer_conf(spark):
    """r10 advice: the deep-alias analysis must not leave the raised
    spark.sql.analyzer.maxIterations stuck for the session."""
    key = "spark.sql.analyzer.maxIterations"
    before = spark.conf.get(key, "100")
    sb = FX.StepBuilder("spark")
    out = sb.ln("CAST(x AS DOUBLE)")
    sb.emit(out)
    df = FX.apply_steps_spark(
        spark.createDataFrame([(2.0,), (3.5,)], "x double"), sb
    )
    assert spark.conf.get(key, "100") == before
    assert len(df.collect()) == 2  # the deep projection still runs
