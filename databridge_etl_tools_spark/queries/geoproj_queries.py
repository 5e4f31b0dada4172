"""Reprojection queries (F13/F14) with DuckDB oracles.

Transcendentals (ln/tan) differ between the JVM and libm in the last
ulp (measured ~5% of values at ~1e-9 relative). F13 (Web Mercator)
keeps the libm path and rounds outputs to integer metres before
hashing. F14 (the PA-South LCC datum pipeline) replays hash-exact
UNROUNDED: its transcendental seam is evaluated in Q40 integer fixed
point (operators/fixtrig.py) emitted by one generator for both
dialects, so Spark and DuckDB execute bit-identical arithmetic —
the r10 promotion that emptied the rows-only tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geoproj as GP
from ..operators.fixtrig import StepBuilder, apply_steps_spark
from ..registry import query, table


@query(
    "proj_webmercator",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             -76.0 + (c_custkey % 100) / 100.0 AS lon,
             39.0 + (c_custkey % 37) / 37.0   AS lat
      FROM customer)
    SELECT c_custkey, lon, lat,
           CAST(ROUND(6378137.0 * radians(lon), 0) AS BIGINT) AS merc_x_m,
           CAST(ROUND(6378137.0 * ln(tan(pi()/4 + radians(lat)/2)), 0) AS BIGINT) AS merc_y_m
    FROM pts
    """,
)
def proj_webmercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: EPSG:4326 → EPSG:3857 as pure column expressions (no
    pyproj, no UDF — reprojection inside whole-stage codegen)."""
    cust = table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        (F.lit(-76.0) + (F.col("c_custkey") % 100) / 100.0).alias("lon"),
        (F.lit(39.0) + (F.col("c_custkey") % 37) / 37.0).alias("lat"),
    )
    x, y = GP.lonlat_to_webmercator(F.col("lon"), F.col("lat"))
    return pts.select(
        "c_custkey",
        "lon",
        "lat",
        F.round(x, 0).cast("bigint").alias("merc_x_m"),
        F.round(y, 0).cast("bigint").alias("merc_y_m"),
    )


#: synthetic PA-South coordinates around the reference fixture's
#: location — IDENTICAL SQL text on both sides (integer arithmetic,
#: exact cast to double).
_PTS_E = "CAST(2690000 + (c_custkey % 1000) * 50 AS DOUBLE)"
_PTS_N = "CAST(230000 + (c_custkey % 700) * 40 AS DOUBLE)"


def _pa_south_oracle() -> str:
    """Generate the DuckDB twin of the fixtrig datum pipeline: the
    SAME StepBuilder emits the arithmetic (dialect seam = int128 type
    name + trunc-div operator), chained as single-reference CTEs."""
    sb = StepBuilder("duckdb")
    cols = GP.pa_south_fixed_steps(sb, "e_ft", "n_ft")
    parts = [
        "WITH pts AS (SELECT c_custkey, "
        f"{_PTS_E} AS e_ft, {_PTS_N} AS n_ft FROM customer)"
    ]
    prev = "pts"
    for i, (name, expr) in enumerate(sb.steps):
        parts.append(f", s{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})")
        prev = f"s{i}"
    parts.append(
        f" SELECT c_custkey, e_ft, n_ft, {cols['lon']} AS lon, "
        f"{cols['lat']} AS lat, {cols['merc_x_nudged']} AS merc_x_nudged, "
        f"{cols['merc_y_nudged']} AS merc_y_nudged FROM {prev}"
    )
    return "\n".join(parts)


@query("proj_pa_south_datum_pipeline", oracle=_pa_south_oracle(), gate=False)
def proj_pa_south_datum_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: the db2 2272→(4269→4326)→3857 pipeline with the ArcGIS
    affine nudge (db2/db2.py:731-819), on synthetic PA-South
    coordinates around the reference fixture's location.

    Promoted from rows-only to full DuckDB-oracle-backed in r10: the
    transcendental seam (pow/atan/sin/ln differ from libm in the last
    ulp) is replaced by Q40 integer fixed-point evaluation
    (operators/fixtrig.py) whose every operation replays bit-exact on
    both engines; the remaining arithmetic is IEEE-correctly-rounded
    (+ − × ÷ sqrt) and deterministic by the standard.  Outputs hash
    UNROUNDED doubles.  Agreement with the double-precision path
    (≤1e-8° / ≤1e-2 m) and with the reference fixture location is
    pinned in tests/test_fixtrig.py; at 100 TB this is a pure
    per-row projection inside the scan — no shuffle, no Python, no
    driver state."""
    from ..operators.util import spread

    cust = table(spark, sf_dir, "customer", access="scan")
    # the Q40 chain is ~2000 int128 ops per row — compute-dense, so a
    # byte-small scan must not serialize it onto one core (guide §2.5
    # input skew: Spark sizes scan partitions by BYTES; the few-MB
    # customer file arrives as ONE partition). spread() is a no-op-ish
    # rebalance once the input is already many partitions at scale.
    cust = spread(cust)
    df = cust.selectExpr("c_custkey", f"{_PTS_E} AS e_ft", f"{_PTS_N} AS n_ft")
    sb = StepBuilder("spark")
    cols = GP.pa_south_fixed_steps(sb, "e_ft", "n_ft")
    df = apply_steps_spark(
        df,
        sb,
        keep=[
            cols["lon"],
            cols["lat"],
            cols["merc_x_nudged"],
            cols["merc_y_nudged"],
        ],
    )
    return df.select(
        "c_custkey",
        "e_ft",
        "n_ft",
        F.col(cols["lon"]).alias("lon"),
        F.col(cols["lat"]).alias("lat"),
        F.col(cols["merc_x_nudged"]).alias("merc_x_nudged"),
        F.col(cols["merc_y_nudged"]).alias("merc_y_nudged"),
    )


_HAV_LON = "CAST(-76 AS DOUBLE) + (c_custkey % 100) / CAST(100 AS DOUBLE)"
_HAV_LAT = "CAST(39 AS DOUBLE) + (c_custkey % 37) / CAST(37 AS DOUBLE)"
_CITY_HALL = (-75.16352, 39.95258)


def _haversine_oracle(k: int = 20) -> str:
    sb = StepBuilder("duckdb")
    from ..operators.fixtrig import dlit

    dist = GP.haversine_steps(
        sb, "lat", "lon", dlit(_CITY_HALL[1]), dlit(_CITY_HALL[0])
    )
    parts = [
        "WITH pts AS (SELECT c_custkey, "
        f"{_HAV_LON} AS lon, {_HAV_LAT} AS lat FROM customer)"
    ]
    prev = "pts"
    for i, (name, expr) in enumerate(sb.steps):
        parts.append(f", s{i} AS (SELECT *, ({expr}) AS {name} FROM {prev})")
        prev = f"s{i}"
    parts.append(
        f" SELECT c_custkey, lon, lat, {dist} AS dist_m, "
        f"CAST(ROW_NUMBER() OVER (ORDER BY {dist}, c_custkey) AS INTEGER)"
        f" AS position FROM {prev} ORDER BY dist_m, c_custkey LIMIT {k}"
    )
    return "\n".join(parts)


@query("geo_haversine_customers", oracle=_haversine_oracle(), gate=False)
def geo_haversine_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREAT-CIRCLE DISTANCE (``geoproj.haversine_steps`` over
    ``operators/fixtrig.py``): the 20 synthetic customer points
    nearest Philadelphia City Hall by exact-replay haversine —
    UNROUNDED double metres hash-matched cross-engine, because the
    only transcendentals (sin on half-angles, any-domain atan) run in
    Q40 integer fixed point emitted by the same generator for both
    dialects. The geodesic every spatial join/radius query needs,
    demonstrated as a reusable cross-engine function rather than a
    one-off: the fixtrig seam now covers the LCC datum pipeline AND
    spherical geodesy. Top-k compiles to TakeOrderedAndProject."""
    from ..operators.fixtrig import dlit

    cust = table(spark, sf_dir, "customer", access="scan")
    df = cust.selectExpr(
        "c_custkey", f"{_HAV_LON} AS lon", f"{_HAV_LAT} AS lat"
    )
    sb = StepBuilder("spark")
    dist = GP.haversine_steps(
        sb, "lat", "lon", dlit(_CITY_HALL[1]), dlit(_CITY_HALL[0])
    )
    df = apply_steps_spark(df, sb)
    # global top-20 first (TakeOrderedAndProject: per-partition heaps
    # + a driver merge of 20 rows), THEN rank the bounded survivors
    # with the house 1-row broadcast-scalar idiom — a sorted 20-slot
    # array cross-joined back, position = array_position. No window,
    # so no single-partition WindowExec on unbounded rows (r10 nit);
    # localCheckpoint computes the 20 rows once for both consumers.
    top = df.orderBy(F.asc(dist), F.asc("c_custkey")).limit(20).localCheckpoint(
        eager=False
    )
    key = F.struct(F.col(dist).alias("d"), F.col("c_custkey").alias("k"))
    order = top.agg(F.array_sort(F.collect_list(key)).alias("_order"))
    return (
        top.crossJoin(F.broadcast(order))
        .select(
            "c_custkey", "lon", "lat",
            F.col(dist).alias("dist_m"),
            F.array_position("_order", key).cast("int").alias("position"),
        )
    )
