"""Reprojection queries (F13/F14) with DuckDB oracles.

Transcendentals (ln/tan) differ between the JVM and libm in the last
ulp (measured ~5% of values at ~1e-9 relative), so outputs are
rounded to integer metres / 6-decimal degrees before hashing — the
inputs are deterministic, so agreement at this precision is stable
across runs. The PA-South LCC legs have no closed-form DuckDB twin
and are covered by unit tests (round-trip closure + known-location
assertions) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geoproj as GP
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


@query("proj_pa_south_datum_pipeline")  # no oracle: LCC has no DuckDB twin
def proj_pa_south_datum_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: the db2 2272→(4269→4326)→3857 pipeline with the ArcGIS
    affine nudge, on synthetic PA-South coordinates around the
    reference fixture's location. Rows-only check; correctness is
    pinned by unit tests (round-trip < 1e-3 ft, fixture point lands
    in Philadelphia)."""
    cust = table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        (F.lit(2690000.0) + (F.col("c_custkey") % 1000) * 50.0).alias("e_ft"),
        (F.lit(230000.0) + (F.col("c_custkey") % 700) * 40.0).alias("n_ft"),
    )
    x, y = GP.pa_south_to_webmercator(F.col("e_ft"), F.col("n_ft"))
    lon, lat = GP.pa_south_ft_to_lonlat(F.col("e_ft"), F.col("n_ft"))
    return pts.select(
        "c_custkey",
        "e_ft",
        "n_ft",
        lon.alias("lon"),
        lat.alias("lat"),
        x.alias("merc_x_nudged"),
        y.alias("merc_y_nudged"),
    )
