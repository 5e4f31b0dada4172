"""Geometry-function queries (SURVEY §2.7 F1/F2/F12/F17/F18/F24).

The synthetic tables carry no geometry, so each query synthesizes
deterministic EWKT strings from integer keys (identical construction
on both engines — integer formatting is exact), then applies the
engine's geometry column-functions. The DuckDB oracles build the
*expected output directly* (independent construction, not a mirror of
our regexes), which makes them genuine oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geometry as G
from ..registry import query, table

# four SRIDs: three corrupt codes (reference opendata remap) + one real
_BAD_SRIDS = [300001, 300084, 300073, 4326]
_EXPECT_FIX = [2272, 3857, 4326, 4326]


@query(
    "geom_srid_repair",
    oracle=f"""
    WITH src AS (
      SELECT p_partkey,
             [{",".join(map(str, _BAD_SRIDS))}][1 + p_partkey % 4] AS raw_srid,
             printf('POINT(%d %d)', p_partkey, p_size::BIGINT)     AS wkt
      FROM part)
    SELECT p_partkey,
           printf('SRID=%d;%s', raw_srid, wkt)  AS ewkt,
           raw_srid                             AS srid_in,
           [{",".join(map(str, _EXPECT_FIX))}][1 + p_partkey % 4] AS srid_fixed,
           wkt                                  AS wkt_out,
           printf('SRID=%d;%s',
                  [{",".join(map(str, _EXPECT_FIX))}][1 + p_partkey % 4], wkt) AS ewkt_fixed
    FROM src
    """,
)
def geom_srid_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 extract/strip + F18 bad-SRID remap, end to end: parse the
    SRID prefix, remap corrupt codes, re-prefix the WKT tail."""
    part = table(spark, sf_dir, "part")
    bad = F.element_at(F.array(*[F.lit(s) for s in _BAD_SRIDS]), (F.col("p_partkey") % 4 + 1).cast("int"))
    src = part.select(
        "p_partkey",
        bad.alias("raw_srid"),
        F.format_string("POINT(%d %d)", "p_partkey", F.col("p_size").cast("bigint")).alias("wkt"),
    ).withColumn("ewkt", F.format_string("SRID=%d;%s", "raw_srid", "wkt"))
    return src.select(
        "p_partkey",
        "ewkt",
        G.srid_of("ewkt").alias("srid_in"),
        G.remap_bad_srid(G.srid_of("ewkt")).alias("srid_fixed"),
        G.strip_srid("ewkt").alias("wkt_out"),
        G.with_srid(G.strip_srid("ewkt"), G.remap_bad_srid(G.srid_of("ewkt"))).alias("ewkt_fixed"),
    )


@query(
    "geom_force_2d",
    oracle="""
    SELECT p_partkey,
           printf('POINT Z (%d %d %d)', p_partkey, p_size::BIGINT, p_partkey % 100) AS wkt_3d,
           printf('POINT (%d %d)', p_partkey, p_size::BIGINT)                       AS wkt_2d
    FROM part
    """,
)
def geom_force_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 force_2d: synthesized POINT Z flattened to 2D; the oracle
    constructs the expected 2D string independently."""
    part = table(spark, sf_dir, "part")
    wkt3d = F.format_string(
        "POINT Z (%d %d %d)", "p_partkey", F.col("p_size").cast("bigint"), F.col("p_partkey") % 100
    )
    return part.select(
        "p_partkey",
        wkt3d.alias("wkt_3d"),
        G.force_2d(wkt3d).alias("wkt_2d"),
    )


@query(
    "geom_multi_promotion",
    oracle="""
    SELECT p_partkey,
           printf('POLYGON((0 0,%d 0,%d %d,0 0))', p_partkey, p_partkey, p_size::BIGINT) AS wkt_in,
           printf('MULTIPOLYGON(((0 0,%d 0,%d %d,0 0)))', p_partkey, p_partkey, p_size::BIGINT) AS wkt_multi,
           'MULTIPOLYGON' AS kind
    FROM part
    """,
)
def geom_multi_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 MULTI promotion + F24 kind sniff on the promoted result."""
    part = table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    wkt = F.format_string(
        "POLYGON((0 0,%d 0,%d %d,0 0))", k, k, F.col("p_size").cast("bigint")
    )
    promoted = G.promote_to_multi(wkt, "MULTIPOLYGON")
    return part.select(
        "p_partkey",
        wkt.alias("wkt_in"),
        promoted.alias("wkt_multi"),
        G.geometry_kind(promoted).alias("kind"),
    )


@query(
    "geom_point_lon_lat",
    oracle="""
    SELECT c_custkey,
           printf('SRID=4326;POINT (%d %d)', -76 + c_custkey % 10, 39 + c_nationkey % 5) AS ewkt,
           CAST(-76 + c_custkey % 10 AS DOUBLE) AS lon,
           CAST(39 + c_nationkey % 5 AS DOUBLE) AS lat
    FROM customer
    """,
)
def geom_point_lon_lat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 POINT → lon/lat double extraction (opendata publish path)."""
    cust = table(spark, sf_dir, "customer")
    ewkt = F.format_string(
        "SRID=4326;POINT (%d %d)",
        (F.lit(-76) + F.col("c_custkey") % 10).cast("bigint"),
        (F.lit(39) + F.col("c_nationkey") % 5).cast("bigint"),
    )
    lon, lat = G.point_to_lon_lat(ewkt)
    return cust.select(
        "c_custkey", ewkt.alias("ewkt"), lon.alias("lon"), lat.alias("lat")
    )


@query(
    "geom_kind_census",
    oracle="""
    WITH src AS (
      SELECT CASE o_orderkey % 3
               WHEN 0 THEN 'POINT(1 2)'
               WHEN 1 THEN printf('SRID=2272;POLYGON((0 0,%d 0,1 1,0 0))', o_orderkey)
               ELSE 'MULTIPOLYGON EMPTY' END AS shape
      FROM orders)
    SELECT CASE WHEN shape LIKE '%POINT%' THEN 'POINT'
                WHEN shape LIKE '%MULTIPOLYGON%' THEN 'MULTIPOLYGON'
                ELSE 'POLYGON' END AS kind,
           COUNT(*) AS n
    FROM src GROUP BY 1
    """,
)
def geom_kind_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/S5 geometry-type probe: DISTINCT kind census used to repair
    corrupt geometry_type metadata (reference _properties.py:145-165)."""
    orders = table(spark, sf_dir, "orders")
    shape = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("POINT(1 2)"))
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.format_string("SRID=2272;POLYGON((0 0,%d 0,1 1,0 0))", "o_orderkey"),
        )
        .otherwise(F.lit("MULTIPOLYGON EMPTY"))
    )
    return (
        orders.select(G.geometry_kind(shape).alias("kind"))
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )
