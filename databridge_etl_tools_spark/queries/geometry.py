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
    "geom_normalize",
    oracle=f"""
    WITH src AS (
      SELECT p_partkey,
             [{",".join(map(str, _BAD_SRIDS))}][1 + p_partkey % 4] AS raw_srid,
             [{",".join(map(str, _EXPECT_FIX))}][1 + p_partkey % 4] AS fix_srid,
             printf('POINT Z (%d %d %d)', p_partkey, p_size::BIGINT, p_partkey % 100) AS wkt_3d,
             printf('POINT (%d %d)', p_partkey, p_size::BIGINT)    AS wkt_2d,
             printf('MULTIPOLYGON(((0 0,%d 0,%d %d,0 0)))', p_partkey, p_partkey, p_size::BIGINT) AS multi_out,
             CAST(p_size AS DOUBLE) AS lat_out
      FROM part)
    SELECT p_partkey,
           printf('SRID=%d;%s', raw_srid, wkt_3d)  AS ewkt,
           raw_srid                                AS srid_in,
           fix_srid                                AS srid_fixed,
           printf('SRID=%d;%s', fix_srid, wkt_2d)  AS ewkt_fixed,
           multi_out                               AS wkt_multi,
           'MULTIPOLYGON'                          AS kind,
           CAST(p_partkey AS DOUBLE)               AS lon,
           lat_out                                 AS lat
    FROM src
    """,
)
def geom_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole geometry prepare chain in one projection:
    F12 SRID extract/strip + F18 bad-SRID remap + F1 force_2d + F2
    MULTI promotion + F24 kind sniff + F17 POINT→lon/lat — applied to
    synthesized EWKT (POINT Z with a corrupt SRID prefix, plus a
    POLYGON for the MULTI path). The oracle constructs every expected
    output string independently."""
    part = table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    size = F.col("p_size").cast("bigint")
    bad = F.element_at(
        F.array(*[F.lit(s) for s in _BAD_SRIDS]), (k % 4 + 1).cast("int")
    )
    wkt3d = F.format_string("POINT Z (%d %d %d)", "p_partkey", size, k % 100)
    poly = F.format_string("POLYGON((0 0,%d 0,%d %d,0 0))", k, k, size)
    src = part.select(
        "p_partkey",
        F.format_string("SRID=%d;%s", bad, wkt3d).alias("ewkt"),
        poly.alias("poly_in"),
    )
    srid_fixed = G.remap_bad_srid(G.srid_of("ewkt"))
    wkt_2d = G.force_2d(G.strip_srid("ewkt"))
    ewkt_fixed = G.with_srid(wkt_2d, srid_fixed)
    promoted = G.promote_to_multi(F.col("poly_in"), "MULTIPOLYGON")
    lon, lat = G.point_to_lon_lat(wkt_2d)
    return src.select(
        "p_partkey",
        "ewkt",
        G.srid_of("ewkt").alias("srid_in"),
        srid_fixed.alias("srid_fixed"),
        ewkt_fixed.alias("ewkt_fixed"),
        promoted.alias("wkt_multi"),
        G.geometry_kind(promoted).alias("kind"),
        lon.alias("lon"),
        lat.alias("lat"),
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
    gate=False,
)
def geom_kind_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/S5 geometry-type probe: DISTINCT kind census used to repair
    corrupt geometry_type metadata (reference _properties.py:145-165)."""
    orders = table(spark, sf_dir, "orders", access="scan")
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
