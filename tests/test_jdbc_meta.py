"""JDBC config builders (S1/K1), geometry-metadata probe (S5),
objectid counter (D11)."""

from __future__ import annotations

import pytest

from databridge_etl_tools_spark.functions.geometry import probe_geometry_metadata
from databridge_etl_tools_spark.sources.jdbc import JdbcScan, JdbcSink, ewkt_scan_query
from databridge_etl_tools_spark.sources.table_store import TableStore


def test_ewkt_scan_query_pushes_geometry_rendering():
    q = ewkt_scan_query(
        "phl.point_table",
        ["objectid", "textfield", "shape"],
        geom_cols={"shape": True},
        where="objectid > 100",
    )
    assert q == (
        'SELECT "objectid", "textfield", ST_AsEWKT("shape") AS "shape" '
        "FROM phl.point_table WHERE objectid > 100"
    )
    q2 = ewkt_scan_query("t", ["shape"], geom_cols={"shape": False})
    assert 'ST_AsText("shape")' in q2


def test_jdbc_scan_partitioned_options():
    scan = JdbcScan(
        url="jdbc:postgresql://db/phl",
        table="phl.big",
        columns=["objectid", "shape"],
        geom_cols={"shape": True},
        partition_column="objectid",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    opts = scan.options()
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "1000"
    assert opts["dbtable"].startswith("(SELECT")
    with pytest.raises(ValueError):
        JdbcScan(url="u", table="t", columns=["a"], partition_column="a").options()


def test_jdbc_sink_options():
    sink = JdbcSink(url="jdbc:postgresql://db/phl", table="phl.t", truncate=True)
    opts = sink.options()
    assert opts["batchsize"] == "1000" and opts["truncate"] == "true"


def test_probe_geometry_metadata_resolution(spark):
    df = spark.createDataFrame(
        [
            ("SRID=2272;POLYGON((0 0,1 0,1 1,0 0))",),
            ("SRID=2272;MULTIPOLYGON(((0 0,1 0,1 1,0 0)))",),
        ],
        "shape string",
    )
    meta = probe_geometry_metadata(df, "shape")
    assert meta == {"geometry_type": "MULTIPOLYGON", "srid": 2272}

    one = spark.createDataFrame([("POINT(1 2)",)], "shape string")
    assert probe_geometry_metadata(one, "shape")["geometry_type"] == "POINT"

    mixed = spark.createDataFrame(
        [("POINT(1 2)",), ("POLYGON((0 0,1 0,1 1,0 0))",)], "shape string"
    )
    assert probe_geometry_metadata(mixed, "shape")["geometry_type"] == "GEOMETRY"


def test_reset_objectid_counter(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(5,), (11,), (3,)], "objectid int")
    store.overwrite("t", df)
    assert store.reset_objectid_counter("t") == 12
    assert store.properties("t")["next_objectid"] == 12
