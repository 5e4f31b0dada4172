"""S1/K1 executed for real: JdbcSink.save / JdbcScan.load round-trip
through embedded Apache Derby (bundled with Spark's distribution, runs
in the same JVM in local mode) — the reference's extract→load path
(postgres/postgres.py:823-831, :682-777) with an actual JDBC engine on
the other side instead of config-only assertions."""

from __future__ import annotations

import pytest

from databridge_etl_tools_spark.sources.jdbc import JdbcScan, JdbcSink

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def _sample(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(1, 101)],
        "k int, name string, val double",
    )


def test_jdbc_sink_then_scan_roundtrip(spark, derby_url):
    JdbcSink(
        url=derby_url, table="orders_rt", driver=DERBY_DRIVER, batchsize=25
    ).save(_sample(spark))

    out = JdbcScan(
        url=derby_url,
        table="orders_rt",
        columns=["k", "name", "val"],
        driver=DERBY_DRIVER,
    ).load(spark)
    rows = {(r.k, r.name, r.val) for r in out.collect()}
    assert len(rows) == 100 and (7, "name_7", 10.5) in rows


def test_jdbc_partitioned_scan_with_pushed_where(spark, derby_url):
    JdbcSink(
        url=derby_url, table="orders_part", driver=DERBY_DRIVER
    ).save(_sample(spark))

    scan = JdbcScan(
        url=derby_url,
        table="orders_part",
        columns=["k", "val"],
        where='"k" <= 40',  # raw SQL reaches the engine: quote to match Spark's created casing
        partition_column="k",
        lower_bound=1,
        upper_bound=100,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    df = scan.load(spark)
    # the scan fans out across JDBC partitions (one cursor each — the
    # reference is a single cursor) and the WHERE ran database-side
    assert df.rdd.getNumPartitions() == 4
    ks = sorted(r.k for r in df.collect())
    assert ks == list(range(1, 41))


def test_jdbc_append_accumulates(spark, derby_url):
    sink = JdbcSink(url=derby_url, table="orders_app", driver=DERBY_DRIVER)
    sink.save(_sample(spark).limit(10))
    sink.save(_sample(spark).limit(10))
    out = JdbcScan(
        url=derby_url, table="orders_app", columns=["k"], driver=DERBY_DRIVER
    ).load(spark)
    assert out.count() == 20
