"""JDBC source/sink configuration (SURVEY §2.1 S1, §2.2 K1).

The reference scans Postgres/PostGIS with geopetl, rendering geometry
to EWKT server-side (``etl.frompostgis(..., geom_with_srid)``,
postgres/postgres.py:823-831) and loads via COPY
(postgres/postgres.py:682-777). The Spark equivalents are
``spark.read.jdbc`` with a pushed-down ``ST_AsEWKT`` projection and
``df.write.jdbc`` with batched inserts.

No Postgres exists in this container, so these helpers build the
exact reader/writer configuration — the query strings and option
dicts — and execute against whatever JDBC engine the ``url``/
``driver`` name. The executed path is integration-tested for real
against embedded Apache Derby (bundled with Spark's distribution;
tests/test_jdbc_roundtrip.py): sink append, scan, partitioned scan
with a database-side WHERE.

Scale notes encoded here:
- reads partition on a numeric column (``partitionColumn`` +
  bounds + ``numPartitions``) so one table scan fans across
  executors — the reference is a single cursor;
- ``fetchsize``/``batchsize`` default to the reference's 1000-row
  rhythm (db2/db2.py:821-874);
- geometry is rendered to EWKT **in the database** (projection
  pushdown), never shipped as raw bytes to re-render Spark-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def ewkt_scan_query(
    table: str,
    columns: list[str],
    geom_cols: dict[str, bool] | None = None,
    where: str | None = None,
) -> str:
    """Build the pushdown SELECT: geometry columns render to EWKT
    (``SRID=n;WKT``) or plain WKT server-side.

    ``geom_cols`` maps geometry column → with_srid flag (the
    ``geom_with_srid`` switch, postgres/postgres.py:823-831).
    """
    geom_cols = geom_cols or {}
    parts = []
    for c in columns:
        if c in geom_cols:
            fn = "ST_AsEWKT" if geom_cols[c] else "ST_AsText"
            parts.append(f'{fn}("{c}") AS "{c}"')
        else:
            parts.append(f'"{c}"')
    sql = f'SELECT {", ".join(parts)} FROM {table}'
    if where:
        sql += f" WHERE {where}"
    return sql


@dataclass
class JdbcScan:
    url: str
    table: str
    columns: list[str]
    geom_cols: dict[str, bool] = field(default_factory=dict)
    where: str | None = None
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 8
    fetchsize: int = 1000
    driver: str = "org.postgresql.Driver"

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "driver": self.driver,
            "dbtable": f"({self.query()}) AS src",
            "fetchsize": str(self.fetchsize),
        }
        if self.partition_column:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("partitioned scan needs lower/upper bounds")
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def query(self) -> str:
        return ewkt_scan_query(self.table, self.columns, self.geom_cols, self.where)

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.options()).load()


@dataclass
class JdbcSink:
    url: str
    table: str
    mode: str = "append"  # append | overwrite (blue/green via _temp swap upstream)
    batchsize: int = 1000
    isolation: str = "READ_COMMITTED"
    truncate: bool = False
    driver: str = "org.postgresql.Driver"

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "driver": self.driver,
            "dbtable": self.table,
            "batchsize": str(self.batchsize),
            "isolationLevel": self.isolation,
            "truncate": str(self.truncate).lower(),
        }

    def save(self, df: DataFrame) -> None:
        df.write.format("jdbc").options(**self.options()).mode(self.mode).save()
