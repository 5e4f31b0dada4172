"""Executor-side feature-service source via Spark 4's Python Data
Source API — the DataSourceV2-grade upgrade of the driver-side
``AGOFeatureSource`` (SURVEY §2.1 S8, §4 pushdown row).

What this buys over the driver-side source:
- **Executor-side fetch**: each InputPartition is an id range fetched
  by a worker, so extract throughput scales with partitions instead
  of a single driver cursor.
- **Real filter pushdown** (``pushFilters``): supported predicates
  translate into the service's ``where`` parameter (the reference
  passes ``where`` strings by hand, ago/ago.py:905-913); unsupported
  ones stay in Spark.
- **Projection pushdown**: the reader requests only ``outFields``
  from the pruned schema.

Usage::

    spark.dataSource.register(FeatureServiceDataSource)
    df = (spark.read.format("feature_service")
          .schema("objectid bigint, pk string, val bigint")
          .option("url", layer_url)
          .option("id_col", "objectid")
          .option("lower", 0).option("upper", 1000)
          .option("num_partitions", 8)
          .load())
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


@dataclass
class _RangePartition(InputPartition):
    lower: int
    upper: int


def _quote(v) -> str:
    return f"'{v}'" if isinstance(v, str) else str(v)


class FeatureServiceReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.url = options["url"].rstrip("/")
        self.id_col = options.get("id_col", "objectid")
        self.lower = int(options.get("lower", 0))
        self.upper = int(options.get("upper", 1 << 31))
        self.num_partitions = int(options.get("num_partitions", 8))
        self.batch = int(options.get("batch", 1000))
        self.token = options.get("token", "")
        self.pushed: list[str] = []

    # -- filter pushdown ------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        unsupported = []
        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self.pushed.append(f"{f.attribute[0]} {op} {_quote(f.value)}")
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self.pushed.append(f"{f.attribute[0]} IS NOT NULL")
            else:
                unsupported.append(f)
        return unsupported

    # -- partition planning --------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        span = max(1, (self.upper - self.lower + self.num_partitions - 1) // self.num_partitions)
        return [
            _RangePartition(lo, min(lo + span, self.upper))
            for lo in range(self.lower, self.upper, span)
        ]

    # -- executor-side read --------------------------------------------
    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        import requests

        from .rest import fetch_with_retry

        session = requests.Session()
        cols = [f.name for f in self.schema_.fields]
        where = " AND ".join(
            [f"{self.id_col} >= {partition.lower}", f"{self.id_col} < {partition.upper}"]
            + self.pushed
        )
        offset = 0
        while True:
            params = {
                "where": where,
                "outFields": ",".join(cols),  # projection pushdown
                "f": "json",
                "resultOffset": offset,
                "resultRecordCount": self.batch,
                "token": self.token,
            }
            doc = fetch_with_retry(session, f"{self.url}/query", params=params).json()
            feats = doc.get("features", [])
            for f in feats:
                attrs = f.get("attributes", {})
                yield tuple(attrs.get(c) for c in cols)
            if not feats or not (
                len(feats) == self.batch or doc.get("exceededTransferLimit")
            ):
                return
            offset += len(feats)


class FeatureServiceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "feature_service"

    def schema(self) -> str:
        # schema must be supplied by the caller (.schema(...)); this
        # default documents the contract
        raise NotImplementedError(
            "feature_service requires an explicit .schema(...) — the "
            "service's field metadata maps via KnackSource-style probes"
        )

    def reader(self, schema: StructType) -> FeatureServiceReader:
        return FeatureServiceReader(schema, self.options)

