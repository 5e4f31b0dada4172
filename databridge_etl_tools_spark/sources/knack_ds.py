"""Executor-side Knack source via Spark 4's Python Data Source API —
the DataSourceV2-grade upgrade of the driver-side ``KnackSource``
(SURVEY §2.1 S6), same move ``feature_service_ds`` made for AGO (S8).

Knack paginates by PAGE NUMBER with the page count returned on every
response (knack/knack.py:105-125) — unlike Airtable's opaque offset
cursor, that makes the fetch embarrassingly parallel: one cheap
driver-side probe learns ``total_pages``, then each InputPartition
owns a contiguous page range fetched entirely on an executor. Extract
throughput scales with partitions instead of a single driver cursor.
(Airtable's opaque offset cursor can't fan out, but its fetch loop
also runs executor-side — see ``airtable_ds``.)

Usage::

    spark.dataSource.register(KnackDataSource)
    df = (spark.read.format("knack")
          .schema(KnackSource(url).schema("object_3"))   # or a DDL string
          .option("url", base_url).option("object", "object_3")
          .option("rows_per_page", 1000)
          .option("num_partitions", 8)
          .load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


@dataclass
class _PageRange(InputPartition):
    first: int  # inclusive, 1-based (Knack pages start at 1)
    last: int  # inclusive


class KnackReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.url = options["url"].rstrip("/")
        self.obj = options["object"]
        self.rows_per_page = int(options.get("rows_per_page", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))
        self.app_id = options.get("app_id", "")
        self.api_key = options.get("api_key", "")
        # pin an explicit sort so page N has the same membership on
        # every executor fetch — the server default is unspecified and
        # parallel page ranges assume one global order
        self.sort_field = options.get("sort_field", "id")
        self.sort_order = options.get("sort_order", "asc")

    def _params(self, page: int) -> dict:
        return {
            "page": page,
            "rows_per_page": self.rows_per_page,
            "sort_field": self.sort_field,
            "sort_order": self.sort_order,
        }

    def _headers(self) -> dict:
        return {
            "X-Knack-Application-Id": self.app_id,
            "X-Knack-REST-API-Key": self.api_key,
        }

    # -- partition planning (driver): one probe for the page count ----
    def partitions(self) -> Sequence[InputPartition]:
        import requests

        from .rest import fetch_with_retry

        session = requests.Session()
        session.headers.update(self._headers())
        doc = fetch_with_retry(
            session,
            f"{self.url}/objects/{self.obj}/records",
            params=self._params(1),
        ).json()
        total = max(1, int(doc.get("total_pages", 1)))
        span = max(1, (total + self.num_partitions - 1) // self.num_partitions)
        return [
            _PageRange(first, min(first + span - 1, total))
            for first in range(1, total + 1, span)
        ]

    # -- executor-side read -------------------------------------------
    def read(self, partition: _PageRange) -> Iterator[tuple]:
        import requests

        from .rest import coerce_value, fetch_with_retry

        session = requests.Session()
        session.headers.update(self._headers())
        fields = list(self.schema_.fields)
        for page in range(partition.first, partition.last + 1):
            doc = fetch_with_retry(
                session,
                f"{self.url}/objects/{self.obj}/records",
                params=self._params(page),
            ).json()
            for rec in doc.get("records", []):
                yield tuple(
                    coerce_value(rec.get(f.name), f.dataType) for f in fields
                )


class KnackDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "knack"

    def schema(self) -> str:
        raise NotImplementedError(
            "knack requires an explicit .schema(...) — synthesize one "
            "with KnackSource(url).schema(object) (field-metadata probe)"
        )

    def reader(self, schema: StructType) -> KnackReader:
        return KnackReader(schema, self.options)
