"""Executor-side Airtable source via Spark 4's Python Data Source API
— the symmetry partner of ``knack_ds`` for SURVEY §2.1 S7.

Airtable paginates with an OPAQUE offset cursor (each response yields
the next request's offset token — reference airtable/airtable.py:
70-94), so the fetch is inherently sequential: no page-count probe,
no page-range fan-out. What still moves executor-side is the fetch
loop itself — a single InputPartition walks the cursor on a worker,
so the driver plans the scan but never holds a record: HTTP transfer,
JSON decode, and row buffering all happen in executor memory, and
downstream stages (repartition, parse, write) pipeline off that
worker without a driver round-trip. The driver-cursor
``AirtableSource.extract`` remains for schema-probe-and-play use.

Usage::

    spark.dataSource.register(AirtableDataSource)
    df = (spark.read.format("airtable")
          .schema("name string, value bigint")
          .option("url", base_url).option("table", "tbl")
          .option("page_size", 1000)
          .option("fields", "name,value")      # projection pushdown
          .load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


@dataclass
class _CursorWalk(InputPartition):
    # one partition: the offset chain is a linked list only the API
    # can follow (value is a constant tag, present for repr clarity)
    idx: int = 0


class AirtableReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema_ = schema
        self.url = options["url"].rstrip("/")
        self.table = options["table"]
        self.page_size = int(options.get("page_size", 1000))
        self.api_key = options.get("api_key", "")
        fields = options.get("fields", "")
        # strip: 'name, value' must request 'value', not ' value'
        # (Airtable silently returns null for an unknown field name)
        self.fields = [f.strip() for f in fields.split(",") if f.strip()] or None

    # -- partition planning (driver): no probe possible — the offset
    # cursor is opaque, so the scan is one executor-side walk
    def partitions(self) -> Sequence[InputPartition]:
        return [_CursorWalk()]

    # -- executor-side read -------------------------------------------
    def read(self, partition: _CursorWalk) -> Iterator[tuple]:
        import requests

        from .rest import coerce_value, fetch_with_retry

        session = requests.Session()
        if self.api_key:
            session.headers["Authorization"] = f"Bearer {self.api_key}"
        cols = list(self.schema_.fields)
        offset = None
        while True:
            params: dict = {"pageSize": self.page_size}
            if offset:
                params["offset"] = offset
            if self.fields:
                params["fields[]"] = self.fields  # projection pushdown
            doc = fetch_with_retry(
                session, f"{self.url}/{self.table}", params=params
            ).json()
            for rec in doc.get("records", []):
                fields = {k.lower(): v for k, v in rec.get("fields", {}).items()}
                yield tuple(coerce_value(fields.get(f.name), f.dataType) for f in cols)
            offset = doc.get("offset")
            if not offset:
                return


class AirtableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "airtable"

    def schema(self) -> str:
        raise NotImplementedError(
            "airtable requires an explicit .schema(...) — Airtable has "
            "no field-metadata endpoint; derive one from a sample or "
            "declare it (reference behavior: caller-supplied schema)"
        )

    def reader(self, schema: StructType) -> AirtableReader:
        return AirtableReader(schema, self.options)
