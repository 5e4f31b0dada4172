"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``databridge_etl_tools_spark.registry``: every
implemented operator from SURVEY.md §2 registers a (query, oracle)
pair there; this module just exposes them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may load this module by file path; make the sibling
# package importable regardless of its CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databridge_etl_tools_spark import registry

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    df = registry.QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)
    return df.orderBy("l_returnflag", "l_linestatus")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(registry.ORACLES)
