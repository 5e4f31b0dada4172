"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings
(AQE on, shuffle partitions ~ cores, Arrow on, UTC session tz) are the
ones we would ship to a real cluster, where ``shuffle.partitions`` is
instead sized to ~2-3x total executor cores and
``spark.sql.files.maxPartitionBytes`` keeps scan tasks ~128MB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_session(app_name: str = "databridge_etl_tools_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this workload.

    - AQE enabled: runtime coalescing + skew-join handling, so plans
      survive a 100x scale-up without hand-retuning partition counts.
    - shuffle.partitions ~= cores locally (cluster: 2-3x total cores).
    - Arrow enabled: pandas UDF / toPandas stay vectorized.
    - Session timezone pinned UTC: deterministic timestamp semantics
      and parity with the DuckDB oracle.
    """
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python Data Source API: allow pushFilters on custom sources
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
