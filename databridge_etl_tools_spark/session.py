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


def _default_driver_mem() -> str:
    """Size the local-mode JVM to the box instead of a constant.

    The engine's iterative operators (graph fixpoints, BPE rounds,
    dedup self-joins) cut lineage with ``localCheckpoint``; those
    blocks live in executor storage until the ContextCleaner releases
    them, so a long query sequence needs real storage headroom — an
    8g heap on a 128 GiB box made later queries in a bench window pay
    block spill + GC storms (measured: the same query 2.5 s in a
    fresh session vs 37 s late in a full window). Default to 1/4 of
    physical RAM clamped to [8, 48] GiB; ``SPARK_GRAFT_DRIVER_MEM``
    still overrides (and a real cluster sizes executors explicitly)."""
    try:
        total_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) // (1 << 30)
    except (ValueError, OSError):
        total_gb = 32
    return f"{max(8, min(48, total_gb // 4))}g"


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
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        # Long-running sessions accumulate out-of-scope RDD state
        # (localCheckpoint blocks, broadcasts, shuffle files) that the
        # ContextCleaner can only release after a JVM GC notices the
        # weak refs — and the default periodic GC fires every 30 min,
        # longer than a whole bench window. Tighten it so state from
        # finished queries drains continuously instead of piling into
        # storage-memory pressure. The cleaner calls System.gc();
        # +ExplicitGCInvokesConcurrent turns that from a multi-second
        # stop-the-world full collection (measured: it inflated the
        # whole bench board when fired every 60 s) into a concurrent
        # G1 cycle with millisecond pauses.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "120s"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+ExplicitGCInvokesConcurrent",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python Data Source API: allow pushFilters on custom sources
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
