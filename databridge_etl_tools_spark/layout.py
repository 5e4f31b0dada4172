"""Optimized physical layouts for the query tables (SCALE.md's
layout story made executable): build once per scale factor, then every
registry-backed query transparently reads the optimized copy.

Three layouts, each targeting the dominant cost of a query family:

- **Facts bucketed by orderkey** (lineitem, orders): co-bucketed
  ``bucketBy(n, key)`` catalog tables make every fact-fact equi-join
  (region_revenue, shipping_priority, upsert/merge family) shuffle-
  free — the bucketed scan already satisfies the join's required
  distribution. At 100 TB this is THE lever: the orderkey shuffle is
  the single biggest data movement in the TPC-H-shaped queries.
- **Events partitioned by day**: ``partitionBy(day(ts))`` directory
  layout → time-ranged scans prune whole days at the file listing
  (real pipelines filter events by ingest window; the partition
  column is dropped on read so query-facing schema is unchanged).
- **Embeddings partitioned by IVF cell**: the ivf_build assignment
  written as the directory key → cell-restricted ANN probes read only
  their cell's files (cosine_topk(cell_col=...) and the cogrouped
  vectorized path co-locate for free).

Results are identical to the raw-parquet path by construction — the
builders only reorganize bytes; the DuckDB oracle keeps reading raw
parquet, so the correctness gate cross-checks the layouts too.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import registry


def _token(sf_dir: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", sf_dir.rstrip("/").lower()).strip("_")


def build_bucketed_facts(
    spark: SparkSession, sf_dir: str, buckets: int | None = None
) -> list[str]:
    """Write lineitem+orders as co-bucketed catalog tables on the
    orderkey and register them as the layout for ``sf_dir``. Returns
    the table names (caller owns DROP TABLE lifetime).

    Bucket count defaults to the cluster parallelism: each bucket is
    one scan partition, so too few buckets throttles every scan of
    the table, not just the joins (at 1000 executors you'd size this
    to a few× total cores, balanced against file count)."""
    if buckets is None:
        buckets = spark.sparkContext.defaultParallelism
    names = []
    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tname = f"{tbl}_bkt_{_token(sf_dir)}"
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        # a previous session's managed-table files survive the
        # in-memory catalog; clear the location or saveAsTable refuses
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = f"{wh.removeprefix('file:')}/{tname}"
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{tbl}.parquet")
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(tname)
        )
        registry.register_layout(
            sf_dir, tbl, lambda spark, tname=tname: spark.table(tname)
        )
        names.append(tname)
    return names


def build_events_by_day(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Write events partitioned by calendar day; the layout provider
    serves the original schema (partition column dropped, original
    column order restored)."""
    registry.LAYOUT.pop((sf_dir.rstrip("/"), "events"), None)
    ev = registry.table(spark, sf_dir, "events")
    cols = ev.columns
    path = f"{out_dir.rstrip('/')}/events_by_day"
    ev.withColumn("_day", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "_day"
    ).parquet(path)
    registry.register_layout(
        sf_dir,
        "events",
        lambda spark, path=path, cols=cols: spark.read.parquet(path).select(*cols),
    )
    return path


def build_embeddings_by_cell(
    spark: SparkSession, sf_dir: str, out_dir: str, k: int = 8, iters: int = 3
) -> str:
    """Write embeddings partitioned by their deterministic k-means IVF
    cell. The provider drops the cell column so query-facing schema is
    unchanged; cell-restricted probes that rebuild the same
    deterministic cells get partition-aligned data placement."""
    from .operators.similarity import ivf_build

    registry.LAYOUT.pop((sf_dir.rstrip("/"), "embeddings"), None)
    emb = registry.table(spark, sf_dir, "embeddings")
    cols = emb.columns
    path = f"{out_dir.rstrip('/')}/embeddings_by_cell"
    indexed = ivf_build(emb, k=k, iters=iters)
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
    registry.register_layout(
        sf_dir,
        "embeddings",
        lambda spark, path=path, cols=cols: spark.read.parquet(path).select(*cols),
    )
    return path


def build_all(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Build every layout for ``sf_dir`` (bench/startup hook)."""
    build_bucketed_facts(spark, sf_dir)
    build_events_by_day(spark, sf_dir, out_dir)
    build_embeddings_by_cell(spark, sf_dir, out_dir)
