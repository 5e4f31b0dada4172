"""Training-shard export: the last step of a curation pipeline —
write the curated corpus as N size-balanced, deterministically
assigned parquet shards plus a manifest.

Dataloaders want shards that are (a) roughly equal-sized so workers
finish together, (b) stable across rebuilds so shard-level caching
and resumption work, and (c) accounted for in a manifest (row counts
per shard, total, assignment recipe) so ingestion can verify
completeness.

Scale design: shard assignment is a pure map-side content hash
(``md5(salt:key) % n_shards`` — uniform, append-stable, no RNG, no
global sort); the write is one ``partitionBy("shard")`` pass, so the
only data movement is the partitioned write itself. The manifest is
a per-shard count aggregate — n_shards rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame, key: str, n_shards: int, salt: str = "shard"
) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards): the
    content hash's integer residue — same recipe as the samplers and
    k-fold splitter, so a row's shard never changes across engines,
    partitionings, or appends."""
    if n_shards < 1:
        raise ValueError("assign_shards: n_shards must be >= 1")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(key).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def write_training_shards(
    df: DataFrame, path: str, key: str, n_shards: int, salt: str = "shard"
) -> dict:
    """Write ``df`` as ``n_shards`` hash-assigned parquet shard
    directories under ``path`` plus ``_manifest.json`` (underscore prefix — Spark's
    file index ignores it, so the dataset stays readable as parquet) (per-shard row
    counts, total, recipe). Returns the manifest dict.

    One partitioned write; the manifest counts run as a single
    n_shards-row aggregate over the just-written data (read back, so
    the manifest attests what is actually on disk, not what the plan
    intended)."""
    sharded = assign_shards(df, key, n_shards, salt)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    written = df.sparkSession.read.parquet(path)
    counts = {
        int(r.shard): r.n
        for r in written.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "salt": salt,
        "shards": {str(s): counts.get(s, 0) for s in range(n_shards)},
        "total_rows": sum(counts.values()),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
