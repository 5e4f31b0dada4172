"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
training-data interchange (every public corpus ships as .jsonl or
.jsonl.gz shards).

Scale notes:
- Uncompressed JSONL is byte-range splittable: one 1 TB file still
  fans out across executors (same property as CSV). Gzip members are
  NOT splittable — a .jsonl.gz file is one task, so shard uploads
  into many files (the ecosystem convention) and parallelism comes
  from the file count. Zstd/bzip2 behave likewise; only uncompressed
  text splits.
- ALWAYS pass a schema in production: schema inference is a full
  extra pass over the data (sampled, but still a scan) and infers
  unstable types from dirty corpora. ``read_jsonl`` requires one.
- Malformed lines: ``mode="PERMISSIVE"`` (default) lands bad lines
  in ``_corrupt_record`` for quarantine — the JSONL twin of the REST
  sink's error-row quarantine (K7) — while ``DROPMALFORMED``
  silently drops and ``FAILFAST`` aborts. The quarantine column only
  materializes when selected (Spark contract: it must be in the
  schema to be readable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
    quarantine: bool = False,
) -> DataFrame:
    """Read .jsonl / .jsonl.gz (compression sniffed from extension).
    With ``quarantine=True`` the schema is extended with
    ``_corrupt_record STRING`` so malformed lines survive as rows
    (filter on ``_corrupt_record IS NOT NULL`` to route them). The
    quarantine frame is CACHED: Spark disallows queries that
    reference only the internal corrupt-record column of a raw JSON
    scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    parser prunes the data columns the corrupt copy is derived
    from), and caching is the documented contract for routing bad
    rows; unpersist after the quarantine split if the corpus is
    large."""
    if quarantine and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    df = (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df.cache() if quarantine else df


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    partitions: int | None = None,
) -> None:
    """Write JSONL shards (one file per partition — the sharded-corpus
    convention; ``compression="gzip"`` for .json.gz members, readable
    back one-task-per-file)."""
    if partitions is not None:
        df = df.repartition(partitions)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
