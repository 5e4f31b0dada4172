"""Streaming corpus curation: the training-data quality/scrub/dedup
pipeline as an incremental job.

Because every curation stage is a pure Column expression
(``gopher_rules``, ``pii_scrub``, ``fingerprint``), the SAME plan
fragment runs over a batch DataFrame and a Structured Streaming
source unchanged — this module just composes them with streaming
dedup state and the exactly-once store sink. At scale this is the
S3-staging ingest shape: drain newly landed document files with
``availableNow``, gate/scrub/dedup, and commit each micro-batch
atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import textstats as TS
from ..operators.pii import pii_scrub

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """File-source document stream (one staged parquet file ≈ one
    micro-batch under availableNow)."""
    return spark.readStream.schema(schema or DOC_SCHEMA).parquet(path)


def curate_docs(df: DataFrame, min_words: int = 10, min_required_hits: int = 1) -> DataFrame:
    """The curation plan fragment: Gopher quality gate → PII scrub →
    content fingerprint. Batch/stream agnostic — pure column
    expressions, no shuffle, runs at scan speed in either mode.
    Output: doc_id, lang, source, curated text (scrubbed), fp.
    ``min_required_hits`` defaults to 1 here (vs the paper's 2): the
    synthetic corpus vocabulary carries few English function words,
    and the pipeline demo needs survivors — production keeps 2.
    """
    g = TS.gopher_rules(
        "text", min_words=min_words, min_required_hits=min_required_hits
    )
    s = pii_scrub("text")
    return (
        df.withColumn("_g", g)
        .where(F.col("_g.passes"))
        .select(
            "doc_id",
            "lang",
            "source",
            s["redacted"].alias("text"),
            # fp over the ORIGINAL text (select computes from the
            # input row): dedup identity is scrub-independent
            TS.fingerprint("text").alias("fp"),
        )
    )


def curate_stream_into_store(
    stream: DataFrame,
    store,
    table: str,
    checkpoint_dir: str,
    min_words: int = 10,
) -> None:
    """Incremental corpus curation with exactly-once commits: each
    micro-batch is gated/scrubbed, streaming-deduped on the content
    fingerprint (``dropDuplicates`` keeps the first arrival; state is
    fingerprint-keyed — bound it with
    ``withWatermark``/``dropDuplicatesWithinWatermark`` when the
    source carries event time; a drain-style availableNow ingest
    holds state only for the run), and committed to the TableStore
    under the idempotent epoch contract (replayed batches are
    skipped, crash-safe). Cross-batch duplicates are additionally
    fenced by the fp-keyed upsert itself: a fingerprint seen in a
    later run overwrites rather than duplicates."""
    from .events import stream_upsert_into_store

    curated = curate_docs(stream, min_words=min_words).dropDuplicates(["fp"])
    stream_upsert_into_store(
        curated, store, table, keys=["fp"], checkpoint_dir=checkpoint_dir
    )
