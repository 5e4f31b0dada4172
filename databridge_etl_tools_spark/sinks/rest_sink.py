"""Partition-batched REST sink (SURVEY §2.2 K5/K7, §2.4 J4).

The reference buffers 500 rows and POSTs ``addFeatures``/
``updateFeatures`` with 3 retries and error-row quarantine
(ago/ago.py:604-665, 323-348). Spark-side, each partition batches and
POSTs independently — ``mapInPandas`` (not foreachPartition) so every
batch yields a status row, and the caller materializes successes and
quarantines failures as DataFrames.

Retry caveat (SURVEY §4): Spark task retries would re-POST whole
partitions; REST edits are not idempotent. The sink therefore (a)
assigns deterministic batch ids so a receiver can dedupe, and (b) is
meant to run in a job with ``spark.task.maxFailures=1`` semantics for
the write stage, treating transport retry as the only retry (same
rollbackOnFailure=false stance as the reference).

The AGO upsert (J4) is re-expressed as one bulk plan: existing
features scanned once (S8) + left join against the staged rows —
adds / updates / duplicate-deletes split set-based, instead of one
REST query per row.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

STATUS_SCHEMA = (
    "partition_id long, batch_id string, n_rows long, ok boolean, error string, payload_sample string"
)


def _check_task_retries(
    explicit: str | None, master: str, allow_task_retries: bool
) -> None:
    """Refuse to run a non-idempotent POST stage under task retries
    (spark.task.maxFailures is a static conf — resolved from the
    SparkContext; plain local[N] masters never retry)."""
    if explicit is not None:
        max_failures = int(explicit)
    elif master.startswith("local") and "," not in master:
        max_failures = 1  # plain local[N] never retries tasks
    else:
        max_failures = 4  # cluster default
    if max_failures > 1 and not allow_task_retries:
        raise RuntimeError(
            f"post_batches targets a non-idempotent endpoint but "
            f"spark.task.maxFailures={max_failures}: a retried task would "
            f"re-POST whole partitions. Set spark.task.maxFailures=1 for "
            f"this job, or pass allow_task_retries=True if the receiver "
            f"dedupes on batch_id."
        )


def post_batches(
    df: DataFrame,
    url: str,
    batch_size: int = 500,
    retries: int = 3,
    timeout: float = 30.0,
    payload_builder: Callable[[list[dict]], dict] | None = None,
    allow_task_retries: bool = False,
) -> DataFrame:
    """POST ``df`` to ``url`` in per-partition batches; returns one
    status row per batch (ok/error + deterministic batch id).

    Enforces the non-idempotence contract at call time instead of in
    prose: on a cluster with task-level retries enabled
    (``spark.task.maxFailures`` > 1, the default 4), a late task
    failure would re-POST every batch already sent by that partition.
    Raises unless retries are off or the caller explicitly accepts
    the risk (``allow_task_retries=True`` — e.g. when the receiver
    dedupes on the deterministic batch ids)."""

    sc = df.sparkSession.sparkContext
    _check_task_retries(
        sc.getConf().get("spark.task.maxFailures", None),
        sc.master,
        allow_task_retries,
    )

    cols = df.columns

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        import requests

        session = requests.Session()
        from ..sources.rest import fetch_with_retry

        buf: list[dict] = []
        pid = None
        out: list[tuple] = []
        seq = 0

        def flush():
            nonlocal seq
            if not buf:
                return
            body = payload_builder(buf) if payload_builder else {"rows": buf}
            batch_id = f"{pid}-{seq}"
            seq += 1
            try:
                fetch_with_retry(
                    session, url, method="POST", json_body={"batch_id": batch_id, **body},
                    retries=retries, timeout=timeout,
                )
                out.append((pid, batch_id, len(buf), True, None, None))
            except Exception as e:  # noqa: BLE001 - quarantine any failure
                out.append(
                    (pid, batch_id, len(buf), False, str(e)[:500], json.dumps(buf[:1]))
                )
            buf.clear()

        for pdf in batches:
            if pid is None:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId() if TaskContext.get() else -1
            for rec in pdf[cols].to_dict("records"):
                buf.append(rec)
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame(
            out,
            columns=["partition_id", "batch_id", "n_rows", "ok", "error", "payload_sample"],
        )

    # Materialize eagerly, exactly once: callers will run multiple
    # actions on the status frame (count, write, filters), and a lazy
    # plan would re-execute mapInPandas — re-POSTing every batch to a
    # non-idempotent endpoint. localCheckpoint truncates the lineage,
    # so downstream actions read the materialized result only.
    return df.mapInPandas(run, STATUS_SCHEMA).localCheckpoint(eager=True)


def quarantine_failures(status_df: DataFrame, path: str) -> int:
    """K7: failed batches → timestamped error sink (ago/ago.py:323-348
    appends failed rows to an -errors.txt in S3); returns count."""
    failures = status_df.where(~F.col("ok"))
    n = failures.count()
    if n:
        failures.write.mode("append").json(path)
    return n


def ago_upsert_plan(
    staged: DataFrame, existing: DataFrame, pk: str, objectid_col: str = "objectid"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """J4 set-based: returns (adds, updates, duplicate_deletes).

    - duplicate_deletes: existing features beyond the first per PK
      (the reference deletes the 2nd hit, ago/ago.py:820-828)
    - updates: staged rows whose PK exists — with the existing
      feature's objectid swapped in (ago/ago.py:830-838)
    - adds: staged rows with no existing PK match
    One shuffle on the PK replaces N per-row REST queries.
    """
    w = Window.partitionBy(pk).orderBy(F.col(objectid_col))
    ranked = existing.withColumn("_rn", F.row_number().over(w))
    dup_deletes = ranked.where(F.col("_rn") > 1).drop("_rn")
    first = ranked.where(F.col("_rn") == 1).select(
        F.col(pk).alias("_pk"), F.col(objectid_col).alias("_existing_oid")
    )
    joined = staged.join(first, staged[pk] == F.col("_pk"), "left")
    adds = joined.where(F.col("_pk").isNull()).drop("_pk", "_existing_oid")
    updates = (
        joined.where(F.col("_pk").isNotNull())
        .withColumn(objectid_col, F.col("_existing_oid"))
        .drop("_pk", "_existing_oid")
    )
    return adds, updates, dup_deletes
