"""Operator-level scaling utilities."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_ids(df: DataFrame, base: int = 0, id_col: str = "objectid") -> DataFrame:
    """Assign dense sequential ids base+1..base+n with NO global sort
    and NO shuffle (the zipWithIndex shape, kept in DataFrame/Arrow
    land): one light job counts rows per partition, the cumulative
    offsets ride along as a plain closure, and a ``mapInPandas`` pass
    numbers each partition locally from its offset.

    Replaces ``row_number() OVER (ORDER BY …)`` — whose plan is a
    single-partition Exchange holding the entire table — for id
    synthesis where ids must be unique and dense but their assignment
    order is free. Requires a deterministic input lineage (both passes
    must see identical partitioning — true for file scans and any
    checkpointed frame; callers with nondeterministic sources should
    ``localCheckpoint`` first).
    """
    tagged = df.withColumn("_pid", F.spark_partition_id())
    counts = tagged.groupBy("_pid").count().collect()
    offsets: dict[int, int] = {}
    acc = base
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["count"]

    schema_str = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes] + [f"`{id_col}` bigint"]
    )

    def number(batches: Iterator) -> Iterator:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            start = offsets[int(pdf["_pid"].iloc[0])] + seen
            out = pdf.drop(columns=["_pid"])
            out[id_col] = range(start + 1, start + 1 + len(pdf))
            seen += len(pdf)
            yield out

    return tagged.mapInPandas(number, schema_str)


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Fan a DataFrame out to ~cluster parallelism before CPU-heavy
    per-row work (shingling, hashing, vector folds).

    Spark sizes scan partitions by BYTES (maxPartitionBytes), so a
    small-but-compute-dense table (600 KB of text, 64-dim vectors)
    arrives as a single partition and serializes the whole operator
    onto one core. The few-MB shuffle this forces is noise next to
    the compute it parallelizes; at real scale the input is already
    many partitions and this becomes a cheap no-op-ish rebalance.
    """
    if df.isStreaming:
        # no partition probe on a streaming frame (.rdd is illegal);
        # micro-batch parallelism is the source's trigger policy, and
        # the fragment must stay batch/stream agnostic in results
        return df
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df


def maybe_broadcast(df: DataFrame, threshold_rows: int) -> DataFrame:
    """Size-aware broadcast: hint ``df`` for broadcast only when its
    row count (one bounded job against what should be a MATERIALIZED
    frame) is at or under ``threshold_rows``; otherwise return it
    unhinted so the join plans as a plain shuffle join. The guard for
    vocabulary-shaped tables: corpus-derived, usually small, but
    unbounded in principle — at 100 TB a token/term/gram table is
    10⁸⁺ rows and would OOM any broadcast budget
    (round-4 verdict item #3).

    CONTRACT: pass a MATERIALIZED frame (``materialize(...)``) — the
    size probe is an eager count, and on an unmaterialized plan the
    whole lineage runs once for the count and again for the join
    (advisor finding r5)."""
    if df.agg(F.count(F.lit(1))).collect()[0][0] <= threshold_rows:
        return F.broadcast(df)
    return df


def in_parallel(*thunks, max_workers: int | None = None) -> list:
    """Run independent driver-side thunks — each typically submitting
    one or more Spark actions — CONCURRENTLY, returning their results
    in argument order (exceptions propagate).

    The optimization-guide §2.6 overlap: Spark happily schedules
    several jobs at once inside one application; actions are only
    sequential because driver code calls them sequentially. Composed
    operators (the curation funnel: two featurize+fit branches, the
    KN doc-score pipeline, the per-source sketch, the finalize
    report's bounded collects) are chains of genuinely independent
    sub-jobs whose small stages leave most executors idle — submitting
    them from a small thread pool back-fills the idle capacity and
    shortens the critical path to the slowest branch. FIFO scheduling
    (the default) gives exactly the back-fill behaviour.

    Results are unchanged by construction: each thunk submits the
    same jobs it would have submitted sequentially; only submission
    overlap changes. ``pyspark.inheritable_thread_target`` keeps
    thread-local JVM properties (job descriptions/groups) correct in
    the pool threads.
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    try:
        from pyspark import inheritable_thread_target as _inherit
    except ImportError:  # pragma: no cover - very old pyspark
        _inherit = lambda f: f  # noqa: E731
    with ThreadPoolExecutor(max_workers=max_workers or len(thunks)) as pool:
        futs = [pool.submit(_inherit(t)) for t in thunks]
        return [f.result() for f in futs]
