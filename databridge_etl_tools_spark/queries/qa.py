"""QA / data-profiling queries (SURVEY §2.9): the count-parity and
null/distinct profile checks as oracle-verified relational queries.
(The assert-style checks live in ``qa.QAReport``; these are their
set-returning equivalents.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, table


@query(
    "qa_report",
    oracle="""
    WITH profile AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(c_name) AS n_name,
             COUNT(DISTINCT c_custkey) AS n_distinct_key,
             COUNT(DISTINCT c_mktsegment) AS n_segments,
             CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_bal
      FROM customer),
    fk AS (
      SELECT (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
             (SELECT COUNT(*) FROM orders) AS n_orders),
    parity AS (
      SELECT (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 2 = 0) AS n_even,
             (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 2 = 1) AS n_odd,
             (SELECT COUNT(*) FROM lineitem) AS n_total)
    SELECT profile.*, fk.*, parity.*,
           (n_even + n_odd = n_total) AS parity_ok
    FROM profile, fk, parity
    """,
)
def qa_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1-V3 as one structured QA report row (SURVEY §7: the
    reference's scattered asserts become a structured report):
    customer profile (row count, null counts, key uniqueness, domain
    cardinality), orders→customer referential integrity (anti-join
    orphan count; broadcastable dimension side), and lineitem
    count-parity across splits — three one-row aggregates combined by
    broadcast cross joins, each map-side combinable."""
    c = table(spark, sf_dir, "customer")
    profile = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_name").alias("n_name"),
        F.countDistinct("c_custkey").alias("n_distinct_key"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("n_negative_bal"),
    )
    o = table(spark, sf_dir, "orders", access="scan").select("o_orderkey", "o_custkey")
    orphans = o.join(
        c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_anti"
    )
    fk = orphans.agg(F.count(F.lit(1)).alias("n_orphans")).crossJoin(
        o.agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = table(spark, sf_dir, "lineitem", access="scan")
    parity = li.agg(
        F.sum(F.when(F.col("l_orderkey") % 2 == 0, 1).otherwise(0)).alias("n_even"),
        F.sum(F.when(F.col("l_orderkey") % 2 == 1, 1).otherwise(0)).alias("n_odd"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return (
        profile.crossJoin(F.broadcast(fk))
        .crossJoin(F.broadcast(parity))
        .withColumn("parity_ok", (F.col("n_even") + F.col("n_odd")) == F.col("n_total"))
    )


@query(
    "events_value_histogram",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(CASE WHEN value < 0.0 THEN -1
                       WHEN value >= 500.0 THEN 20
                       ELSE least(floor((value - 0.0) / 500.0 * 20), 19)
                  END AS INTEGER) AS bucket
      FROM events)
    SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY 1, 2
    """,
    gate=False,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling (``qa.histogram_fixed``): 20 equi-width
    value buckets over [0, 500) per event type, with explicit
    underflow/overflow buckets so no row is dropped. One map-side
    bucket expression + one mergeable aggregation — the shuffle
    carries at most types × 22 rows at any corpus size."""
    from ..qa import histogram_fixed

    ev = table(spark, sf_dir, "events")
    return histogram_fixed(
        ev, "value", bins=20, lo=0.0, hi=500.0, group_col="event_type"
    )


@query(
    "documents_column_profile",
    oracle="""
    SELECT 'doc_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(COUNT(DISTINCT CAST(doc_id AS VARCHAR)) AS BIGINT)
             AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_value,
           CAST(MAX(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(n_chars AS VARCHAR)) AS BIGINT),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
    gate=False,
)
def documents_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table — the
    queryable twin of the reference's vacuum/analyze lifecycle step
    (SURVEY §2.6 D9): per column, row/null/distinct counts and typed
    min/max, the stats table a load-drift monitor diffs across runs.
    Two Expand-free jobs (``operators.profile.profile_columns``): one
    scalar aggregate for counts/nulls/min/max, one map-side unpivot →
    per-column distinct aggregate (deliberately NOT the
    multi-distinct single-aggregate spelling, whose Expand fans the
    corpus ×|cols| through one aggregation — the measured
    approx_sketches hazard). At 100 TB the distinct pass swaps to
    approx_count_distinct/HLL; the exact spelling is the audit."""
    from ..operators.profile import profile_columns

    docs = table(spark, sf_dir, "documents", access="scan")
    return profile_columns(docs, ["doc_id", "lang", "source", "n_chars"])
