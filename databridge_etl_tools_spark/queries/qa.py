"""QA / data-profiling queries (SURVEY §2.9): the count-parity and
null/distinct profile checks as oracle-verified relational queries.
(The assert-style checks live in ``qa.QAReport``; these are their
set-returning equivalents.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, table


@query(
    "qa_profile_customer",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(c_name) AS n_name,
           COUNT(DISTINCT c_custkey) AS n_distinct_key,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_bal
    FROM customer
    """,
)
def qa_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1/V2-style profile: row count, null counts, key uniqueness,
    domain cardinality — one pass, map-side combinable."""
    c = table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_name").alias("n_name"),
        F.countDistinct("c_custkey").alias("n_distinct_key"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("n_negative_bal"),
    )


@query(
    "qa_fk_orphans",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
           (SELECT COUNT(*) FROM orders) AS n_orders
    """,
)
def qa_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity check: count of orders whose customer is
    missing (anti-join; broadcastable dimension side). Always returns
    one summary row — 0 orphans means the FK holds."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans")).crossJoin(
        o.agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "qa_count_parity_splits",
    oracle="""
    WITH a AS (SELECT COUNT(*) n FROM lineitem WHERE l_orderkey % 2 = 0),
         b AS (SELECT COUNT(*) n FROM lineitem WHERE l_orderkey % 2 = 1),
         t AS (SELECT COUNT(*) n FROM lineitem)
    SELECT a.n AS n_even, b.n AS n_odd, t.n AS n_total,
           (a.n + b.n = t.n) AS parity_ok
    FROM a, b, t
    """,
)
def qa_count_parity_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2/V3 count-parity as a self-checking query: partition counts
    must sum to the total."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.sum(F.when(F.col("l_orderkey") % 2 == 0, 1).otherwise(0)).alias("n_even"),
        F.sum(F.when(F.col("l_orderkey") % 2 == 1, 1).otherwise(0)).alias("n_odd"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return agg.select(
        "n_even",
        "n_odd",
        "n_total",
        ((F.col("n_even") + F.col("n_odd")) == F.col("n_total")).alias("parity_ok"),
    )
