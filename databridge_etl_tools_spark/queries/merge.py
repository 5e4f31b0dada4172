"""Merge-family queries (SURVEY §2.4 J1-J4, §2.5 A7/A9/A10) backed by
``operators.merge``. Prod/staging splits are derived deterministically
from ``orders``/``events`` so the DuckDB oracle can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import merge as M
from ..registry import query, table

ORDER_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

_UPSERT_ORACLE = f"""
    WITH prod AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         staging AS (
           SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                  o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 3 = 0)
    SELECT {ORDER_COLS} FROM staging
    UNION ALL
    SELECT {ORDER_COLS} FROM prod p
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = p.o_orderkey)
"""


def _prod_staging(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = table(spark, sf_dir, "orders")
    prod = orders.where(F.col("o_orderkey") % 2 == 0)
    staging = orders.where(F.col("o_orderkey") % 3 == 0).withColumns(
        {
            "o_orderstatus": F.lit("U"),
            "o_totalprice": F.col("o_totalprice") * 2,
        }
    )
    return prod, staging


@query("upsert_orders", oracle=_UPSERT_ORACLE)
def upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 upsert: staging overlays prod on the PK.

    Reference: ON CONFLICT DO UPDATE (postgres/postgres.py:1092-1180).
    """
    prod, staging = _prod_staging(spark, sf_dir)
    return M.upsert(prod, staging, ["o_orderkey"])


@query(
    "delete_stale",
    oracle=f"""
    WITH prod AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
         staging AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0)
    SELECT 'kept' AS fate, {ORDER_COLS} FROM prod p
    WHERE EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = p.o_orderkey)
    UNION ALL
    SELECT 'stale' AS fate, {ORDER_COLS} FROM prod p
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = p.o_orderkey)
    """,
)
def delete_stale_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 delete-stale, both sides in one tagged union: 'kept' = prod
    rows surviving the staging sync (semi join), 'stale' = rows the
    sync would delete (anti join). Reference: DELETE ... USING
    (... EXCEPT ...), postgres/postgres.py:1034-1090."""
    orders = table(spark, sf_dir, "orders")
    prod = orders.where(F.col("o_orderkey") % 2 == 0)
    staging = orders.where(F.col("o_orderkey") % 3 == 0)
    kept = M.delete_stale(prod, staging, ["o_orderkey"])
    stale = M.stale_rows(prod, staging, ["o_orderkey"])
    return kept.select(F.lit("kept").alias("fate"), "*").unionByName(
        stale.select(F.lit("stale").alias("fate"), "*")
    )


@query(
    "dedupe_events_by_user",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedupe_events_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 dedupe-by-key keep-first (reference ago/ago.py:820-828)."""
    ev = table(spark, sf_dir, "events")
    return M.dedupe_by_key(ev, ["user_id"], [F.col("ts"), F.col("event_id")])


@query(
    "record_diff",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey % 5 <> 0),
         b AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey % 7 <> 0),
         added AS (SELECT * FROM b EXCEPT ALL SELECT * FROM a),
         subtracted AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    SELECT 'added' AS side, o_orderkey, o_totalprice FROM added
    UNION ALL
    SELECT 'subtracted' AS side, o_orderkey, o_totalprice FROM subtracted
    """,
)
def record_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 recorddiff test oracle (tests/test_postgres.py:70-93):
    multiset added/subtracted sides, tagged and unioned."""
    a = table(spark, sf_dir, "orders").where(F.col("o_custkey") % 5 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    b = table(spark, sf_dir, "orders").where(F.col("o_custkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    added, subtracted = M.record_diff(a, b)
    return added.select(F.lit("added").alias("side"), "*").unionByName(
        subtracted.select(F.lit("subtracted").alias("side"), "*")
    )


@query(
    "scd2_customer_history",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg,
             DATE '2024-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to
      FROM customer),
    snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS bal,
             CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 11 <> 0),
    j AS (
      SELECT COALESCE(h.c_custkey, s.c_custkey) AS c_custkey,
             h.bal AS h_bal, h.seg AS h_seg, h.valid_from,
             s.bal AS s_bal, s.seg AS s_seg,
             (h.c_custkey IS NOT NULL) AS in_h,
             (s.c_custkey IS NOT NULL) AS in_s,
             (h.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
              AND (h.bal IS DISTINCT FROM s.bal
                   OR h.seg IS DISTINCT FROM s.seg)) AS changed
      FROM hist h FULL OUTER JOIN snap s ON h.c_custkey = s.c_custkey)
    SELECT c_custkey, h_bal AS bal, h_seg AS seg, valid_from,
           CAST(NULL AS DATE) AS valid_to
    FROM j WHERE in_h AND in_s AND NOT changed
    UNION ALL
    SELECT c_custkey, h_bal, h_seg, valid_from, DATE '2024-02-01'
    FROM j WHERE in_h AND (NOT in_s OR changed)
    UNION ALL
    SELECT c_custkey, s_bal, s_seg, DATE '2024-02-01', CAST(NULL AS DATE)
    FROM j WHERE in_s AND (NOT in_h OR changed)
    """,
    gate=False,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 merge
    (``operators.merge.scd2_apply``): the customer table's initial
    history evolved against a synthesized second snapshot (every 3rd
    balance moved, every 7th segment changed, every 11th key deleted)
    — changed/deleted open rows close at the batch date, changed and
    surviving keys gain new open versions, unchanged rows stay open.
    One full-outer key join; null-safe attribute comparison. The
    DuckDB oracle replays the full versioning semantics
    independently."""
    from ..operators.merge import scd2_apply

    cust = table(spark, sf_dir, "customer")
    hist = cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    snap = (
        cust.where(F.col("c_custkey") % 11 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + F.lit(100.0)
            ).otherwise(F.col("c_acctbal")).alias("bal"),
            F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
        )
    )
    return scd2_apply(hist, snap, ["c_custkey"], ["bal", "seg"], "2024-02-01")


@query(
    "scd2_point_in_time",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg,
             DATE '2024-01-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to
      FROM customer),
    snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS bal,
             CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 11 <> 0),
    j AS (
      SELECT COALESCE(h.c_custkey, s.c_custkey) AS c_custkey,
             h.bal AS h_bal, h.seg AS h_seg, h.valid_from,
             s.bal AS s_bal, s.seg AS s_seg,
             (h.c_custkey IS NOT NULL) AS in_h,
             (s.c_custkey IS NOT NULL) AS in_s,
             (h.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
              AND (h.bal IS DISTINCT FROM s.bal
                   OR h.seg IS DISTINCT FROM s.seg)) AS changed
      FROM hist h FULL OUTER JOIN snap s ON h.c_custkey = s.c_custkey),
    evolved AS (
      SELECT c_custkey, h_bal AS bal, h_seg AS seg, valid_from,
             CAST(NULL AS DATE) AS valid_to
      FROM j WHERE in_h AND in_s AND NOT changed
      UNION ALL
      SELECT c_custkey, h_bal, h_seg, valid_from, DATE '2024-02-01'
      FROM j WHERE in_h AND (NOT in_s OR changed)
      UNION ALL
      SELECT c_custkey, s_bal, s_seg, DATE '2024-02-01', CAST(NULL AS DATE)
      FROM j WHERE in_s AND (NOT in_h OR changed))
    SELECT c_custkey, bal, seg FROM evolved
    WHERE valid_from <= DATE '2024-01-15'
      AND (valid_to IS NULL OR valid_to > DATE '2024-01-15')
    """,
    gate=False,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction over the SCD2 history: the table
    exactly as it stood on 2024-01-15 — after the first load, before
    the second snapshot's changes took effect — via the validity-
    interval predicate ``valid_from <= d < valid_to``. A map-side
    filter over the history (at scale, partition the history by
    valid_from range and the filter prunes partitions); the time-
    travel read that makes SCD2 worth its bookkeeping."""
    from ..operators.merge import scd2_apply

    cust = table(spark, sf_dir, "customer")
    hist = cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    snap = (
        cust.where(F.col("c_custkey") % 11 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + F.lit(100.0)
            ).otherwise(F.col("c_acctbal")).alias("bal"),
            F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
        )
    )
    evolved = scd2_apply(hist, snap, ["c_custkey"], ["bal", "seg"], "2024-02-01")
    d = F.lit("2024-01-15").cast("date")
    return evolved.where(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    ).select("c_custkey", "bal", "seg")
