"""Remaining TPC-H-shaped depth queries (Q9, Q10, Q12, Q14, Q16, Q17,
Q18, Q19, Q22), adapted to the synthetic schema (no partsupp /
l_shipmode / p_container / c_phone columns — each adaptation keeps the
query's *relational shape* and is documented per query).

All register in the overflow tier (``gate=False``): oracle-verified by
the local mirror without displacing a driver-gate query. Every SUM
follows the registry determinism rules (exact DECIMAL internally, final
cast to DOUBLE on both sides).

Reference parity intent: the reference (databridge-etl-tools) is an
EL tool, not a warehouse — these shapes demonstrate that the Spark
engine underneath covers the full relational surface a consumer of the
loaded tables would run (SURVEY §2.5 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query, table

DEC2 = "decimal(38,2)"
DEC6 = "decimal(38,6)"


@query(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount)
                         - 0.1*p.p_retailprice*l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
    gate=False,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name substring filter. Adaptation: no partsupp table, so
    supply cost is proxied as ``0.1 * p_retailprice`` (the shape —
    5-table join, CASE-free arithmetic agg over year extraction — is
    what's exercised, not the cost model).

    Plan: name-filtered part broadcasts into the lineitem scan,
    supplier/nation broadcast, one fact-fact shuffle (orders), one
    group-by shuffle."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@query(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, nation
    """,
    gate=False,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter. The original's ORDER BY revenue LIMIT 20 is dropped —
    ties at the cut make it nondeterministic cross-engine; the full
    grouped result is compared instead (the sort/limit is presentation,
    not relational shape).

    Plan: both date predicates and the returnflag filter push to the
    scans; customer joins shuffle on custkey; nation broadcasts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
    )


@query(
    "latency_priority_classes",
    oracle="""
    SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 90 THEN 'late'
                WHEN date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 30 THEN 'slow'
                ELSE 'fast' END AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_class
    """,
    gate=False,
)
def latency_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix per shipping class. Adaptation:
    no l_shipmode column, so the class is derived from ship latency
    (days between order and ship date) — same conditional-aggregation
    shape (SUM of CASE), same two-class split on o_orderpriority.

    Both engines diff calendar DATEs (explicit casts) so the day
    arithmetic is timezone-free and identical."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_shipdate")
    lag_days = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    ship_class = (
        F.when(lag_days > 90, "late").when(lag_days > 30, "slow").otherwise("fast")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(38,6))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
           AS DOUBLE) AS promo_share_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    gate=False,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts — conditional numerator over unconditional denominator.
    Exact decimal numerator and denominator, each cast to DOUBLE, one
    scalar multiply+divide (IEEE-identical both engines).

    Plan: month filter pushes to the lineitem scan; part broadcasts;
    single-row combine, zero extra shuffles."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC6))
    ).cast("double")
    den = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * num / den).cast("double").alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "supplier_part_census",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    gate=False,
)
def supplier_part_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier census per part attribute
    triple, excluding a supplier blacklist via NOT IN. Adaptation: no
    partsupp table — the part↔supplier bridge is the DISTINCT
    (partkey, suppkey) projection of lineitem.

    Plan: the blacklist is a broadcast anti-join (NOT IN with
    non-nullable keys ≡ anti join); part filter broadcasts; the
    distinct bridge and the count-distinct agg each shuffle once on
    partkey-rooted keys."""
    ps = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(blacklist), ps.suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), ps.partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_size <= 10),
    stats AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE)/COUNT(*) AS avg_qty
      FROM lineitem l JOIN brand_parts b ON l.l_partkey = b.p_partkey
      GROUP BY l.l_partkey)
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,2))) AS DOUBLE)/7.0 AS DOUBLE)
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem l
    JOIN brand_parts b ON l.l_partkey = b.p_partkey
    JOIN stats s ON s.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * s.avg_qty
    """,
    gate=False,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity
    lineitems of one brand's small parts — a correlated per-part AVG
    subquery. Adaptation: p_container doesn't exist; ``p_size <= 10``
    stands in as the second part predicate.

    The Spark plan decorrelates the AVG with a window over partkey
    (one shuffle, no self-join); the oracle keeps the two-pass CTE
    form. avg_qty follows the determinism rule: exact decimal sum →
    double → divide by count, identically on both engines."""
    bp = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").join(
        F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast(DEC2)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    small = li.withColumn("_avg_qty", avg_qty).where(
        F.col("l_quantity") < 0.5 * F.col("_avg_qty")
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast(DEC2)).cast("double") / 7.0)
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


@query(
    "large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    gate=False,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind orders whose total quantity
    exceeds a threshold — IN over a grouped HAVING subquery, then a
    re-aggregation on the joined result.

    Plan: the HAVING aggregate is one shuffle on orderkey; its
    qualifying keys semi-join the same shuffle-partitioned fact
    (co-partitioned, no extra exchange under AQE); customer broadcasts
    relative to the few qualifying orders. Threshold 250 keeps the
    result non-empty from sf0.001 up while staying selective."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC2)).alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(qualifying, o.o_orderkey == qualifying.l_orderkey, "left_semi")
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC2)).cast("double").alias("total_qty"))
    )


@query(
    "bracket_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    gate=False,
)
def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of three (brand, size-range,
    quantity-range) conjuncts across the join — the classic
    OR-of-ANDs predicate that exercises join-predicate handling.
    Adaptation: p_container/shipmode clauses don't exist; brand ×
    size × quantity brackets carry the same structure.

    Plan: Catalyst extracts the common join key (partkey equi-join,
    part broadcasts) and keeps the disjunction as a post-join filter;
    the brand/size part of each disjunct is also pushed to the part
    scan as ``(brand=12 AND size≤5) OR (brand=23 AND size≤10) OR …``,
    pruning the broadcast side."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(bracket)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "idle_customer_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE)/COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0)
    SELECT right(c.c_name, 1) AS cust_group,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY cust_group
    """,
    gate=False,
)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    qualifying orders, grouped into buckets — a scalar AVG subquery
    plus a filtered NOT EXISTS anti-join. Adaptations: no c_phone, so
    the bucket is the last digit of c_name (uniform by construction);
    and every synthetic customer has ≥1 order, so the anti-join
    excludes customers with any *URGENT* order (same filtered-NOT-
    EXISTS shape, non-empty result at every SF).

    Plan: the scalar average is a one-row broadcast cross join
    (filter evaluates map-side); NOT EXISTS is a shuffle anti-join on
    custkey; one final group-by shuffle on the 10-value bucket.
    avg follows the determinism rule (decimal sum → double / count)."""
    c = table(spark, sf_dir, "customer")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC2)).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.expr("right(c_name, 1)").alias("cust_group"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC2)).cast("double").alias("totacctbal"),
        )
    )
