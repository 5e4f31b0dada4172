"""Two-pass distributed prefix sum vs a sorted python twin: exact
running totals over a total order, any input partitioning, stable
across recomputation (the materialized-pid contract)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.prefixsum import running_sum


def test_running_sum_matches_sorted_twin_any_partitioning(spark):
    rng = random.Random(17)
    rows = [(i, rng.randint(-50, 100)) for i in range(1000)]
    rng.shuffle(rows)
    twin = {}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        twin[k] = acc
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(parts)
        out = running_sum(df, ["k"], "v", n_parts=8, out_col="run")
        got = {r["k"]: r["run"] for r in out.collect()}
        assert got == twin


def test_running_sum_composite_order_and_reread_stability(spark):
    # composite total order (ties on the first key broken by the
    # second) and re-collecting the SAME frame yields identical
    # values (the totals job and final plan share one checkpoint)
    rows = [(1, 1, 10), (1, 2, 5), (2, 1, 7), (2, 2, 1), (3, 1, 2)]
    df = spark.createDataFrame(rows, "a int, b int, v bigint")
    out = running_sum(df, ["a", "b"], "v", n_parts=3, out_col="run")
    want = {(1, 1): 10, (1, 2): 15, (2, 1): 22, (2, 2): 23, (3, 1): 25}
    got1 = {(r["a"], r["b"]): r["run"] for r in out.collect()}
    got2 = {(r["a"], r["b"]): r["run"] for r in out.collect()}
    assert got1 == want and got2 == want
