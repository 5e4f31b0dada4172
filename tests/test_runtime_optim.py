"""Runtime optimizations the engine leans on at scale, pinned against
the ACTUAL executed plans: Catalyst's runtime bloom-filter injection
(semi-join reduction of a fact scan from a selective dim filter) and
AQE's runtime skew-join split — the "let the optimizer do it"
counterparts to the manual layout/bucketing/salting layer
(SCALE.md; ROADMAP backlog 2-3)."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.registry import table

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def _confs(spark, settings: dict):
    old = {k: spark.conf.get(k, None) for k in settings}
    for k, v in settings.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_reduces_fact_scan(spark):
    """A selective dim-side filter injects a runtime bloom filter
    (BloomFilterAggregate on the dim, might_contain on the fact scan)
    into a shuffle join — at 100 TB this is a semi-join reduction
    that prunes fact rows BEFORE the shuffle. The application-side
    threshold defaults to 10 GB, so the test lowers it to demonstrate
    the mechanism at test scale; results must equal the unfiltered
    plan's."""
    settings = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    li = table(spark, SF, "lineitem")
    o = (
        table(spark, SF, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .where(F.col("o_custkey") % 97 == 0)
    )
    def q():
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    baseline = {tuple(r) for r in q().collect()}
    with _confs(spark, settings):
        j = q()
        got = {tuple(r) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
    assert "bloomfilter" in plan or "might_contain" in plan
    assert got == baseline and len(got) == 1


def test_aqe_splits_planted_skewed_join(spark):
    """AQE's OptimizeSkewedJoin splits a planted hot-key partition at
    runtime: the final adaptive plan must show SortMergeJoin(skew=true)
    with a skewed AQEShuffleRead on the hot side — the zero-code
    alternative to manual salting (operators/skew.py) when the skew is
    in a JOIN rather than an aggregation. Thresholds are lowered to
    make a 400k-row plant skew-eligible; results must be exact."""
    settings = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    n_left, hot = 400_000, 7
    left = spark.range(0, n_left).select(
        F.when(F.col("id") % 20 != 0, F.lit(hot))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pl"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    with _confs(spark, settings):
        j = left.join(right, "k")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan.lower()
    # exactness under the split: every left row matched exactly once
    assert len(rows) == n_left
    assert sum(1 for r in rows if r.k == hot) == n_left - n_left // 20


@pytest.fixture(autouse=True)
def _clean_plans(spark):
    yield
    spark.catalog.clearCache()
