"""Unit tests for operators.merge on tiny inline frames, mirroring the
reference's round-trip-diff oracle (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators import merge as M


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_upsert_overlays_and_inserts(spark):
    prod = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    staging = _df(spark, [(2, "B"), (4, "D")])
    got = {tuple(r) for r in M.upsert(prod, staging, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_upsert_dedupes_staging_first_wins(spark):
    prod = _df(spark, [(1, "a")])
    staging = _df(spark, [(1, "x2"), (1, "x1"), (2, "y")])
    got = {
        tuple(r)
        for r in M.upsert(prod, staging, ["k"], staging_order=[F.col("v")]).collect()
    }
    assert got == {(1, "x1"), (2, "y")}


def test_stale_and_delete_stale_partition(spark):
    prod = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    staging = _df(spark, [(2, "ignored")])
    stale = {r.k for r in M.stale_rows(prod, staging, ["k"]).collect()}
    kept = {r.k for r in M.delete_stale(prod, staging, ["k"]).collect()}
    assert stale == {1, 3}
    assert kept == {2}
    assert stale | kept == {1, 2, 3}


def test_dedupe_by_key_keeps_first(spark):
    df = _df(spark, [(1, "b"), (1, "a"), (2, "z")])
    got = {tuple(r) for r in M.dedupe_by_key(df, ["k"], [F.col("v")]).collect()}
    assert got == {(1, "a"), (2, "z")}


def test_record_diff_roundtrip_empty(spark):
    a = _df(spark, [(1, "a"), (1, "a"), (2, "b")])
    added, subtracted = M.record_diff(a, a)
    assert added.count() == 0 and subtracted.count() == 0
    b = _df(spark, [(1, "a"), (2, "b")])
    added, subtracted = M.record_diff(a, b)
    assert added.count() == 0 and subtracted.count() == 1  # duplicate lost
