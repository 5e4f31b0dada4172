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


def test_scd2_apply_versioning_contract(spark):
    """SCD2 semantics on a planted case: unchanged stays open, changed
    closes + reopens, deleted closes, new key opens, closed history is
    immutable, null<->value counts as a change."""
    import datetime as dt

    from databridge_etl_tools_spark.operators.merge import scd2_apply

    d0, d1 = dt.date(2024, 1, 1), dt.date(2024, 2, 1)
    hist = spark.createDataFrame(
        [
            (1, 10.0, d0, None),   # unchanged
            (2, 20.0, d0, None),   # will change
            (3, 30.0, d0, None),   # will be deleted
            (5, None, d0, None),   # null -> value change
            (9, 5.0, dt.date(2023, 1, 1), d0),  # already-closed row
        ],
        "k long, v double, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (4, 40.0), (5, 50.0)], "k long, v double"
    )
    out = scd2_apply(hist, snap, ["k"], ["v"], "2024-02-01").collect()
    rows = {(r.k, r.v, r.valid_from, r.valid_to) for r in out}
    assert rows == {
        (9, 5.0, dt.date(2023, 1, 1), d0),  # immutable closed history
        (1, 10.0, d0, None),                # unchanged, still open
        (2, 20.0, d0, d1), (2, 21.0, d1, None),  # changed: close + reopen
        (3, 30.0, d0, d1),                  # deleted: closed, no reopen
        (5, None, d0, d1), (5, 50.0, d1, None),  # null->value is a change
        (4, 40.0, d1, None),                # brand-new key opens
    }
    # exactly one open row per live key
    open_keys = [r.k for r in out if r.valid_to is None]
    assert sorted(open_keys) == [1, 2, 4, 5]
