"""Fixed-bin histogram: bucket math, edge/overflow handling, python twin."""

from __future__ import annotations

import math

import pytest

from databridge_etl_tools_spark.qa import histogram_fixed


def test_histogram_matches_python_twin(spark):
    vals = [(-5.0,), (0.0,), (0.49,), (2.5,), (9.999,), (10.0,), (42.0,)] + [
        (float(i) / 7.0,) for i in range(70)
    ]
    df = spark.createDataFrame(vals, "v double")
    got = {r.bucket: r.n for r in histogram_fixed(df, "v", bins=10, lo=0.0, hi=10.0).collect()}
    want = {}
    for (v,) in vals:
        if v < 0.0:
            b = -1
        elif v >= 10.0:
            b = 10
        else:
            b = min(int(math.floor(v / 10.0 * 10)), 9)
        want[b] = want.get(b, 0) + 1
    assert got == want
    assert got[-1] == 1 and got[10] == 2  # underflow; 10.0 and 42.0 overflow
    assert sum(got.values()) == len(vals)  # no row dropped


def test_histogram_grouped_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.5), ("b", 9.0)], "g string, v double"
    )
    got = {
        (r.g, r.bucket): r.n
        for r in histogram_fixed(df, "v", bins=5, lo=0.0, hi=10.0, group_col="g").collect()
    }
    assert got == {("a", 0): 2, ("b", 4): 1}
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", bins=0, lo=0.0, hi=1.0)
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", bins=5, lo=1.0, hi=1.0)
