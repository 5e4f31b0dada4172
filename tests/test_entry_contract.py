"""Driver-contract smoke tests: entry() returns rows; every query runs
at sf0.001; every oracle key exists in queries()."""

from __future__ import annotations

import pytest

import __spark_entry__ as ent


def test_entry_smoke(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_oracle_keys_subset_of_queries():
    qs, oracles = ent.queries(), ent.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", sorted(ent.queries()))
def test_query_runs_smoke(spark, sf_dir, name):
    df = ent.queries()[name](spark, sf_dir)
    assert df.count() >= 0
