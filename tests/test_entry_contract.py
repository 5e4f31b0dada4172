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


def test_gate_canary():
    """Driver-gate invariants (round-3 verdict #6): the driver checks
    exactly the first DRIVER_GATE_WINDOW registrations, so (a) the
    gate tier must fill that window exactly, (b) the first-N prefix of
    the catalog must BE the gate tier (a registration-order bug would
    silently drop an oracle query from driver verification), and (c)
    every oracle-backed query is either gate-tier or explicitly in the
    OVERFLOW tier that tools/check_correctness.py mirrors — no third
    bucket where a query could silently lose verification."""
    from databridge_etl_tools_spark import registry

    qs, oracles = ent.queries(), ent.oracle_sql()
    gate = [n for n in qs if n in oracles and n not in registry.OVERFLOW]
    assert len(gate) == registry.DRIVER_GATE_WINDOW
    assert list(qs)[: registry.DRIVER_GATE_WINDOW] == gate
    assert set(oracles) == set(gate) | registry.OVERFLOW
    # rotation overlay names must stay valid oracle queries
    assert registry.GATE_ROTATE_IN <= set(oracles)
    assert registry.GATE_ROTATE_OUT <= set(oracles)
    assert not (registry.GATE_ROTATE_IN & registry.GATE_ROTATE_OUT)


@pytest.mark.parametrize("name", sorted(ent.queries()))
def test_query_runs_smoke(spark, sf_dir, name):
    """Every catalog query runs AND its physical plan passes the
    systemic scale audit: no CartesianProduct anywhere (1-row
    crossJoins compile to BroadcastNestedLoopJoin, which is fine;
    an O(n²) cartesian is never acceptable at 100 TB) and no
    row-at-a-time Python UDF (``BatchEvalPython``) in any hot path —
    Python crossings must be Arrow-vectorized (``ArrowEvalPython`` /
    ``MapInPandas`` / ``FlatMapGroupsInPandas``)."""
    df = ent.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert df.count() >= 0
