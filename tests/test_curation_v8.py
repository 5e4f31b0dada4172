"""Curation v8 (rank-weighted sampling): quota contract + pins.

The oracle gate proves cross-engine exactness; these pin the
SEMANTICS the verdict asked for — kept-per-source counts must shift
monotonically with source rank, and the apportionment must be an
exact largest-remainder split of the budget."""

from __future__ import annotations

import pytest

from databridge_etl_tools_spark.operators.sampling import weighted_quotas
from databridge_etl_tools_spark.registry import QUERIES, load_all

SF = "/root/testdata/sf0.001"


def test_weighted_quotas_exact_and_monotone():
    w = {"a": 50, "b": 30, "c": 30, "d": 0, "e": 7}
    q = weighted_quotas(w, 17)
    assert sum(q.values()) == 17
    # proportionality: higher weight never trails by more than the
    # single largest-remainder unit
    for s in w:
        for t in w:
            if w[s] > w[t]:
                assert q[s] >= q[t] - 1
    # equal weights: same base, extras tie-break deterministically
    # toward the smaller key — within one unit, never reversed
    assert q["b"] in (q["c"], q["c"] + 1)
    assert weighted_quotas({"a": 0, "b": 0}, 10) == {"a": 0, "b": 0}
    assert weighted_quotas(w, 0) == {s: 0 for s in w}


def test_weighted_quotas_property_sweep():
    import random

    rng = random.Random(5)
    for _ in range(200):
        n = rng.randint(1, 12)
        w = {f"s{i}": rng.randint(0, 100) for i in range(n)}
        b = rng.randint(0, 500)
        q = weighted_quotas(w, b)
        wt = sum(w.values())
        if wt == 0 or b <= 0:
            assert all(v == 0 for v in q.values())
            continue
        assert sum(q.values()) == b
        for s in w:
            base = (w[s] * b) // wt
            assert base <= q[s] <= base + 1


@pytest.fixture(scope="module")
def v8_rows(spark):
    load_all()
    return QUERIES["corpus_curation_v8"](spark, SF).collect()


def test_v8_kept_counts_follow_rank(v8_rows):
    """The verdict's pin: kept-per-source shifts monotonically with
    source rank — quota tracks rank within the single Hamilton
    remainder unit, and kept = min(quota, survivors)."""
    assert len(v8_rows) > 1
    for r in v8_rows:
        assert r["n_kept"] == min(r["quota"], r["n_classifier"])
        assert r["n_classifier"] <= r["n_gopher"] <= r["n_unique"] <= r["n_docs"]
    for a in v8_rows:
        for b in v8_rows:
            if a["rank_q"] > b["rank_q"]:
                assert a["quota"] >= b["quota"] - 1


def test_v8_budget_is_half_of_survivors(v8_rows):
    total_surv = sum(r["n_classifier"] for r in v8_rows)
    total_quota = sum(r["quota"] for r in v8_rows)
    assert total_quota == total_surv // 2
    assert sum(r["n_kept"] for r in v8_rows) <= total_quota


@pytest.fixture(scope="module")
def v9_rows(spark):
    load_all()
    return QUERIES["corpus_curation_v9"](spark, SF).collect()


def test_v9_funnel_monotone_and_lid_agrees_with_metadata(v9_rows):
    """v9 semantics: the funnel is monotone per (source, pred_lang),
    and on THIS corpus (markers derive from the metadata lang) the
    LID prediction agrees with metadata almost everywhere — the
    content-over-metadata behavior is pinned separately by the
    cross-plant tests in test_lid.py."""
    assert v9_rows
    for r in v9_rows:
        assert (
            r["n_kept"] <= r["n_classifier"] <= r["n_gopher"]
            <= r["n_unique"] <= r["n_docs"]
        )
    match = sum(r["n_lang_match"] for r in v9_rows)
    total = sum(r["n_docs"] for r in v9_rows)
    assert match / total >= 0.95
    kept = sum(r["n_kept"] for r in v9_rows)
    assert 0 < kept < total


def test_capped_waterfall_reallocates_saturated_mass():
    from databridge_etl_tools_spark.operators.sampling import (
        capped_weighted_quotas,
        weighted_quotas,
    )

    w = {"a": 90, "b": 10, "c": 10}
    caps = {"a": 3, "b": 100, "c": 100}
    # one-shot: a's quota (≈ 16 of 20) mostly exceeds its cap of 3 —
    # min() would strand ~13 units; the waterfall hands them to b/c
    alloc = capped_weighted_quotas(w, caps, 20)
    assert alloc["a"] == 3
    assert sum(alloc.values()) == 20
    assert alloc["b"] + alloc["c"] == 17
    assert abs(alloc["b"] - alloc["c"]) <= 1  # equal weights
    # no caps binding -> identical to plain largest remainder
    loose = {s: 1000 for s in w}
    assert capped_weighted_quotas(w, loose, 20) == weighted_quotas(w, 20)
    # convergence well inside the unroll: extra rounds change nothing
    assert capped_weighted_quotas(w, caps, 20, rounds=20) == alloc
    # budget beyond total capacity saturates everything and stops
    tight = capped_weighted_quotas(w, {"a": 1, "b": 2, "c": 3}, 100)
    assert tight == {"a": 1, "b": 2, "c": 3}


def test_capped_waterfall_property_sweep():
    import random

    from databridge_etl_tools_spark.operators.sampling import (
        capped_weighted_quotas,
    )

    rng = random.Random(9)
    for _ in range(200):
        n = rng.randint(1, 10)
        w = {f"s{i}": rng.randint(0, 50) for i in range(n)}
        caps = {f"s{i}": rng.randint(0, 30) for i in range(n)}
        b = rng.randint(0, 300)
        alloc = capped_weighted_quotas(w, caps, b, rounds=n + 1)
        total_cap = sum(caps[s] for s in w if w[s] > 0)
        assert all(0 <= alloc[s] <= caps[s] for s in w)
        assert all(alloc[s] == 0 for s in w if w[s] == 0)
        # exact: drains the budget or saturates all positive-weight caps
        assert sum(alloc.values()) == min(b, total_cap) or b < 0


@pytest.fixture(scope="module")
def v10_rows(spark):
    load_all()
    return QUERIES["corpus_curation_v10"](spark, SF).collect()


def test_v10_waterfall_fills_the_budget_exactly(v10_rows):
    """v10 semantics: the funnel is monotone; the waterfall never
    over-allocates a source (alloc ≤ survivors), selection delivers
    exactly the allocation, and — the waterfall's whole point —
    the TOTAL kept equals min(budget, total supply), with no quota
    mass stranded on saturated sources."""
    assert v10_rows
    for r in v10_rows:
        assert (
            r["n_survivors"] <= r["n_classifier"] <= r["n_gopher"]
            <= r["n_unique"] <= r["n_docs"]
        )
        assert r["alloc"] <= r["n_survivors"]
        assert r["n_kept"] == r["alloc"]
    total_surv = sum(r["n_survivors"] for r in v10_rows)
    budget = total_surv // 2
    assert sum(r["n_kept"] for r in v10_rows) == min(budget, total_surv)


def test_weighted_quotas_rejects_negative_and_non_integer():
    """r12 advice: a negative weight would floor-divide toward -inf
    (negative quotas, desynced from the DuckDB twin's //); validate
    at entry like ridge_fit_multi validates lam."""
    import pytest

    with pytest.raises(ValueError, match="non-negative"):
        weighted_quotas({"a": -1, "b": 2}, 10)
    with pytest.raises(ValueError, match="non-negative"):
        weighted_quotas({"a": 1.5}, 10)
    with pytest.raises(ValueError, match="budget"):
        weighted_quotas({"a": 1}, 10.0)
    assert weighted_quotas({"a": 0, "b": 0}, 10) == {"a": 0, "b": 0}
