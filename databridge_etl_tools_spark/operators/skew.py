"""Skew-mitigation operators.

AQE's skew-join splitting handles join-side skew at runtime
(enabled in ``session.py``); these helpers cover the aggregation-side
pattern: two-phase (salted) aggregation for hot group keys, where a
single reducer would otherwise own a whole hot key's rows.

Algebra note: only algebraic aggregates (SUM/COUNT/MIN/MAX, and
AVG decomposed as SUM+COUNT) re-combine losslessly across salt
buckets — the result is bit-identical to the unsalted plan for
exact types (decimals/ints), which is what the oracle query checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (keys + salt) so a hot
    key spreads over ``salt_buckets`` reducers; phase 2 re-combines.

    ``aggs`` maps output name → (combiner, phase-1 expression) where
    combiner ∈ {"sum", "min", "max"}; COUNT is expressed as
    ("sum", F.count(...)).
    """
    # CAVEAT: monotonically_increasing_id is NONDETERMINISTIC under
    # task retry — safe HERE only because every supported combiner is
    # algebraic (sum/min/max commute with any bucket assignment), so
    # any salt partition yields the identical final answer. Do NOT
    # copy this salt into a non-algebraic context (e.g. collect_list,
    # first); use pmod(hash(stable_cols), n) there instead.
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()])
    )
    comb = {"sum": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[comb[c](f"_p_{name}").alias(name) for name, (c, _) in aggs.items()]
    )
