"""Per-entity event-sequence construction.

The training-example builder for sequential models (recommenders,
session models): gather each user's events in time order and keep the
most recent ``last_n`` — the fixed-length "interaction history"
feature.

Scale design: ONE user-keyed shuffle (the grouped collect); ordering
happens inside the aggregated array (``array_sort`` over
(ts, tiebreak, payload) structs), NOT via a global sort — so the
plan is a plain mergeable aggregation, deterministic under any
partitioning. The per-user array is bounded by that user's event
count; pathological power users are the caller's skew concern (cap
with a pre-filter or salt if one entity holds millions of events —
the truncation here happens AFTER collection, which is the correct
semantics for "most recent n" but means the collect sees all rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    payload_col: str = "event_type",
    last_n: int = 10,
) -> DataFrame:
    """Build ``(user, n_events, last_events)`` where ``last_events``
    is the payload of the user's final ``last_n`` events ordered by
    (``ts_col``, ``tiebreak_col``) — the tiebreaker makes the order
    total, so equal timestamps can't make the sequence
    partition-dependent."""
    if last_n < 1:
        raise ValueError("user_sequences: last_n must be >= 1")
    ev = events.select(
        F.col(user_col),
        F.struct(F.col(ts_col), F.col(tiebreak_col), F.col(payload_col)).alias("_e"),
    )
    agged = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_e")).alias("_seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    tail = F.slice(
        F.col("_seq"),
        F.greatest(F.size("_seq") - F.lit(last_n) + F.lit(1), F.lit(1)),
        last_n,
    )
    return agged.select(
        user_col,
        "n_events",
        F.transform(tail, lambda e: e[payload_col]).alias("last_events"),
    )
