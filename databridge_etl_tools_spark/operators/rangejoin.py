"""Interval/range join — an operator Spark lacks natively
(SURVEY §4 extension; guide's 'as-of / range join' family).

Joining points to intervals with NO equi-key degenerates to a
broadcast nested-loop join in Spark (fine only when one side is
tiny). The scale path bucketizes the range dimension: every interval
explodes into the fixed-width buckets it overlaps, points map to
their bucket, and the join becomes an equi-join on the bucket id
plus a residual containment filter — O(points + intervals·span)
instead of O(points·intervals), shuffling on a well-distributed key.

Bucket width trades explosion factor (span/width rows per interval)
against candidate precision (points sharing a bucket but outside the
interval are filtered post-join). Width ≈ median interval length is
the standard choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.datetimes import epoch_bucket


def _bucket_of(ts: Column, width_minutes: int) -> Column:
    # floor semantics (pre-1970 safe) via the shared datetimes helper
    return epoch_bucket(ts, width_minutes * 60_000_000)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    width_minutes: int = 1440,
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (half-open), via bucketized equi-join.

    Columns from both inputs are preserved (name collisions are the
    caller's to resolve).

    ``how``: ``'inner'`` or ``'left'`` (= ``'left_outer'``, points
    side preserved). The outer variant is the common enrichment shape
    (reference analogue: the AIS geocoder's keep-unmatched-rows
    left-join semantics, ais_geocoder/ais_geocoder.py:40-114): the
    inner bucketized join plus a bucketized ANTI join for the
    unmatched points — both hash joins on the bucket id with the
    containment residual, so the plan stays nested-loop-free and the
    left side is scanned a bounded number of times regardless of
    interval count.

    ``broadcast_intervals=True`` hints Catalyst to broadcast the
    exploded interval side. The explode erases the interval table's
    size estimate, so the planner can otherwise pick the POINTS side
    for the broadcast build (observed at sf0.1: a 600k-row events
    hash relation rebuilt per query, 5× slower than the hinted plan).
    Set it when intervals are dimension-sized; leave False when both
    sides are large — the bucketized equi-join then runs as a regular
    shuffle join, which is the 100 TB-safe shape.
    """
    if how not in ("inner", "left", "left_outer"):
        raise NotImplementedError(
            "bucketized interval_join supports how='inner' and 'left'"
        )
    p = points.withColumn("_pb", _bucket_of(F.col(point_ts), width_minutes))
    iv = intervals.withColumn(
        "_buckets",
        F.sequence(
            _bucket_of(F.col(start_ts), width_minutes),
            # end is exclusive, but a point in the end's bucket can
            # still precede it — include the boundary bucket and let
            # the residual filter decide
            _bucket_of(F.col(end_ts), width_minutes),
        ),
    ).withColumn("_pb", F.explode("_buckets")).drop("_buckets")
    if broadcast_intervals:
        iv = F.broadcast(iv)
    contained = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    inner = p.join(iv, "_pb").where(contained).drop("_pb")
    if how == "inner":
        return inner
    # left outer: matched rows from the inner join, plus points with
    # NO containing interval via a bucket-equi ANTI join (the residual
    # rides in the join condition, so "shares a bucket but outside the
    # interval" rows correctly still count as unmatched), padded with
    # typed nulls for the interval columns.
    pa, iva = p.alias("p"), iv.alias("iv")
    unmatched = pa.join(
        iva,
        (F.col("p._pb") == F.col("iv._pb"))
        & (F.col(f"p.{point_ts}") >= F.col(f"iv.{start_ts}"))
        & (F.col(f"p.{point_ts}") < F.col(f"iv.{end_ts}")),
        "left_anti",
    ).drop("_pb")
    null_iv = [
        F.lit(None).cast(f.dataType).alias(f.name) for f in intervals.schema.fields
    ]
    return inner.unionByName(unmatched.select("*", *null_iv))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: "list[str] | str",
    left_on: str = "ts",
    right_on: str = "ts",
    value_cols: "list[str] | None" = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Generic as-of join (Spark has no native one): for every left
    row, the nearest right row of the same ``by`` group at
    ``right_on <= left_on`` (backward) or ``>=`` (forward),
    optionally within ``tolerance_us`` microseconds.

    Implementation: union-tag both sides, sort per group by
    (timestamp, tag) — right rows sort before left at equal
    timestamps, so an exact-tie right row IS matchable — and carry
    the latest right payload forward with a running
    ``last(..., ignorenulls)`` window (forward direction runs the
    same plan on the reversed timestamp order). ONE shuffle on the
    group key, never a range join, never a per-row subquery — the
    same cost as a groupBy at any scale. Every left column survives;
    the match arrives as ``asof_<right_on>`` plus the requested
    ``value_cols``; tolerance violations null the whole match
    (pandas ``merge_asof`` semantics — the tests' independent twin).
    When multiple right rows share one (``by``, ``right_on``) value,
    the greatest (timestamp, value_cols) payload struct wins — a
    deterministic, partition-independent tiebreak.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols or [])
    clash = sorted(set(value_cols) & set(left.columns))
    if clash:
        raise ValueError(f"asof_join: value_cols collide with left columns: {clash}")
    extra = [c for c in left.columns if c not in by]

    payload = F.struct(
        F.col(right_on).alias("_t"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(*by, F.col(right_on).alias("_ts"), payload.alias("_p"))
    for c in extra:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_tag", F.lit(0))
    l = (
        left.withColumn("_ts", F.col(left_on))
        .withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
        .withColumn("_tag", F.lit(1))
    )
    cols = by + extra + ["_ts", "_p", "_tag"]
    tagged = r.select(*cols).unionByName(l.select(*cols))

    # _p last in the order: when multiple right rows share the same
    # (by, right_on), the carried match is the one with the greatest
    # payload struct — a total, partition-independent tiebreak (the
    # repo's determinism contract), not whichever row a partitioning
    # happened to sort last. Left rows all carry NULL _p (sorted
    # first within their tag group), which cannot affect the
    # right-row carry.
    order = (
        [F.col("_ts"), F.col("_tag"), F.col("_p")]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_tag"), F.col("_p")]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "_m", F.last(F.when(F.col("_tag") == 0, F.col("_p")), ignorenulls=True).over(w)
    ).where(F.col("_tag") == 1)

    matched_ts = F.col("_m._t")
    ok = matched_ts.isNotNull()
    if tolerance_us is not None:
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        delta = (
            us(F.col("_ts")) - us(matched_ts)
            if direction == "backward"
            else us(matched_ts) - us(F.col("_ts"))
        )
        ok = ok & (delta <= tolerance_us)
    sel = [F.col(c) for c in by + extra]
    sel.append(F.when(ok, matched_ts).alias(f"asof_{right_on}"))
    for c in value_cols:
        sel.append(F.when(ok, F.col(f"_m.{c}")).alias(c))
    return carried.select(*sel)
