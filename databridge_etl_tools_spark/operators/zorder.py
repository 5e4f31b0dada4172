"""Z-order (Morton) clustering for multi-dimensional data skipping.

Spark's built-in layout levers are one-dimensional: partitionBy
prunes on ONE directory key, and a range-sort tightens min/max file
statistics for ONE leading column while leaving every other column's
per-file range as wide as the table. Z-ordering interleaves the bits
of several columns into one sort key, so a range-partitioned,
sorted-within-partition write gives every participating column
LOCALLY NARROW per-file min/max ranges — and parquet row-group /
file statistics then let a predicate on ANY of the clustered columns
skip most of the data (the Delta Lake ``OPTIMIZE ZORDER BY`` recipe,
expressed as plain DataFrame ops).

Everything is JVM bit arithmetic: the z-value is a single column
expression (no UDF), the clustered write is one range shuffle —
write-once cost, amortized over every subsequent scan, exactly like
the bucketed-facts layout. Skipping effectiveness is MEASURED from
the written parquet footers (``file_column_ranges``), not asserted:
see tests/test_zorder.py for the planted contrast (z-ordered vs
time-sorted events: the same user predicate overlaps a small
fraction of files instead of all of them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: "list[Column | str]", bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of each column
    (non-negative ints; values are masked, so out-of-range values
    alias rather than error — callers with wide domains should
    rank/bucketize first). With the default 16 bits × ≤3 columns the
    result fits comfortably in a signed int64."""
    if not cols:
        raise ValueError("zvalue: need at least one column")
    if bits * len(cols) > 62:
        raise ValueError("zvalue: bits × columns must stay under 63")
    n = len(cols)
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint") for c in cols
    ]
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (b * n + j)))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Write ``df`` clustered by the z-order of ``cols``: one range
    shuffle on the z-value + an in-partition sort, then a plain
    parquet write (the z column itself is dropped — it exists only to
    arrange bytes). Row content is untouched.

    Each column is RANGE-NORMALIZED into [0, 2^bits) with
    ``width_bucket`` over its min/max (one bounded aggregate — 2
    scalars per column) before interleaving. This is the step naive
    z-ordering forgets: raw bit-interleave lets whichever dimension
    happens to occupy higher bit positions dominate the sort (a
    narrow-range column like a 0-14 user id contributes nothing
    against a 6-digit epoch-hour), degenerating to a 1-D sort.
    Equal-width buckets assume roughly uniform marginals; heavily
    skewed columns should be pre-ranked (quantile-bucketized)
    upstream — the Delta OPTIMIZE ZORDER implementation does the
    same range-id normalization."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    n_buckets = 1 << bits
    norm = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            norm.append(F.lit(0).cast("bigint"))
            continue
        # width_bucket returns n_buckets+1 AT the max bound — clamp so
        # the top value doesn't wrap past the bit mask to bucket 0
        norm.append(
            F.least(
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(n_buckets)
                )
                - 1,
                F.lit(n_buckets - 1),
            ).cast("bigint")
        )
    z = zvalue(norm, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, columns: "list[str]") -> "list[dict]":
    """Per-file min/max for ``columns`` from the parquet footers —
    the statistics a reader's predicate pushdown skips on. Driver-side
    metadata only (footer reads, no data pages)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins: dict = {c: None for c in columns}
        maxs: dict = {c: None for c in columns}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        out.append(
            {"file": os.path.basename(f), **{c: (mins[c], maxs[c]) for c in columns}}
        )
    return out


def overlap_fraction(ranges: "list[dict]", column: str, value) -> float:
    """Fraction of files whose [min, max] for ``column`` contains
    ``value`` — the files a point predicate CANNOT skip."""
    hit = sum(1 for r in ranges if r[column][0] <= value <= r[column][1])
    return hit / len(ranges) if ranges else 1.0
