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


def hilbert_value(x: "Column | str", y: "Column | str", bits: int = 16) -> Column:
    """2-D Hilbert curve index of ``(x, y)`` (non-negative ints,
    masked to ``bits`` bits) — the locality-tighter alternative to
    the Morton interleave for two-column clustering: consecutive
    curve positions are always ADJACENT cells (Morton's bit
    interleave jumps across the plane at power-of-two boundaries),
    so a range-partitioned sort on the index yields files whose
    min/max boxes are more compact on BOTH columns.

    The classic per-bit quadrant descent (d += s²·((3·rx) ⊕ ry),
    rotate/flip, recurse) is a FOLD, so it's expressed as ONE
    ``F.aggregate`` over the bit levels with a (d, m, s, cx, cy)
    struct accumulator. Chained ``when``-rewrites of (x, y) would be
    the codegen-friendly spelling, but each level references the
    previous level's expressions ~3× and Catalyst trees share
    nothing — the tree grows 3^bits nodes and bits=10 OOMs the
    driver at plan construction (measured). The HOF lambda is
    interpreted, but it reads only accumulator VALUES — ~``bits``
    scalar ops per row, paid once in a write-once clustering path.
    Divisions are by powers of two on sub-2³¹ ints (exponent-only —
    exact in binary floating point). Pinned bit-exact against a
    python twin and bijectivity/adjacency-validated in tests. 2-D
    only: the d>2 generalization needs Gray-code state tables; use
    :func:`zvalue` there."""
    if not 1 <= bits <= 29:
        raise ValueError("hilbert_value: bits must be in 1..29")
    mask = (1 << bits) - 1
    cx0 = (F.col(x) if isinstance(x, str) else x).cast("bigint").bitwiseAND(
        F.lit(mask)
    )
    cy0 = (F.col(y) if isinstance(y, str) else y).cast("bigint").bitwiseAND(
        F.lit(mask)
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("d"),
        F.lit(4 ** (bits - 1)).cast("bigint").alias("m"),
        F.lit(1 << (bits - 1)).cast("bigint").alias("s"),
        cx0.alias("cx"),
        cy0.alias("cy"),
    )

    def step(acc, _i):
        s = acc["s"]
        rx = F.floor(acc["cx"] / s).cast("bigint") % 2
        ry = F.floor(acc["cy"] / s).cast("bigint") % 2
        # quadrant rotation: ry=1 → identity; ry=0, rx=0 → swap;
        # ry=0, rx=1 → flip both ACROSS THE FULL ORDER (2^bits − 1 −
        # coord, the Wikipedia rot(n, …) form), then swap. The flip
        # must use the full order, not the level size s: s−1−coord
        # goes NEGATIVE for coords above s, and negative ``%``/``&``
        # semantics differ between engines (Python's infinite
        # two's-complement vs SQL's sign-of-dividend) — the full-
        # order flip keeps every intermediate in [0, 2^bits).
        nx = (
            F.when(ry == 1, acc["cx"])
            .when(rx == 0, acc["cy"])
            .otherwise(F.lit(mask) - acc["cy"])
        )
        ny = (
            F.when(ry == 1, acc["cy"])
            .when(rx == 0, acc["cx"])
            .otherwise(F.lit(mask) - acc["cx"])
        )
        return F.struct(
            (acc["d"] + acc["m"] * (rx * 3).bitwiseXOR(ry)).alias("d"),
            F.floor(acc["m"] / 4).cast("bigint").alias("m"),
            F.floor(s / 2).cast("bigint").alias("s"),
            nx.alias("cx"),
            ny.alias("cy"),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)), init, step, lambda acc: acc["d"]
    )


def quantile_buckets(
    df: DataFrame, col: str, n_buckets: int = 64, rel_err: float = 0.001
) -> Column:
    """Quantile-rank bucketization in [0, n_buckets): the pre-ranking
    step skewed columns need before z-ordering (equal-width buckets
    collapse a power-law column into one hot bucket and the dimension
    stops contributing to the interleave).

    Scale-correct construction: boundaries come from
    ``approxQuantile`` (Greenwald-Khanna sketch — one pass, driver
    holds n_buckets-1 bounded scalars, NEVER a global sort or an
    unpartitioned rank window), and assignment is a codegen-friendly
    sum of ``value >= boundary`` comparisons — plain column
    arithmetic, no interpreted HOF lambda. Duplicate boundaries
    (very heavy skew) merge buckets monotonically."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(col, qs, rel_err)
    c = F.col(col).cast("double")
    b = F.lit(0).cast("bigint")
    for v in bounds:
        b = b + (c >= F.lit(float(v))).cast("bigint")
    return b


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    n_files: int = 16,
    bits: int = 10,
    normalize: str = "width",
    curve: str = "morton",
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
    ``normalize="width"`` (equal-width ``width_bucket`` over min/max)
    assumes roughly uniform marginals; ``normalize="quantile"`` uses
    :func:`quantile_buckets` (sketch-derived rank buckets — one extra
    pass) for heavily skewed columns, the same range-id
    normalization Delta's OPTIMIZE ZORDER performs."""
    if normalize not in ("width", "quantile"):
        raise ValueError(f"write_zordered: unknown normalize {normalize!r}")
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"write_zordered: unknown curve {curve!r}")
    if curve == "hilbert" and len(cols) != 2:
        raise ValueError("write_zordered: curve='hilbert' needs exactly 2 columns")

    def _curve(norm):
        # ``curve="hilbert"`` swaps the interleave for the 2-D Hilbert
        # index — same normalization, same write; tighter per-file
        # boxes (consecutive curve cells are adjacent, so range-sorted
        # files cover compact regions instead of Morton's
        # power-of-two-boundary jumps)
        if curve == "hilbert":
            return hilbert_value(norm[0], norm[1], bits=bits)
        return zvalue(norm, bits=bits)

    n_buckets = 1 << bits
    if normalize == "quantile":
        norm = [quantile_buckets(df, c, n_buckets=min(n_buckets, 64)) for c in cols]
        z = _curve(norm)
        (
            df.withColumn("_z", z)
            .repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(path)
        )
        return
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
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
    z = _curve(norm)
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
    ``value`` — the files a point predicate CANNOT skip. A file with
    no statistics for the column (all-null column, stats disabled)
    has a (None, None) range and counts as a hit: a reader cannot
    skip what it cannot bound (advisor finding r5)."""
    hit = sum(
        1
        for r in ranges
        if r[column][0] is None
        or r[column][1] is None
        or r[column][0] <= value <= r[column][1]
    )
    return hit / len(ranges) if ranges else 1.0
