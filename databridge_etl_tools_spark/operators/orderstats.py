"""Exact distributed order statistics via bucketed selection.

The scale-safe way to get an EXACT k-th smallest / median / quantile
boundary without the two anti-patterns exact quantiles usually drag
in: a global sort (single-partition Exchange) or a single-reducer
``percentile`` buffer holding every distinct value (the round-5
verdict's curation-median hazard). Classic two-phase selection
(Blum-style bucket refinement, the Münz/IQR textbook construction):

1. one bounded aggregate gets (min, max, count);
2. one map-side bucket assignment + one ``buckets``-row histogram
   shuffle locates the bucket containing rank k (driver cumsum over
   ``buckets`` rows — bounded collect);
3. recurse INTO that bucket (re-filter the base scan map-side —
   predicate-pushdown friendly, nothing materialized) until the
   candidate set fits ``max_rows_exact``, then a
   ``TakeOrderedAndProject``-shaped orderBy+limit resolves the exact
   value.

Depth is log_buckets(n / max_rows_exact): with the defaults (1024
buckets, 64 Ki rows) one level resolves ≤ 67 M rows, two levels
≤ 68 G — at 100 TB the histogram shuffles stay 1024 rows wide and the
corpus is only ever SCANNED, never sorted or shuffled.

Determinism: bucket assignment is pure scalar arithmetic on (v, lo,
hi) — identical IEEE ops on identical operands — and the final
in-bucket selection is an orderBy on the value alone, whose k-th
element is the k-th order statistic of the multiset regardless of
tie order. Safe for oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _resolve_exact(vals: DataFrame, resolve: "list[tuple]") -> "dict[int, float]":
    """Final in-bucket selection, BATCHED: all (k, lo, hi, rank)
    requests whose value ranges are pairwise disjoint resolve in ONE
    job — a range-tagged partitioned window (row_number within tag,
    pick the requested ranks). Equi-depth's n_bins-1 boundaries land
    in n_bins-1 disjoint buckets, so the whole final phase is one job
    instead of one TakeOrdered per boundary (bench: 7 jobs → 1).
    Overlapping or duplicate ranges (median's two middle ranks share
    a bucket) group by identical range first; genuinely overlapping
    distinct ranges fall back to per-range jobs."""
    from pyspark.sql import Window

    out: dict[int, float] = {}
    # merge requests with IDENTICAL ranges (multiple ranks, one tag)
    by_range: dict[tuple, list] = {}
    for k, lo, hi, rank in resolve:
        by_range.setdefault((lo, hi), []).append((k, rank))
    ranges = sorted(by_range)
    disjoint = all(
        ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1)
    )
    if not disjoint or len(ranges) == 0:
        for (lo, hi), wants in by_range.items():
            for k, rank in wants:
                out[k] = (
                    vals.where((F.col("_v") >= lo) & (F.col("_v") <= hi))
                    .orderBy("_v")
                    .limit(rank)
                    .agg(F.max("_v"))
                    .collect()[0][0]
                )
        return out
    tag = None
    cond = None
    for i, (lo, hi) in enumerate(ranges):
        inrange = (F.col("_v") >= F.lit(lo)) & (F.col("_v") <= F.lit(hi))
        cond = inrange if cond is None else (cond | inrange)
        tag = (
            F.when(inrange, F.lit(i))
            if tag is None
            else tag.when(inrange, F.lit(i))
        )
    wanted = [(i, rank) for i, r in enumerate(ranges) for _, rank in by_range[r]]
    pick = None
    for i, rank in wanted:
        hit = (F.col("_t") == F.lit(i)) & (F.col("_rn") == F.lit(rank))
        pick = hit if pick is None else (pick | hit)
    w = Window.partitionBy("_t").orderBy("_v")
    rows = (
        vals.where(cond)
        .select("_v", tag.alias("_t"))
        .withColumn("_rn", F.row_number().over(w))
        .where(pick)
        .collect()
    )
    got = {(int(r["_t"]), int(r["_rn"])): r["_v"] for r in rows}
    for i, r in enumerate(ranges):
        for k, rank in by_range[r]:
            out[k] = got[(i, rank)]
    return out


def _bucket_idx(v: Column, lo, hi, buckets: int) -> Column:
    """Map value → bucket 0..buckets-1 over [lo, hi]; the hi edge and
    any float-rounding overshoot clamp into the last bucket."""
    w = (hi - lo) / float(buckets)
    raw = F.floor((v - F.lit(lo)) / F.lit(w)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))


def kth_smallest(
    df: DataFrame,
    col: str,
    ks: "list[int]",
    *,
    buckets: int = 1024,
    max_rows_exact: int = 65536,
) -> "dict[int, float]":
    """Exact k-th smallest values (1-based ranks over non-null rows)
    for every k in ``ks``, as ``{k: value}``.

    Level-SYNCHRONIZED descent (round-6 bench finding: per-rank
    independent descents cost 7× the jobs for equi-depth boundaries):
    all pending ranks sharing a value range share ONE histogram and
    ONE target-bucket min/max aggregate per level — at level 1 that
    means 2 jobs total regardless of how many ranks were asked for.
    Each rank carries its bucket's count forward, so no per-rank
    count jobs exist at all; ranks whose candidate set fits
    ``max_rows_exact`` resolve with a ``TakeOrdered``-shaped
    orderBy+limit. See module docstring for the scale argument."""
    vals = df.select(F.col(col).alias("_v")).where(F.col("_v").isNotNull())
    st = vals.agg(
        F.min("_v").alias("lo"), F.max("_v").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n = int(st["n"])
    if n == 0:
        raise ValueError(f"kth_smallest: no non-null rows in {col!r}")
    bad = [k for k in ks if not 1 <= k <= n]
    if bad:
        raise ValueError(f"kth_smallest: ranks {bad} outside 1..{n}")
    out: dict[int, float] = {}
    # per-rank state: (k, lo, hi, rank-within-range, rows-in-range, cap)
    pending = [(k, st["lo"], st["hi"], k, n, max_rows_exact) for k in set(ks)]
    while pending:
        nxt, resolve = [], []
        for k, lo, hi, rank, cnt, cap in pending:
            if lo == hi:
                out[k] = lo
            elif cnt <= cap:
                resolve.append((k, lo, hi, rank))
            else:
                nxt.append((k, lo, hi, rank, cnt, cap))
        if resolve:
            out.update(_resolve_exact(vals, resolve))
        if not nxt:
            break
        # group unresolved ranks by identical range → one histogram +
        # one bucket-bounds aggregate per distinct range this level
        groups: dict[tuple, list] = {}
        for s in nxt:
            groups.setdefault((s[1], s[2]), []).append(s)
        pending = []
        for (lo, hi), states in groups.items():
            idx = _bucket_idx(F.col("_v"), lo, hi, buckets)
            ranged = vals.where((F.col("_v") >= lo) & (F.col("_v") <= hi))
            hist = ranged.groupBy(idx.alias("_b")).agg(F.count(F.lit(1)).alias("c")).collect()
            counts = {int(r["_b"]): int(r["c"]) for r in hist}
            cum, acc = {}, 0
            for b in sorted(counts):
                cum[b] = acc
                acc += counts[b]
            located = []  # (k, target bucket, rank-in-bucket, bucket count, cap)
            for k, _lo, _hi, rank, cnt, cap in states:
                target = None
                for b in sorted(counts):
                    if cum[b] + counts[b] >= rank:
                        target = b
                        break
                located.append((k, target, rank - cum[target], counts[target], cap))
            # ONE aggregate gets the ACTUAL value bounds of every
            # target bucket (guarantees progress even when float
            # width rounds oddly)
            targets = sorted({t for _, t, _, _, _ in located})
            bounds = {
                int(r["_b"]): (r["blo"], r["bhi"])
                for r in ranged.where(idx.isin(targets))
                .groupBy(idx.alias("_b"))
                .agg(F.min("_v").alias("blo"), F.max("_v").alias("bhi"))
                .collect()
            }
            for k, target, rank, cnt, cap in located:
                blo, bhi = bounds[target]
                if blo == lo and bhi == hi:
                    # degenerate refinement (pathological float
                    # spacing): force exact resolution next pass
                    cap = max(cap, cnt)
                pending.append((k, blo, bhi, rank, cnt, cap))
    return out


def exact_median(
    df: DataFrame, col: str, *, buckets: int = 1024, max_rows_exact: int = 65536
) -> "tuple[int, float]":
    """Exact interpolated median (``quantile_cont(0.5)`` semantics:
    even n averages the two middle order statistics) without a global
    sort or a single-reducer value buffer — the scale-safe exact
    variant the round-5 verdict asked the curation median to have.
    Returns ``(n, median)``."""
    n = df.where(F.col(col).isNotNull()).count()
    if n == 0:
        raise ValueError(f"exact_median: no non-null rows in {col!r}")
    k1, k2 = (n + 1) // 2, n // 2 + 1
    got = kth_smallest(
        df, col, sorted({k1, k2}), buckets=buckets, max_rows_exact=max_rows_exact
    )
    return n, (float(got[k1]) + float(got[k2])) / 2.0


def equi_depth_boundaries(
    df: DataFrame,
    col: str,
    n_bins: int,
    *,
    buckets: int = 1024,
    max_rows_exact: int = 65536,
) -> "list[float]":
    """Exact equi-depth bin boundaries: the order statistics at ranks
    ``floor(n·i/n_bins)`` for i = 1..n_bins-1 (n_bins-1 values,
    ascending). Rows then bin by value comparison (``1 + Σ[v > bᵢ]``)
    — map-side, no global sort, no ntile window over a single
    partition. The quantile-binning primitive behind length bucketing
    for sequence packing and score binning for curation."""
    n = df.where(F.col(col).isNotNull()).count()
    ranks = sorted({max(1, (n * i) // n_bins) for i in range(1, n_bins)})
    got = kth_smallest(df, col, ranks, buckets=buckets, max_rows_exact=max_rows_exact)
    return [got[max(1, (n * i) // n_bins)] for i in range(1, n_bins)]
