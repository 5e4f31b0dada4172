"""Count-min sketch over the corpus token stream.

The mergeable fixed-size frequency summary (Cormode & Muthukrishnan
2005): L hash lanes × W buckets of counters; estimate(t) = min over
lanes of t's bucket — always ≥ the true count (one-sided error
≤ N/W with high probability). The streaming/approximate sibling of
the exact vocabulary count: at 100 TB you keep the 4×1024-counter
sketch, not the 10⁹-row exact table.

Engine-deterministic by construction: bucket assignment is the
repo's standard md5-prefix hash (``CAST('0x'||substr(md5(…),1,8) AS
BIGINT)`` reproduces it in DuckDB), and every counter is an exact
integer SUM — so unlike Spark's built-in
``count_min_sketch`` aggregate (seeded murmur, opaque binary), this
one is oracle-checkable bit-for-bit.

Scale shape: ONE token-keyed count shuffle (vocabulary-sized
output); the sketch itself is built from the vocabulary counts (not
the raw stream — same result, since the bucket sum is additive), so
lanes explode L× over the vocabulary, never over the corpus; the
L×W bucket table is bounded (KBs) and broadcast back for estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize
from .textstats import tokens


def _bucket(lane, token, width: int):
    """md5-prefix bucket in [0, width): lane-salted, engine-portable."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cms"), lane.cast("string"), F.lit(":"), token)),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return h % width


def countmin_table(counts: DataFrame, *, lanes: int = 4, width: int = 1024) -> DataFrame:
    """The L×W counter table ``(lane, bucket, bucket_n)`` from a
    ``(token, c)`` count table. Bucket sums are ADDITIVE, so building
    from the vocabulary counts (not the raw token stream) yields the
    identical sketch at vocabulary×L cost — and the same additivity
    is what makes the sketch a valid running STREAMING aggregate
    (``streaming.sketch.stream_countmin``)."""
    lane = F.explode(F.sequence(F.lit(0), F.lit(lanes - 1))).alias("lane")
    return (
        counts.select("token", "c", lane)
        .select(
            "c", "lane", _bucket(F.col("lane"), F.col("token"), width).alias("bucket")
        )
        .groupBy("lane", "bucket")
        .agg(F.sum("c").cast("bigint").alias("bucket_n"))
    )


def countmin_topk(
    docs: DataFrame,
    *,
    text_col: str = "text",
    lanes: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> DataFrame:
    """Build an L×W count-min sketch of the corpus token frequencies
    and report, for the exact top-``top_k`` tokens, the true count vs
    the sketch estimate: ``(rank, token, exact_n, cms_est, overest)``
    with ``overest = cms_est − exact_n ≥ 0`` (the one-sided error).

    The exact top-k is the honesty anchor (and compiles to
    TakeOrderedAndProject); the sketch is what survives at scale."""
    counts = materialize(
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lane = F.explode(F.sequence(F.lit(0), F.lit(lanes - 1))).alias("lane")
    cms = countmin_table(counts, lanes=lanes, width=width)
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    top = counts.withColumn("rank", F.row_number().over(w).cast("int")).where(
        F.col("rank") <= top_k
    )
    est = (
        top.select("rank", "token", F.col("c").alias("exact_n"), lane)
        .select(
            "rank",
            "token",
            "exact_n",
            "lane",
            _bucket(F.col("lane"), F.col("token"), width).alias("bucket"),
        )
        .join(F.broadcast(cms), ["lane", "bucket"])
        .groupBy("rank", "token", "exact_n")
        .agg(F.min("bucket_n").alias("cms_est"))
    )
    return est.select(
        "rank",
        "token",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("overest"),
    )


def kmv_minhashes(df: DataFrame, col: str, *, k: int = 64, salt: str = "kmv") -> DataFrame:
    """The k-minimum-values distinct-count sketch (Bar-Yossef et al.
    2002 / Beyer et al. 2007): hash every value with the repo's
    engine-portable md5-prefix hash, keep the k smallest DISTINCT
    hashes. Returns that bounded table ``(hv)`` — the sketch itself.

    Mergeable: the union of two sketches re-truncated to its k
    smallest values IS the sketch of the combined input
    (:func:`kmv_merge`; the property every partial-aggregation /
    cross-day rollup needs, pinned in tests/test_kmv.py).

    Scale shape: one map-side hash + distinct (token-keyed shuffle of
    the DISTINCT values — at 100 TB this is the same vocabulary-sized
    shuffle every distinct-count pays) + a ``TakeOrderedAndProject``
    for the k smallest. The sketch is k rows forever; estimates cost
    nothing more. Unlike Spark's built-in ``approx_count_distinct``
    (HLL++, opaque seeded registers) the KMV estimate is
    bit-reproducible in DuckDB SQL, so the whole estimator is
    oracle-checkable."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.where(F.col(col).isNotNull())
        .select(h.alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(sketches: "list[DataFrame]", *, k: int = 64) -> DataFrame:
    """Merge KMV sketches: union the min-hash sets, dedup, re-take
    the k smallest — exactly the sketch of the concatenated inputs."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, *, k: int = 64) -> "tuple[int, float]":
    """Distinct-count estimate from a KMV sketch: with fewer than k
    hashes the count is EXACT (= the sketch size); otherwise
    ``(k-1) · 2³² / h₍ₖ₎`` (the k-th minimum divides the hash space
    into k near-equal gaps). Returns ``(n_hashes, estimate)`` — a
    2-scalar driver collect over a k-row frame."""
    rows = sketch.agg(
        F.count(F.lit(1)).alias("nk"), F.max("hv").alias("m")
    ).collect()[0]
    nk = int(rows["nk"])
    if nk < k:
        return nk, float(nk)
    return nk, (k - 1) * 4294967296.0 / float(rows["m"])


def bucketmin_table(df: DataFrame, col: str, *, k: int = 64, salt: str = "kmv") -> DataFrame:
    """Stochastic-averaging distinct sketch: route each value's
    md5-prefix hash into one of ``k`` buckets (``hv % k``) and keep
    the per-bucket MINIMUM — ``(bucket, min_hv)``, ≤ k rows.

    This is KMV's streaming-safe sibling (Flajolet-Martin stochastic
    averaging): the per-bucket min is a plain ``groupBy().min()`` —
    bounded state a Structured Streaming aggregate can maintain
    forever (``streaming.sketch.stream_kmv``), while true bottom-k
    needs an order-by-limit no streaming plan allows. Merge = union +
    per-bucket min again. Estimator (:func:`bucketmin_estimate`):
    E[min of m uniforms] = 1/(m+1), so AVERAGE the k minima first and
    take ONE reciprocal — n̂ = k²·2³²/Σmin_b − k. (Per-bucket
    reciprocals Σ(2³²/min_b) look equivalent but E[1/min] diverges —
    the heavy-tail bias overestimated 3× in testing.) Higher variance
    than bottom-k KMV at equal k — the price of
    streaming-aggregability."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.where(F.col(col).isNotNull())
        .select(h.alias("hv"))
        .groupBy((F.col("hv") % k).alias("bucket"))
        .agg(F.min("hv").alias("min_hv"))
    )


def bucketmin_table_by(
    df: DataFrame, key, col: str, *, k: int = 64, salt: str = "kmv"
) -> DataFrame:
    """GROUPED bucket-min distinct sketch: per group, route each
    value's md5-prefix hash into one of ``k`` buckets and keep the
    per-(group, bucket) MINIMUM — the per-segment distinct-count
    sketch (distinct users per day, distinct tokens per source). One
    plain (group, bucket)-keyed aggregate: bounded state (≤ k rows
    per group), map-side combinable, mergeable across loads (union →
    per-bucket min), and NO per-group sort or bottom-k — the grouped
    shape true KMV can't have without a hot-key window (a group's
    distinct values all land in one task's order-by). Estimate per
    group column-side via :func:`bucketmin_estimate_col` — no driver
    collect grows with |groups|."""
    keys = [key] if isinstance(key, str) else list(key)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        df.where(F.col(col).isNotNull())
        .select(*keys, h.alias("hv"))
        .groupBy(*keys, (F.col("hv") % k).alias("bucket"))
        .agg(F.min("hv").alias("min_hv"))
    )


def bucketmin_estimate_col(sketch_by: DataFrame, key, *, k: int = 64) -> DataFrame:
    """Column-side grouped estimator for :func:`bucketmin_table_by`:
    n̂ = k²·2³²/Σmin_b − k with empty buckets counted as 2³² (the
    same mean-of-minima, single-reciprocal estimator as
    :func:`bucketmin_estimate` — per-bucket reciprocals diverge).
    The sum is exact integer arithmetic; the one division is a
    deterministic scalar double op, so the estimate itself is
    DuckDB-reproducible and oracle-checkable per group. Returns
    ``(key..., n_buckets, n_est)``."""
    keys = [key] if isinstance(key, str) else list(key)
    total = F.sum("min_hv") + F.lit(4294967296) * (k - F.count(F.lit(1)))
    return sketch_by.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (F.lit(float(k * k) * 4294967296.0) / total.cast("double") - F.lit(float(k)))
        .alias("n_est"),
    )


def kmv_minhashes_by(
    df: DataFrame,
    key,
    col: str,
    *,
    k: int = 64,
    salt: str = "kmv",
    est_safety: int = 8,
) -> DataFrame:
    """GROUPED bottom-k KMV sketches: per group, the k smallest
    distinct md5-prefix hashes of ``col`` — ``(key..., hv)``, ≤ k
    rows per group. Unlike the grouped bucket-min (which only
    estimates cardinality), the actual k-min SET supports SKETCH SET
    ALGEBRA: union (merge + re-truncate) and the Beyer et al. 2007
    Jaccard/intersection estimators (:func:`kmv_pair_overlap`).

    The naive grouped bottom-k is a hot-key hazard (a per-group
    window sorts each group's ENTIRE distinct-value set in one task —
    10⁸ distinct per group at corpus scale). Scale path here is a
    THRESHOLD PREFILTER: a grouped bucket-min pass estimates each
    group's cardinality V̂, every hash above
    ``est_safety · k · 2³² / V̂`` is discarded map-side (the true
    k-th minimum concentrates near ``k · 2³² / V``, so the filter
    passes ~est_safety·k rows per group), and only that sliver is
    window-sorted. Groups whose survivors come up short (V̂ was a
    ≥ est_safety× overestimate — beyond the estimator's error bars,
    but guarded anyway) are re-run unfiltered, so the OUTPUT is the
    exact bottom-k regardless: the prefilter is pure plumbing, never
    semantics, which is what lets an oracle reproduce the sketch
    with a plain per-group rank."""
    keys = [key] if isinstance(key, str) else list(key)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    from .materialize import materialize

    hv = materialize(
        df.where(F.col(col).isNotNull()).select(*keys, h.alias("hv")).distinct()
    )
    est = bucketmin_estimate_col(
        hv.groupBy(*keys, (F.col("hv") % k).alias("bucket")).agg(
            F.min("hv").alias("min_hv")
        ),
        keys,
        k=k,
    )
    thr = est.select(
        *keys,
        F.least(
            F.lit(float(2**32)),
            F.lit(float(est_safety * k) * float(2**32))
            / F.greatest(F.col("n_est"), F.lit(float(k))),
        ).alias("_thr"),
    )
    w = Window.partitionBy(*keys).orderBy("hv")
    cand = (
        hv.join(F.broadcast(thr), keys)
        .where(F.col("hv") <= F.col("_thr"))
        .withColumn("_rn", F.row_number().over(w))
    )
    got = cand.where(F.col("_rn") <= k).select(*keys, "hv")
    # escape hatch: a group with < k survivors re-runs unfiltered
    # (correct when its true cardinality is < k, and repairs any
    # pathological over-estimate) — exact bottom-k either way
    short = (
        got.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") < k)
        .select(*keys)
    )
    rerun = (
        hv.join(F.broadcast(short), keys, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(*keys, "hv")
    )
    return got.join(F.broadcast(short), keys, "left_anti").unionByName(rerun)


def kmv_pair_overlap(
    sketches: DataFrame, key: str, *, k: int = 64, max_groups: int = 1024
) -> DataFrame:
    """Sketch SET ALGEBRA over grouped KMV sketches (Beyer et al.
    2007): for every unordered group pair, merge the two k-min sets,
    keep the k smallest of the union, and estimate

    - ``est_jaccard`` = |{merged k-min} ∩ S_A ∩ S_B| / min(|merge|, k)
      (the denominator is the merge size when it is < k — both
      sketches exhaustive, so the estimate is the EXACT Jaccard,
      matching est_union's small-set special case; r7 advisor),
    - ``est_union``   = (k−1)·2³² / (k-th min of the merge) when the
      merge has k hashes (else the exact union size — both sets were
      exhaustive),
    - ``est_inter``   = est_jaccard · est_union.

    Everything is k-row arithmetic per pair — comparing every group
    pair costs |pairs|·k rows TOTAL, where the exact answer pays an
    inverted-index join over the full value sets. Deterministic
    (md5 hashes, integer memberships), so oracle-checkable.

    ``max_groups`` guards the QUADRATIC pair fan-out (|groups|²·k/2
    rows — r7 verdict): a bounded ``limit`` probe over the sketch
    table's distinct groups raises an actionable error before the
    pair join. All-pairs overlap is a few-groups operation by design;
    at large |groups| compare a chosen pair subset (filter the
    sketches to the groups you care about, or join a pairs table of
    candidates from LSH/blocking) instead of the full cross."""
    from .materialize import materialize

    # the sketch table is consumed FIVE times below (guard probe, ga,
    # gb, and both membership joins) and its upstream is the whole
    # bottom-k pipeline — materialize the ≤ |groups|·k-row result ONCE
    # (tiny checkpoint; this is the opposite regime from the
    # documented materialize-trap, where the checkpointed intermediate
    # was corpus-sized). r9: the r8 guard probe alone re-ran the
    # pipeline end-to-end and cost ~25% of the bench entry.
    sk = materialize(sketches.select(F.col(key).alias("_g"), "hv"))
    n_groups = sk.select("_g").distinct().limit(max_groups + 1).count()
    if n_groups > max_groups:
        raise ValueError(
            f"kmv_pair_overlap: more than max_groups={max_groups} "
            f"distinct groups in {key!r} — the all-pairs overlap is "
            "quadratic in |groups| (|pairs|·k rows). Compare a "
            "candidate pair subset instead (filter the sketch table "
            "to the groups of interest, or supply LSH/blocking "
            "candidates), or raise max_groups= explicitly."
        )
    ga = sk.select(F.col("_g").alias("ga")).distinct()
    gb = sk.select(F.col("_g").alias("gb")).distinct()
    pairs = ga.join(gb, F.col("ga") < F.col("gb"))
    ua = pairs.join(sk, F.col("ga") == F.col("_g")).select(
        "ga", "gb", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    ub = pairs.join(sk, F.col("gb") == F.col("_g")).select(
        "ga", "gb", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("hv")
    top = merged.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return top.groupBy("ga", "gb").agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("ovl"),
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.least(F.count(F.lit(1)), F.lit(k)).cast("double")
        ).alias("est_jaccard"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float((k - 1) * 2**32)) / F.max("hv").cast("double"))
        .alias("est_union"),
    )


def bucketmin_estimate(table: DataFrame, *, k: int = 64) -> float:
    """Distinct-count estimate from a bucket-min table:
    n̂ = k²·2³²/Σ min_b − k (mean-of-minima, single reciprocal —
    see :func:`bucketmin_table`). Empty buckets count as min = 2³²
    (no value seen → the minimum of zero uniforms is the full range).
    Bounded driver collect (≤ k rows)."""
    rows = table.collect()
    total = sum(float(r["min_hv"]) for r in rows) + 4294967296.0 * (k - len(rows))
    return float(k * k * 4294967296.0 / total - k)


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    denom: int = 500,
) -> DataFrame:
    """EXACT φ-heavy hitters (φ = 1/``denom``) in two passes with NO
    vocabulary-sized shuffle — the Misra-Gries candidate recipe:

    Pass 1 (map-side): each partition runs a Misra-Gries summary with
    ``k = 2·denom`` counters (one Arrow pass, bounded dict — the
    classic streaming frequent-items algorithm). Any item with global
    frequency ≥ n/denom has, by pigeonhole, density ≥ 1/denom in some
    partition, and MG with k > denom counters never evicts an item
    whose partition frequency exceeds n_p/k — so the union of
    partition summaries (≤ partitions·k rows, collected and
    broadcast) is a guaranteed SUPERSET of the answer.

    Pass 2: exact counts of candidates only (map-side ``isin`` filter
    → a candidate-sized groupBy) and the integer threshold test
    ``count·denom ≥ n`` — so the OUTPUT is exact and
    partition-layout-independent even though the intermediate
    candidate set is not.

    At 100 TB this replaces the full token groupBy (10⁹-row shuffle)
    with a bounded-candidate shuffle; the count-min sketch answers
    the same question approximately in one pass — this answers it
    EXACTLY in two. Returns ``(item, n)``."""
    import pandas as pd

    k = 2 * denom
    vals = df.select(F.col(col).cast("string").alias("_v")).where(
        F.col("_v").isNotNull()
    )

    def mg(batches):
        # batch-wise Misra-Gries (Agarwal et al. 2012 mergeable
        # summaries): aggregate each Arrow batch with value_counts,
        # merge into the summary, and when it exceeds k counters
        # subtract the (k+1)-th largest count from everything and
        # drop the non-positive — O(batch + k log k) per batch, vs
        # the textbook per-item eviction's O(n·k) worst case on
        # distinct-heavy partitions. The reduction preserves the
        # error bound (≤ n_p/(k+1) total decrement per item), so the
        # candidate-superset guarantee is unchanged.
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf["_v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {key: c - m for key, c in counters.items() if c > m}
        yield pd.DataFrame({"_v": list(counters.keys())})

    cands = materialize(vals.mapInPandas(mg, "_v string").distinct())
    n = vals.count()
    return (
        # candidates are ≤ partitions·k rows by construction — a
        # legitimate bounded broadcast (SCALE.md audit category)
        vals.join(F.broadcast(cands), "_v", "left_semi")
        .groupBy(F.col("_v").alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .where(F.col("n") * denom >= F.lit(n))
    )


def heavy_hitters_by(
    df: DataFrame,
    key,
    col: str,
    *,
    denom: int = 500,
    max_groups: int = 65536,
) -> DataFrame:
    """PER-GROUP exact φ-heavy hitters (φ = 1/``denom`` of each
    GROUP's rows) — :func:`heavy_hitters` with the Misra-Gries
    summaries keyed by group: pass 1 keeps an independent k=2·denom
    counter dict per (partition, group) (the pigeonhole argument is
    per group: an item with group frequency ≥ n_g/denom has density
    ≥ 1/denom among that group's rows in some partition, and a
    k-counter MG never evicts it there), pass 2 exact-counts the
    candidate (group, item) pairs and applies the integer threshold
    against the per-group totals — output exact and layout-
    independent. Candidates are ≤ partitions·|groups|·k rows, so the
    broadcast stays bounded while |groups|·k stays far below the
    vocabulary the full (group, token) shuffle would move; at large
    |groups| every group is small (pigeonhole on rows) and the plain
    grouped count IS the cheap plan. Returns
    ``(key..., item, n, n_group)``.

    ``max_groups`` bounds the per-(partition, group) executor MG
    state and the candidate broadcast (≤ partitions·|groups|·k rows
    — r7 verdict): the per-group totals aggregate runs FIRST (it is
    needed for the threshold test anyway) with a ``limit`` probe, and
    raises an actionable error before the MG pass builds any executor
    dict when the group key is too wide. At that cardinality every
    group is small by pigeonhole and the plain (group, item) count
    IS the cheap plan."""
    import pandas as pd

    keys = [key] if isinstance(key, str) else list(key)
    k = 2 * denom
    vals = df.select(
        *[F.col(c).cast("string").alias(f"_g{i}") for i, c in enumerate(keys)],
        F.col(col).cast("string").alias("_v"),
    ).where(F.col("_v").isNotNull())
    gcols = [f"_g{i}" for i in range(len(keys))]
    from .materialize import materialize

    totals = materialize(
        vals.groupBy(*gcols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_group"))
        .limit(max_groups + 1)
    )
    if totals.count() > max_groups:
        raise ValueError(
            f"heavy_hitters_by: more than max_groups={max_groups} "
            f"distinct groups in {keys!r} — per-(partition, group) "
            "Misra-Gries summaries and the candidate broadcast scale "
            "with |groups|·k. At this cardinality every group is "
            "small by pigeonhole: use the plain grouped count "
            "(groupBy(key, col).count() + a per-group threshold "
            "join), or raise max_groups= explicitly."
        )

    def mg(batches):
        sums: dict = {}
        for pdf in batches:
            vc = pdf.groupby(gcols, dropna=False)["_v"].value_counts()
            for idx, c in vc.items():
                g, v = tuple(idx[:-1]), idx[-1]
                d = sums.setdefault(g, {})
                d[v] = d.get(v, 0) + int(c)
            for g, d in sums.items():
                if len(d) > k:
                    m = sorted(d.values(), reverse=True)[k]
                    sums[g] = {key_: c - m for key_, c in d.items() if c > m}
        rows = [(*g, v) for g, d in sums.items() for v in d]
        yield pd.DataFrame(rows, columns=[*gcols, "_v"])

    schema = ", ".join(f"{c} string" for c in [*gcols, "_v"])
    cands = materialize(vals.mapInPandas(mg, schema).distinct())
    return (
        vals.join(F.broadcast(cands), [*gcols, "_v"], "left_semi")
        .groupBy(*gcols, "_v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .join(totals, gcols)
        .where(F.col("n") * denom >= F.col("n_group"))
        .select(
            *[F.col(g).alias(c) for g, c in zip(gcols, keys)],
            F.col("_v").alias("item"),
            "n",
            "n_group",
        )
    )
