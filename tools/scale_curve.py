#!/usr/bin/env python
"""Measured scale curves: sf0.1 -> derived sf~1 (10x key-shifted copies).

The repo's 100 TB story is argued from plan shapes (SCALE.md); this
tool measures it once. It derives an engine-local ~sf1 dataset --
each non-dimension table replicated ``--factor`` times (default 10)
with every surrogate key shifted by ``replica * 100M`` so joins stay
consistent inside a replica and replicas stay disjoint (the graph
queries see 10 disjoint copies of the purchase graph: same diameter,
same iteration count, 10x edges -- a clean weak-scaling probe).

The derived parquet lives under ``.scale/sf1`` (gitignored) and is
NEVER fed to the oracle gate: DuckDB comparisons always run on the
driver's read-only ``/root/testdata`` trees. This tool measures
wall-clock only.

Protocol per (query, sf): one unmeasured warm run (JIT / codegen),
then the MEDIAN OF 3 noop-materialized runs -- identical to bench.py.
Both SFs run in ONE session back to back, so the sentinel ratio is ~1
by construction and the sf1/sf0.1 ratio is directly interpretable:
~10x = linear in rows, >>10x = a super-linear plan to diagnose.

Usage:
  python tools/scale_curve.py --build            # derive .scale/sf1
  python tools/scale_curve.py [names...]         # measure (builds if needed)
  python tools/scale_curve.py --ab-pagerank      # raw vs bucketed edges at sf1
  python tools/scale_curve.py --ab-trustrank     # seeded walk, same contrast
  python tools/scale_curve.py --step2 [names...] # sf0.1 -> sf~1 -> sf~3 slope
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
OFFSET = 100_000_000  # > any sf0.1 key; replicas are disjoint key ranges

#: int64 surrogate keys to shift per replica; dims (region, nation)
#: are copied once -- replicas keep referencing the same 25 nations,
#: exactly how a 10x-bigger TPC-H world looks.
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}

#: default measurement set: the 10 slowest headline queries in
#: BENCH_LOCAL.json (r10), i.e. where a super-linear plan would hurt
#: most at 100 TB.
DEFAULT_QUERIES = [
    "graph_pagerank_weighted",
    "bpe_learn_merges_words",
    "graph_triangles_copurchase",
    "graph_pagerank_suppliers",
    "proj_pa_south_datum_pipeline",
    "sketch_quantile_rollup",
    "graph_affinity_distance",
    "graph_bfs_supplier_radius",
    "ann_ivf_kmeans",
    "approx_sketches",
]


def build(spark, src: str = SRC, dst: str = DST, factor: int = FACTOR) -> str:
    """Write the derived ~sf1 tree (skipped when the marker is fresh)."""
    from databridge_etl_tools_spark import registry

    marker = os.path.join(dst, "_SCALE_META.json")
    sig = {"src": src, "factor": factor, "offset": OFFSET}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == sig:
                return dst
    os.makedirs(dst, exist_ok=True)
    for name, keys in SHIFT.items():
        df = registry.table(spark, src, name)
        if keys:
            copies = [
                df.select(
                    *[
                        (F.col(c) + F.lit(i * OFFSET)).alias(c) if c in keys
                        else F.col(c)
                        for c in df.columns
                    ]
                )
                for i in range(factor)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            # spread write across tasks so the derived scan starts
            # with uniform splits (sf0.1 tables are single files)
            out = out.repartition(max(8, factor))
        else:
            out = df
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
        print(f"built {name} x{factor if keys else 1}", flush=True)
    with open(marker, "w") as f:
        json.dump(sig, f)
    return dst


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, reps: int = 3) -> float:
    fn()  # warm (codegen JIT; per-plan, not per-data)
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[reps // 2]


def measure(names: list[str]) -> None:
    from databridge_etl_tools_spark import registry
    from databridge_etl_tools_spark.session import get_session

    registry.load_all()
    spark = get_session("scale_curve")
    spark.sparkContext.setCheckpointDir(os.path.join(DST, "..", "ckpt"))
    build(spark)
    # python worker pool warmup (first pandas-UDF query pays forks)
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()
    rows = []
    for n in names:
        q = registry.QUERIES[n]
        t_small = timed(lambda: materialize(q(spark, SRC)))
        t_big = timed(lambda: materialize(q(spark, DST)))
        ratio = t_big / t_small if t_small else float("inf")
        rows.append((n, t_small, t_big, ratio))
        print(f"{n:34s} sf0.1={t_small:6.2f}s  sf~1={t_big:7.2f}s  "
              f"ratio={ratio:5.2f}x", flush=True)
    print(json.dumps({
        "factor": FACTOR,
        "rows": [
            {"query": n, "sf01_sec": round(a, 3), "sf1_sec": round(b, 3),
             "ratio": round(r, 2)} for n, a, b, r in rows
        ],
    }))


def dst_for(factor: int) -> str:
    """Derived-tree path for a replication factor (sf~{factor/10})."""
    if factor == FACTOR:
        return DST
    return os.path.join(os.path.dirname(DST), f"sf{factor // 10}")


def measure_step2(names: list[str], big_factor: int = 30) -> None:
    """The r11 watchlist probe: measure the SAME queries at sf0.1,
    sf~1 (10x) and sf~{big_factor/10} ({big_factor}x) in one session,
    and report the per-decade log-slope of each step — a flattening
    slope certifies the first step's ratio was fixed cost + linear
    tail, a steepening one flags a super-linear plan."""
    import math

    from databridge_etl_tools_spark import registry
    from databridge_etl_tools_spark.session import get_session

    registry.load_all()
    spark = get_session("scale_step2")
    spark.sparkContext.setCheckpointDir(os.path.join(DST, "..", "ckpt"))
    build(spark)
    dst3 = dst_for(big_factor)
    build(spark, dst=dst3, factor=big_factor)
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()
    rows = []
    for n in names:
        q = registry.QUERIES[n]
        t1 = timed(lambda: materialize(q(spark, SRC)))
        t2 = timed(lambda: materialize(q(spark, DST)))
        t3 = timed(lambda: materialize(q(spark, dst3)))
        s12 = math.log(t2 / t1) / math.log(FACTOR) if t1 else float("nan")
        s23 = (
            math.log(t3 / t2) / math.log(big_factor / FACTOR)
            if t2
            else float("nan")
        )
        rows.append((n, t1, t2, t3, s12, s23))
        print(
            f"{n:30s} sf0.1={t1:6.2f}s sf~1={t2:7.2f}s "
            f"sf~{big_factor // 10}={t3:7.2f}s  "
            f"slope1={s12:4.2f} slope2={s23:4.2f}",
            flush=True,
        )
    print(json.dumps({
        "factors": [1, FACTOR, big_factor],
        "rows": [
            {"query": n, "sf01_sec": round(a, 3), "sf1_sec": round(b, 3),
             "sf3_sec": round(c, 3), "slope_step1": round(x, 3),
             "slope_step2": round(y, 3)}
            for n, a, b, c, x, y in rows
        ],
    }))


def ab_trustrank() -> None:
    """Raw build+checkpoint vs bucketed edges_ready for the SEEDED
    walk (graph_trustrank_seeded's shape) at sf~1 — the r11 verdict
    asked whether the global walk's measured 1.50x layout win
    carries over to the personalized iteration."""
    from databridge_etl_tools_spark import layout, registry
    from databridge_etl_tools_spark.operators.graph import pagerank
    from databridge_etl_tools_spark.session import get_session

    registry.load_all()
    spark = get_session("scale_ab_tr")
    spark.sparkContext.setCheckpointDir(os.path.join(DST, "..", "ckpt"))
    build(spark)

    def seeds():
        return (
            registry.table(spark, DST, "supplier")
            .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
            .limit(5)
            .select((F.col("s_suppkey") * 2 + 1).alias("node"))
        )

    def edges_raw():
        ord_ = registry.table(spark, DST, "orders").select(
            "o_orderkey", "o_custkey")
        li = registry.table(spark, DST, "lineitem").select(
            "l_orderkey", "l_suppkey")
        pairs = ord_.join(li, ord_["o_orderkey"] == li["l_orderkey"]).select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        return pairs.select(
            F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
        ).unionByName(
            pairs.select(
                F.col("supp_node").alias("src"),
                F.col("cust_node").alias("dst"),
            )
        )

    t_raw = timed(
        lambda: materialize(pagerank(edges_raw(), iters=8, seeds=seeds()))
    )
    print(f"raw build+checkpoint: {t_raw:.2f}s", flush=True)
    layout.build_purchase_edges(spark, DST)
    eb = registry.table(spark, DST, "purchase_edges")
    t_bkt = timed(
        lambda: materialize(
            pagerank(
                eb.select("src", "dst"), iters=8,
                edges_ready=True, seeds=seeds(),
            )
        )
    )
    print(f"bucketed edges_ready: {t_bkt:.2f}s", flush=True)
    print(json.dumps({
        "mode": "trustrank", "raw_sec": round(t_raw, 2),
        "bucketed_sec": round(t_bkt, 2), "factor": FACTOR,
    }))


def ab_pagerank() -> None:
    """Raw build+checkpoint vs bucketed edges_ready pagerank at sf~1.

    The r9/r10 A/Bs at sf0.1 measured parity-or-worse for the layout
    (broadcast regime; build amortizes over only 8 iterations). This
    re-runs the same contrast on 10x the edges, where the shuffle
    regime and the per-iteration exchange actually bite.
    """
    from databridge_etl_tools_spark import layout, registry
    from databridge_etl_tools_spark.operators.graph import pagerank
    from databridge_etl_tools_spark.session import get_session

    registry.load_all()
    spark = get_session("scale_ab")
    spark.sparkContext.setCheckpointDir(os.path.join(DST, "..", "ckpt"))
    build(spark)

    def edges_raw():
        ord_ = registry.table(spark, DST, "orders").select("o_orderkey", "o_custkey")
        li = registry.table(spark, DST, "lineitem").select("l_orderkey", "l_suppkey")
        pairs = ord_.join(li, ord_["o_orderkey"] == li["l_orderkey"]).select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        return pairs.select(
            F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
        ).unionByName(
            pairs.select(
                F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
            )
        )

    t_raw = timed(lambda: materialize(pagerank(edges_raw(), iters=8)))
    print(f"raw build+checkpoint: {t_raw:.2f}s", flush=True)

    layout.build_purchase_edges(spark, DST)
    eb = registry.table(spark, DST, "purchase_edges")

    t_bkt = timed(
        lambda: materialize(
            pagerank(eb.select("src", "dst"), iters=8, edges_ready=True)
        )
    )
    print(f"bucketed edges_ready: {t_bkt:.2f}s", flush=True)
    print(json.dumps({"raw_sec": round(t_raw, 2), "bucketed_sec": round(t_bkt, 2),
                      "factor": FACTOR}))


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    if "--build" in argv:
        from databridge_etl_tools_spark.session import get_session

        build(get_session("scale_build"))
    elif "--ab-pagerank" in argv:
        ab_pagerank()
    elif "--ab-trustrank" in argv:
        ab_trustrank()
    elif "--step2" in argv:
        names = [a for a in argv if not a.startswith("--")]
        measure_step2(names or [
            "graph_trustrank_seeded", "graph_triangles_copurchase"])
    else:
        measure(argv or DEFAULT_QUERIES)
