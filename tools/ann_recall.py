"""Measure ANN recall vs. exact brute force on the embeddings table
(the "measure, don't guess" companion to SCALE.md's similarity
section): recall@k for LSH at several probe counts and for IVF at
several cell counts, with wall-clock per variant.

Usage: python tools/ann_recall.py [--sf /root/testdata/sf0.01] [--k 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(approx: dict, exact: dict) -> float:
    if not exact:
        return 0.0
    total = sum(len(approx.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact.items())
    return round(total / len(exact), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--query-mod", type=int, default=10,
                    help="measure on the vec_id %% N == 0 query sample")
    args = ap.parse_args()

    from databridge_etl_tools_spark.operators import similarity as S
    from databridge_etl_tools_spark.registry import table
    from databridge_etl_tools_spark.session import get_session

    spark = get_session("ann_recall")
    from pyspark.sql import functions as F

    emb = table(spark, args.sf, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    qpred = F.col("vec_id") % args.query_mod == 0

    t0 = time.time()
    exact = topk_sets(S.cosine_topk(emb, k=args.k, query_pred=qpred))
    t_exact = round(time.time() - t0, 2)

    report = {"sf": args.sf, "n_vectors": n, "n_queries": len(exact), "k": args.k, "exact_sec": t_exact,
              "lsh": {}, "ivf": {}}
    for probes in (1, 2, 4):
        t0 = time.time()
        approx = topk_sets(
            S.cosine_topk_lsh(emb, k=args.k, n_planes=8, dim=dim, n_probes=probes, query_pred=qpred)
        )
        report["lsh"][f"probes_{probes}"] = {
            "recall": recall(approx, exact), "sec": round(time.time() - t0, 2),
        }
    for cells in (4, 8, 16):
        centroids, assignments = S.kmeans_fit(emb, cells, iters=3)
        indexed = emb.join(assignments, "vec_id").localCheckpoint(eager=True)
        for nprobe in (1, 2, 4):
            t0 = time.time()
            approx = topk_sets(
                S.cosine_topk(
                    indexed, k=args.k, cell_col="cell", query_pred=qpred,
                    probe_cells=S.ivf_probe_cells("embedding", centroids, nprobe),
                )
            )
            report["ivf"][f"cells_{cells}_nprobe_{nprobe}"] = {
                "recall": recall(approx, exact), "sec": round(time.time() - t0, 2),
            }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
