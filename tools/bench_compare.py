"""Compare two bench.py JSON artifacts and separate plan regressions
from machine drift.

The round-4 lesson: a +26% uniform drift across untouched queries is
environment, not code — but proving that cost a manual re-bench. This
tool encodes the discipline: it computes the MEDIAN per-query ratio
(new/old) as the machine-speed factor, normalizes every query by it,
and flags only queries whose normalized ratio exceeds the threshold —
i.e., queries that got slower RELATIVE TO THE REST, which is what a
plan regression looks like.

Usage: python tools/bench_compare.py BENCH_old.json BENCH_new.json
       [--threshold 1.5]
Exit code 1 if any query is flagged.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    def payload(path: str) -> dict:
        # accept both the raw bench.py line ({"queries": ...}) and the
        # driver's BENCH_r{N}.json wrapper ({"parsed": {"queries": ...}})
        obj = json.load(open(path))
        if "queries" in obj:
            return obj
        return obj["parsed"]

    p_old, p_new = payload(args.old), payload(args.new)
    old, new = p_old["queries"], p_new["queries"]
    common = sorted(set(old) & set(new))
    if not common:
        print(json.dumps({"error": "no common queries"}))
        return 1
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    drift = statistics.median(ratios.values())
    # r7: when both artifacts carry the fixed CPU sentinel, its ratio
    # is a data-independent machine-speed measurement — report it next
    # to the median-query estimate (they should roughly agree; a
    # median ratio far above the sentinel ratio means the CODE got
    # uniformly slower, which the median alone would hide)
    sent = None
    if p_old.get("sentinel_sec") and p_new.get("sentinel_sec"):
        sent = round(p_new["sentinel_sec"] / p_old["sentinel_sec"], 3)
    flagged = {
        q: {"old": old[q], "new": new[q], "ratio": round(r, 3),
            "normalized": round(r / drift, 3)}
        for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r / drift > args.threshold
    }
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    print(
        json.dumps(
            {
                "n_common": len(common),
                "machine_drift_median_ratio": round(drift, 3),
                "sentinel_ratio": sent,
                "flagged_normalized_gt": args.threshold,
                "flagged": flagged,
                "added": added,
                "removed": removed,
            },
            indent=2,
        )
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
