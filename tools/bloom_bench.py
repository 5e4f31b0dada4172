"""Measure the bloom data-skipping crossover for keyed ingest.

``upsert_epoch``'s per-batch read cost is the thing blooms change:
classic probes scan the full accumulated ledger every micro-batch
(changed-row probe + anti-join), bloom probes touch only candidate
segments — O(delta) when the batch is all-new keys. This tool grows
one ledger to ``LEDGER`` rows in ``SEGMENTS`` keyed epoch commits,
then times an all-new-key batch commit three ways in ONE session:

- classic (BLOOM_MIN_ROWS forced above the ledger): full scans
- bloom, first over-threshold commit (re-covers bloom-less
  segments: the one-time self-healing cost)
- bloom, steady state (every segment covered): the per-batch cost a
  long-lived sink actually pays

Usage::

    python tools/bloom_bench.py [LEDGER] [BATCH] [SEGMENTS]
    # defaults 2_000_000 20_000 16

Prints one JSON line; record the numbers in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from databridge_etl_tools_spark.session import get_session  # noqa: E402
from databridge_etl_tools_spark.sources.table_store import TableStore  # noqa: E402


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.sha1(F.col("id").cast("string")).alias("v"),
    )


def _grow(spark, root: str, tag: str, ledger: int, segments: int,
          min_rows: int) -> TableStore:
    st = TableStore(spark, os.path.join(root, tag))
    st.BLOOM_MIN_ROWS = min_rows
    per = ledger // segments
    for e in range(segments):
        st.upsert_epoch(
            "t", _mk(spark, e * per, (e + 1) * per), ["doc_id"], e, scope="s"
        )
    return st


def _time_commit(st: TableStore, spark, lo: int, hi: int, epoch: int) -> float:
    t0 = time.time()
    assert st.upsert_epoch("t", _mk(spark, lo, hi), ["doc_id"], epoch, scope="s")
    return time.time() - t0


def main() -> None:
    ledger = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    segments = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_session("bloom_bench")
    root = tempfile.mkdtemp(prefix="bloom_bench_")
    try:
        # classic: threshold above everything, blooms never engage
        st_c = _grow(spark, root, "classic", ledger, segments, 1 << 60)
        # warm both code paths once
        _time_commit(st_c, spark, ledger, ledger + batch, segments)
        classic = [
            _time_commit(
                st_c, spark,
                ledger + (i + 1) * batch, ledger + (i + 2) * batch,
                segments + 1 + i,
            )
            for i in range(3)
        ]

        # bloom: grown on the classic path (threshold > ledger while
        # growing would be cheating the other way — grow it classic
        # so every segment starts BLOOM-LESS), then drop the
        # threshold: the first commit pays the one-time re-cover,
        # steady state pays the bloom-only probe
        st_b = _grow(spark, root, "bloom", ledger, segments, 1 << 60)
        st_b.BLOOM_MIN_ROWS = 0
        recover = _time_commit(st_b, spark, ledger, ledger + batch, segments)
        steady = [
            _time_commit(
                st_b, spark,
                ledger + (i + 1) * batch, ledger + (i + 2) * batch,
                segments + 1 + i,
            )
            for i in range(3)
        ]

        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(json.dumps({
            "ledger_rows": ledger, "batch_rows": batch,
            "segments": segments,
            "classic_per_batch_sec": round(med(classic), 2),
            "bloom_recover_sec": round(recover, 2),
            "bloom_steady_per_batch_sec": round(med(steady), 2),
            "speedup": round(med(classic) / med(steady), 2),
            "runs": {
                "classic": [round(x, 2) for x in classic],
                "steady": [round(x, 2) for x in steady],
            },
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
