"""Continuous-ingest cost model for the streaming curation funnel.

The funnel's 100 TB operating mode is a stream of micro-batches, so
its drain cost decomposes as::

    T(drain) = CONST + batches * FIXED + docs * MARGINAL

CONST is the per-drain query start/stop (availableNow machinery,
seconds — irrelevant to a long-lived stream), FIXED the per-batch
overhead (localCheckpoint, three epoch fences + commits, the KMV
read-merge-rewrite), MARGINAL the per-document screen cost. A
1000-executor deployment picks its trigger size from FIXED vs
MARGINAL: too-small batches pay FIXED per few docs, too-large ones
lose the latency the stream exists for.

Method: four drains in ONE Spark session — {full, half} corpus x
{BIG, SMALL} wave counts, fresh store/checkpoint each, models
trained offline once and loaded from the registry every time (the
production shape; fitting cost excluded by design). The 2x2 design
solves the three coefficients by differencing::

    FIXED    = mean over corpus sizes of (T_big - T_small)/(BIG-SMALL)
    MARGINAL = mean over wave counts of (T_full - T_half)/(docs/2)
    CONST    = mean residual

Also times the periodic FINALIZE job (corpus-global selection) once,
since deployments amortize it across many drains.

Usage::

    python tools/funnel_throughput.py [BIG] [SMALL]   # default 12 3

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

from databridge_etl_tools_spark.operators.lid import (  # noqa: E402
    LANGS,
    char_trigram_features,
    lid_fit,
    plant_markers,
)
from databridge_etl_tools_spark.operators.materialize import materialize  # noqa: E402
from databridge_etl_tools_spark.operators.models import save_models  # noqa: E402
from databridge_etl_tools_spark.operators.quality import (  # noqa: E402
    hashed_tf_features,
    quality_classifier_fit,
)
from databridge_etl_tools_spark.session import get_session  # noqa: E402
from databridge_etl_tools_spark.sources.table_store import TableStore  # noqa: E402
from databridge_etl_tools_spark.streaming.funnel import (  # noqa: E402
    curation_funnel_finalize,
    curation_funnel_stream_into_store,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stage_waves(docs, root: str, waves: int, tag: str) -> str:
    out = os.path.join(root, f"stage-{tag}")
    for w in range(waves):
        docs.filter(F.col("doc_id") % waves == w).coalesce(1).write.parquet(
            os.path.join(out, f"wave-{w}")
        )
    return out


def drain(spark, reg, staged: str, root: str, tag: str) -> float:
    store = TableStore(spark, os.path.join(root, f"store-{tag}"))
    ck = os.path.join(root, f"ck-{tag}")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged + "/*")
    )
    t0 = time.time()
    curation_funnel_stream_into_store(stream, store, reg, ck)
    dt = time.time() - t0
    print(f"drain {tag}: {dt:.2f}s", flush=True)
    return dt


def main() -> None:
    big = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("funnel_throughput")
    root = tempfile.mkdtemp(prefix="funnel_tp_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        half_docs = docs.filter(F.col("doc_id") % 2 == 0)
        n_full = docs.count()
        n_half = half_docs.count()

        # offline training job (v10's exact fit), persisted once
        reg = TableStore(spark, os.path.join(root, "reg"))
        planted = materialize(
            char_trigram_features(plant_markers(docs), d=16, cap=240)
        )
        lid_models = lid_fit(
            docs, d=16, cap=240, lam=1, holdout_mod=5, feats=planted
        )
        for m, lg in zip(lid_models, LANGS):
            m["label"] = lg
        qfeats = materialize(hashed_tf_features(docs, d=16))
        qmodel = quality_classifier_fit(docs, d=16, lam=1, feats=qfeats)
        save_models(reg, "models", "lid", lid_models)
        save_models(reg, "models", "quality", [qmodel])

        stages = {
            ("full", big): stage_waves(docs, root, big, f"full{big}"),
            ("full", small): stage_waves(docs, root, small, f"full{small}"),
            ("half", big): stage_waves(half_docs, root, big, f"half{big}"),
            ("half", small): stage_waves(half_docs, root, small, f"half{small}"),
        }

        # warm the whole drain code path once on a tiny slice
        tiny = stage_waves(docs.limit(200), root, 1, "tiny")
        drain(spark, reg, tiny, root, "warm")

        t = {
            key: drain(spark, reg, staged, root, f"{key[0]}{key[1]}")
            for key, staged in stages.items()
        }

        fixed = (
            (t[("full", big)] - t[("full", small)])
            + (t[("half", big)] - t[("half", small)])
        ) / (2 * (big - small))
        marginal = (
            (t[("full", big)] - t[("half", big)])
            + (t[("full", small)] - t[("half", small)])
        ) / (2 * (n_full - n_half))
        const = sum(
            t[(c, b)] - b * fixed - n * marginal
            for (c, b), n in [
                (("full", big), n_full), (("full", small), n_full),
                (("half", big), n_half), (("half", small), n_half),
            ]
        ) / 4

        store = TableStore(spark, os.path.join(root, f"store-full{big}"))
        t0 = time.time()
        rep = curation_funnel_finalize(spark, store, docs)
        n_rep = rep.count()
        t_fin = time.time() - t0

        print(json.dumps({
            "sf_dir": sf_dir, "docs": n_full, "big": big, "small": small,
            "drains_sec": {f"{c}_{b}": round(v, 2) for (c, b), v in t.items()},
            "const_per_drain_sec": round(const, 2),
            "fixed_per_batch_sec": round(fixed, 3),
            "marginal_per_doc_ms": round(marginal * 1e3, 4),
            "screen_docs_per_sec": (
                round(1.0 / marginal) if marginal > 0 else None
            ),
            "finalize_sec": round(t_fin, 2), "report_rows": n_rep,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
