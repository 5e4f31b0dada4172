"""Service-lookup enrichment (SURVEY §2.4 J5): the AIS geocoder.

The reference calls ``/search/{address}`` once per row with a
5-attempt exponential-backoff retry and splices selected feature
properties into the row (ais_geocoder/ais_geocoder.py:40-114,
ais_request.py:6-26). Semantically it's a left join against a
service; physically each Arrow batch geocodes through one pooled
HTTP session per partition (the reference hoists its transformer out
of the row loop for the same reason — ago/ago.py:351-358).

Scale: rows/second is bounded by the service; parallelism = number
of partitions, so ``df.repartition(n)`` is the throughput knob; the
operation is idempotent (pure lookup), so Spark task retries are
safe here, unlike the edit sinks.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

DEFAULT_FIELDS = ("lon", "lat", "shape", "geocode_type", "match_type", "normalized")


def geocode_enrich(
    df: DataFrame,
    query_col: str,
    endpoint: str,
    fields: tuple[str, ...] = DEFAULT_FIELDS,
    remove_fields: tuple[str, ...] = (),
    retries: int = 5,
    timeout: float = 10.0,
) -> DataFrame:
    """Left-join ``df`` against the geocode service: adds ``fields``
    (null on miss) plus an ``_geocode_error`` count column semantics:
    per-row boolean ``geocoded``."""
    in_cols = [c for c in df.columns if c not in remove_fields]
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c in in_cols]
        + [f"{f} string" for f in fields]
        + ["geocoded boolean"]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        import requests

        from .rest import fetch_with_retry

        session = requests.Session()
        cache: dict[str, dict | None] = {}

        from urllib.parse import quote

        def lookup(q):
            if q in cache:
                return cache[q]
            try:
                r = fetch_with_retry(
                    session,
                    f"{endpoint}/search/{quote(q)}",
                    retries=retries,
                    timeout=timeout,
                )
                feats = r.json().get("features", [])
                props = feats[0].get("properties", {}) if feats else None
            except Exception:  # noqa: BLE001 - miss on any failure
                props = None
            cache[q] = props
            return props

        for pdf in batches:
            enriched = {f: [] for f in fields}
            ok = []
            for q in pdf[query_col].astype(str):
                props = lookup(q)
                ok.append(props is not None)
                for f in fields:
                    v = None if props is None else props.get(f)
                    # declared schema types every field string; AIS
                    # returns lon/lat as JSON numbers — stringify
                    enriched[f].append(None if v is None else str(v))
            out = pdf[in_cols].copy()
            for f in fields:
                out[f] = pd.Series(enriched[f], index=pdf.index, dtype="object")
            out["geocoded"] = ok
            yield out

    return df.select(*in_cols).mapInPandas(run, out_schema)
