"""ANALYZE-style column profiling — the table-statistics pass behind
the reference's vacuum/analyze lifecycle step (databridge_etl_tools
postgres/postgres.py VACUUM ANALYZE call sites; SURVEY §2.6 D9), done
as a queryable operator instead of a DB side effect: per column,
row/null/distinct counts and min/max, as a narrow (column, stats)
table a drift monitor can diff across loads.

Scale shape — two jobs, both Expand-free:

1. **scalar pass**: ONE aggregate computes every column's count,
   null count, and min/max (map-side combinable; no shuffle beyond
   the single scalar row). min/max are emitted as canonical STRINGS
   (numerics cast before comparison keeps NUMERIC ordering; the
   string form is just transport).
2. **distinct pass**: the frame UNPIVOTS map-side to (column, value)
   pairs (|cols| × rows, projection-only — no Expand node, columns
   are pruned to the profiled set) and ONE groupBy(column) counts
   distinct values. This deliberately avoids the multi-distinct
   single-aggregate spelling, whose Expand fans the input ×|cols|
   through ONE aggregation (the measured 48 s hazard documented at
   queries/relational.py approx_sketches); the unpivot does the same
   fan-out but map-side, feeding |cols| independent partial
   aggregates.

At 100 TB swap pass 2's count_distinct for approx_count_distinct (or
the HLL sketch column) — the pass-1 anchors stay exact either way;
the exact spelling here is what makes the profile oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(c: str, dt: T.DataType):
    """Canonical string form with type-correct ordering semantics."""
    col = F.col(c)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        col = F.when(~F.isnan(col), col)  # NaN sorts last in Spark, not DuckDB
    return col


def profile_columns(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Profile ``cols``: returns (col_name, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max as strings of the typed
    min/max (numeric ordering for numerics). ``n_distinct`` counts
    distinct non-null values; NaN counts as a value but is excluded
    from min/max (engines disagree on its ordering)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        dt = df.schema[c].dataType
        v = _canon(c, dt)
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"_null_{c}")
        )
        aggs.append(F.min(v).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(v).cast("string").alias(f"_max_{c}"))
    scalar = df.agg(*aggs)

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.value")
    distincts = (
        pairs.where(F.col("value").isNotNull())
        .groupBy("col_name")
        .agg(F.count_distinct("value").cast("bigint").alias("n_distinct"))
    )

    wide = scalar.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("_n").alias("n_rows"),
                        F.col(f"_null_{c}").alias("n_null"),
                        F.col(f"_min_{c}").alias("min_value"),
                        F.col(f"_max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select(
        "p.col_name", "p.n_rows", "p.n_null", "p.min_value", "p.max_value"
    )
    return wide.join(distincts, "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_null",
        F.coalesce(F.col("n_distinct"), F.lit(0).cast("bigint")).alias(
            "n_distinct"
        ),
        "min_value",
        "max_value",
    )


def key_census(
    counts: DataFrame,
    key_col: str,
    *,
    top: int = 10,
    parallelism: int = 32,
) -> DataFrame:
    """JOIN-KEY SKEW report over a ``(key, n)`` count table: the
    hottest ``top`` key values, their exact integer share (ppm of all
    occurrences), and the salting factor that would spread each hot
    key across ~task-sized slices at ``parallelism``-way execution
    (``ceil(parallelism·n/total)`` — >1 means salt or rely on AQE
    skew-join).

    Shared by the batch pre-flight (``join_skew_diagnostics``, which
    feeds it one map-side-combinable key count) and the streaming
    census (``streaming.sketch.stream_key_census``, whose drained
    state snapshot is the same (key, n) table — the report over an
    availableNow drain equals the batch report by construction).
    Plan shape: ``orderBy().limit(top)`` plans TakeOrderedAndProject
    (per-partition partial top-k, NO full-sort shuffle), and the
    rank/share arithmetic runs over the bounded ``top``-row result ×
    a broadcast scalar total."""
    from pyspark.sql import Window

    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    topk = counts.orderBy(F.desc("n"), F.asc(key_col)).limit(top)
    w = Window.orderBy(F.desc("n"), F.asc(key_col))
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            key_col,
            "n",
            F.expr("CAST(n * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
            F.expr(
                f"CAST(({int(parallelism)} * n + total - 1) DIV total AS BIGINT)"
            ).alias("rec_salt"),
        )
    )
