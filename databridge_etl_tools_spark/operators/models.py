"""Model registry on the versioned TableStore: persist trained
linear heads (quality ridge, LID one-vs-rest) as plain rows and load
them back bit-exactly.

Production pipelines train offline and score online across many
jobs; the model must therefore OUTLIVE the fitting session. Every
model this engine fits is already a dict of plain integers/floats
(the integer-fixed-point discipline — ``b_int`` q30 weights,
``s_int``/``sy_int`` moment sums, one float intercept), so
persistence is one bounded row per (model, class): no pickling, no
engine-version coupling, and the stored form is itself auditable
SQL. Round-tripping is EXACT for the integer state; the float
intercept/rmse survive as IEEE doubles (parquet stores them
bit-for-bit), so a loaded model scores identically to the fitted
one (pinned in tests).

Layout (one table per registry, ``label`` distinguishes the heads of
a multiclass model; single-head models use label = ''):
``(name string, label string, d int, intercept double, rmse double,
n long, max_abs_q long, b_int array<long>, s_int array<long>,
sy_int long)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

MODEL_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("d", T.IntegerType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("rmse", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("max_abs_q", T.LongType()),
        T.StructField("b_int", T.ArrayType(T.LongType())),
        T.StructField("s_int", T.ArrayType(T.LongType())),
        T.StructField("sy_int", T.LongType()),
    ]
)


def _rows(name: str, models: "list[dict]") -> list:
    out = []
    for m in models:
        out.append(
            (
                name,
                str(m.get("label", "")),
                len(m["b_int"]),
                float(m["intercept"]),
                float(m.get("rmse", 0.0)),
                int(m["n"]),
                int(m.get("max_abs_q", 1 << 20)),
                [int(v) for v in m["b_int"]],
                [int(v) for v in m["s_int"]],
                int(m["sy_int"]),
            )
        )
    return out


def save_models(
    store, table: str, name: str, models: "list[dict] | dict"
) -> int:
    """Persist a fitted model (or the L heads of a multiclass model)
    under ``name``, replacing any prior version of that name while
    keeping other names (upsert-by-name on the bounded model table).
    Returns the number of head rows written."""
    if isinstance(models, dict):
        models = [models]
    spark = store.spark
    new = spark.createDataFrame(_rows(name, models), MODEL_SCHEMA)
    if store.exists(table):
        from pyspark.sql import functions as F

        kept = store.read(table).filter(F.col("name") != name)
        new = kept.unionByName(new)
    store.overwrite(table, new)
    return len(models)


def roundtrip_models(spark, named: "dict[str, list | dict]") -> dict:
    """Route freshly-fitted models through a throwaway registry store
    (save → load) so every downstream score runs on LOADED dicts —
    the in-query form of the train-offline/score-online production
    boundary, safe to gate on because the integer round-trip is
    bit-exact. ``named`` maps registry name → model dict (single
    head) or list of head dicts (multiclass; heads must carry their
    ``label``). Returns the loaded models in the same shape. The
    temp store is removed in ``finally`` (queries run inside
    bench/gate loops — leak-free)."""
    import shutil
    import tempfile

    from ..sources.table_store import TableStore

    reg_dir = tempfile.mkdtemp(prefix="dbt_model_reg_")
    try:
        reg = TableStore(spark, reg_dir)
        for name, m in named.items():
            save_models(reg, "models", name, m)
        return {
            name: (
                load_models(reg, "models", name)
                if isinstance(m, list)
                else load_models(reg, "models", name)[0]
            )
            for name, m in named.items()
        }
    finally:
        shutil.rmtree(reg_dir, ignore_errors=True)


def load_models(store, table: str, name: str) -> "list[dict]":
    """Load the heads saved under ``name`` in their original order
    (sorted by label — LANGS order for the LID model, '' for
    single-head models). Returns ``ridge_fit``-shaped dicts whose
    integer state is bit-identical to the fitted model's."""
    from pyspark.sql import functions as F

    from . import intlin as IL

    rows = (
        store.read(table)
        .filter(F.col("name") == name)
        .orderBy("label")
        .collect()
    )
    if not rows:
        raise KeyError(f"no model named {name!r} in {table!r}")
    out = []
    for r in rows:
        out.append(
            {
                "label": r["label"],
                # float weights derive from the SOLVER's fixed point
                # (intlin.Q_BETA, same divisor linear.py fits with) —
                # a hard-coded shift would silently de-sync the float
                # view from b_int if Q_BETA ever moved
                "weights": [
                    v / float(1 << IL.Q_BETA) for v in r["b_int"]
                ],
                "intercept": float(r["intercept"]),
                "rmse": float(r["rmse"]),
                "n": int(r["n"]),
                "max_abs_q": int(r["max_abs_q"]),
                "b_int": [int(v) for v in r["b_int"]],
                "s_int": [int(v) for v in r["s_int"]],
                "sy_int": int(r["sy_int"]),
            }
        )
    return out
