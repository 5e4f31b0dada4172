"""Merge-family operators: upsert, delete-stale, dedupe-by-key.

Re-expresses the reference's join-shaped semantics (SURVEY §2.4) as
set-based DataFrame plans:

- upsert          ⇄ ``INSERT ... ON CONFLICT DO UPDATE`` driver
                    (reference: postgres/postgres.py:1092-1273)
- delete_stale    ⇄ ``DELETE ... USING (... EXCEPT ...)``
                    (reference: postgres/postgres.py:1034-1090)
- dedupe_by_key   ⇄ AGO duplicate-feature cleanup
                    (reference: ago/ago.py:820-828)
- upsert_csv      ⇄ temp-table COPY + upsert
                    (reference: postgres/postgres.py:1182-1203)

Scale notes: every operator here is a single hash-shuffle on the
primary key (or zero shuffles when the staging side broadcasts —
Catalyst/AQE decides from size stats). At 100 TB, prod and staging
both hash-partition on PK; no driver-side collection anywhere. The
reference instead does a per-row server round-trip (AGO upsert) or a
server-side SQL join — the set-based plan is the algorithmic win.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key (first under ``order_by``).

    Reference parity: ago/ago.py:820-828 deletes the second feature
    sharing a primary key. Deterministic when ``order_by`` is a total
    order within each key group.
    """
    if not order_by:
        order_by = [F.col(k) for k in keys]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    prod: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    staging_order: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Overlay ``staging`` onto ``prod`` by primary key (staging wins).

    Equivalent to the reference's ``INSERT ... ON CONFLICT ON
    CONSTRAINT pk DO UPDATE SET col = EXCLUDED.col``
    (postgres/postgres.py:1092-1180). Postgres errors when staging
    holds duplicate PKs; we define deterministic first-wins under
    ``staging_order`` instead (documented divergence, SURVEY §7.3c).

    Plan shape: one shuffle on ``keys`` shared by the anti-join and
    the union; AQE broadcasts the staging side when small.
    """
    if staging_order is not None:
        staging = dedupe_by_key(staging, keys, staging_order)
    untouched = prod.join(staging.select(*keys), list(keys), "left_anti")
    return untouched.unionByName(staging.select(*prod.columns))


def stale_rows(prod: DataFrame, staging: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``prod`` whose key no longer exists in ``staging``.

    The reference computes this with ``EXCEPT`` then deletes by PK
    (postgres/postgres.py:1034-1090); an anti-join on the PK is the
    equivalent relational core and shuffles only on the key columns.
    """
    return prod.join(staging.select(*keys), list(keys), "left_anti")


def delete_stale(prod: DataFrame, staging: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``prod`` minus stale rows (semi-join on staging keys)."""
    return prod.join(staging.select(*keys), list(keys), "left_semi")


def record_diff(a: DataFrame, b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(added, subtracted) multiset diffs — the reference's test oracle
    ``etl.recorddiff`` (tests/test_postgres.py:70-93)."""
    return b.exceptAll(a), a.exceptAll(b)


def scd2_apply(
    hist: DataFrame,
    snap: DataFrame,
    keys: Sequence[str],
    track_cols: Sequence[str],
    batch_date: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: evolve a versioned
    history table against a new snapshot.

    ``hist`` carries ``keys + track_cols + valid_from + valid_to``
    (``valid_to`` NULL = the open version); ``snap`` carries
    ``keys + track_cols``. The new history:

    - an open row whose tracked attributes are unchanged stays open;
    - an open row whose attributes changed — or whose key left the
      snapshot — is CLOSED at ``batch_date``;
    - a changed or brand-new key gains a new open row effective
      ``batch_date``.

    Closed history rows pass through untouched (immutable audit
    trail). Attribute comparison is null-safe (``<=>``), so NULL→value
    and value→NULL both count as changes.

    Scale: ONE full-outer key-keyed shuffle join between the open
    slice and the snapshot (both sides co-partition); the closed
    slice is a pass-through union with no shuffle. This is the
    audit-grade extension of ``upsert`` — same join shape, plus
    validity interval bookkeeping; on a lakehouse the output is the
    table you MERGE back in one transaction."""
    keys = list(keys)
    track = list(track_cols)
    d = F.lit(batch_date).cast("date")
    open_rows = hist.where(F.col("valid_to").isNull())
    closed_rows = hist.where(F.col("valid_to").isNotNull())

    h = open_rows.select(
        *keys,
        *[F.col(c).alias(f"_h_{c}") for c in track],
        "valid_from",
    )
    s = snap.select(*keys, *[F.col(c).alias(f"_s_{c}") for c in track])
    # key-presence flags must not depend on attr nullability: derive
    # from marker columns instead
    j = (
        h.withColumn("_in_h", F.lit(True))
        .join(s.withColumn("_in_s", F.lit(True)), keys, "full_outer")
    )
    changed = F.lit(False)
    for c in track:
        changed = changed | ~F.col(f"_h_{c}").eqNullSafe(F.col(f"_s_{c}"))
    in_h = F.col("_in_h").isNotNull() & F.col("_in_h")
    in_s = F.col("_in_s").isNotNull() & F.col("_in_s")

    kept_open = j.where(in_h & in_s & ~changed).select(
        *keys,
        *[F.col(f"_h_{c}").alias(c) for c in track],
        "valid_from",
        F.lit(None).cast("date").alias("valid_to"),
    )
    to_close = j.where(in_h & (~in_s | changed)).select(
        *keys,
        *[F.col(f"_h_{c}").alias(c) for c in track],
        "valid_from",
        d.alias("valid_to"),
    )
    new_open = j.where(in_s & (~in_h | changed)).select(
        *keys,
        *[F.col(f"_s_{c}").alias(c) for c in track],
        d.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return (
        closed_rows.select(*keys, *track, "valid_from", "valid_to")
        .unionByName(kept_open)
        .unionByName(to_close)
        .unionByName(new_open)
    )
