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
