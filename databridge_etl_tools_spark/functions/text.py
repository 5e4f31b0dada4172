"""Text / header scalar functions (SURVEY §2.7 F4-F6, F10-F11,
F20-F22) — all JVM-side column expressions or pure-Python name
helpers (no UDFs)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scrub_null_bytes(col: Column | str) -> Column:
    """F5: remove NUL bytes from a string column.

    Reference scrubs whole extracted CSV files
    (postgres/_cleanup.py:40-66); columnar scrub is the relational
    equivalent.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "\\x00", "")


def sanitize_ascii(col: Column | str) -> Column:
    """F10: strip non-ASCII characters plus ``' " < >`` from
    designated columns (reference: ago/ago.py:442-452)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[^\\x00-\\x7F]|['\"<>]", "")


def empty_to_null(col: Column | str) -> Column:
    """F11: empty/whitespace-only cells → NULL before REST upload
    (reference: ago/ago.py:457-459 nulls falsy values)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def array_braces(col: Column | str) -> Column:
    """F4: rewrite JSON-style ``[a,b]`` to Postgres array ``{a,b}`` —
    only needed at the PG edge (reference: postgres/postgres.py:420-443)."""
    c = F.col(col) if isinstance(col, str) else col
    inner = F.substring(c, 2, F.length(c) - 2)
    return F.when(
        c.rlike(r"^\[.*\]$"), F.concat(F.lit("{"), inner, F.lit("}"))
    ).otherwise(c)


def list_to_json(col: Column | str) -> Column:
    """F19/F21: serialize array/struct cells to JSON strings
    (reference: knack/knack.py:140-141, airtable/airtable.py:96-102)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_json(c)


_BOM = "﻿"


def snakecase(name: str) -> str:
    """F20: Knack label → snake_case column name with the reference's
    cleanup (``__``→``_``, ``_i_d``→``_id``; knack/knack.py:59-68)."""
    s = re.sub(r"[^0-9a-zA-Z]+", "_", name)
    s = re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", s).lower()
    s = re.sub(r"_+", "_", s).strip("_")
    s = s.replace("_i_d", "_id")
    return s


def normalize_headers(df: DataFrame, column_mapping: dict[str, str] | None = None) -> DataFrame:
    """F6/F22/P5: header normalization pipeline —

    - strip BOM from names (postgres/postgres.py:723-728)
    - lowercase (opendata/opendata.py:96-98)
    - ``#`` → ``_`` (postgres/postgres.py:399-415)
    - ``objectid_<n>`` → ``objectid`` when no objectid column exists
    - apply an explicit old→new mapping last (postgres/postgres.py:651-680)
    """
    renames: dict[str, str] = {}
    cols = list(df.columns)
    lowered = [c.lstrip(_BOM).lower().replace("#", "_") for c in cols]
    has_objectid = "objectid" in lowered
    out: list[str] = []
    for name in lowered:
        m = re.fullmatch(r"objectid_\d+", name)
        if m and not has_objectid:
            name = "objectid"
            has_objectid = True
        out.append(name)
    for old, new in zip(cols, out):
        if old != new:
            renames[old] = new
    df = df.withColumnsRenamed(renames)
    if column_mapping:
        df = df.withColumnsRenamed(dict(column_mapping))
    return df
