"""Prepare-pipeline queries (SURVEY §2.3 P1-P6, §2.7 F4-F6/F10/F11/
F21/F22): header normalization, column mapping, drops, synthetic ids,
cell-level cleanup — the §3.1 load-prepare stage as one lineage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..registry import query, table


@query(
    "prepare_header_normalize",
    oracle="""
    SELECT c_custkey AS objectid, c_name AS cust_name
    FROM customer
    """,
    gate=False,
)
def prepare_header_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F6/F22: messy inbound headers (BOM, '#', OBJECTID_1 suffix,
    mixed case) normalized, then an explicit column mapping applied —
    the reference's load-time header pipeline
    (postgres/postgres.py:399-418, 651-680, 723-728) — followed by
    the P1 exclude_fields drop (Catalyst prunes the dropped column
    out of the parquet scan entirely)."""
    cust = table(spark, sf_dir, "customer")
    messy = cust.select(
        F.col("c_custkey").alias("OBJECTID_1"),
        F.col("c_name").alias("﻿Cust#Name"),
        F.col("c_acctbal").alias("Acct#Bal"),
    )
    return TX.normalize_headers(messy).drop("acct_bal")


@query(
    "prepare_synthetic_objectid",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS INTEGER) AS objectid, doc_id, source
    FROM documents
    """,
)
def prepare_synthetic_objectid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: synthetic objectid counter (airtable/airtable.py:107-109) as
    a deterministic ranking window over the natural key.

    Scale note: a global row_number forces a single-partition sort;
    at 100 TB the engine's non-oracle variant is
    ``monotonically_increasing_id`` (per-partition monotone, no
    shuffle) — the global counter exists for reference parity.
    """
    docs = table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    return docs.select(
        F.row_number().over(w).alias("objectid"), "doc_id", "source"
    )


@query(
    "prepare_cell_cleanup",
    oracle="""
    SELECT doc_id,
           regexp_replace(text, '\\x00', '', 'g')                    AS scrubbed,
           regexp_replace(text, '[^\\x00-\\x7F]|[''"<>]', '', 'g')   AS sanitized,
           CASE WHEN trim(lang) = '' THEN NULL ELSE lang END         AS lang_or_null,
           '{' || source || ',' || lang || '}'                       AS pg_array,
           CAST(to_json(string_split(text, ' ')[1:5]) AS VARCHAR)    AS first_words_json
    FROM documents
    """,
    gate=False,
)
def prepare_cell_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F10/F11/F4/F19/F21 cell-level cleanup as one projection:
    NUL scrub, ASCII sanitize, empty→NULL, JSON-bracket→PG-brace
    rewrite, and array-cell→JSON string (Knack/Airtable extract
    convention)."""
    docs = table(spark, sf_dir, "documents")
    json_style = F.format_string("[%s,%s]", "source", "lang")
    return docs.select(
        "doc_id",
        TX.scrub_null_bytes("text").alias("scrubbed"),
        TX.sanitize_ascii("text").alias("sanitized"),
        TX.empty_to_null("lang").alias("lang_or_null"),
        TX.array_braces(json_style).alias("pg_array"),
        TX.list_to_json(F.slice(F.split(F.col("text"), " "), 1, 5)).alias(
            "first_words_json"
        ),
    )
