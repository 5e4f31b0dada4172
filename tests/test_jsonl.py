"""JSONL source/sink: round trips (plain + gzip), malformed-line
quarantine, and mode semantics."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from databridge_etl_tools_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _rows(df):
    return sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect())


def test_jsonl_roundtrip_plain_and_gzip(spark, tmp_path):
    docs = _docs(spark)
    exp = _rows(docs)

    plain = str(tmp_path / "plain")
    write_jsonl(docs, plain, partitions=3)
    assert _rows(read_jsonl(spark, plain, SCHEMA)) == exp
    assert len(glob.glob(os.path.join(plain, "part-*.json"))) == 3

    gz = str(tmp_path / "gz")
    write_jsonl(docs, gz, compression="gzip", partitions=2)
    files = glob.glob(os.path.join(gz, "part-*.json.gz"))
    assert len(files) == 2  # sharded members — parallelism = file count
    with gzip.open(files[0], "rt") as f:
        assert f.readline().startswith("{")
    assert _rows(read_jsonl(spark, gz, SCHEMA)) == exp


def test_jsonl_quarantine_keeps_malformed_lines(spark, tmp_path):
    path = str(tmp_path / "dirty")
    os.makedirs(path)
    with open(os.path.join(path, "a.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write("{broken json!!\n")
        f.write('{"doc_id": 2, "text": "fine", "lang": "en", "source": "s", "n_chars": 4}\n')

    df = read_jsonl(spark, path, SCHEMA, quarantine=True)
    good = df.where(F.col(CORRUPT_COL).isNull())
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    assert "{broken json!!" in bad.collect()[0][CORRUPT_COL]

    # DROPMALFORMED silently drops the bad line
    dropped = read_jsonl(spark, path, SCHEMA, mode="DROPMALFORMED")
    assert dropped.count() == 2

    # FAILFAST aborts the read
    with pytest.raises(Exception):
        read_jsonl(spark, path, SCHEMA, mode="FAILFAST").collect()
