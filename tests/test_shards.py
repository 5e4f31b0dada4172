"""Training-shard export: determinism, balance, manifest fidelity."""

from __future__ import annotations

import json

import pytest

from databridge_etl_tools_spark.sinks.shards import assign_shards, write_training_shards


def test_shard_assignment_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.shard for r in assign_shards(df, "doc_id", 8).collect()}
    b = {
        r.doc_id: r.shard
        for r in assign_shards(df.repartition(7), "doc_id", 8).collect()
    }
    assert a == b  # partition-independent
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == set(range(8))
    assert max(c.values()) < 2 * min(c.values())  # hash-uniform balance
    # append stability: the first 100 rows keep their shards
    sub = {r.doc_id: r.shard for r in assign_shards(df.where("doc_id < 100"), "doc_id", 8).collect()}
    assert all(a[k] == v for k, v in sub.items())
    with pytest.raises(ValueError):
        assign_shards(df, "doc_id", 0)


def test_write_training_shards_manifest(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, key="doc_id", n_shards=4)
    assert manifest["total_rows"] == docs.count()
    assert len(manifest["shards"]) == 4
    assert sum(manifest["shards"].values()) == manifest["total_rows"]
    on_disk = json.load(open(f"{out}/_manifest.json"))
    assert on_disk == manifest
    # shards round-trip: same rows, shard column present and in range
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.where("shard < 0 OR shard >= 4").count() == 0
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
