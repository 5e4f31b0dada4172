"""Vocabulary build + document encoding: rank contract, OOV handling,
round-trip decode, empty-doc survival."""

from __future__ import annotations

import pytest

from databridge_etl_tools_spark.operators.vocab import build_vocab, encode_documents


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c a b"),
            (2, "b c d"),
            (3, ""),
        ],
        "doc_id long, text string",
    )


def test_vocab_rank_contract(spark):
    v = {r.token: (r.token_id, r["count"]) for r in build_vocab(_docs(spark)).collect()}
    # counts: a=3, b=3, c=2, d=1; ties rank lexicographically
    assert v == {"a": (0, 3), "b": (1, 3), "c": (2, 2), "d": (3, 1)}
    v2 = {r.token for r in build_vocab(_docs(spark), min_count=2).collect()}
    assert v2 == {"a", "b", "c"}
    v3 = {r.token for r in build_vocab(_docs(spark), max_size=2).collect()}
    assert v3 == {"a", "b"}


def test_encode_round_trip_and_oov(spark):
    docs = _docs(spark)
    vocab = build_vocab(docs, min_count=2)  # d is OOV
    enc = {r.doc_id: r for r in encode_documents(docs, vocab).collect()}
    assert enc[1].ids == [0, 1, 0, 2, 0, 1]
    assert (enc[1].n_tokens, enc[1].n_oov) == (6, 0)
    assert enc[2].ids == [1, 2, -1]  # d -> oov_id
    assert (enc[2].n_tokens, enc[2].n_oov) == (3, 1)
    # empty doc survives with an empty sequence
    assert enc[3].ids == [] and enc[3].n_tokens == 0 and enc[3].n_oov == 0
    # decode round-trip: ids map back to the original in-vocab tokens
    inv = {r.token_id: r.token for r in vocab.collect()}
    decoded = [inv.get(i, "<oov>") for i in enc[1].ids]
    assert decoded == ["a", "b", "a", "c", "a", "b"]


def test_encode_partition_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    vocab = build_vocab(docs, min_count=3)
    a = {r.doc_id: r.ids for r in encode_documents(docs.repartition(1), vocab).collect()}
    b = {
        r.doc_id: r.ids
        for r in encode_documents(docs.repartition(9, "text"), vocab).collect()
    }
    assert a == b and len(a) == 80
