"""Sequence-packing contract: partitioning independence (the whole
point of concat-and-chunk binning) and boundary semantics."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databridge_etl_tools_spark.operators.packing import pack_sequences


def _twin(df, budget):
    # the naive single-partition global window — fine at test scale,
    # the scale-killer pack_sequences exists to avoid
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        df.withColumn("seq_start", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("seq_id", F.expr(f"seq_start DIV {budget}"))
    )


def test_pack_matches_global_window_twin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sized = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok")
    )
    got = {
        r.doc_id: (r.seq_id, r.seq_start)
        for r in pack_sequences(sized, "n_tok", budget=100).collect()
    }
    exp = {
        r.doc_id: (r.seq_id, r.seq_start)
        for r in _twin(sized, 100).collect()
    }
    assert got == exp and len(got) == docs.count()


def test_pack_partition_count_invariance(spark):
    sized = spark.createDataFrame(
        [(i, 10 + (i % 7)) for i in range(200)], "doc_id long, n_tok int"
    )
    a = {r.doc_id: r.seq_id for r in pack_sequences(sized, "n_tok", n_parts=1).collect()}
    b = {r.doc_id: r.seq_id for r in pack_sequences(sized, "n_tok", n_parts=32).collect()}
    assert a == b


def test_pack_boundary_semantics(spark):
    # budget 10: docs of 6 tokens each -> starts 0,6,12,18,24 ->
    # bins 0,0,1,1,2 (a doc belongs to the bin where it STARTS,
    # even when it straddles the cut)
    sized = spark.createDataFrame(
        [(i, 6) for i in range(5)], "doc_id long, n_tok int"
    )
    out = {r.doc_id: r.seq_id for r in pack_sequences(sized, "n_tok", budget=10).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_pack_property_random_sizes(spark):
    """Random sizes/ids: the distributed two-pass prefix sum must equal
    the exact python cumsum for every row (hypothesis-style sweep with
    fixed seeds, several shapes including zero-sized docs)."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        ids = sorted(rng.sample(range(100000), 150))
        sizes = [rng.choice([0, 1, 3, 50, 255, 256, 300]) for _ in ids]
        sized = spark.createDataFrame(
            list(zip(ids, sizes)), "doc_id long, n_tok int"
        )
        got = {
            r.doc_id: (r.seq_id, r.seq_start)
            for r in pack_sequences(sized, "n_tok", budget=256, n_parts=7).collect()
        }
        start = 0
        for i, n in zip(ids, sizes):
            assert got[i] == (start // 256, start), (seed, i)
            start += n
