"""Vocabulary induction + document encoding.

The tokenizer-adjacent pair every training pipeline runs: build a
frequency-ranked token→id vocabulary from the corpus, then encode
documents into id sequences against it.

Scale design:

- ``build_vocab``: the corpus pays one explode + one token-keyed
  count — the output is VOCABULARY-sized (orders of magnitude
  smaller than the corpus). The final frequency rank is a global
  row_number window: a deliberate single-task sort over the
  vocabulary only (standard practice — a few million rows at worst;
  if a vocabulary ever outgrows one task, pre-aggregate with
  ``repartitionByRange`` and rank per range with offsets, the same
  two-phase recipe as ``operators.packing``).
- ``encode_documents``: the vocabulary joins back BROADCAST onto the
  exploded (doc, pos, token) stream — the corpus is never shuffled
  by token — and sequences reassemble with a struct-sorted
  collect_list, so the id order is exact and partition-independent.
  Unknown tokens map to ``oov_id`` and are counted per document
  (the OOV-rate QA signal).

Ranking is (count desc, token asc) — a total order, so ids are
engine-identical and stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize
from .textstats import tokens


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 1,
    max_size: int | None = None,
) -> DataFrame:
    """Frequency-ranked vocabulary: ``(token, token_id, count)`` with
    ``token_id`` dense from 0 in (count desc, token asc) order."""
    base = materialize(docs.select(tokens(F.col(text_col)).alias("_toks")))
    counts = (
        base.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    vocab = counts.withColumn("token_id", (F.row_number().over(w) - 1).cast("int"))
    if max_size is not None:
        vocab = vocab.where(F.col("token_id") < max_size)
    return vocab.select("token", "token_id", "count")


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> DataFrame:
    """Encode each document against the vocabulary: ``(<id_col>,
    n_tokens, n_oov, ids ARRAY<INT>)`` — ids in original token order,
    unknown tokens as ``oov_id``."""
    base = materialize(
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    )
    ex = base.select(id_col, F.posexplode_outer("_toks").alias("pos", "token"))
    joined = ex.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("int").alias("tid"),
        F.col("token_id").isNull().alias("_oov"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("pos").isNotNull(),
                        F.struct(F.col("pos"), F.col("tid")),
                    )
                )
            ).alias("_seq"),
            F.sum(
                F.when(F.col("pos").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("pos").isNotNull() & F.col("_oov"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("bigint").alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.transform(F.col("_seq"), lambda s: s["tid"]).alias("ids"),
        )
    )
