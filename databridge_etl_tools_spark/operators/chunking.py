"""Document chunking + segment-level exact dedup.

Two training-data operators the reference has no analog for (its row
transforms in `databridge_etl_tools/utils.py` are cell-level only):

- ``chunk_documents``: cut each document's token stream into
  fixed-size windows with a stride — overlapping windows
  (stride < size) are the RAG/context-window shape, disjoint windows
  (stride == size) are pretraining segments.
- ``dedup_segments``: CCNet-style sub-document exact dedup — the unit
  of deduplication drops from the whole document to the segment, so a
  boilerplate block repeated across millions of pages is removed
  everywhere while the surrounding novel text survives.

Scale design: chunking is pure map-side (tokenize → start offsets →
explode → slice; all JVM catalyst expressions, no Python, no
shuffle). The output grows by ~size/stride×, so chunk FIRST and
filter/select BEFORE wide downstream joins. Segment dedup adds
exactly ONE shuffle: the window over the segment fingerprint
(first-occurrence ranking); at 100 TB the fingerprint is a uniformly
distributed md5, so the shuffle has no skew by construction.

HOF gotchas honored (see SCALE.md): the token array is materialized
into a column before any lambda touches it; slice bounds derive from
the exploded start offset, never from a re-derived array; sequence()
bounds are clamped with greatest() so empty docs yield one empty
chunk instead of a descending sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into token windows.

    Returns ``(<id_col>, chunk_start INT, chunk_text STRING,
    n_chunk_tokens INT)`` — one row per window, starts at
    0, stride, 2·stride, … while the start lies inside the document
    (an empty document yields a single empty chunk at start 0, so no
    document silently disappears). The tail window may be shorter
    than ``size``; downstream callers filter on ``n_chunk_tokens``
    if they need full windows only."""
    if stride is None:
        stride = size
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    # NULL text must behave like empty text (one empty chunk at start
    # 0), not propagate: F.size(NULL) is -1, which would emit chunk
    # rows with n_chunk_tokens = -1 and silently skew downstream
    # retention sums (round-4 advisor finding).
    base = docs.select(
        F.col(id_col),
        F.coalesce(
            tokens(F.col(text_col)), F.expr("CAST(array() AS ARRAY<STRING>)")
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    # greatest(n-1, 0): sequence() with end < start descends instead of
    # returning empty — clamp so n == 0 yields [0]
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - F.lit(1), F.lit(0)), F.lit(stride)
    )
    exploded = base.select(
        id_col, "_toks", F.explode(starts).alias("_s")
    ).withColumn("_ctoks", F.slice(F.col("_toks"), F.col("_s") + F.lit(1), size))
    return exploded.select(
        id_col,
        F.col("_s").cast("int").alias("chunk_start"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
        F.size("_ctoks").cast("int").alias("n_chunk_tokens"),
    )


def dedup_segments(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 4,
) -> DataFrame:
    """Segment-level exact dedup over disjoint token windows.

    Chunks every document into disjoint ``size``-token segments,
    fingerprints each (md5 of the joined tokens), and marks the
    corpus-wide FIRST occurrence of every fingerprint — ordered by
    (<id_col>, chunk_start) so the keep decision is total-ordered and
    engine-independent. Returns the chunk columns plus
    ``is_first BOOLEAN``; callers keep ``is_first`` rows and
    reassemble, or aggregate per document for retention stats.

    One fingerprint-keyed shuffle (the ranking window); md5 keys are
    uniform, so no skew handling is needed."""
    segs = chunk_documents(
        docs, text_col=text_col, id_col=id_col, size=size, stride=size
    ).withColumn("seg_fp", F.md5("chunk_text"))
    w = Window.partitionBy("seg_fp").orderBy(F.asc(id_col), F.asc("chunk_start"))
    return segs.withColumn("is_first", F.row_number().over(w) == F.lit(1))


def segment_overlap_matrix(
    docs: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 4,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    groups (sources/domains/datasets), how many distinct
    ``size``-token segments they share — the shared-boilerplate /
    cross-leakage census run before mixing corpora.

    Shape: distinct (group, fingerprint) — one shuffle whose row
    count is bounded by groups × distinct segments — then a
    fingerprint-keyed self-join emitting ordered pairs. A fingerprint
    present in g groups yields g·(g-1)/2 pair rows: bounded by the
    GROUP count squared (tiny), never by the corpus, so the join
    cannot blow up on hot boilerplate. Returns
    ``(group_a, group_b, n_shared_segments)``."""
    segs = (
        chunk_documents(docs, text_col=text_col, id_col=id_col, size=size, stride=size)
        .where(F.col("n_chunk_tokens") > 0)
        .join(docs.select(id_col, group_col), id_col)
        .select(F.col(group_col).alias("g"), F.md5("chunk_text").alias("seg_fp"))
        .distinct()
    )
    a = segs.select(F.col("g").alias("group_a"), "seg_fp")
    b = segs.select(F.col("g").alias("group_b"), "seg_fp")
    return (
        a.join(b, "seg_fp")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_shared_segments"))
    )


def reassemble_deduped_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 4,
) -> DataFrame:
    """The full CCNet loop: segment → dedup → REASSEMBLE. Documents
    come back with their corpus-duplicate segments removed — surviving
    segments re-joined in original order — plus retention counters.

    Returns ``(<id_col>, clean_text STRING, n_segments, n_kept,
    n_tokens_kept)``. Order is restored with
    ``array_sort(collect_list(struct(chunk_start, chunk_text)))`` —
    sorting the collected structs makes the result independent of
    aggregation arrival order, so the output is deterministic under
    any partitioning (collect_list alone is not). A document whose
    every segment was seen elsewhere first yields an empty
    ``clean_text`` rather than disappearing.

    Adds one doc-keyed shuffle on top of ``dedup_segments``'s
    fingerprint window — the same two-shuffle budget as the stats
    query, with the document's segments grouped back together."""
    segs = dedup_segments(docs, text_col=text_col, id_col=id_col, size=size)
    kept_struct = F.when(
        F.col("is_first"), F.struct(F.col("chunk_start"), F.col("chunk_text"))
    )
    return (
        segs.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("is_first").cast("bigint")).alias("n_kept"),
            F.sum(
                F.when(F.col("is_first"), F.col("n_chunk_tokens").cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            ).alias("n_tokens_kept"),
        )
        .select(
            id_col,
            F.array_join(
                F.transform(F.col("_kept"), lambda s: s["chunk_text"]), " "
            ).alias("clean_text"),
            "n_segments",
            "n_kept",
            "n_tokens_kept",
        )
    )
