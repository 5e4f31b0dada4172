"""Corpus-level co-occurrence statistics: PMI collocations and a
smoothed bigram language model.

Two classic corpus-analysis operators a training-data pipeline runs
between cleaning and packing:

- :func:`pmi_pairs` — pointwise-mutual-information collocation
  mining over adjacent token pairs ("new york"-style multiword
  detection, tokenizer-merge candidates).
- :func:`bigram_lm_scores` — per-document likelihood under an
  add-one-smoothed bigram model fit on the corpus itself: a
  log-free, engine-deterministic proxy for the perplexity-based
  quality filters (CCNet-style) that rank documents by how "normal"
  their token transitions are.

Determinism: every score is either a pure rational of exact integer
counts evaluated as one fixed double expression tree (PMI), or an
integer fixed-point sum of such rationals (LM: ``floor(p·1e9)``
summed as BIGINT) — no ``ln``/libm calls, no double reductions, so
DuckDB reproduces the values bit-for-bit.

Scale shape (100 TB honest): the corpus pays one explode into a
token stream and one into an adjacent-pair stream, each with a
single keyed count shuffle; unigram / context tables are
vocabulary-sized and join back size-aware (``util.maybe_broadcast``
— broadcast small, plain shuffle join beyond the threshold); totals
are 1-row broadcast aggregates, never driver scalars; the LM's
per-document reduce is doc-id-keyed. No windows over the corpus, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize
from .textstats import tokens
from .util import maybe_broadcast
from .vocab import BROADCAST_VOCAB_MAX_ROWS


def _tok_base(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, toks) with the token array MATERIALIZED before any
    explode (interpreted-HOF discipline: lambdas are CodegenFallback
    and re-evaluate non-column expressions per element)."""
    return materialize(
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
    )


def _pair_stream(base: DataFrame, id_col: str) -> DataFrame:
    """(id, a, b) for every adjacent token pair (docs with ≥2
    tokens; the ``size >= 2`` guard keeps ``sequence(1, n-1)``
    ascending — Spark's sequence DESCENDS when end < start)."""
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(toks[i - 1] AS a, toks[i] AS b))"
    )
    return (
        base.where(F.size("toks") >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )


def pmi_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_count: int = 5,
    top_k: int = 20,
    broadcast_threshold: int = BROADCAST_VOCAB_MAX_ROWS,
) -> DataFrame:
    """Top-``top_k`` adjacent-pair collocations by PMI.

    ``score = (c_ab·N_tok·N_tok) / (N_pair·c_a·c_b)`` — the PMI
    ratio ``P(a,b)/(P(a)·P(b))`` with ``P(a,b)=c_ab/N_pair`` and
    ``P(x)=c_x/N_tok``, WITHOUT the monotone ``log``: the ranking is
    identical to textbook PMI and the value is one deterministic
    double expression over exact integer counts. Ties break on
    (a, b) so the cut is total-ordered. Returns
    ``(rank, a, b, c_ab, c_a, c_b, score)``.

    Plan: pair counts = one (a, b)-keyed shuffle; unigram counts =
    one token-keyed shuffle, joined back size-aware ×2; totals ride
    a broadcast 1-row crossJoin; the global top-k compiles to
    TakeOrderedAndProject (LimitPushDownThroughWindow), never a
    full single-partition sort."""
    base = _tok_base(docs, text_col, id_col)
    toks = base.select(F.explode("toks").alias("token"))
    uni = materialize(toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    pair_counts = (
        _pair_stream(base, id_col)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_pair_count)
    )
    totals = base.agg(
        F.sum(F.size("toks")).cast("bigint").alias("n_tok"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0)))
        .cast("bigint")
        .alias("n_pair"),
    )
    uni_s = maybe_broadcast(uni, broadcast_threshold)
    scored = (
        pair_counts.join(
            uni_s.select(F.col("token").alias("a"), F.col("c").alias("c_a")), "a"
        )
        .join(uni_s.select(F.col("token").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.col("c_ab").cast("double")
                * F.col("n_tok")
                * F.col("n_tok")
                / (F.col("n_pair").cast("double") * F.col("c_a") * F.col("c_b"))
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select("rank", "a", "b", "c_ab", "c_a", "c_b", "score")
    )


def bigram_lm_scores(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_threshold: int = BROADCAST_VOCAB_MAX_ROWS,
    train_docs: DataFrame | None = None,
    base: DataFrame | None = None,
    train_base: DataFrame | None = None,
) -> DataFrame:
    """Per-document likelihood under an add-one-smoothed bigram LM
    fit on ``train_docs`` (default: the corpus itself — the CCNet
    self-scoring setting). Passing a separate ``train_docs`` gives
    CROSS-model scoring — score a raw corpus under a target-domain
    LM, the ingredient importance-resampling data selection (DSIR)
    ratios are built from. Transitions unseen in training score
    ``1/(c_a + V)`` (add-one smoothing; fully-unseen contexts
    ``1/V``) via LEFT joins — with self-training every transition is
    seen and the result is identical to the historical inner-join
    construction.

    For each transition ``a→b``: ``p(b|a) = (c_ab + 1) / (c_a· + V)``
    with ``c_a·`` = count of transitions leaving ``a`` and ``V`` the
    corpus vocabulary size. Per document: ``n_trans`` and
    ``score_nano = Σ floor(p·1e9)`` (BIGINT — order-independent, so
    oracle-hashable; the mean transition probability
    ``score_nano / n_trans / 1e9`` ranks documents exactly like mean
    log-likelihood would rank typical ones, without a libm call).
    Documents with fewer than 2 tokens have no transitions and are
    absent — filter upstream if they need a default score.
    Returns ``(<id_col>, n_trans, score_nano)``.

    Plan: transition stream joined against the bigram-count table on
    (a, b) and the context table on (a) — both corpus-derived and
    joined size-aware; V is a 1-row broadcast; final reduce is one
    doc-keyed shuffle.

    ``base`` / ``train_base``: optionally PRE-TOKENIZED (id, toks)
    frames (``_tok_base`` output, already materialized) replacing
    the internal tokenize+checkpoint of ``docs`` / ``train_docs`` —
    a caller scoring one corpus under several models (the DSIR
    ratio) tokenizes ONCE and hands the shared frame to every call
    instead of paying a checkpointed tokenize pass per model."""
    if base is None:
        base = _tok_base(docs, text_col, id_col)
    stream = _pair_stream(base, id_col)
    if train_base is not None:
        t_base, t_stream = train_base, _pair_stream(train_base, id_col)
    elif train_docs is None:
        t_base, t_stream = base, stream
    else:
        t_base = _tok_base(train_docs, text_col, id_col)
        t_stream = _pair_stream(t_base, id_col)
    grams = materialize(
        t_stream.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ctx = materialize(grams.groupBy("a").agg(F.sum("c_ab").alias("c_a")))
    vocab_n = t_base.select(F.explode("toks").alias("t")).agg(
        F.count_distinct("t").alias("v")
    )
    p = (F.coalesce(F.col("c_ab"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c_a"), F.lit(0)) + F.col("v")
    )
    return (
        stream.join(maybe_broadcast(grams, broadcast_threshold), ["a", "b"], "left")
        .join(maybe_broadcast(ctx, broadcast_threshold), "a", "left")
        .crossJoin(F.broadcast(vocab_n))
        .select(id_col, F.floor(p * F.lit(1e9)).cast("bigint").alias("_pn"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trans"),
            F.sum("_pn").cast("bigint").alias("score_nano"),
        )
    )


def skipgram_pmi_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_pair_count: int = 5,
    top_k: int = 20,
    broadcast_threshold: int = BROADCAST_VOCAB_MAX_ROWS,
) -> DataFrame:
    """Windowed (skip-gram) PMI collocations: ordered token pairs at
    every distance 1..``window`` — the word2vec-style co-occurrence
    statistic, vs :func:`pmi_pairs`' adjacent-only bigrams (a window
    catches 'merge … join' across an intervening token). Same
    log-free rational score over exact integer counts, ties broken on
    (a, b), returns ``(rank, a, b, c_ab, c_a, c_b, score)``.

    Plan: the pair stream is built MAP-SIDE as one array expression
    (flatten over k of zip_with(toks, toks shifted k) — O(window·len)
    per doc, no self-join on position), materialized before explode
    (the InferFiltersFromGenerate discipline), then ONE (a, b)-keyed
    shuffle; ``N_pair`` is the summed pair-array size, so the
    normalizer is consistent with the stream by construction. Top-k
    compiles to TakeOrderedAndProject."""
    base = _tok_base(docs, text_col, id_col)
    ks = F.sequence(F.lit(1), F.lit(window))
    pair_arr = F.flatten(
        F.transform(
            ks,
            lambda k: F.zip_with(
                F.slice(F.col("toks"), F.lit(1), F.greatest(F.size("toks") - k, F.lit(0))),
                F.slice(F.col("toks"), k + 1, F.greatest(F.size("toks") - k, F.lit(0))),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    wb = materialize(base.select(F.col(id_col), pair_arr.alias("pairs")))
    stream = wb.select(F.explode("pairs").alias("p")).select("p.a", "p.b")
    toks = base.select(F.explode("toks").alias("token"))
    uni = materialize(toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    pair_counts = (
        stream.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_pair_count)
    )
    n_tok = base.agg(F.sum(F.size("toks")).cast("bigint").alias("n_tok"))
    n_pair = wb.agg(F.sum(F.size("pairs")).cast("bigint").alias("n_pair"))
    uni_s = maybe_broadcast(uni, broadcast_threshold)
    scored = (
        pair_counts.join(
            uni_s.select(F.col("token").alias("a"), F.col("c").alias("c_a")), "a"
        )
        .join(uni_s.select(F.col("token").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_pair))
        .select(
            "a",
            "b",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.col("c_ab").cast("double")
                * F.col("n_tok")
                * F.col("n_tok")
                / (F.col("n_pair").cast("double") * F.col("c_a") * F.col("c_b"))
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select("rank", "a", "b", "c_ab", "c_a", "c_b", "score")
    )
