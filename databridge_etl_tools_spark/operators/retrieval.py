"""BM25 keyword retrieval: inverted-index scoring + top-k.

The training-data counterpart of the reference's attribute filters
(`databridge_etl_tools/utils.py` has only exact-match row selection;
keyword relevance ranking is a new capability): score every document
against a small set of keyword queries with BM25 (Robertson-Spärck
Jones) and keep the top-k per query.

Scale design (100 TB corpus, handful-of-queries workload):

- the ONLY corpus-sized shuffle is the term-frequency aggregation
  (``groupBy(doc, term)``) — and even that happens AFTER the corpus
  token stream is semi-joined against the **broadcast** query
  vocabulary, so non-query terms never leave the map side;
- document frequency is computed only for the query vocabulary (a
  vocabulary-sized aggregate of the already-filtered postings), then
  broadcast back — the corpus is never shuffled by term;
- document length rides the token stream into the tf aggregation
  (``max(dl)``), so no second corpus-sized join on doc id;
- corpus-level stats (N, Σdl) are a single 1-row aggregate
  cross-joined in (Catalyst broadcasts a 1-row relation);
- per-term score contributions are cast to ``DECIMAL(38,12)`` before
  the per-(query, doc) sum, making the reduction order-independent —
  double sums reduce in partial-agg order and would break
  cross-engine/cross-run determinism.

idf variants:

- ``idf="ln"`` — the standard BM25+ form ``ln(1 + (N-df+.5)/(df+.5))``.
  Correct for ranking, but ``ln`` differs at ulp level between libm
  implementations (Java ``Math.log`` vs DuckDB's C libm), so
  cross-ENGINE hash parity cannot be guaranteed; pinned against a
  pure-python twin in tests instead.
- ``idf="rational"`` — ``(N-df+.5)/(df+.5)`` without the log: the same
  monotone ordering per term, pure rational arithmetic, bit-identical
  across engines. Used by the DuckDB-oracled gate query.

Defaults k1=1.5, b=0.75 are dyadic rationals (exact in binary
floating point) so the scoring expression is reproducible verbatim in
any IEEE-754 engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens

#: decimal type for order-independent score accumulation
_ACC = "decimal(38,12)"


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.5,
    b: float = 0.75,
    idf: str = "rational",
) -> DataFrame:
    """Score every (query, document) pair with at least one term match.

    Returns ``(query_id, <id_col>, score DOUBLE, n_terms INT)`` where
    ``n_terms`` is the number of distinct query terms the document
    matched. Documents sharing no term with a query are absent (their
    BM25 score is 0)."""
    if idf not in ("ln", "rational"):
        raise ValueError(f"unknown idf variant: {idf!r}")

    # broadcast query vocabulary: (query_id, term), deduped
    qterms = queries.select(
        query_id_col, F.explode(tokens(F.col(query_text_col))).alias("term")
    ).distinct()
    qvocab = qterms.select("term").distinct()

    # corpus token stream, filtered to query vocabulary BEFORE the tf
    # shuffle; dl rides along so no second corpus join. The token
    # array is materialized into a column (with a checkpoint barrier)
    # before the explode: Generate over an inline filter()-HOF runs
    # interpreted and re-evaluates the split per array element, and
    # CollapseProject would re-inline a plain two-step select (the
    # round-3 minhash forensics — see SCALE.md).
    from .materialize import materialize

    base = materialize(
        docs.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_toks")
        ).withColumn("dl", F.size("_toks"))
    )
    toks = base.select(id_col, "dl", F.explode("_toks").alias("term"))
    tf = (
        toks.join(F.broadcast(qvocab), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )

    # corpus stats: 1-row relation (N, Σdl) — broadcast by Catalyst;
    # derived from the materialized base so the corpus is tokenized
    # exactly once
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("dl").cast("bigint")).alias("sum_dl"),
    )

    # document frequency, query vocabulary only (vocabulary-sized)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfd"))

    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
    )
    # parenthesization mirrored EXACTLY by the DuckDB oracle — IEEE
    # ops on identical operands in identical order are bit-identical
    rational = (F.col("n_docs") - F.col("dfd") + F.lit(0.5)) / (
        F.col("dfd") + F.lit(0.5)
    )
    idf_col = F.log(F.lit(1.0) + rational) if idf == "ln" else rational
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    contrib = (
        idf_col
        * (F.col("tf") * (F.lit(k1) + F.lit(1.0)))
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl))
    ).cast(_ACC)
    return (
        joined.groupBy(query_id_col, id_col)
        .agg(
            F.sum(contrib).alias("_acc"),
            F.count(F.lit(1)).cast("int").alias("n_terms"),
        )
        .select(
            query_id_col,
            id_col,
            F.col("_acc").cast("double").alias("score"),
            "n_terms",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Top-k documents per query by BM25 score (ties broken by doc id,
    so the cut is total-ordered and engine-independent). The ranking
    window partitions by query — parallelism is per-query, which is
    the right shape when queries are few and the corpus is huge; the
    scored relation entering the window is already only
    (matched docs × queries) rows."""
    scored = bm25_scores(docs, queries, query_id_col=query_id_col, id_col=id_col, **kwargs)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


MRR_Q = 1 << 30  #: reciprocal-rank fixed point: floor(2^30 / rank)


def ranking_eval(
    results: DataFrame,
    truth: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """IR ranking metrics — the evaluation side every retrieval/ANN
    pipeline needs next to its index: given ranked ``results``
    (query, item, rank ≤ k) and a ``truth`` relevance table (query,
    item), compute

    - **MRR**: mean reciprocal rank of the FIRST relevant hit
      (0 contribution for queries with no hit in the top-k),
    - **recall@k**: relevant-hits / min(|relevant|, k) summed over
      queries (the R-capped convention, so a query with 100 relevant
      items is not penalized for a k of 5),
    - **precision@k**: relevant-hits / k.

    Every per-query number is an exact integer (reciprocal ranks in
    q30 fixed point — ``floor(2^30 / rank)`` with rank ≤ k, so the
    quantization is the only rounding and any engine replays it);
    the three means are single correctly-rounded double divisions at
    the end. Queries in ``results`` with NO truth rows count as
    zero-relevant (skipped in recall's denominator-capped sum but
    present in MRR/precision means — the honest convention when truth
    covers only labeled queries is to pre-filter ``results``).

    One hit-tagging join + one query-keyed aggregate + one scalar
    merge; nothing driver-side."""
    q = F.col(query_col)
    res = results.select(
        q.alias("_q"), F.col(item_col).alias("_i"), F.col(rank_col).alias("_r")
    )
    tr = truth.select(
        F.col(query_col).alias("_q"), F.col(item_col).alias("_i")
    ).distinct()
    n_rel = tr.groupBy("_q").agg(F.count(F.lit(1)).cast("long").alias("_nrel"))
    hits = res.join(tr, ["_q", "_i"], "left_semi")
    return _metrics_from_hits(res, hits, n_rel, k)


def ranking_eval_labeled(
    results: DataFrame,
    item_labels: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """``ranking_eval`` for LABEL-relevance truth ("an item is
    relevant to a query iff they share a label") WITHOUT ever
    materializing the truth expansion.  The generic path would build
    queries ⋈ items-on-label — |Q|·(corpus/label) rows through a join
    whose only uses are a per-query count and a membership probe; on
    a skewed-label corpus at 100× that expansion IS the query's cost.
    Here instead:

    - ``_nrel`` comes from the label HISTOGRAM (one groupBy over the
      item table, |labels| rows, broadcast to the queries): a query's
      relevant count is hist(label) − 1 (itself excluded);
    - hits are tagged by joining the ≤ k·|Q| RESULT rows to the item
      table on item id and comparing the two labels directly
      (self-matches dropped, mirroring the expansion's
      ``item ≠ query`` rule).

    Same exact metrics as ``ranking_eval`` on the expanded truth —
    the r10 driver gate pins this equivalence via the unchanged
    oracle."""
    res = results.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_r"),
    )
    items = item_labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lb")
    )
    qlab = items.join(
        res.select(F.col("_q").alias("_id")).distinct(), "_id"
    ).select(F.col("_id").alias("_q"), F.col("_lb").alias("_qlb"))
    hist = items.groupBy("_lb").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    n_rel = qlab.join(F.broadcast(hist), qlab["_qlb"] == hist["_lb"]).select(
        "_q", (F.col("_n") - 1).alias("_nrel")
    )
    hits = (
        res.join(items, res["_i"] == items["_id"])
        .join(qlab, "_q")
        .where((F.col("_lb") == F.col("_qlb")) & (F.col("_i") != F.col("_q")))
        .select("_q", "_i", "_r")
    )
    return _metrics_from_hits(res, hits, n_rel, k)


def _metrics_from_hits(
    res: DataFrame, hits: DataFrame, n_rel: DataFrame, k: int
) -> DataFrame:
    """Shared aggregation tail: per-query exact-integer metrics, then
    the three corpus means as single double divisions."""
    per_q = (
        res.select("_q")
        .distinct()
        .join(
            hits.groupBy("_q").agg(
                F.count(F.lit(1)).cast("long").alias("_nhit"),
                F.min("_r").cast("long").alias("_first"),
            ),
            "_q",
            "left",
        )
        .join(n_rel, "_q", "left")
        .select(
            "_q",
            F.coalesce(F.col("_nhit"), F.lit(0)).alias("_nhit"),
            F.coalesce(F.col("_nrel"), F.lit(0)).alias("_nrel"),
            F.coalesce(
                F.expr(f"CAST({MRR_Q} DIV _first AS BIGINT)"), F.lit(0)
            ).alias("_rr_q"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        (
            F.sum(F.col("_rr_q").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(float(MRR_Q))
        ).alias("mrr"),
        (
            F.sum(
                F.when(
                    F.least(F.col("_nrel"), F.lit(k).cast("long")) > 0,
                    # integer DIV (trunc), NOT /: the q30 recall share
                    # must be exact for the oracle replay
                    F.expr(
                        f"CAST(_nhit * {MRR_Q}"
                        f" DIV LEAST(_nrel, CAST({k} AS BIGINT)) AS BIGINT)"
                    ),
                ).otherwise(F.lit(0).cast("long")).cast("decimal(38,0)")
            ).cast("double")
            / F.count(F.lit(1))
            / F.lit(float(MRR_Q))
        ).alias(f"recall_at_{k}"),
        (
            F.sum(F.col("_nhit").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / F.lit(float(k))
        ).alias(f"precision_at_{k}"),
    )
