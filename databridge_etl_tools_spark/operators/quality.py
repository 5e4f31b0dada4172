"""Trained document-quality classifier: hashed features + ridge probe.

Every production pretraining corpus gates on a *trained* linear
quality model, not just rule heuristics — GPT-3's WebText-vs-
CommonCrawl logistic filter, CCNet's fastText LM gate, LLaMA /
RefinedWeb quality classifiers. This module composes two operators
the engine already has into that capability:

- **features**: the hashing-trick featurizer (Weinberger et al.
  2009; same md5 → ``mod d`` dim map as
  ``queries.textops.features_hashing_trick``) densified into a
  length-``d`` array of normalized term frequencies ``x_j = c_j /
  n_tokens``. Pure map-side JVM column expressions (nested
  higher-order functions over a MATERIALIZED dims column — the
  CodegenFallback re-evaluation trap applies to derived arrays, so
  the token→dim map is computed once into a column); zero shuffles,
  vocabulary-free, so the featurizer itself scales like a parquet
  scan at 100 TB.
- **fit**: ``operators.linear.ridge_fit`` — ONE Arrow pass of exact
  integer sufficient statistics over the labeled slice, a driver-side
  fraction-free Gaussian elimination (``intlin.gauss_solve_fixed``)
  whose every pivot is integer arithmetic and therefore replayable
  bit-for-bit by a DuckDB twin (the r9 ridge promotion discipline).
- **labels**: a deterministic self-supervised slice, the standard
  trick when no human labels exist (CCNet uses Wikipedia as the
  positive class): positives = documents passing the published
  Gopher rule conjunction; negatives = a disjoint slice with PLANTED
  degradation (repeated junk tokens — the boilerplate/spam failure
  mode the real classifiers target). Both sides derive from the
  corpus by pure string expressions, so the oracle rebuilds the
  identical slice.
- **score**: ``ridge_pq_col``'s exact integer fold — per row one
  int64 fold + one power-of-two division + one IEEE add; zero
  shuffles, zero Python, bit-reproducible across engines. At 100 TB
  scoring is embarrassingly parallel map work.

Reference parity: the reference pipeline has no trained model — its
quality gates are per-cell cleaning rules (e.g. ``databridge_etl_
tools/utils.py`` cell scrubbing); this is a beyond-reference
capability the brief's training-data charter asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import textstats as TS
from .linear import ridge_fit, ridge_pq_col

#: classifier feature width. 16 is deliberately compact: the hashing
#: trick degrades gracefully under collisions (Weinberger et al. §4),
#: a quality gate needs far less capacity than a retrieval model, and
#: the DuckDB twin unrolls d−1 elimination pivots into CTE levels —
#: 15 levels keep the replay readable. Parameterize ``d`` to widen.
DEFAULT_DIMS = 16

#: hash salt — distinct from features_hashing_trick's "feat:" so the
#: two featurizers are independent draws of the hash family.
SALT = "qf:"

#: planted degradation: 8 repeats of two junk tokens (16 tokens).
#: Concentrating added mass on ≤2 hashed dims while diluting every
#: organic dim's normalized frequency — the spam/boilerplate
#: signature the trained gate must learn to reject.
JUNK_SUFFIX = " qqjunk zzspam" * 8


def hashed_tf_features(
    df: DataFrame,
    text_col: str = "text",
    *,
    d: int = DEFAULT_DIMS,
    salt: str = SALT,
    gopher: "dict | None" = None,
) -> DataFrame:
    """Append ``_n`` (token count) and ``feat`` (dense length-``d``
    ``array<double>`` of normalized hashed term frequencies) to
    ``df``; rows with zero tokens are dropped (no features to hash).

    ``dim(t) = bigint(md5(salt||t)[:8 hex]) mod d`` — the exact
    integer hash both engines reproduce (same map as
    ``features_hashing_trick``, oracle-proven). ``x_j = cast(c_j as
    double) / cast(n as double)`` — one correctly-rounded IEEE
    division, so quantization downstream is engine-exact. Cost is
    O(d·n_tokens) comparisons per document, all inside JVM column
    expressions — map-side only, no shuffle at any scale.

    ``gopher``: optionally kwargs for ``textstats.gopher_rules``;
    when given, a ``gp`` int column (the gate conjunction) is
    computed HERE, from the in-flight ``_toks`` column, before the
    token array is dropped. The curation consumers all gate on
    Gopher after materializing this frame — computing the gate in
    the featurize pass means the checkpoint can drop ``text``
    entirely (guide §2.3: project before the expensive boundary) and
    no consumer ever re-splits the stored text per sub-rule."""
    from .util import spread

    dim_of = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), t)), 1, 8), 16, 10)
        .cast("bigint")
        % d
    ).cast("int")
    out = (
        # token→dim hashing is interpreted-HOF work (~n_tokens md5
        # per row): fan a byte-small scan out to cluster parallelism
        # first (no-op-ish once the input is already many partitions)
        spread(df).withColumn("_toks", TS.tokens(text_col))
        .filter(F.size("_toks") > 0)
        .withColumn("_n", F.size("_toks"))
        .withColumn("_dims", F.transform(F.col("_toks"), dim_of))
    )
    if gopher is not None:
        out = out.withColumn(
            "gp",
            TS.gopher_rules(text_col, toks=F.col("_toks"), **gopher)[
                "passes"
            ].cast("int"),
        )
    feat = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda j: F.size(F.filter(F.col("_dims"), lambda x: x == j)).cast(
            "double"
        )
        / F.col("_n").cast("double"),
    )
    return out.withColumn("feat", feat).drop("_toks", "_dims")


def labeled_slice(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    neg_mod: int = 7,
    junk: str = JUNK_SUFFIX,
    min_words: int = 10,
    min_required_hits: int = 1,
) -> DataFrame:
    """The deterministic self-supervised training slice:
    ``label=0.0`` rows are the ``id % neg_mod = 0`` documents with
    the junk suffix planted INTO the text (features are computed on
    the degraded text); ``label=1.0`` rows are the remaining
    documents that pass the full Gopher conjunction
    (``textstats.gopher_rules`` — the published positive-class
    heuristic). Corpus adaptation, same spirit as the established
    ``min_words=10``: ``min_required_hits=1`` because the synthetic
    vocabulary contains only one of the paper's eight required
    function words — the published ``>= 2`` passes ZERO documents
    here, which would empty the positive class. Pure column
    expressions; the oracle rebuilds the identical slice from the
    same predicates."""
    neg = _neg_docs(docs, text_col, id_col, neg_mod, junk).select(
        id_col, text_col, F.lit(0.0).alias("label")
    )
    pos = docs.filter(
        _pos_cond(text_col, id_col, neg_mod, min_words, min_required_hits)
    ).select(F.col(id_col), F.col(text_col), F.lit(1.0).alias("label"))
    return neg.unionByName(pos)


def _neg_docs(
    docs: DataFrame, text_col: str, id_col: str, neg_mod: int, junk: str
) -> DataFrame:
    """The negative-class construction (id % neg_mod = 0, junk suffix
    planted INTO the text) — the single definition both the plain
    labeled_slice path and the shared-featurize fit path read, so the
    labeling scheme cannot silently desync between them."""
    i = F.col(id_col)
    return docs.filter(i % neg_mod == 0).select(
        i.alias(id_col),
        F.concat(F.col(text_col), F.lit(junk)).alias(text_col),
    )


def _pos_cond(
    text_col: str,
    id_col: str,
    neg_mod: int,
    min_words: int,
    min_required_hits: int,
):
    """The positive-class predicate (non-negative slice passing the
    Gopher conjunction) — shared for the same reason as _neg_docs."""
    g = TS.gopher_rules(
        text_col, min_words=min_words, min_required_hits=min_required_hits
    )
    return (F.col(id_col) % neg_mod != 0) & g["passes"]


def quality_classifier_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    d: int = DEFAULT_DIMS,
    lam: int = 1,
    neg_mod: int = 7,
    min_words: int = 10,
    feats: "DataFrame | None" = None,
) -> dict:
    """Fit the quality model: labeled slice → hashed features → one
    Arrow moments pass → integer ridge solve. Returns the
    ``ridge_fit`` model dict (``b_int`` q30 integer weights +
    intercept + train rmse) — broadcast-safe plain Python values.

    ``feats``: optionally the PRE-FEATURIZED raw corpus
    (``hashed_tf_features(docs, d=d)``, ideally materialized) so fit
    and scoring SHARE one featurize pass. Positives reuse its rows
    directly (their text is unmodified — the featurizer is per-row
    map work, so filtering the shared frame is row-identical to
    featurizing the filtered slice); negatives (``id % neg_mod = 0``
    with the junk suffix planted INTO the text) are featurized
    separately — they must be, the degradation is the training
    signal. Same rows as the unshared path either way.

    When ``feats`` carries a precomputed ``gp`` column
    (``hashed_tf_features(..., gopher=...)``), the positive filter
    reads it instead of re-deriving the Gopher conjunction from text
    — the caller owns the contract that ``gp`` was computed with the
    SAME (min_words, min_required_hits=1) parameters this fit uses
    (every curation query builds both from one constant)."""
    if feats is None:
        sl = labeled_slice(
            docs, text_col, id_col, neg_mod=neg_mod, min_words=min_words
        )
        f = hashed_tf_features(sl, text_col, d=d)
        return ridge_fit(f, "label", "feat", lam=lam)
    if "gp" in feats.columns:
        pos_cond = (F.col(id_col) % neg_mod != 0) & (F.col("gp") == 1)
    else:
        pos_cond = _pos_cond(text_col, id_col, neg_mod, min_words, 1)
    pos = feats.filter(pos_cond).select(
        F.lit(1.0).alias("label"), "feat"
    )
    neg = hashed_tf_features(
        _neg_docs(docs, text_col, id_col, neg_mod, JUNK_SUFFIX),
        text_col,
        d=d,
    ).select(F.lit(0.0).alias("label"), "feat")
    return ridge_fit(neg.unionByName(pos), "label", "feat", lam=lam)


def quality_pq_col(model: dict) -> Column:
    """The exact integer score fold over the ``feat`` column:
    ``pq = Σ_j floor(x_j·2^20)·B_j`` (int64). ``prediction =
    intercept + pq / 2^50``. Features are normalized frequencies
    (|x| ≤ 1 < the fit slice's observed bound), so ``ridge_pq_col``'s
    int64 audit contract holds for any scoring corpus."""
    return ridge_pq_col(model, "feat")


def quality_prediction_col(model: dict) -> Column:
    """Per-row double prediction — one int64→double cast (exact for
    |pq| < 2^53, IEEE-identical beyond), one exact power-of-two
    division, one IEEE addition; deterministic across engines."""
    return F.lit(float(model["intercept"])) + quality_pq_col(model).cast(
        "double"
    ) / F.lit(float(1 << 50))
