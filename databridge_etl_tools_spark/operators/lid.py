"""Trained language-ID classifier: hashed char-trigram features +
one-vs-rest integer ridge heads.

Production corpus pipelines gate on a *trained* language identifier
BEFORE every other filter — CCNet and RefinedWeb both run fastText
LID first; the quality / perplexity gates are per-language. This
module is the multiclass extension of ``operators.quality``:

- **features**: hashed CHARACTER-TRIGRAM frequencies over the first
  ``cap`` characters (fastText LID's signature feature family —
  char n-grams are the language signal; a short prefix is enough,
  which also bounds the per-document cost to O(cap·d) JVM
  comparisons regardless of document length). Same md5 → ``mod d``
  dim map as the quality featurizer under a distinct ``lid:`` salt
  (an independent draw of the hash family).
- **labels / corpus adaptation**: the synthetic corpus draws every
  document's text from ONE shared vocabulary — the ``lang`` column
  is metadata the text never reflects, so there is nothing for a
  content classifier to learn. The adaptation (same discipline as
  the quality classifier's planted-junk negatives) PLANTS a
  deterministic per-language function-word marker prefix derived
  from the label: real corpora carry exactly this signal in the
  text already; here it is injected so the capability is
  demonstrable and oracle-replayable. The behavioral contract —
  the model classifies by CONTENT, not metadata — is pinned by
  cross-planted documents (``tests/test_lid.py``: an ``en``-labeled
  document carrying the ``de`` marker is predicted ``de``).
- **fit**: ``linear.ridge_fit_multi`` — ONE Arrow moments pass for
  all L class heads (the normal-equation matrix depends only on X,
  never on labels) + ONE shared fraction-free elimination with L
  RHS columns (``intlin.gauss_solve_multi``), every pivot integer
  arithmetic and therefore replayable bit-for-bit by the DuckDB
  twin. The L-class fit costs the same single pass as the binary
  quality fit.
- **predict**: L exact integer score folds (one literal-array
  ``zip_with`` each) + a deterministic argmax (first language in
  ascending order attaining the maximum score — the twin's CASE
  chain picks identically). Zero shuffles, zero Python; at 100 TB
  LID scoring is embarrassingly parallel map work over a bounded
  prefix of each document.

Reference parity: beyond-reference — the reference pipeline
(databridge-etl-tools) has no trained models; this is the
training-data charter's LID gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .linear import ridge_fit_multi, ridge_pq_col

#: class list — the corpus's language inventory. Static so the
#: DuckDB twin's per-class CTE unroll is static SQL.
LANGS = ("de", "en", "es", "fr", "zh")
# load_models returns heads ORDER BY label, and lid_score_cols zips
# the loaded list against LANGS positionally — that round-trip is
# only order-preserving while LANGS is lexicographically sorted.
# Adding a language out of alphabetical order would silently assign
# every head to the wrong language column; fail loudly instead.
assert tuple(LANGS) == tuple(sorted(LANGS)), (
    "LANGS must stay lexicographically sorted: the model registry "
    "orders multiclass heads by label on load"
)

#: per-language marker: a run of the language's top function words
#: (the char-trigram signature real text carries organically).
MARKERS = {
    "de": " der und nicht ist",
    "en": " the and of to is",
    "es": " el la que y los",
    "fr": " le et les des une",
    "zh": " 的是不了在有",
}

#: marker repeats planted as a PREFIX (prefix so the feature cap
#: always sees it). 8 repeats ≈ 60% of the capped prefix — enough
#: that the 16-dim hashed heads separate all 5 classes perfectly on
#: held-out data (swept in tests).
MARK_REPEAT = 8

#: feature prefix cap in CHARACTERS. LID needs only a snippet
#: (fastText LID convention); the cap makes per-document feature
#: cost independent of document length — at 100 TB the featurizer
#: reads ``cap`` chars per row no matter how long the documents get.
DEFAULT_CAP = 240

#: feature width (hashed trigram dims). 16 keeps the oracle's
#: elimination unroll at the quality classifier's 15 CTE levels.
DEFAULT_DIMS = 16

#: n-gram size (character trigrams).
NGRAM = 3

SALT = "lid:"


def marker_col(lang_col: str = "lang") -> Column:
    """The planted per-language marker prefix (MARK_REPEAT copies of
    the language's marker; empty for unknown languages)."""
    expr = F.lit("")
    for lg in LANGS:
        expr = (
            F.when(F.col(lang_col) == lg, F.lit(MARKERS[lg] * MARK_REPEAT))
            .otherwise(expr)
        )
    return expr


def plant_markers(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Prefix each document's text with its language marker — the
    corpus adaptation that injects the content signal real corpora
    already carry (see module docstring). Pure map-side."""
    return df.withColumn(
        text_col, F.concat(marker_col(lang_col), F.col(text_col))
    )


def trigram_keep_cond(text_col: str = "text", cap: int = DEFAULT_CAP):
    """The exact row-keep predicate :func:`char_trigram_features`
    applies (rows failing it carry no trigram to hash and are
    dropped; NULL text evaluates NULL = dropped). Exported as the
    single source of truth so row-preserving consumers
    (``lid_score_stream``'s abstain complement) derive their
    complement from THE SAME rule instead of restating it — the two
    silently desync otherwise."""
    return F.length(F.substring(F.col(text_col), 1, cap)) >= NGRAM


def char_trigram_features(
    df: DataFrame,
    text_col: str = "text",
    *,
    d: int = DEFAULT_DIMS,
    cap: int = DEFAULT_CAP,
    salt: str = SALT,
) -> DataFrame:
    """Append ``_g`` (trigram count) and ``feat`` (dense length-``d``
    ``array<double>`` of normalized hashed char-trigram frequencies
    over the first ``cap`` characters); rows with fewer than
    ``NGRAM`` characters are dropped (no trigrams to hash).

    ``dim(g) = bigint(md5(salt||g)[:8 hex]) mod d`` — the exact
    integer hash both engines reproduce. The trigram→dim map is
    materialized into a column once (the CodegenFallback
    re-evaluation trap applies to derived arrays — same guard as
    ``quality.hashed_tf_features``). All JVM column expressions;
    map-side only, O(cap·d) per row at any scale."""
    from .util import spread

    dim_of = lambda g: (  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), g)), 1, 8), 16, 10)
        .cast("bigint")
        % d
    ).cast("int")
    t = F.substring(F.col(text_col), 1, cap)
    out = (
        # the trigram hash map is interpreted-HOF work (~cap md5 per
        # row): fan a byte-small scan out to cluster parallelism
        # first (no-op-ish once the input is already many partitions)
        spread(df).withColumn("_t", t)
        .filter(trigram_keep_cond(text_col, cap))
        .withColumn(
            "_grams",
            F.transform(
                F.sequence(
                    F.lit(1), F.length("_t") - F.lit(NGRAM - 1)
                ),
                lambda i: F.col("_t").substr(i, F.lit(NGRAM)),
            ),
        )
        .withColumn("_g", F.size("_grams").cast("bigint"))
        .withColumn("_dims", F.transform(F.col("_grams"), dim_of))
    )
    feat = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda j: F.size(F.filter(F.col("_dims"), lambda x: x == j)).cast(
            "double"
        )
        / F.col("_g").cast("double"),
    )
    return out.withColumn("feat", feat).drop("_t", "_grams", "_dims")


def lid_fit(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    *,
    d: int = DEFAULT_DIMS,
    cap: int = DEFAULT_CAP,
    lam: int = 1,
    holdout_mod: int = 5,
    feats: "DataFrame | None" = None,
) -> list[dict]:
    """Fit the L one-vs-rest heads on the TRAINING slice (``doc_id %
    holdout_mod != 0`` — the held-out complement is the honest eval
    set): plant markers → char-trigram features → one shared Arrow
    moments pass → one shared integer elimination. Returns one model
    dict per language in ``LANGS`` order (broadcast-safe plain
    Python values).

    ``feats``: optionally the PRE-FEATURIZED planted corpus
    (``char_trigram_features(plant_markers(docs), d=d, cap=cap)``,
    ideally materialized) so fit and whole-corpus scoring SHARE one
    featurize pass — the featurizer is per-row map work, so filtering
    the shared frame to the train slice is row-identical to
    featurizing the filtered slice; callers that fit AND score
    (curation v9/v10, the LID report queries) halve the interpreted-
    HOF hashing cost this way."""
    if feats is not None:
        feats = feats.filter(F.col(id_col) % holdout_mod != 0)
    else:
        train = plant_markers(
            docs.filter(F.col(id_col) % holdout_mod != 0), text_col, lang_col
        )
        feats = char_trigram_features(train, text_col, d=d, cap=cap)
    for lg in LANGS:
        feats = feats.withColumn(
            f"_y_{lg}", (F.col(lang_col) == lg).cast("double")
        )
    return ridge_fit_multi(
        feats, [f"_y_{lg}" for lg in LANGS], "feat", lam=lam
    )


def lid_score_cols(models: list[dict]) -> list[Column]:
    """Per-class double score ``ic_c + pq_c / 2^50`` over ``feat`` —
    each an exact integer fold + one power-of-two division + one
    IEEE addition, deterministic across engines."""
    q50 = float(1 << 50)
    return [
        (
            F.lit(float(m["intercept"]))
            + ridge_pq_col(m, "feat").cast("double") / F.lit(q50)
        ).alias(f"_s_{lg}")
        for lg, m in zip(LANGS, models)
    ]


def lid_predict_col(score_cols: list[str]) -> Column:
    """Deterministic argmax: the FIRST language in ``LANGS``
    (ascending) order whose score equals the maximum — the twin's
    CASE chain ties identically."""
    mx = F.greatest(*[F.col(c) for c in score_cols])
    expr = F.lit(LANGS[-1])
    for lg, c in zip(reversed(LANGS[:-1]), reversed(score_cols[:-1])):
        expr = F.when(F.col(c) == mx, F.lit(lg)).otherwise(expr)
    return expr
