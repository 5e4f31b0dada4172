"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All pure Column expressions (whole-stage codegen, zero Python in the
hot path) — at 100 TB these run at parquet-scan speed. Heuristics are
standard public techniques (stopword/character-class ratios, n-gram
profiles, rolling/content hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language marker lexicons for the n-gram/stopword heuristic
#: language-ID (public-knowledge technique: Cavnar-Trenkle-style
#: profile matching reduced to high-frequency function words).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "et"],
    "de": ["der", "die", "und", "das", "ist"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (empty tokens dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count word-pieces of <=4 chars plus
    punctuation marks — a deterministic regex proxy for subword
    tokenizers (~chars/4 for prose)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_count(c, F.lit(r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"))
    return pieces


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def avg_word_len(col: Column | str) -> Column:
    """Mean token length as DOUBLE (exact: int/int division)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(F.regexp_replace(c, r"\s+", ""))
    n = token_count(c)
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_count(c, F.lit(r"[^\w\s]"))
    return F.when(F.length(c) > 0, p.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    sw = stopwords or LANG_MARKERS["en"]
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: F.lower(x).isin(*sw)))
    n = F.size(t)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards prose-like
    word length (3-8), some stopwords, low punctuation density.
    Deterministic integer/double arithmetic only."""
    wl = avg_word_len(col)
    word_len_ok = F.when((wl >= 3.0) & (wl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return (word_len_ok + sw + punct_ok) / 3.0


def marker_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens matching ``lang``'s marker lexicon."""
    t = tokens(col)
    return F.size(F.filter(t, lambda x: F.lower(x).isin(*LANG_MARKERS[lang])))


def language_guess(col: Column | str) -> Column:
    """Heuristic language ID: argmax of marker-lexicon hit counts,
    'und' when nothing matches. Ties break by language-key order
    (en < es < fr < de evaluation order, first max wins)."""
    c = F.col(col) if isinstance(col, str) else col
    hits = {lang: marker_hits(c, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


#: Gopher rule 5's required English function words (Rae et al. 2021,
#: "Scaling Language Models: ... Gopher", App. A1.1 — public
#: heuristic, also adopted by RefinedWeb/Dolma).
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    col: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_required_hits: int = 2,
    toks: Column | None = None,
) -> Column:
    """Gopher quality-filter rules (Rae et al. 2021, App. A1.1) as one
    struct of per-rule booleans plus the conjunction — the standard
    published heuristic gate for web-scale pretraining corpora:

    - ``words_ok``: word count within [min_words, max_words]
    - ``word_len_ok``: mean word length within [3, 10]
    - ``symbol_ok``: (# '#' + # '...') / words <= 0.1
    - ``alpha_ok``: >= 80% of words contain an alphabetic character
    - ``stopword_ok``: >= 2 distinct required function words present

    The paper's two line-level rules (bullet-start / ellipsis-end line
    fractions) are omitted: the synthetic corpus is single-line, so
    they are vacuous here; they'd be the same per-line array exprs.
    Pure Column expressions — codegen'd except the array lambdas.

    ``toks``: optionally a PRE-COMPUTED token-array column for the
    same text (``textstats.tokens(col)`` materialized into a real
    column upstream). The tokenize split is referenced by several
    sub-rules, and HOF lambdas are interpreted (CodegenFallback) — so
    without this, every referencing expression re-splits the text per
    row. A pipeline that already carries the token array (the hashed
    featurizers do) hands it in and the gate costs zero extra splits.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c) if toks is None else toks
    n = F.size(toks)
    # mean word length = non-whitespace chars / token count — same
    # value as avg_word_len(c), reusing n instead of re-splitting
    _total = F.length(F.regexp_replace(c, r"\s+", ""))
    wl = F.when(n > 0, _total.cast("double") / n).otherwise(F.lit(0.0))
    symbols = F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\.|…"))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # distinct required function words present: |lower(toks) ∩ REQ| —
    # one interpreted transform + one native array_intersect, replacing
    # eight per-word exists() traversals (identical count: both sides
    # tally DISTINCT required words found)
    req_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
        )
    )
    words_ok = (n >= min_words) & (n <= max_words)
    word_len_ok = (wl >= min_word_len) & (wl <= max_word_len)
    symbol_ok = F.when(n > 0, symbols.cast("double") / n <= max_symbol_ratio).otherwise(
        F.lit(False)
    )
    alpha_ok = F.when(
        n > 0, alpha_words.cast("double") / n >= min_alpha_word_frac
    ).otherwise(F.lit(False))
    stopword_ok = req_hits >= min_required_hits
    return F.struct(
        words_ok.alias("words_ok"),
        word_len_ok.alias("word_len_ok"),
        symbol_ok.alias("symbol_ok"),
        alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"),
        (words_ok & word_len_ok & symbol_ok & alpha_ok & stopword_ok).alias("passes"),
    )


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized,
    lowercased text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition statistics — the MassiveText/
    RefinedWeb repetition filters (duplicate-n-gram fractions) at the
    token level: ``distinct_token_ratio`` (|distinct|/|tokens|, pure
    map-side), ``top_token_frac`` and ``top_bigram_frac`` (most
    frequent unigram/bigram count over total). Boilerplate-heavy and
    degenerate documents score high top-gram fractions.

    Scale shape: unigrams and bigrams are folded into ONE exploded
    (kind, gram) stream so the whole statistic costs a single shuffle
    chain — groupBy(id, kind, gram) with map-side partial counts, then
    groupBy(id) — both keyed on the document id, so AQE coalesces
    them; no per-document Python, no window over the corpus. The
    paper's line/paragraph variants are vacuous on the single-line
    synthetic corpus (same plan, split on newlines).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("_id"), toks.alias("toks")).where(
        F.size("toks") > 0
    )
    # guard: sequence(1, 0) is DESCENDING in Spark — never build it
    grams = base.select(
        "_id",
        F.explode(
            F.concat(
                F.expr("transform(toks, t -> struct('uni' AS kind, t AS gram))"),
                F.expr(
                    "if(size(toks) >= 2,"
                    " transform(sequence(1, size(toks) - 1),"
                    "  i -> struct('bi' AS kind,"
                    "   concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS gram)),"
                    " array())"
                ),
            )
        ).alias("g"),
    ).select("_id", "g.kind", "g.gram")
    counts = grams.groupBy("_id", "kind", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_kind = counts.groupBy("_id").agg(
        F.max(F.when(F.col("kind") == "uni", F.col("c"))).alias("m_uni"),
        F.sum(F.when(F.col("kind") == "uni", F.col("c"))).alias("t_uni"),
        F.max(F.when(F.col("kind") == "bi", F.col("c"))).alias("m_bi"),
        F.sum(F.when(F.col("kind") == "bi", F.col("c"))).alias("t_bi"),
    )
    side = df.select(
        F.col(id_col).alias("_id"),
        F.size(toks).alias("n_tokens"),
        F.when(
            F.size(toks) > 0,
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
        )
        .otherwise(F.lit(0.0))
        .alias("distinct_token_ratio"),
    )
    return (
        side.join(per_kind, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "distinct_token_ratio",
            F.coalesce(
                F.col("m_uni").cast("double") / F.col("t_uni"), F.lit(0.0)
            ).alias("top_token_frac"),
            F.coalesce(F.col("m_bi").cast("double") / F.col("t_bi"), F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
        )
    )


def rare_token_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_num: int = 1,
    rare_den: int = 5,
) -> DataFrame:
    """Corpus-frequency quality statistics per document: how much of a
    document is made of corpus-rare tokens — the rare-word-ratio
    feature quality classifiers use (an OOV/gibberish signal), plus
    the mean document-frequency ratio (a commonness score; the
    log-free cousin of mean IDF).

    A token is *rare* iff ``df(token)/n_docs <= rare_num/rare_den``,
    tested as ``df*rare_den <= n_docs*rare_num`` — exact integer
    arithmetic, so the decision is engine-independent (no float
    threshold at the boundary). ``mean_df_ratio`` is
    ``sum(df(token)) / (n_tokens * n_docs)``: integer aggregates with
    ONE final scalar division — deterministic under any partial-agg
    order.

    Scale shape: pass 1 builds the document-frequency table —
    vocabulary-sized, orders of magnitude smaller than the corpus —
    which pass 2 joins back SIZE-AWARE (``maybe_broadcast``: under the
    vocab broadcast budget there is no shuffle of the corpus-sized
    occurrence stream by token; a 100 TB-corpus vocabulary that
    outgrows it degrades to a shuffle join instead of an OOM). The
    corpus-side work is one explode + one groupBy(doc) — both keyed
    on the document id.
    """
    from .materialize import materialize
    from .util import maybe_broadcast
    from .vocab import BROADCAST_VOCAB_MAX_ROWS

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("_id"), toks.alias("toks"))
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    occs = base.select("_id", F.explode_outer("toks").alias("w"))
    dfreq = materialize(
        occs.where(F.col("w").isNotNull())
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("dfd"))
    )
    per = (
        occs.where(F.col("w").isNotNull())
        .join(maybe_broadcast(dfreq, BROADCAST_VOCAB_MAX_ROWS), "w")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("dfd") * rare_den <= F.col("n_docs") * rare_num, 1
                ).otherwise(0)
            ).alias("n_rare"),
            F.sum("dfd").alias("sum_df"),
            F.first("n_docs").alias("n_docs"),
        )
    )
    return (
        base.select("_id")
        .join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_rare"), F.lit(0)).alias("n_rare"),
            F.coalesce(F.col("sum_df"), F.lit(0)).alias("sum_df"),
            F.coalesce(
                F.col("sum_df").cast("double")
                / (F.col("n_tokens") * F.col("n_docs")),
                F.lit(0.0),
            ).alias("mean_df_ratio"),
        )
    )


def rolling_hash(col: Column | str, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters (documents'
    order-sensitive fingerprint), computed JVM-side via aggregate over
    the char array — deterministic integer arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def clean_text(col: Column | str, lowercase: bool = False) -> Column:
    """C4-style text normalization: strip control characters (except
    tab/newline, which the whitespace collapse handles), strip
    zero-width characters (ZWSP/ZWNJ/ZWJ/BOM — the invisible dedup
    poison: two visually identical strings with different bytes),
    collapse all whitespace runs to single spaces, trim, and
    optionally lowercase. Pure JVM regex chain at scan speed; the
    patterns live in the Java∩RE2 subset (literal codepoints, no
    lookarounds) so DuckDB oracles replay them byte-identically."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    c = F.regexp_replace(c, "[​‌‍﻿]", "")
    c = F.trim(F.regexp_replace(c, "\\s+", " "))
    return F.lower(c) if lowercase else c
