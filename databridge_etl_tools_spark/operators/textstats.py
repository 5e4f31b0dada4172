"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All pure Column expressions (whole-stage codegen, zero Python in the
hot path) — at 100 TB these run at parquet-scan speed. Heuristics are
standard public techniques (stopword/character-class ratios, n-gram
profiles, rolling/content hashes).
"""

from __future__ import annotations

from pyspark.sql import Column
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


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized,
    lowercased text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


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
