"""PII detection / redaction operators for training-data pipelines.

Large-scale corpus curation scrubs personally-identifiable strings
(emails, phone numbers, IP addresses) before training — the standard
regex pass published with C4/RefinedWeb/Dolma-style pipelines. All
pure Column expressions (JVM regex inside whole-stage codegen, zero
Python) — the scrub runs at parquet-scan speed at 100 TB.

Patterns deliberately stick to syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
repetition, ASCII word boundaries. Redaction order is fixed
email → phone → ipv4, and each kind is COUNTED on the text as it
looked when that kind was scrubbed, so a phone-shaped run inside an
email local part is attributed to the email, not double-counted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: detection patterns, in scrub order (email first: its local part may
#: contain phone-shaped digit runs)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(col: Column | str) -> Column:
    """Scrub emails, phone numbers, and IPv4 addresses from ``col``.

    Returns ``struct(redacted, n_email, n_phone, n_ipv4)`` where each
    PII kind is replaced with its ``[KIND]`` token and counted at its
    point in the scrub order (no double counting across kinds).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = c
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(out, F.lit(pat)).alias(f"n_{kind}"))
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return F.struct(out.alias("redacted"), *counts)


def mask_digits_keep_last(col: Column | str, keep: int = 4) -> Column:
    """Mask every digit except the last ``keep`` in each digit run of
    length > ``keep`` — the account-number / phone display mask
    (``215-989-7412`` → ``***-***-7412`` after separator-agnostic
    masking of the leading runs). Runs of <= ``keep`` digits are left
    alone (they can't be shortened without changing length)."""
    c = F.col(col) if isinstance(col, str) else col
    # digits followed by `keep` more digits (lookahead) become '*'
    return F.regexp_replace(c, rf"\d(?=(?:[^\d]*\d){{{keep}}})", "*")


def luhn_card_scrub(
    text_col: str, min_len: int = 13, max_len: int = 19
) -> Column:
    """Payment-card detection with CHECKSUM VALIDATION — the
    precision upgrade over bare digit-run regexes: a 13–19-digit run
    is redacted only when it passes the Luhn check (ISO/IEC 7812), so
    order ids and timestamps with card-shaped lengths survive while
    real PANs are scrubbed — the high-precision card rule of
    published curation pipelines (bare runs false-positive heavily at
    corpus scale).

    Pure JVM column expressions — candidate extraction is one
    ``regexp_extract_all`` of maximal digit runs (no lookarounds, so
    the pattern stays in the Java∩RE2 subset the oracle needs),
    length-filtered in a HOF; the Luhn sum is integer arithmetic over
    ``sequence(1, len)`` (double every second digit from the right,
    subtract 9 past 9, total ≡ 0 mod 10); redaction left-folds
    ``replace(acc, candidate, '[CARD]')`` over the validated list —
    every step bit-identical in DuckDB's list algebra.

    Takes a column NAME (the expression template inlines it); returns
    ``struct(redacted, n_candidates, n_valid_cards)``."""
    t = f"`{text_col}`"
    cands = (
        f"filter(regexp_extract_all({t}, '\\\\d+', 0),"
        f" x -> length(x) >= {int(min_len)} AND length(x) <= {int(max_len)})"
    )
    luhn = (
        "aggregate(sequence(1, length(x)), 0, (acc, i) -> acc + ("
        "CASE WHEN i % 2 = 0 THEN "
        "CASE WHEN 2 * CAST(substr(x, length(x) - i + 1, 1) AS INT) > 9 "
        "THEN 2 * CAST(substr(x, length(x) - i + 1, 1) AS INT) - 9 "
        "ELSE 2 * CAST(substr(x, length(x) - i + 1, 1) AS INT) END "
        "ELSE CAST(substr(x, length(x) - i + 1, 1) AS INT) END)) % 10 = 0"
    )
    valid = f"filter({cands}, x -> {luhn})"
    return F.expr(
        "named_struct("
        f"'redacted', aggregate({valid}, {t}, (acc, x) ->"
        " replace(acc, x, '[CARD]')),"
        f"'n_candidates', CAST(size({cands}) AS BIGINT),"
        f"'n_valid_cards', CAST(size({valid}) AS BIGINT))"
    )
