"""Planted-case tests for the PII scrub operators (email/phone/IPv4
redaction order, attribution, and the digit-mask display helper)."""

from __future__ import annotations

from databridge_etl_tools_spark.operators.pii import mask_digits_keep_last, pii_scrub


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(pii_scrub("t").alias("s")).select("s.*").first()


def test_scrub_all_three_kinds(spark):
    r = _scrub(spark, "mail a@b.com or call 215-555-0199 from 192.168.1.10 now")
    assert r.redacted == "mail [EMAIL] or call [PHONE] from [IPV4] now"
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 1, 1)


def test_scrub_phone_inside_email_attributed_to_email(spark):
    # the digit run is part of the email local part; email scrubs first,
    # so no phone is counted or left behind
    r = _scrub(spark, "reach me at x123-456-7890@corp.example.org ok")
    assert r.redacted == "reach me at [EMAIL] ok"
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 0, 0)


def test_scrub_multiple_and_boundaries(spark):
    r = _scrub(spark, "a@b.co c@d.io 111-222-3333 444-555-6666 10.0.0.1")
    assert (r.n_email, r.n_phone, r.n_ipv4) == (2, 2, 1)
    # 12345-678-9012 has a 5-digit head: \b\d{3} can't match mid-run
    r2 = _scrub(spark, "order 12345-678-9012 is not a phone")
    assert r2.n_phone == 0 and "12345-678-9012" in r2.redacted


def test_scrub_clean_text_untouched(spark):
    r = _scrub(spark, "no identifiers here, just prose.")
    assert r.redacted == "no identifiers here, just prose."
    assert (r.n_email, r.n_phone, r.n_ipv4) == (0, 0, 0)


def test_mask_digits_keep_last(spark):
    df = spark.createDataFrame(
        [("215-989-7412",), ("card 4111 1111 1111 1234 ok",), ("pin 123",)],
        "t string",
    )
    out = [r[0] for r in df.select(mask_digits_keep_last("t")).collect()]
    assert out[0] == "***-***-7412"
    assert out[1] == "card **** **** **** 1234 ok"
    # runs of <= keep digits stay untouched
    assert out[2] == "pin 123"


def _cards(spark, text):
    from databridge_etl_tools_spark.operators.pii import luhn_card_scrub

    df = spark.createDataFrame([(text,)], "t string")
    return df.select(luhn_card_scrub("t").alias("s")).select("s.*").first()


def test_luhn_valid_card_redacted(spark):
    r = _cards(spark, "pay 4539578763621486 today")
    assert r.redacted == "pay [CARD] today"
    assert (r.n_candidates, r.n_valid_cards) == (1, 1)


def test_luhn_checksum_failure_survives(spark):
    # same digits, last one off by 6: candidate but NOT redacted
    r = _cards(spark, "ref 4539578763621480 kept")
    assert r.redacted == "ref 4539578763621480 kept"
    assert (r.n_candidates, r.n_valid_cards) == (1, 0)


def test_luhn_length_window(spark):
    # 12 digits (too short) and 20 digits (too long) are not candidates;
    # a 14-digit timestamp-like run is a candidate but fails the checksum
    r = _cards(spark, "a 123456789012 b 12345678901234567890 c 20260815120001")
    assert (r.n_candidates, r.n_valid_cards) == (1, 0)
    assert "[CARD]" not in r.redacted


def test_luhn_multiple_occurrences_all_redacted(spark):
    r = _cards(spark, "x 4539578763621486 y 4539578763621486 z")
    assert r.redacted == "x [CARD] y [CARD] z"
    assert r.n_valid_cards == 2
