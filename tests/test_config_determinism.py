"""Config-perturbation determinism: the oracle-hash gate only works
if results are bit-identical under different shuffle widths — the
knob that changes partial-aggregation grouping, partition counts, and
reduction order. A sample of gate queries spanning the risky families
(decimal aggs, window ranks, hash sampling, fixed-point sums,
percentiles) must produce identical sorted rows at 32 and 7 shuffle
partitions."""

from __future__ import annotations

import pytest

import __spark_entry__ as ent

SAMPLE = [
    "pricing_summary",           # decimal-routed double sums
    "text_keywords_tfidf",       # rational scores + rank cut
    "sample_weighted_length",    # integer hash accept
    "text_lm_bigram_score",      # fixed-point sums
    "user_activity_anomalies_mad",  # interpolated percentiles
    "vocab_growth_curve",        # min-bucket + cumulative join
]


def _rows(spark, name, sf_dir):
    df = ent.queries()[name](spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_results_stable_across_shuffle_widths(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    base = _rows(spark, name, sf_dir)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert _rows(spark, name, sf_dir) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
