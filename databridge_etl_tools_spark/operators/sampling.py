"""Deterministic sampling for training-data pipelines: uniform rate
sampling, per-stratum rates, and stable train/val splits.

Everything is keyed on a CONTENT hash (md5 of a key column + salt),
never on RNG state or row position, so samples are:
- reproducible across engines (the DuckDB oracles recompute them),
- reproducible across cluster layouts and retries (no
  rand()/monotonically_increasing_id in the decision path),
- stable under appends — a row's fate never changes when other rows
  arrive, which is what makes incremental dataset rebuilds sane.

Scale: pure map-side column expressions (one md5 per row), zero
shuffles; Catalyst pushes the keep-predicate into the scan's filter
stage, so a 1% sample of 100 TB reads everything once but shuffles
and writes only the 1%.

``df.sample()`` is deliberately not used: it is seeded per-partition,
so the same row's fate changes with partitioning — the opposite of
the reproducibility contract above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32 — the hash-unit denominator (8 md5 hex chars)
_UNIT = float(1 << 32)


def hash_unit(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1): leading 8 md5 hex chars
    of ``salt:key`` over 2^32. Same recipe as the dedup/minhash
    hashes, so any engine reproduces it bit-for-bit."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 8), 16, 10
    ).cast("bigint")
    return h / F.lit(_UNIT)


def sample_deterministic(
    df: DataFrame, key: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, decided per-row by content hash."""
    return df.where(hash_unit(key, salt) < rate)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key: str | None = None,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum sampling rates (the corpus-balancing move: e.g.
    keep 100% of rare languages, 5% of English). ``key`` defaults to
    the stratum column itself — pass the document id for row-level
    fates."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.where(hash_unit(key or strata_col, salt) < rate)


def train_val_split(
    df: DataFrame, key: str, val_fraction: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Stable split assignment: adds ``split`` ∈ {'train','val'}.
    Keyed on content, so a document never migrates between splits
    across rebuilds (the leakage-prevention property training
    pipelines need)."""
    return df.withColumn(
        "split",
        F.when(hash_unit(key, salt) < val_fraction, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )
