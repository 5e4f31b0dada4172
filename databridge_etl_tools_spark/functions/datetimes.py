"""Timezone-policy scalar functions (SURVEY §2.7 F7-F9).

The reference carries three distinct policies that must not be
unified away (SURVEY §7.3b):

- extract: naive timestamps are *US/Eastern wall clock*
  (postgres/postgres.py:837-857)
- Carto: dates become Eastern-midnight tz-aware values
  (carto/carto_.py:338-351)
- Esri/AGO: dates are epoch **milliseconds UTC**, naive assumed
  Eastern (ago/ago.py:460-476 — the reference's ``timezone.est``
  attribute is a latent bug; we implement the intent).

All implementations are session-timezone-independent: they operate on
TIMESTAMP_NTZ via ``convert_timezone`` + ``timestamp_diff``, so
results don't shift under a driver session in a different local zone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EASTERN = "America/New_York"


def _ntz(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")


def _epoch_ms(ntz: Column) -> Column:
    # pure integer arithmetic on the NTZ microsecond value; no
    # session-tz involvement.
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MILLISECOND", epoch, ntz)


def truncate_ntz(col: Column | str, unit: str = "HOUR") -> Column:
    """Session-tz-independent truncation of a TIMESTAMP_NTZ.

    Spark's ``date_trunc`` returns a session-zone TIMESTAMP (values
    shift under a non-UTC driver session); integer bucket arithmetic
    against the epoch stays in NTZ space. Floor semantics (not
    truncate-toward-zero), so pre-1970 timestamps bucket like
    ``date_trunc`` would. Valid units: HOUR, MINUTE, DAY, etc.
    """
    width = _UNIT_MICROS.get(unit.upper())
    if width is None:
        raise ValueError(
            f"truncate_ntz supports fixed-width units {sorted(_UNIT_MICROS)}, "
            f"got {unit!r} (calendar units like MONTH need calendar logic)"
        )
    return F.timestamp_add("MICROSECOND", -epoch_floor_offset(_ntz(col), width), _ntz(col))


_UNIT_MICROS = {
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
}


def epoch_floor_offset(ntz: Column, width_micros: int) -> Column:
    """Microseconds from the previous width boundary to ``ntz`` —
    floor semantics via positive modulus (pre-1970 safe). Shared by
    truncate_ntz and the range-join bucketizer."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    micros = F.timestamp_diff("MICROSECOND", epoch, ntz)
    return ((micros % width_micros) + width_micros) % width_micros


def epoch_bucket(ntz: Column, width_micros: int) -> Column:
    """Floor bucket index of an NTZ timestamp for a fixed width."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    micros = F.timestamp_diff("MICROSECOND", epoch, ntz)
    return ((micros - epoch_floor_offset(ntz, width_micros)) / width_micros).cast(
        "bigint"
    )


def localize_naive_eastern(col: Column | str) -> Column:
    """F7: interpret a naive timestamp as US/Eastern wall clock and
    return the equivalent UTC wall clock (TIMESTAMP_NTZ)."""
    return F.convert_timezone(F.lit(EASTERN), F.lit("UTC"), _ntz(col))


def date_to_eastern_midnight_utc(col: Column | str) -> Column:
    """F8: calendar date → Eastern midnight, expressed as UTC wall
    clock (Carto upload policy, carto/carto_.py:338-351)."""
    midnight = F.date_trunc("DAY", _ntz(col))
    return F.convert_timezone(F.lit(EASTERN), F.lit("UTC"), midnight)


def to_epoch_ms_utc(col: Column | str) -> Column:
    """Epoch milliseconds (BIGINT) of a TIMESTAMP_NTZ already in UTC."""
    return _epoch_ms(_ntz(col))


def naive_eastern_to_epoch_ms(col: Column | str) -> Column:
    """F9: Esri date policy — naive value assumed Eastern → epoch ms
    UTC as BIGINT (ago/ago.py:460-476)."""
    return _epoch_ms(localize_naive_eastern(col))
