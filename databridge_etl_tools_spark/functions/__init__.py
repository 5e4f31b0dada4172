"""Scalar-function layer (SURVEY §2.7 F1-F24).

Every function that can be a JVM-side Column expression is one —
these stay inside whole-stage codegen and cost nothing extra at
100 TB. Python appears only in ``geometry_udf`` (Arrow-vectorized
pandas UDFs for WKT⇄Esri-JSON and reprojection plumbing).
"""

from .text import (  # noqa: F401
    array_braces,
    empty_to_null,
    list_to_json,
    normalize_headers,
    sanitize_ascii,
    scrub_null_bytes,
    snakecase,
)
from .datetimes import (  # noqa: F401
    date_to_eastern_midnight_utc,
    localize_naive_eastern,
    naive_eastern_to_epoch_ms,
    to_epoch_ms_utc,
)
from .geometry import (  # noqa: F401
    force_2d,
    geometry_kind,
    point_to_lon_lat,
    promote_to_multi,
    remap_bad_srid,
    repair_nan,
    srid_of,
    strip_srid,
    with_srid,
)
