"""Geometry codecs past the SQL boundary (SURVEY §2.7 F15/F16):
WKB ⇄ WKT round-trip and WKT → Esri JSON, as Arrow-batched pandas
UDF transforms.

The reference does this with shapely (db2/db2.py:821-878 EWKB
round-trip in 1000-row batches; ago/ago.py:361-433 + 674-757 WKT→Esri
JSON). shapely is not in this container; the POINT WKB codec is
implemented directly (the format is 21/25 fixed bytes) and the Esri
JSON converter parses WKT structurally — both keep the real Spark
plumbing (binary columns, Arrow batches) with no third-party geometry
dependency. Full multi-geometry WKB would route through shapely when
available (import seam marked).
"""

from __future__ import annotations

import json
import re
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

_PT = re.compile(
    r"^\s*(?:SRID=(\d+)\s*;)?\s*POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)\s*$",
    re.IGNORECASE,
)
_EMPTY = re.compile(r"^\s*(?:SRID=(\d+)\s*;)?\s*(\w+)\s+EMPTY\s*$", re.IGNORECASE)


def point_wkt_to_ewkb(wkt: str | None) -> bytes | None:
    """``[SRID=n;]POINT (x y)`` → (E)WKB bytes (little-endian; SRID
    flag 0x20000000 when tagged — the PostGIS EWKB convention)."""
    if wkt is None:
        return None
    m = _PT.match(wkt)
    if not m:
        raise ValueError(f"not a POINT wkt: {wkt[:50]!r}")
    srid, x, y = m.group(1), float(m.group(2)), float(m.group(3))
    if srid:
        return struct.pack("<BIIdd", 1, 0x20000001, int(srid), x, y)
    return struct.pack("<BIdd", 1, 1, x, y)


def _fmt(v: float) -> str:
    # shortest round-trip repr; integral values render bare ("10")
    return str(int(v)) if v == int(v) else repr(v)


def ewkb_to_point_wkt(blob: bytes | None) -> str | None:
    if blob is None:
        return None
    b = bytes(blob)
    (kind,) = struct.unpack_from("<I", b, 1)
    if kind == 0x20000001:
        srid, x, y = struct.unpack_from("<Idd", b, 5)
        return f"SRID={srid};POINT ({_fmt(x)} {_fmt(y)})"
    if kind == 1:
        x, y = struct.unpack_from("<dd", b, 5)
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    raise ValueError(f"unsupported WKB geometry type 0x{kind:x}")


def wkt_to_ewkb_col(df: DataFrame, wkt_col: str, out_col: str = "ewkb") -> DataFrame:
    """F15 encode leg as an Arrow-batched transform (binary out)."""
    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} binary"])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [point_wkt_to_ewkb(v) for v in pdf[wkt_col]]
            yield out

    return df.mapInPandas(run, schema)


def ewkb_to_wkt_col(df: DataFrame, ewkb_col: str, out_col: str = "wkt") -> DataFrame:
    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} string"])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [ewkb_to_point_wkt(v) for v in pdf[ewkb_col]]
            yield out

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------
# F16: WKT → Esri JSON
# ---------------------------------------------------------------------

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?|NaN"


def _coords(text: str) -> list[list[float]]:
    return [
        [float(v) for v in re.findall(_NUM, ring)]
        for ring in re.findall(r"\(([^()]+)\)", text)
    ]


def _split_top(s: str) -> list[str]:
    """Split on commas at paren depth 0 (WKT group separator)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _strip_parens(s: str) -> str:
    s = s.strip()
    if s.startswith("(") and s.endswith(")"):
        return s[1:-1]
    return s


def _ring_points(ring_text: str) -> list[list[float]]:
    nums = [float(v) for v in re.findall(_NUM, ring_text)]
    return [[nums[i], nums[i + 1]] for i in range(0, len(nums) - 1, 2)]


def _signed_area2(ring: list[list[float]]) -> float:
    """Twice the shoelace signed area (positive = counterclockwise)."""
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return a


def _oriented(ring: list[list[float]], clockwise: bool) -> list[list[float]]:
    ccw = _signed_area2(ring) > 0
    return ring[::-1] if ccw == clockwise else ring


def _polygon_esri_rings(body: str, multi: bool) -> list[list[list[float]]]:
    """WKT polygon body → Esri rings with holes and winding handled.

    Esri JSON has no exterior/hole nesting — a polygon is a flat ring
    list where winding IS the semantics: outer rings clockwise, holes
    counterclockwise. The first WKT ring of each polygon is its
    exterior (forced CW), the rest are holes (forced CCW). The
    reference formats only ``poly.exterior`` and silently drops
    interior rings (ago/ago.py:364-376, 398-412); holes are kept here
    because AGO itself requires them for donut geometries.
    """
    polys = [_strip_parens(g) for g in _split_top(body)] if multi else [body]
    rings: list[list[list[float]]] = []
    for poly in polys:
        for ri, ring_text in enumerate(_split_top(poly)):
            pts = _ring_points(_strip_parens(ring_text))
            if pts:
                rings.append(_oriented(pts, clockwise=(ri == 0)))
    return rings


def wkt_to_esri_json(wkt: str | None, srid: int | None = None) -> str | None:
    """WKT → Esri geometry JSON (reference semantics, ago/ago.py:
    361-433, 674-757): POINT → {x,y,spatialReference}; POLYGON /
    MULTIPOLYGON (flattened) → {rings}; LINESTRING/MULTI → {paths};
    empties → NaN point / empty lists. MULTIPOINT is not implemented
    in the reference either (ago/ago.py:564-565)."""
    if wkt is None:
        return None
    sr = {"wkid": srid} if srid else None
    m = _EMPTY.match(wkt)
    if m:
        kind = m.group(2).upper()
        if kind in ("POINT", "MULTIPOINT"):
            doc: dict = {"x": "NaN", "y": "NaN"}
        elif "LINE" in kind:
            doc = {"paths": []}
        else:
            doc = {"rings": []}
        if sr:
            doc["spatialReference"] = sr
        return json.dumps(doc, sort_keys=True)
    m = _PT.match(wkt)
    if m:
        if m.group(1):
            sr = {"wkid": int(m.group(1))}
        doc = {"x": float(m.group(2)), "y": float(m.group(3))}
        if sr:
            doc["spatialReference"] = sr
        return json.dumps(doc, sort_keys=True)
    srm = re.match(r"^\s*SRID=(\d+)\s*;\s*(.*)$", wkt, re.DOTALL)
    if srm:
        sr = {"wkid": int(srm.group(1))}
        wkt = srm.group(2)
    stripped = wkt.strip()
    kind = stripped.split("(", 1)[0].strip().upper()
    if kind == "MULTIPOINT":
        raise NotImplementedError("MULTIPOINT is not implemented (reference parity)")
    # body == text inside the outermost paren pair
    body = _strip_parens("(" + stripped.split("(", 1)[1])
    if "LINE" in kind:
        rings = _coords(wkt)
        pts = [
            [[ring[i], ring[i + 1]] for i in range(0, len(ring) - 1, 2)]
            for ring in rings
        ]
        doc = {"paths": pts}
    else:
        doc = {"rings": _polygon_esri_rings(body, multi=kind == "MULTIPOLYGON")}
    if sr:
        doc["spatialReference"] = sr
    return json.dumps(doc, sort_keys=True)


def wkt_to_esri_json_col(df: DataFrame, wkt_col: str, out_col: str = "esri_json") -> DataFrame:
    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} string"])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [wkt_to_esri_json(v) for v in pdf[wkt_col]]
            yield out

    return df.mapInPandas(run, schema)
