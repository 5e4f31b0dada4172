"""Geometry codecs past the SQL boundary (SURVEY §2.7 F15/F16):
WKB ⇄ WKT round-trip and WKT → Esri JSON, as Arrow-batched pandas
UDF transforms.

The reference does this with shapely (db2/db2.py:821-878 EWKB
round-trip in 1000-row batches; ago/ago.py:361-433 + 674-757 WKT→Esri
JSON). shapely is not in this container; the full (E)WKB codec (POINT /
LINESTRING / POLYGON / MULTI*, SRID flag, EMPTY forms) is implemented
directly against the OGC byte layout, and the Esri JSON converter
parses WKT structurally — both keep the real Spark plumbing (binary
columns, Arrow batches) with no third-party geometry dependency.
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


# -- full multi-geometry (E)WKB codec ---------------------------------
# Geometry type codes per the OGC WKB spec; EWKB adds the PostGIS
# SRID flag (0x20000000) on the outermost geometry only.

_WKB_KINDS = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
}
_KIND_NAMES = {v: k for k, v in _WKB_KINDS.items()}
_SRID_FLAG = 0x20000000


def _pack_coords(pts: list[list[float]]) -> bytes:
    return b"".join(struct.pack("<dd", x, y) for x, y in pts)


def _encode_body(kind: str, body: str) -> bytes:
    """WKT body text (inside the outermost parens, or '' for EMPTY) →
    WKB payload after the type word."""
    from math import nan

    if kind == "POINT":
        if not body:
            return struct.pack("<dd", nan, nan)  # POINT EMPTY convention
        x, y = (float(v) for v in body.split())
        return struct.pack("<dd", x, y)
    if kind == "LINESTRING":
        pts = _ring_points(body) if body else []
        return struct.pack("<I", len(pts)) + _pack_coords(pts)
    if kind == "POLYGON":
        rings = [_ring_points(_strip_parens(r)) for r in _split_top(body)] if body else []
        out = struct.pack("<I", len(rings))
        for ring in rings:
            out += struct.pack("<I", len(ring)) + _pack_coords(ring)
        return out
    # MULTI*: each element is a full nested WKB geometry (no SRID)
    base = {"MULTIPOINT": "POINT", "MULTILINESTRING": "LINESTRING",
            "MULTIPOLYGON": "POLYGON"}[kind]
    parts = _split_top(body) if body else []
    out = struct.pack("<I", len(parts))
    for part in parts:
        inner = _strip_parens(part) if base != "POINT" else part.strip().strip("()").strip()
        out += struct.pack("<BI", 1, _WKB_KINDS[base]) + _encode_body(base, inner)
    return out


def wkt_to_ewkb(wkt: str | None) -> bytes | None:
    """``[SRID=n;]<geometry> (...)`` → (E)WKB for POINT / LINESTRING /
    POLYGON / MULTI* (little-endian; SRID flag on the outer geometry —
    the PostGIS EWKB convention the reference round-trips through
    geopetl/shapely, db2/db2.py:821-878)."""
    if wkt is None:
        return None
    s = wkt.strip()
    srid = None
    if s.upper().startswith("SRID="):
        head, s = s.split(";", 1)
        srid = int(head[5:])
        s = s.strip()
    m = re.match(r"^(\w+)\s*(EMPTY|\(.*\))\s*$", s, re.DOTALL)
    if not m:
        raise ValueError(f"unparseable wkt: {wkt[:50]!r}")
    kind = m.group(1).upper()
    if kind not in _WKB_KINDS:
        raise ValueError(f"unsupported geometry kind: {kind}")
    body = "" if m.group(2).upper() == "EMPTY" else _strip_parens(m.group(2))
    payload = _encode_body(kind, body)
    code = _WKB_KINDS[kind]
    if srid is not None:
        return struct.pack("<BII", 1, code | _SRID_FLAG, srid) + payload
    return struct.pack("<BI", 1, code) + payload


def _fmt_pts(pts: list[tuple]) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)


def _decode_body(kind: str, b: bytes, off: int) -> tuple[str, int]:
    """→ (WKT body text with parens, next offset)."""
    if kind == "POINT":
        x, y = struct.unpack_from("<dd", b, off)
        off += 16
        if x != x and y != y:  # NaN,NaN = POINT EMPTY
            return "EMPTY", off
        return f"({_fmt(x)} {_fmt(y)})", off
    if kind == "LINESTRING":
        (n,) = struct.unpack_from("<I", b, off)
        off += 4
        pts = [struct.unpack_from("<dd", b, off + 16 * i) for i in range(n)]
        off += 16 * n
        return ("EMPTY" if not n else f"({_fmt_pts(pts)})"), off
    if kind == "POLYGON":
        (nr,) = struct.unpack_from("<I", b, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from("<I", b, off)
            off += 4
            pts = [struct.unpack_from("<dd", b, off + 16 * i) for i in range(n)]
            off += 16 * n
            rings.append(f"({_fmt_pts(pts)})")
        return ("EMPTY" if not nr else "(" + ", ".join(rings) + ")"), off
    # MULTI*
    base = {"MULTIPOINT": "POINT", "MULTILINESTRING": "LINESTRING",
            "MULTIPOLYGON": "POLYGON"}[kind]
    (n,) = struct.unpack_from("<I", b, off)
    off += 4
    parts = []
    for _ in range(n):
        (code,) = struct.unpack_from("<I", b, off + 1)
        off += 5
        body, off = _decode_body(_KIND_NAMES[code & 0xFF], b, off)
        parts.append(body)
    return ("EMPTY" if not n else "(" + ", ".join(parts) + ")"), off


def ewkb_to_wkt(blob: bytes | None) -> str | None:
    """Inverse of :func:`wkt_to_ewkb` for every supported kind."""
    if blob is None:
        return None
    b = bytes(blob)
    (code,) = struct.unpack_from("<I", b, 1)
    off = 5
    srid = None
    if code & _SRID_FLAG:
        (srid,) = struct.unpack_from("<I", b, off)
        off += 4
        code &= ~_SRID_FLAG
    kind = _KIND_NAMES.get(code)
    if kind is None:
        raise ValueError(f"unsupported WKB geometry type 0x{code:x}")
    body, _ = _decode_body(kind, b, off)
    text = f"{kind} {body}"
    return f"SRID={srid};{text}" if srid is not None else text


def wkt_to_ewkb_col(df: DataFrame, wkt_col: str, out_col: str = "ewkb") -> DataFrame:
    """F15 encode leg as an Arrow-batched transform (binary out)."""
    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} binary"])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [wkt_to_ewkb(v) for v in pdf[wkt_col]]
            yield out

    return df.mapInPandas(run, schema)


def ewkb_to_wkt_col(df: DataFrame, ewkb_col: str, out_col: str = "wkt") -> DataFrame:
    schema = ", ".join([f"`{c}` {t}" for c, t in df.dtypes] + [f"{out_col} string"])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [ewkb_to_wkt(v) for v in pdf[ewkb_col]]
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
