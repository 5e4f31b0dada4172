"""JSON Table Schema ⇄ Spark StructType (SURVEY §1.2-1.3).

The reference's universal contract is a frictionless-style JSON Table
Schema staged next to each CSV (``schemas/<schema>/<table>.json``)
with ``fields: [{name, type, constraints, geometry_type, srid}]`` and
``primaryKey`` (produced by postgres/_properties.py:57-178, consumed
by postgres/postgres.py:231-271 and carto/carto_.py:177-204). Two
type vocabularies coexist:

- old/"abstract" types (string/number/float/object/array/datetime…)
  mapped via DATA_TYPE_MAP (abstract/__init__.py:11-25,
  postgres/postgres_map.py:1-17)
- "new" schemas carrying real PostgreSQL type names used verbatim in
  DDL (postgres/postgres.py:527-549)

Here both vocabularies resolve to Spark types. Geometry columns stay
StringType (EWKT convention) and carry ``{geometry_type, srid}`` in
StructField metadata; the primary key and NOT NULL constraints map to
table properties / nullability. Drift detection reproduces
postgres/postgres.py:454-488 (normalize text⇄varchar, ignore
ESRI bookkeeping columns).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

#: old/"abstract" JSON-schema type → Spark type (reference
#: DATA_TYPE_MAP, postgres/postgres_map.py:1-17). ``numeric`` uses the
#: reference fixture precision numeric(38,8) (tests/test_postgres.py:31).
ABSTRACT_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "text": T.StringType(),
    "number": T.DecimalType(38, 8),
    "float": T.DecimalType(38, 8),
    "numeric": T.DecimalType(38, 8),
    "double precision": T.DoubleType(),
    "integer": T.IntegerType(),
    "boolean": T.BooleanType(),
    "object": T.StringType(),  # jsonb → JSON string
    "array": T.StringType(),  # jsonb/_text → JSON string at rest
    "date": T.DateType(),
    "time": T.StringType(),  # Spark has no TimeType
    "datetime": T.TimestampNTZType(),
    "geom": T.StringType(),  # EWKT
    "geometry": T.StringType(),  # EWKT
}

#: geometry_type promotion map (reference GEOM_TYPE_MAP,
#: postgres/postgres_map.py:19-27 — note polygon → MultiPolygon).
GEOM_TYPE_MAP = {
    "point": "Point",
    "line": "Linestring",
    "linestring": "Linestring",
    "polygon": "MultiPolygon",
    "multipolygon": "MultiPolygon",
    "multilinestring": "MultiLineString",
    "geometry": "Geometry",
}

#: columns the reference's drift check ignores
#: (postgres/postgres.py:454-488): the geometry column is compared
#: separately and ESRI adds gdb_geomattr_data behind your back.
DRIFT_IGNORED = {"shape", "gdb_geomattr_data"}


def _pg_type_to_spark(pg: str) -> T.DataType:
    """'new'-schema PostgreSQL type name → Spark type."""
    s = pg.strip().lower()
    if m := re.fullmatch(r"(?:character varying|varchar|character|char)(?:\((\d+)\))?", s):
        return T.StringType()
    if m := re.fullmatch(r"(?:numeric|decimal)\s*(?:\((\d+)\s*,\s*(\d+)\))?", s):
        if m.group(1):
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(38, 8)
    if s in ("smallint", "int2"):
        return T.ShortType()
    if s in ("integer", "int", "int4", "serial"):
        return T.IntegerType()
    if s in ("bigint", "int8", "bigserial"):
        return T.LongType()
    if s in ("real", "float4"):
        return T.FloatType()
    if s in ("double precision", "float8"):
        return T.DoubleType()
    if s == "boolean":
        return T.BooleanType()
    if s == "date":
        return T.DateType()
    if s.startswith("timestamptz") or s.startswith("timestamp with time zone"):
        return T.TimestampType()
    if s.startswith("timestamp"):
        return T.TimestampNTZType()
    if s in ("text", "jsonb", "json", "uuid", "time", "_text") or s.startswith("geometry"):
        return T.StringType()
    return T.StringType()


@dataclass
class TableSchema:
    """Engine-side schema object: Spark StructType + the reference's
    extra-relational facts (PK, geometry metadata)."""

    struct: T.StructType
    primary_key: list[str] = field(default_factory=list)

    @property
    def geometry_fields(self) -> dict[str, dict]:
        out = {}
        for f in self.struct.fields:
            if f.metadata and "geometry_type" in f.metadata:
                out[f.name] = {
                    "geometry_type": f.metadata.get("geometry_type"),
                    "srid": f.metadata.get("srid"),
                }
        return out

    # -- JSON Table Schema → Spark ------------------------------------
    @classmethod
    def from_json(cls, doc: str | dict) -> "TableSchema":
        if isinstance(doc, str):
            doc = json.loads(doc)
        fields: list[T.StructField] = []
        for f in doc.get("fields", []):
            name = f["name"]
            ftype = str(f.get("type", "string")).lower()
            required = bool(f.get("constraints", {}).get("required", False))
            meta: dict = {}
            if ftype in ("geometry", "geom"):
                gt = str(f.get("geometry_type", "geometry")).lower()
                meta["geometry_type"] = GEOM_TYPE_MAP.get(gt, "Geometry")
                if "srid" in f:
                    meta["srid"] = int(f["srid"])
                dtype: T.DataType = T.StringType()
            elif ftype in ABSTRACT_TYPE_MAP:
                dtype = ABSTRACT_TYPE_MAP[ftype]
            else:
                dtype = _pg_type_to_spark(ftype)
            fields.append(T.StructField(name, dtype, nullable=not required, metadata=meta))
        return cls(struct=T.StructType(fields), primary_key=list(doc.get("primaryKey", [])))

    # -- Spark → JSON Table Schema ------------------------------------
    def to_json(self) -> str:
        """Serialize back to the staged-schema convention (the
        extract-json-schema command, postgres/_properties.py:57-178)."""
        inverse = {
            T.StringType(): "string",
            T.DecimalType(38, 8): "numeric",
            T.IntegerType(): "integer",
            T.LongType(): "integer",
            T.ShortType(): "integer",
            T.DoubleType(): "number",
            T.FloatType(): "number",
            T.BooleanType(): "boolean",
            T.DateType(): "date",
            T.TimestampNTZType(): "datetime",
            T.TimestampType(): "timestamp with time zone",
        }
        out = {"primaryKey": list(self.primary_key), "fields": []}
        for f in self.struct.fields:
            entry: dict = {"name": f.name}
            if f.metadata and "geometry_type" in f.metadata:
                entry["type"] = "geometry"
                entry["geometry_type"] = f.metadata["geometry_type"].lower()
                if "srid" in f.metadata:
                    entry["srid"] = int(f.metadata["srid"])
            else:
                entry["type"] = inverse.get(f.dataType, f.dataType.simpleString())
            if not f.nullable:
                entry["constraints"] = {"required": True}
            out["fields"].append(entry)
        return json.dumps(out, indent=2)


def _normalize_for_drift(dtype: T.DataType) -> str:
    """text ⇄ character varying normalization (postgres.py:462-470)."""
    if isinstance(dtype, T.StringType):
        return "text"
    if isinstance(dtype, (T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    return dtype.simpleString()


def schema_drift(expected: T.StructType, actual: T.StructType) -> list[str]:
    """Column-level drift report; non-empty ⇒ the reference would drop
    and recreate the table (postgres/postgres.py:454-488)."""
    problems: list[str] = []
    exp = {f.name.lower(): f for f in expected.fields if f.name.lower() not in DRIFT_IGNORED}
    act = {f.name.lower(): f for f in actual.fields if f.name.lower() not in DRIFT_IGNORED}
    for name in exp.keys() - act.keys():
        problems.append(f"missing column: {name}")
    for name in act.keys() - exp.keys():
        problems.append(f"unexpected column: {name}")
    for name in exp.keys() & act.keys():
        a, b = _normalize_for_drift(exp[name].dataType), _normalize_for_drift(act[name].dataType)
        if a != b:
            problems.append(f"type drift on {name}: expected {a}, actual {b}")
    return problems
