"""Postgres type OID / typmod → Spark ``DataType`` mapping.

Semantics match the reference's Snowflake/BigQuery/Iceberg mappers
(SURVEY.md §1.2; reference ``etl-snowflake-py/etl_snowflake/type_mapping.py``,
``etl-destination/src/iceberg/schema.rs:41-64``), re-targeted at Spark's
type system:

* ``numeric`` typmod decodes to ``DecimalType(p, s)`` with precision
  capped at 38 (reference caps at Snowflake's 38,
  ``type_mapping.py:203-209``); a typmod-less numeric defaults to
  ``DecimalType(38, 10)`` (reference default NUMBER(38,10)).
* ``varchar``/``bpchar`` length = typmod − 4 (header bytes); Spark has no
  length-bounded string so the length is informational only.
* unsigned ``oid`` (u32) widens to ``LongType`` (no unsigned in Spark).
* ``time`` has no Spark type → microseconds-since-midnight ``LongType``
  (the reference stores Arrow Time64(µs),
  ``src/destination/snowflake_destination.rs:729-742``).
* ``json``/``jsonb`` stay raw ``StringType`` (VARIANT semantics: opaque at
  landing, parsed on demand — reference ``task.py:77-79``).
* unknown types fall back to ``StringType`` (reference ``type_mapping.py:244``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

MAX_DECIMAL_PRECISION = 38
DEFAULT_NUMERIC = (38, 10)

# Postgres built-in type OIDs (pg_catalog.pg_type).
_OID_BOOL = 16
_OID_BYTEA = 17
_OID_CHAR = 18
_OID_NAME = 19
_OID_INT8 = 20
_OID_INT2 = 21
_OID_INT4 = 23
_OID_TEXT = 25
_OID_OID = 26
_OID_JSON = 114
_OID_FLOAT4 = 700
_OID_FLOAT8 = 701
_OID_INET = 869
_OID_CIDR = 650
_OID_MACADDR = 829
_OID_BPCHAR = 1042
_OID_VARCHAR = 1043
_OID_DATE = 1082
_OID_TIME = 1083
_OID_TIMESTAMP = 1114
_OID_TIMESTAMPTZ = 1184
_OID_INTERVAL = 1186
_OID_NUMERIC = 1700
_OID_UUID = 2950
_OID_JSONB = 3802

# Array-type OID → element OID (the common built-ins).
_ARRAY_OIDS: dict[int, int] = {
    1000: _OID_BOOL,
    1001: _OID_BYTEA,
    1005: _OID_INT2,
    1007: _OID_INT4,
    1016: _OID_INT8,
    1021: _OID_FLOAT4,
    1022: _OID_FLOAT8,
    1009: _OID_TEXT,
    1015: _OID_VARCHAR,
    1014: _OID_BPCHAR,
    1182: _OID_DATE,
    1183: _OID_TIME,
    1115: _OID_TIMESTAMP,
    1185: _OID_TIMESTAMPTZ,
    1231: _OID_NUMERIC,
    2951: _OID_UUID,
    199: _OID_JSON,
    3807: _OID_JSONB,
    1028: _OID_OID,
}


def decode_numeric_typmod(typmod: int) -> tuple[int, int]:
    """Decode a Postgres numeric typmod into (precision, scale).

    Postgres packs ``((precision << 16) | scale) + 4`` (VARHDRSZ) into the
    attribute typmod. ``-1`` means unconstrained → the reference's default
    NUMBER(38,10). Precision is capped at Spark's (and Snowflake's) 38.
    """
    if typmod is None or typmod < 0:
        return DEFAULT_NUMERIC
    packed = typmod - 4
    precision = (packed >> 16) & 0xFFFF
    scale = packed & 0xFFFF
    if precision <= 0:
        return DEFAULT_NUMERIC
    if precision > MAX_DECIMAL_PRECISION:
        precision = MAX_DECIMAL_PRECISION
    scale = min(scale, precision)
    return precision, scale


def decode_varchar_typmod(typmod: int) -> int | None:
    """varchar/bpchar typmod → declared character length (or None)."""
    if typmod is None or typmod < 4:
        return None
    return typmod - 4


_SCALAR_OID_MAP: dict[int, T.DataType] = {
    _OID_BOOL: T.BooleanType(),
    _OID_INT2: T.ShortType(),
    _OID_INT4: T.IntegerType(),
    _OID_INT8: T.LongType(),
    _OID_OID: T.LongType(),  # u32 widened; Spark has no unsigned
    _OID_FLOAT4: T.FloatType(),
    _OID_FLOAT8: T.DoubleType(),
    _OID_TEXT: T.StringType(),
    _OID_VARCHAR: T.StringType(),
    _OID_BPCHAR: T.StringType(),
    _OID_CHAR: T.StringType(),
    _OID_NAME: T.StringType(),
    _OID_BYTEA: T.BinaryType(),
    _OID_DATE: T.DateType(),
    _OID_TIME: T.LongType(),  # µs since midnight (no TimeType in Spark)
    _OID_TIMESTAMPTZ: T.TimestampType(),
    _OID_UUID: T.StringType(),
    _OID_JSON: T.StringType(),
    _OID_JSONB: T.StringType(),
    _OID_INTERVAL: T.StringType(),
    _OID_INET: T.StringType(),
    _OID_CIDR: T.StringType(),
    _OID_MACADDR: T.StringType(),
}


def _timestamp_ntz() -> T.DataType:
    # TimestampNTZType exists on Spark 3.4+/4.x; guard for safety.
    try:
        return T.TimestampNTZType()
    except AttributeError:  # pragma: no cover
        return T.TimestampType()


def oid_to_spark_type(oid: int, typmod: int = -1) -> T.DataType:
    """Map a Postgres type OID (+typmod) to the Spark type.

    Unknown OIDs → ``StringType`` (reference behavior: everything
    unmapped lands as VARCHAR)."""
    if oid == _OID_NUMERIC:
        p, s = decode_numeric_typmod(typmod)
        return T.DecimalType(p, s)
    if oid == _OID_TIMESTAMP:
        return _timestamp_ntz()
    if oid in _ARRAY_OIDS:
        elem = oid_to_spark_type(_ARRAY_OIDS[oid], typmod)
        return T.ArrayType(elem, containsNull=True)
    return _SCALAR_OID_MAP.get(oid, T.StringType())


_NAME_MAP: dict[str, int] = {
    "bool": _OID_BOOL,
    "boolean": _OID_BOOL,
    "int2": _OID_INT2,
    "smallint": _OID_INT2,
    "int4": _OID_INT4,
    "int": _OID_INT4,
    "integer": _OID_INT4,
    "int8": _OID_INT8,
    "bigint": _OID_INT8,
    "bigserial": _OID_INT8,
    "serial": _OID_INT4,
    "oid": _OID_OID,
    "float4": _OID_FLOAT4,
    "real": _OID_FLOAT4,
    "float8": _OID_FLOAT8,
    "double precision": _OID_FLOAT8,
    "numeric": _OID_NUMERIC,
    "decimal": _OID_NUMERIC,
    "text": _OID_TEXT,
    "varchar": _OID_VARCHAR,
    "character varying": _OID_VARCHAR,
    "bpchar": _OID_BPCHAR,
    "character": _OID_BPCHAR,
    "char": _OID_CHAR,
    "name": _OID_NAME,
    "bytea": _OID_BYTEA,
    "date": _OID_DATE,
    "time": _OID_TIME,
    "time without time zone": _OID_TIME,
    "timestamp": _OID_TIMESTAMP,
    "timestamp without time zone": _OID_TIMESTAMP,
    "timestamptz": _OID_TIMESTAMPTZ,
    "timestamp with time zone": _OID_TIMESTAMPTZ,
    "interval": _OID_INTERVAL,
    "uuid": _OID_UUID,
    "json": _OID_JSON,
    "jsonb": _OID_JSONB,
    "inet": _OID_INET,
    "cidr": _OID_CIDR,
    "macaddr": _OID_MACADDR,
}


def pg_type_name_to_spark_type(type_name: str, typmod: int = -1) -> T.DataType:
    """Map a formatted Postgres type name (e.g. ``numeric(12,2)``,
    ``text[]``, ``_int4``) to a Spark type.

    Array spellings: trailing ``[]`` or leading ``_`` (reference handles
    both, ``type_mapping.py:67-82,220-225``)."""
    name = type_name.strip().lower()
    if name.endswith("[]"):
        return T.ArrayType(pg_type_name_to_spark_type(name[:-2], typmod), True)
    if name.startswith("_"):
        return T.ArrayType(pg_type_name_to_spark_type(name[1:], typmod), True)
    # Parenthesized modifiers: numeric(12,2), varchar(100), char(3)
    base, paren, mods = name.partition("(")
    base = base.strip()
    if paren:
        mods = mods.rstrip(")").strip()
        if base in ("numeric", "decimal"):
            parts = [p.strip() for p in mods.split(",")]
            try:
                p = int(parts[0])
                s = int(parts[1]) if len(parts) > 1 else 0
                p2 = min(p, MAX_DECIMAL_PRECISION)
                return T.DecimalType(p2, min(s, p2))
            except ValueError:
                pass
    oid = _NAME_MAP.get(base)
    if oid is None:
        return T.StringType()
    return oid_to_spark_type(oid, typmod)


@dataclass(frozen=True)
class ColumnSpec:
    """One column of a discovered table schema (catalog or Relation event)."""

    name: str
    type_oid: int
    type_name: str
    typmod: int = -1
    nullable: bool = True
    primary: bool = False

    def to_struct_field(self) -> T.StructField:
        dtype = oid_to_spark_type(self.type_oid, self.typmod)
        return T.StructField(self.name, dtype, self.nullable)


def columns_to_struct_type(columns: list[ColumnSpec]) -> T.StructType:
    return T.StructType([c.to_struct_field() for c in columns])
