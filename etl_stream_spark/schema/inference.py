"""Value-based schema inference (last-resort acquisition path).

When neither the catalog nor Relation events supply a schema, infer Spark
types from sample values — semantics per the reference's Python fallback
(``etl-snowflake-py/etl_snowflake/client.py:819-852``; SURVEY.md §1.1):

* bool → Boolean, int → Long, float → Double;
* list → Array (element type inferred from first non-null element);
* dict → raw JSON string (VARIANT semantics, no nested structs — the
  reference keeps JSON objects opaque);
* numeric-looking strings promote: integer-string → Long,
  decimal-string → Decimal(38,10);
* anything else → String; all-null columns → String.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import types as T

_INT_STRING_RE = re.compile(r"^-?\d+$")
_DECIMAL_STRING_RE = re.compile(r"^-?\d+\.\d+$")


def infer_spark_type(value: object) -> T.DataType:
    """Infer the Spark type of one Python value."""
    if value is None:
        return T.StringType()
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, datetime):
        return T.TimestampType()
    if isinstance(value, date):
        return T.DateType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, dict):
        return T.StringType()  # opaque JSON (VARIANT)
    if isinstance(value, (list, tuple)):
        elem = next((v for v in value if v is not None), None)
        return T.ArrayType(infer_spark_type(elem), containsNull=True)
    if isinstance(value, str):
        if _INT_STRING_RE.match(value):
            return T.LongType()
        if _DECIMAL_STRING_RE.match(value):
            return T.DecimalType(38, 10)
        return T.StringType()
    return T.StringType()


def infer_struct_type(rows: list[dict[str, object]]) -> T.StructType:
    """Infer a StructType from sample row dicts: per column, the type of
    the first non-null value (the reference's Arrow-encoding rule,
    ``src/destination/snowflake_destination.rs:624-631``), with string
    fallback when values disagree."""
    order: list[str] = []
    first_nonnull: dict[str, object] = {}
    conflicted: set[str] = set()
    for row in rows:
        for k, v in row.items():
            if k not in first_nonnull and k not in order:
                order.append(k)
            if v is None:
                continue
            if k not in first_nonnull:
                first_nonnull[k] = v
            else:
                if infer_spark_type(first_nonnull[k]) != infer_spark_type(v):
                    conflicted.add(k)
    fields = []
    for k in order:
        if k in conflicted:
            dtype: T.DataType = T.StringType()
        else:
            dtype = infer_spark_type(first_nonnull.get(k))
        fields.append(T.StructField(k, dtype, True))
    return T.StructType(fields)


def arrow_to_struct_type(arrow_schema) -> T.StructType:
    """Arrow-schema → Spark StructType recovery — the Arrow-based
    inference fallback (``etl-snowflake-py/etl_snowflake/client.py:
    624-656``). Uses PySpark's own Arrow conversion so every Arrow type
    Spark can exchange is covered; fields become nullable (landed CDC
    columns are all-nullable, ``ddl.py:290-321``)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    struct = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)
    return T.StructType([T.StructField(f.name, f.dataType, True) for f in struct.fields])
