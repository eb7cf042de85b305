"""Cell→JSON serialization (P4/P5 of SURVEY.md §2.3).

The reference serializes typed cells to JSON scalars/arrays when shipping
rows to the warehouse: bytes are base64-encoded
(``src/destination/snowflake_destination.rs:877-880``), timestamptz is
RFC3339 (``:889``), and NaN/±Inf floats become JSON ``null``
(``:1106-1125``). In Spark the heavy lifting is ``to_json`` (JVM-side,
codegen); these helpers only add the reference's extra conventions on
top. Everything stays a Column expression — no UDFs, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

RFC3339_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def sanitize_floats(col: Column) -> Column:
    """NaN/±Inf → null for a float/double column (the JSON-array
    serialization rule at ``snowflake_destination.rs:1106-1125``)."""
    bad = F.isnan(col) | (F.abs(col) == F.lit(float("inf")))
    return F.when(bad, F.lit(None)).otherwise(col)


def cell_json(col: Column, data_type: T.DataType) -> Column:
    """Serialize one typed cell to its JSON-compatible string form
    (``cell_to_json``, ``snowflake_destination.rs:863-891``):
    bytes→base64, timestamptz→RFC3339, date→ISO, float NaN/Inf→null,
    decimal→plain string. Null maps to null."""
    if isinstance(data_type, T.BinaryType):
        return F.base64(col)
    if isinstance(data_type, T.TimestampType):
        return F.date_format(col, RFC3339_FORMAT)
    if isinstance(data_type, T.TimestampNTZType):
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    if isinstance(data_type, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(data_type, (T.FloatType, T.DoubleType)):
        return sanitize_floats(col).cast("string")
    if isinstance(data_type, T.BooleanType):
        return F.when(col, F.lit("true")).when(~col, F.lit("false"))
    return col.cast("string")


def array_json(col: Column, element_type: T.DataType) -> Column:
    """Array cell → one JSON string (direct-serialization path,
    ``snowflake_destination.rs:1026-1264``). Float elements get the
    NaN/Inf→null rule; bytes elements are base64 strings; everything
    else rides Spark's native ``to_json`` escaping."""
    if isinstance(element_type, (T.FloatType, T.DoubleType)):
        col = F.transform(col, sanitize_floats)
    elif isinstance(element_type, T.BinaryType):
        col = F.transform(col, F.base64)
    elif isinstance(element_type, T.TimestampType):
        col = F.transform(col, lambda x: F.date_format(x, RFC3339_FORMAT))
    return F.to_json(col)
