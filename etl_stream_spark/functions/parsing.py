"""JSON→typed parse casts and numeric-string detection (P7, §2.7).

The reference lands ARRAY/VARIANT columns as raw JSON strings and casts
at merge time with ``TRY_PARSE_JSON(src."c")::ARRAY`` / ``::VARIANT``
(``etl-snowflake-py/etl_snowflake/task.py:57-81``); schema inference
promotes numeric-looking strings via ``^-?\\d+(\\.\\d+)?$``
(``client.py:845-850``). Spark analogs: ``from_json`` (null on
malformed input — exactly TRY_PARSE_JSON's contract) and ``rlike``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_STRING_RE = re.compile(r"^-?\d+(\.\d+)?$")
_NUMERIC_STRING_SQL = "^-?[0-9]+(\\.[0-9]+)?$"


def is_numeric_string(value: str) -> bool:
    """Driver-side twin of the inference regex (``client.py:845-850``)."""
    return bool(NUMERIC_STRING_RE.match(value))


def numeric_string_expr(col: Column) -> Column:
    """Column predicate: value parses as int or plain decimal."""
    return col.rlike(_NUMERIC_STRING_SQL)


def parse_json_columns(
    df: DataFrame, json_schemas: dict[str, T.DataType | str]
) -> DataFrame:
    """Cast landed JSON-string columns to typed values in one projection
    — the merge-time ``TRY_PARSE_JSON(...)::ARRAY/::VARIANT`` pass.
    Malformed JSON yields null, matching TRY_PARSE_JSON. Columns not in
    ``json_schemas`` pass through untouched."""
    exprs = []
    for name in df.columns:
        if name in json_schemas:
            exprs.append(F.from_json(F.col(name), json_schemas[name]).alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)
