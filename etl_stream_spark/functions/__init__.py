"""Scalar function layer (SURVEY.md §2.7): JSON serialization of typed
cells, JSON→typed parse casts at merge time, and sequence generation."""

from etl_stream_spark.functions.serialization import (
    array_json,
    cell_json,
    sanitize_floats,
)
from etl_stream_spark.functions.parsing import (
    is_numeric_string,
    numeric_string_expr,
    parse_json_columns,
)
from etl_stream_spark.functions.sequences import (
    lsn_sequence,
    lsn_sequence_expr,
)

__all__ = [
    "array_json",
    "cell_json",
    "sanitize_floats",
    "is_numeric_string",
    "numeric_string_expr",
    "parse_json_columns",
    "lsn_sequence",
    "lsn_sequence_expr",
]
