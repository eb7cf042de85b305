"""Schema system: Postgres-universe → Spark ``StructType`` mapping,
identifier validation, primary-key heuristics, value-based inference.

Reference parity targets (see SURVEY.md §1):
* type mapping — ``etl-snowflake-py/etl_snowflake/type_mapping.py``
* identifier validation — ``etl-snowflake-py/etl_snowflake/ddl.py:17-50``
* PK detection — ``etl-snowflake-py/etl_snowflake/client.py:872-923``
* inference — ``etl-snowflake-py/etl_snowflake/client.py:819-852``
"""

from etl_stream_spark.schema.identifiers import (
    escape_table_name,
    unescape_table_name,
    validate_identifier,
)
from etl_stream_spark.schema.inference import infer_spark_type, infer_struct_type
from etl_stream_spark.schema.pk_detection import detect_primary_key
from etl_stream_spark.schema.type_mapping import (
    decode_numeric_typmod,
    decode_varchar_typmod,
    oid_to_spark_type,
    pg_type_name_to_spark_type,
)

__all__ = [
    "decode_numeric_typmod",
    "decode_varchar_typmod",
    "detect_primary_key",
    "escape_table_name",
    "infer_spark_type",
    "infer_struct_type",
    "oid_to_spark_type",
    "pg_type_name_to_spark_type",
    "unescape_table_name",
    "validate_identifier",
]
