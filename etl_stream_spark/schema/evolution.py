"""Schema evolution (§2.8 schema drift): new-column detection + merge.

Reference behavior: when incoming rows carry unseen columns, ALTER TABLE
ADD COLUMN (nullable) on landing+target and recreate the merge task
(``etl-snowflake-py/etl_snowflake/client.py:945-981``,
``ddl.py:412-441``); landing tables are created with
``ENABLE_SCHEMA_EVOLUTION = TRUE`` (``ddl.py:348-350``). On parquet/
Delta the ALTER is implicit — new columns appear in new files and
``mergeSchema`` reads union them, old rows reading null — so these
helpers only *detect* and *describe* the drift for logging and for
callers that must keep an explicit catalog.
"""

from __future__ import annotations

from pyspark.sql import types as T


def detect_new_columns(existing: T.StructType, incoming: T.StructType) -> list[T.StructField]:
    """Columns in ``incoming`` absent from ``existing`` (order kept) —
    the set math at ``client.py:945-981``. Case-insensitive match, as
    warehouse identifiers are."""
    have = {f.name.lower() for f in existing.fields}
    return [f for f in incoming.fields if f.name.lower() not in have]


def evolve_struct(existing: T.StructType, incoming: T.StructType) -> T.StructType:
    """Existing schema + new incoming columns appended as *nullable*
    (the ADD COLUMN path keeps them nullable, ``ddl.py:412-441``)."""
    new = [
        T.StructField(f.name, f.dataType, nullable=True)
        for f in detect_new_columns(existing, incoming)
    ]
    return T.StructType(list(existing.fields) + new)
