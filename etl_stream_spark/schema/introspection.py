"""Catalog/metadata introspection (S4/S5/S7 of SURVEY.md §2.1).

The reference's metadata scans — publication tables
(``src/schema_cache.rs:364-398``), per-table columns with
nullability/PK flags (``:402-442``), warehouse INFORMATION_SCHEMA
exists/columns checks (``etl-snowflake-py/etl_snowflake/ddl.py:
462-526``) — map to Spark catalog calls and parquet footer reads. All
driver-side metadata operations; none touch row data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from etl_stream_spark.schema.pk_detection import detect_primary_key


@dataclass(frozen=True)
class ColumnInfo:
    """One catalog row of the column scan (S5): name, type, nullable,
    PK membership (heuristic, ``client.py:872-923``)."""

    name: str
    data_type: str
    nullable: bool
    is_primary: bool


def table_exists(spark: SparkSession, name: str) -> bool:
    """INFORMATION_SCHEMA.TABLES exists-check (``ddl.py:462-485``)."""
    return spark.catalog.tableExists(name)


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """Publication-table scan analog (S4): visible tables."""
    return [t.name for t in spark.catalog.listTables(database)]


def path_schema(spark: SparkSession, path: str, fmt: str = "parquet") -> T.StructType:
    """Schema of a path-addressed table (parquet footer read — no data
    scan)."""
    return spark.read.format(fmt).load(path).schema


def describe_columns(schema: T.StructType, keys: list[str] | None = None) -> list[ColumnInfo]:
    """Column scan (S5) over a StructType, ordered by position
    (``ORDER BY a.attnum`` / ORDINAL_POSITION, ``schema_cache.rs:427``,
    ``ddl.py:508``). PK flags from explicit ``keys`` or the name
    heuristic."""
    pk = set(keys) if keys is not None else set(detect_primary_key([f.name for f in schema.fields]))
    return [
        ColumnInfo(
            name=f.name,
            data_type=f.dataType.simpleString(),
            nullable=f.nullable,
            is_primary=f.name in pk,
        )
        for f in schema.fields
    ]
