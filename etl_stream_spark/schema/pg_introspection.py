"""Live Postgres catalog introspection over JDBC (S5 in production).

The reference's schema cache queries ``pg_attribute`` / ``pg_index``
directly for column types, nullability, and PK membership
(``src/schema_cache.rs:402-442``). The Spark-native path is the JDBC
reader with a pushdown *query* (not a table scan): the catalog query
runs inside Postgres and only its result rows cross the wire — a
driver-sized metadata read, same as the reference.

No Postgres exists in this sandbox, so the reader is injectable: tests
exercise the full query→ColumnSpec→StructType pipeline against a mock
reader returning fixture rows, and a real deployment passes nothing and
gets ``spark.read.format("jdbc")``. The JDBC driver jar is a public
coordinate (``org.postgresql:postgresql``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_stream_spark.schema.identifiers import validate_identifier
from etl_stream_spark.schema.type_mapping import ColumnSpec, columns_to_struct_type

#: Column catalog query — re-derivation of the reference's scan
#: (``schema_cache.rs:402-442``) against the public Postgres catalogs:
#: attributes of the table's relation, dropped/system columns excluded,
#: PK membership via the primary-key index, ordered by attnum.
PG_COLUMNS_QUERY = """
SELECT a.attname                            AS column_name,
       a.atttypid::int                      AS type_oid,
       t.typname                            AS type_name,
       a.atttypmod                          AS typmod,
       NOT a.attnotnull                     AS nullable,
       COALESCE(i.indisprimary, false)      AS is_primary
FROM pg_catalog.pg_attribute a
JOIN pg_catalog.pg_type t ON t.oid = a.atttypid
JOIN pg_catalog.pg_class c ON c.oid = a.attrelid
JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
LEFT JOIN pg_catalog.pg_index i
       ON i.indrelid = a.attrelid
      AND a.attnum = ANY(i.indkey)
      AND i.indisprimary
WHERE n.nspname = '{schema}'
  AND c.relname = '{table}'
  AND a.attnum > 0
  AND NOT a.attisdropped
ORDER BY a.attnum
"""

#: Publication-membership scan (S4 twin of ``schema_cache.rs:364-398``).
PG_PUBLICATION_TABLES_QUERY = """
SELECT schemaname AS table_schema, tablename AS table_name
FROM pg_catalog.pg_publication_tables
WHERE pubname = '{publication}'
ORDER BY schemaname, tablename
"""

#: WAL backlog scan (S6): replication-slot retained bytes.
PG_WAL_SIZE_QUERY = """
SELECT slot_name,
       pg_wal_lsn_diff(pg_current_wal_lsn(), restart_lsn)::bigint AS retained_bytes
FROM pg_catalog.pg_replication_slots
"""

ReaderFn = Callable[[str], DataFrame]


def jdbc_query_reader(
    spark: SparkSession, url: str, properties: dict[str, str] | None = None
) -> ReaderFn:
    """Reader factory: query string → DataFrame via the JDBC source's
    query pushdown (the whole query executes in Postgres)."""

    def read(query: str) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("query", query)
            .option("driver", "org.postgresql.Driver")
        )
        for k, v in (properties or {}).items():
            reader = reader.option(k, v)
        return reader.load()

    return read


def introspect_pg_columns(
    schema: str, table: str, reader: ReaderFn
) -> list[ColumnSpec]:
    """Column scan for one table → ordered :class:`ColumnSpec` list.

    Identifiers are validated before interpolation (the reference's
    identifier ladder, ``schema/identifiers.py``) — catalog queries are
    the one place a table name reaches SQL text.
    """
    validate_identifier(schema)
    validate_identifier(table)
    rows = reader(PG_COLUMNS_QUERY.format(schema=schema, table=table)).collect()
    return [
        ColumnSpec(
            name=r["column_name"],
            type_oid=int(r["type_oid"]),
            type_name=r["type_name"],
            typmod=int(r["typmod"]),
            nullable=bool(r["nullable"]),
            primary=bool(r["is_primary"]),
        )
        for r in rows
    ]


def pg_table_schema(schema: str, table: str, reader: ReaderFn):
    """Spark StructType of a live Postgres table (OID→Spark mapping)."""
    return columns_to_struct_type(introspect_pg_columns(schema, table, reader))


def publication_tables(publication: str, reader: ReaderFn) -> list[tuple[str, str]]:
    """(schema, table) pairs in a publication (S4)."""
    validate_identifier(publication)
    rows = reader(PG_PUBLICATION_TABLES_QUERY.format(publication=publication)).collect()
    return [(r["table_schema"], r["table_name"]) for r in rows]


def wal_retained_bytes(reader: ReaderFn) -> dict[str, int]:
    """Per-slot WAL backlog (S6) — feeds the wal-size alert stream."""
    return {
        r["slot_name"]: int(r["retained_bytes"]) for r in reader(PG_WAL_SIZE_QUERY).collect()
    }
