"""CDC envelope decoding (S1): raw JSON change events → typed envelope.

The reference consumes decoded Postgres logical-replication events from
the external ``etl`` crate (``Cargo.toml:11``; flow at
``docs/data_flow.md:5-15``). The Spark-native source is any stream of
Debezium-style JSON records — Kafka ``value`` bytes or files — decoded
declaratively with ``from_json`` so Catalyst prunes unused payload
fields at the scan.

Envelope convention (Debezium pgoutput spelling):

    {"op": "c|r|u|d|t", "ts_ms": ..., "before": {...}, "after": {...},
     "source": {"lsn": ..., "table": ..., "schema": ...}}

``op`` codes map to the reference's operation vocabulary (insert/read
snapshot → INSERT, matching ``write_table_rows`` treating snapshot rows
as upserts, ``etl-destination/src/bigquery/core.rs:502-553``). The
sequence is LSN-derived (``bigquery/core.rs:574-606``), zero-padded so
lexicographic order == commit order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_stream_spark.cdc.envelope import (
    OP_DELETE,
    OP_INSERT,
    OP_TRUNCATE,
    OP_UPDATE,
    with_cdc_metadata,
    effective_row,
)
from etl_stream_spark.functions.sequences import lsn_sequence_expr

#: Debezium op-code → reference operation vocabulary.
_OP_MAP = {"c": OP_INSERT, "r": OP_INSERT, "u": OP_UPDATE, "d": OP_DELETE, "t": OP_TRUNCATE}


def cdc_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """Envelope StructType for ``from_json`` given the table's row type."""
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", payload_schema),
            T.StructField("after", payload_schema),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("table", T.StringType()),
                        T.StructField("schema", T.StringType()),
                    ]
                ),
            ),
        ]
    )


def decode_cdc_json(
    raw: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Decode a stream of raw JSON envelopes into flattened CDC rows with
    ``table``/``operation``/``sequence``/``cdc_timestamp`` metadata plus
    the payload columns (DELETE rows read the *before* image, P3).

    One narrow projection chain — no shuffle; works identically on batch
    and streaming DataFrames. Malformed JSON rows decode to null ops and
    are dropped (TRY-parse semantics)."""
    env = raw.select(
        F.from_json(F.col(value_col).cast("string"), cdc_envelope_schema(payload_schema)).alias(
            "e"
        )
    ).select("e.*")

    op = F.col("op")
    mapped = None
    for code, name in _OP_MAP.items():
        mapped = F.when(op == code, name) if mapped is None else mapped.when(op == code, name)

    decoded = (
        env.filter(op.isNotNull())
        .withColumn("table", F.col("source.table"))
        .withColumn("_operation_tmp", mapped)
        .filter(F.col("_operation_tmp").isNotNull())
    )
    decoded = with_cdc_metadata(
        decoded,
        operation=F.col("_operation_tmp"),
        sequence=lsn_sequence_expr(F.col("source.lsn"), F.col("source.lsn")),
        timestamp=F.timestamp_millis(F.col("ts_ms")),
    ).drop("_operation_tmp", "op", "ts_ms", "source")
    return effective_row(decoded)


def decode_cdc_json_with_dlq(
    raw: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`decode_cdc_json`, but malformed envelopes are routed
    to a dead-letter DataFrame instead of silently dropped.

    Returns ``(decoded, dead_letters)``; the dead-letter side carries
    the raw value plus the failure reason. Both are projections of the
    same input, so on a stream each can feed its own sink (the DLQ is
    an append-only audit table — the reference logs-and-skips,
    losing the rows; SURVEY §2.3 P1).
    """
    # from_json is PERMISSIVE: malformed input yields an all-null struct,
    # not NULL — try_parse_json distinguishes truly unparseable bytes
    parsed = raw.withColumn(
        "_e",
        F.from_json(
            F.col(value_col).cast("string"), cdc_envelope_schema(payload_schema)
        ),
    ).withColumn("_json_ok", F.expr(f"try_parse_json(cast({value_col} as string))").isNotNull())
    known_ops = list(_OP_MAP.keys())
    ok = F.col("_json_ok") & F.col("_e.op").isNotNull() & F.col("_e.op").isin(*known_ops)
    bad = parsed.filter(~ok).select(
        F.col(value_col).cast("string").alias("raw_value"),
        F.when(~F.col("_json_ok"), "unparseable_json")
        .when(F.col("_e.op").isNull(), "missing_op")
        .otherwise("unknown_op")
        .alias("reason"),
    )
    good = parsed.filter(ok).drop("_e", "_json_ok")
    return decode_cdc_json(good, payload_schema, value_col), bad
