"""LSN-derived CDC sequence numbers (§2.7).

The reference's BigQuery/Iceberg paths derive the per-event sequence from
replication LSNs — ``generate_sequence_number(start_lsn, commit_lsn)``
(``etl-destination/src/bigquery/core.rs:574-606``,
``etl-destination/src/iceberg/core.rs:313-345``) — producing strings
whose lexicographic order equals commit order. The wall-clock variant
(``<µs-epoch>_<idx:08d>``, Snowflake path) lives in
:mod:`etl_stream_spark.cdc.envelope`. Both are equal-length zero-padded
so string MAX/compare is order-correct (SURVEY §7.3 risk 1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LSN_HEX_WIDTH = 16  # 64-bit LSN → fixed 16 hex digits


def lsn_sequence(commit_lsn: int, start_lsn: int) -> str:
    """``<commit:016x>/<start:016x>`` — fixed width, commit-major order."""
    return f"{commit_lsn:0{_LSN_HEX_WIDTH}x}/{start_lsn:0{_LSN_HEX_WIDTH}x}"


def lsn_sequence_expr(commit_lsn: Column, start_lsn: Column) -> Column:
    """Column version of :func:`lsn_sequence` (JVM-side, codegen)."""

    def hex16(c: Column) -> Column:
        return F.lpad(F.lower(F.conv(c.cast("string"), 10, 16)), _LSN_HEX_WIDTH, "0")

    return F.concat_ws("/", hex16(commit_lsn), hex16(start_lsn))
