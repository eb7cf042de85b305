"""Initial table copy (S2): bulk snapshot before streaming starts.

The reference's "table sync" phase copies existing rows and the
destinations treat every snapshot row as an upsert
(``etl-destination/src/bigquery/core.rs:502-553``). Spark analog: one
batch read → stamp INSERT metadata with a sequence that sorts *below*
every live CDC sequence → merge. Any change events that raced the
snapshot then win the last-writer-wins dedup, giving the same end state
as the reference's snapshot-then-stream handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_stream_spark.cdc.envelope import OP_INSERT, with_cdc_metadata
from etl_stream_spark.cdc.merge import ParquetMergeTable

#: Sorts below every LSN/epoch sequence ('0' < any hex digit string of
#: equal length; shorter strings compare below longer zero-padded ones).
INITIAL_COPY_SEQUENCE = "0"


def initial_copy(table: ParquetMergeTable, snapshot: DataFrame) -> None:
    """Load a consistent snapshot into the merge target as INSERT
    upserts stamped with the minimal sequence."""
    stamped = with_cdc_metadata(
        snapshot,
        operation=F.lit(OP_INSERT),
        sequence=F.lit(INITIAL_COPY_SEQUENCE),
    )
    table.merge(stamped)
