"""File-based streaming source for CDC tests and replays.

Stands in for the Kafka/replication feed (S1) without external services:
a directory of JSON/parquet files read with ``readStream`` becomes the
micro-batched event stream. ``maxFilesPerTrigger`` maps the reference's
``batch_max_size`` batching knob (``migrations/001_create_tables.sql:53``)
onto Spark's admission control; the paired latency knob
(``batch_max_fill_ms``) maps to the processing-time trigger set where the
stream is *started* (sink side), not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_cdc_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan over a drop-directory of change-event files."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)
