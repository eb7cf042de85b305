"""Source layer (SURVEY.md §2.1): CDC envelope decoding from streaming
JSON (S1), file/rate test sources, initial table copy (S2), and the
config-table scan driving pipeline reconciliation (S3)."""

from etl_stream_spark.sources.envelope_decode import (
    cdc_envelope_schema,
    decode_cdc_json,
)
from etl_stream_spark.sources.file_source import read_cdc_file_stream
from etl_stream_spark.sources.kafka_source import (
    KAFKA_PACKAGE,
    kafka_cdc_stream,
    kafka_raw_stream,
    kafka_reader_options,
)
from etl_stream_spark.sources.initial_copy import INITIAL_COPY_SEQUENCE, initial_copy
from etl_stream_spark.sources.config_db import (
    PipelineSpec,
    load_pipeline_specs,
    specs_from_rows,
)

__all__ = [
    "cdc_envelope_schema",
    "decode_cdc_json",
    "read_cdc_file_stream",
    "KAFKA_PACKAGE",
    "kafka_cdc_stream",
    "kafka_raw_stream",
    "kafka_reader_options",
    "INITIAL_COPY_SEQUENCE",
    "initial_copy",
    "PipelineSpec",
    "load_pipeline_specs",
    "specs_from_rows",
]
