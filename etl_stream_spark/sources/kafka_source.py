"""Kafka CDC source (S1): the production feed behind the file-source
stand-in.

The reference's pipeline consumes a live logical-replication stream
(``src/pipeline_manager.rs:465-516``; flow at ``docs/data_flow.md:5-15``).
The Spark-native equivalent is ``readStream.format("kafka")`` over the
Debezium topic(s) for the publication, decoded with the same
``decode_cdc_json`` path the file source uses — the decode, dedup, and
merge stages are source-agnostic by construction, so swapping the file
stand-in for Kafka is *only* a reader-config change.

Scale posture: one Kafka partition maps to one Spark input partition per
micro-batch; ``minPartitions`` can oversplit hot topics beyond the
partition count, and ``maxOffsetsPerTrigger`` is the admission-control
twin of the reference's ``batch_max_size``
(``migrations/001_create_tables.sql:53``). Offsets live in the
checkpoint, giving the same exactly-once replay contract as the file
source (the sink's idempotent MERGE absorbs reprocessing).

This sandbox has no Kafka broker and no ``spark-sql-kafka`` jar, so
:func:`kafka_cdc_stream` raises a documented error when the connector is
absent; the option-building and decode logic are plain functions, tested
without a broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_stream_spark.sources.envelope_decode import decode_cdc_json

#: Packages coordinate needed on a real cluster (spark-submit
#: ``--packages`` / ``spark.jars.packages``). Public Maven coordinate.
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


def kafka_reader_options(
    bootstrap_servers: str,
    topics: str | list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Build the Kafka reader option map (pure; testable without a broker).

    ``max_offsets_per_trigger`` caps records admitted per micro-batch —
    the backpressure knob pairing with the processing-time trigger the
    sink sets (reference: ``batch_max_size`` / ``batch_max_fill_ms``).
    """
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics) if isinstance(topics, list) else topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    opts.update(extra or {})
    return opts


def kafka_raw_stream(
    spark: SparkSession, options: dict[str, str]
) -> DataFrame:
    """``readStream.format("kafka")`` with the given options.

    Raises ``RuntimeError`` with the jar coordinate when the connector
    is not on the classpath (this sandbox), instead of Spark's generic
    DATA_SOURCE_NOT_FOUND.
    """
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        # Only translate the connector-missing failure — any other error
        # (bad bootstrap servers, malformed offsets JSON, auth) must
        # surface untouched or it sends cluster debugging the wrong way.
        msg = str(e)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg:
            raise RuntimeError(
                "Kafka connector not on classpath; submit with "
                f"--packages {KAFKA_PACKAGE}:<spark-version>"
            ) from e
        raise


def kafka_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | list[str],
    payload_schema: T.StructType,
    **reader_kwargs,
) -> DataFrame:
    """Debezium topic → typed CDC envelope stream.

    The Kafka ``value`` bytes become the JSON ``value`` column the
    shared decoder expects; everything downstream (LWW dedup, MERGE,
    rollup) is identical to the file-source path.
    """
    opts = kafka_reader_options(bootstrap_servers, topics, **reader_kwargs)
    raw = kafka_raw_stream(spark, opts)
    return decode_cdc_json(
        raw.select(F.col("value").cast("string").alias("value")), payload_schema
    )
