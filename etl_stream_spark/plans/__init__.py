"""Plan-level utilities: partitioning discipline, compaction, explain
helpers."""

from etl_stream_spark.plans.compaction import compact_parquet
from etl_stream_spark.plans.partitioning import ensure_parallelism, salted_join

__all__ = ["compact_parquet", "ensure_parallelism", "salted_join"]
