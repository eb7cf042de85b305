"""Plan-level utilities: partitioning discipline, explain helpers."""

from etl_stream_spark.plans.partitioning import ensure_parallelism

__all__ = ["ensure_parallelism"]
