"""Partitioning discipline helpers.

``ensure_parallelism`` guards the expensive-per-row operators (shingling,
min-hashing, vector math, Pandas-UDF decode) against under-partitioned
inputs: a small parquet file scans as ONE partition, serializing all the
downstream compute on one core. At 100 TB the scan naturally produces
thousands of partitions and this is a no-op — the repartition only fires
when the input has fewer partitions than the cluster has slots, i.e.
exactly when the shuffle it introduces is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan is under-partitioned."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
