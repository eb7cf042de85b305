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
from pyspark.sql import functions as F

SALT_COL = "_salt"


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan is under-partitioned.

    The check is metadata-only: leaf input-file count vs the cluster's
    default parallelism. (``df.rdd.getNumPartitions()`` would be exact
    but forces a plan→RDD conversion on every call — measurable overhead
    in front of every hot operator.) A scan with at least ``target``
    files already yields enough splits; fewer files than cores — the
    small-file case this guard exists for — triggers the repartition.
    For the CPU-bound per-row operators guarded here, repartitioning a
    few-large-files scan up to core count is the desired outcome too.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source (rate, memory, createDataFrame)
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side.

    The big side gets a pseudo-random salt in ``[0, salt_buckets)``; the
    small side is replicated once per salt value, and the join runs on
    ``on + [salt]`` — a hot key's rows spread across ``salt_buckets``
    shuffle partitions instead of landing on one straggler task. Use
    when the small side is too big to broadcast AND the key histogram is
    skewed; with AQE's ``skewJoin`` (on by default in
    :func:`~etl_stream_spark.session.get_spark`) prefer letting AQE
    split first and reach for explicit salting only when a single key
    exceeds what one task can sort.

    Cost model: small side ×``salt_buckets`` shuffle volume, big side
    unchanged — choose the smaller input as ``small``.
    """
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    small_s = small.withColumn(SALT_COL, F.explode(salts))
    return big_s.join(small_s, [*on, SALT_COL], how).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join/merge keys.

    Two tables bucketed on the same keys with the same bucket count
    join WITHOUT a shuffle exchange — the scan itself satisfies the
    join's partitioning requirement, and with ``sort`` the sort-merge
    join skips its sorts too. This is the co-location strategy for the
    repeated big-big joins of a 100 TB deployment (fact-fact joins,
    landing→target merges): pay the shuffle once at write time, never
    at read time. Requires a catalog table (``saveAsTable``) — plain
    ``.parquet(path)`` writes cannot record bucketing metadata.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name)
