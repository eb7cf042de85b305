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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _scan_partition_estimate(df: DataFrame) -> int | None:
    """Estimate the scan's split count from leaf-file sizes using
    Spark's own packing formula (``bytes + files × openCost`` over
    ``maxPartitionBytes``) — metadata-only, no plan→RDD conversion.

    Raw file *count* is the wrong proxy in both directions: many small
    files bin-pack into few partitions, and few huge files split into
    many. Returns None when the estimate can't be computed cheaply
    (non-file source, or remote paths this driver can't stat)."""
    import math
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession

    def _bytes_conf(key: str, default: int) -> int:
        raw = str(spark.conf.get(key, str(default))).lower().strip()
        for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
            if raw.endswith(suffix):
                try:
                    return int(float(raw[: -len(suffix)]) * mult)
                except ValueError:
                    return default
        try:
            return int(raw)
        except ValueError:
            return default

    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 * 1024 * 1024)
    max_bytes = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024)
    total = 0
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("file", ""):
            return None  # remote store: don't stat from the driver
        try:
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
    return max(1, math.ceil((total + len(files) * open_cost) / max_bytes))


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan is under-partitioned.

    Guards the expensive-per-row operators against a scan that yields
    fewer partitions than the cluster has slots. The split count comes
    from the metadata-only size estimate above; when that's unavailable
    the exact (but plan→RDD-converting) ``getNumPartitions`` decides —
    correctness of the guard beats the analysis overhead on that rare
    path."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    est = _scan_partition_estimate(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est >= target:
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


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    phi: float = 0.001,
    salt_buckets: int = 16,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join that detects its own hot keys and salts *only* those.

    :func:`salted_join` replicates the whole small side ``salt_buckets``
    times — fine when most keys are hot, wasteful when (as usual) a
    handful are. This variant first runs one bounded-memory
    Misra-Gries pass (:func:`~etl_stream_spark.operators.frequency.
    mg_hot_candidates`) over the big side's key column to find keys
    PROVEN to hold ≥ ``phi`` of all rows, then:

    * big side: hot rows get a pseudo-random salt in
      ``[0, salt_buckets)``, everything else salt 0;
    * small side: hot keys explode into all salts, everything else one
      row with salt 0 — replication volume is ``|hot| × salt_buckets``
      rows, not ``|small| × salt_buckets``.

    The hot-key set is ≤ ``1/phi`` rows by construction, broadcast to
    both sides. The join result is identical to the unsalted join (salt
    only moves rows between shuffle partitions), so correctness is
    oracle-checkable against plain SQL. Detection costs ONE extra pass
    over the big side's key column — the Misra-Gries residuals prove
    heaviness directly (:func:`~etl_stream_spark.operators.frequency.
    mg_hot_candidates`), skipping ``heavy_hitters``' exact-verification
    scan: a key inside the MG error band of the threshold may go
    unsalted (that is simply the plain join's behavior for it, and a
    straggler-causing key sits far above the band), while the saving
    is a whole second pass over the fact at 100 TB. With a known
    hot-key list, pass it via ``hot_keys`` and skip detection entirely.
    """
    from ..operators.frequency import mg_hot_candidates

    if how not in ("inner", "left"):
        # right/full outer would emit phantom null-extended rows for the
        # salted copies of a hot small-side row whose salt matches no
        # big row — the salt must stay invisible in the result
        raise ValueError(f"skew_aware_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = mg_hot_candidates(big, on, phi=phi).select(
            F.col("item").alias(on)
        )
    hot = F.broadcast(hot_keys.select(on).distinct())
    is_hot = F.col("_hotmark").isNotNull()
    marker = hot.withColumn("_hotmark", F.lit(True))

    big_s = (
        big.join(marker, on, "left")
        .withColumn(
            SALT_COL,
            F.when(
                is_hot,
                F.pmod(
                    F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
        .drop("_hotmark")
    )
    all_salts = F.array(*[F.lit(i).cast("long") for i in range(salt_buckets)])
    small_s = (
        small.join(marker, on, "left")
        .withColumn(
            "_salts",
            F.when(is_hot, all_salts).otherwise(F.array(F.lit(0).cast("long"))),
        )
        .withColumn(SALT_COL, F.explode("_salts"))
        .drop("_hotmark", "_salts")
    )
    return big_s.join(small_s, [on, SALT_COL], how).drop(SALT_COL)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a fact table directory-partitioned on its pruning
    columns (date/tenant/source — the coarse filters every query
    carries).

    Two prunings come free at read time: STATIC (a literal filter on a
    partition column never opens the other directories — asserted by
    ``tests/test_scale_properties.py::test_partition_pruning_reaches_the_scan``)
    and DYNAMIC (joining against a dim with a selective filter injects
    a runtime ``dynamicpruningexpression`` into the fact scan, so only
    partitions whose keys survive the dim filter are read — the DPP
    test beside it). At 100 TB, daily partitioning means a
    one-week-of-data query reads 7/365ths of the table however the
    predicate arrives — literal or via a join.

    The column count matters: partition on the 1-3 coarse columns
    queries actually filter by; high-cardinality partition columns
    produce the many-small-files layout ``plans/compaction.py`` exists
    to repair.
    """
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join/merge keys.

    Two tables bucketed on the same keys with the same bucket count
    join WITHOUT a shuffle exchange — the scan itself satisfies the
    join's partitioning requirement, and with ``sort`` the sort-merge
    join skips its sorts too. This is the co-location strategy for the
    repeated big-big joins of a 100 TB deployment (fact-fact joins,
    landing→target merges): pay the shuffle once at write time, never
    at read time. Requires a catalog table (``saveAsTable``) — plain
    ``.parquet(path)`` writes cannot record bucketing metadata. Pass
    ``path`` to store the data at an explicit location (external
    table) instead of under ``spark.sql.warehouse.dir`` — the session
    catalog still records the bucket spec either way.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
