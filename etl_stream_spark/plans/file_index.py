"""Manifest-style file-skipping index (zone maps over files).

Parquet already carries row-group min/max stats, but at 100 TB the
planner must still LIST and OPEN every file footer to use them. Table
formats (Iceberg manifests, Delta's add-file stats, Hive's zone maps —
all public designs) lift those stats into ONE small metadata table so
pruning happens before any data file is touched. This module is that
layer for plain parquet directories:

* :func:`build_index` computes per-(file, column) min/max in ONE
  distributed pass over the table (``input_file_name()`` + groupBy —
  at write time you would piggyback this on the writer; as a separate
  pass it is a map-side-combinable aggregate whose output is bounded
  by the FILE COUNT, not the row count) and stores it as a small
  parquet manifest.
* :func:`pruned_files` filters the manifest with a range predicate and
  returns the surviving file list — driver-side work bounded by the
  file count (exactly what Iceberg's planner does with manifests).
* :func:`read_pruned` reads only those files.

Composes with ``plans/zorder.py``: a z-ordered layout makes every
file's min/max tight in EVERY clustered dimension, so the manifest
prunes multi-column predicates file-level — measured end-to-end in
``tests/test_zorder.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_index(
    spark: SparkSession, table_path: str, cols: list[str], index_path: str
) -> None:
    """One distributed pass: per-file min/max for ``cols``, persisted
    as a single-file parquet manifest at ``index_path``."""
    df = spark.read.parquet(table_path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(index_path)
    )


def pruned_files(
    spark: SparkSession,
    index_path: str,
    ranges: dict[str, tuple],
) -> list[str]:
    """Files whose [min, max] intervals intersect EVERY requested
    ``col: (lo, hi)`` range (``None`` bound = open). The collect is
    bounded by the file count — manifest-sized, never data-sized."""
    idx = spark.read.parquet(index_path)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            idx = idx.filter(F.col(f"max_{c}") >= lo)
        if hi is not None:
            idx = idx.filter(F.col(f"min_{c}") <= hi)
    return [r["file"] for r in idx.select("file").collect()]


def read_pruned(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    ranges: dict[str, tuple],
) -> DataFrame:
    """Read only the files the manifest says can match; the predicate
    itself must still be applied by the caller (zone maps bound, they
    do not filter). Returns an empty frame with the table's schema when
    nothing survives."""
    files = pruned_files(spark, index_path, ranges)
    base = spark.read.parquet(table_path)
    if not files:
        return base.limit(0)
    return spark.read.schema(base.schema).parquet(*files)
