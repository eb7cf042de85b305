"""Small-file compaction for append-heavy parquet tables.

Streaming appends (the landing table, K1) produce one file per
micro-batch per partition; at a 5-second trigger that is ~17k files a
day per pipeline — metadata pressure and tiny-scan overhead long before
data volume matters. Compaction rewrites a directory to
``ceil(bytes/target)`` files. On Delta/Iceberg this is ``OPTIMIZE`` /
``rewrite_data_files``; this parquet implementation keeps the same
public surface for the bucketed-parquet deployment, with a
write-then-swap so readers never observe a half-written directory
(POSIX rename; on object stores use the table format's transaction).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _strip_scheme(p: str) -> str:
    head = p.split("/", 1)[0]
    return os.path.normpath(p.split(":", 1)[1]) if ":" in head else os.path.normpath(p)


def partition_cols_of(base_path: str, file_path: str) -> list[str]:
    """Hive-style partition column names between ``base_path`` and a
    data file, in directory order (``.../dt=2020/hr=3/part-0.parquet``
    → ``['dt', 'hr']``). Pure path arithmetic — no listing."""
    base = _strip_scheme(base_path)
    rel = _strip_scheme(file_path)
    if rel.startswith(base):
        rel = rel[len(base):].strip("/")
    parts = rel.split("/")[:-1]
    return [p.split("=", 1)[0] for p in parts if "=" in p]


def replace_parquet_files(spark: SparkSession, base_path: str, files, keep) -> None:
    """Rewrite exactly ``files`` under ``base_path``: append
    ``keep(subset)`` as new files — PRESERVING any Hive-style partition
    layout discovered from the file paths (an unpartitioned append into
    a partitioned directory corrupts it for every future read) — then
    delete the originals. Concurrent-append safe (the landing-purge
    protocol): rows appended during the rewrite are never touched.
    Crash window: before the deletes, retained rows exist twice —
    recovery is re-running the same rewrite."""
    from etl_stream_spark.cdc.merge import _hadoop_fs, _hadoop_path

    files = list(files)
    if not files:
        return
    subset = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", base_path)
        .parquet(*files)
    )
    pcols = partition_cols_of(base_path, files[0])
    retained = keep(subset).persist()  # isEmpty + append: one scan
    try:
        if not retained.isEmpty():
            writer = retained.write.mode("append")
            if pcols:
                writer = writer.partitionBy(*pcols)
            writer.parquet(base_path)
    finally:
        retained.unpersist()
    fs, _ = _hadoop_fs(spark, base_path)
    for f in files:
        fs.delete(_hadoop_path(spark, f), False)


def parquet_files(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet part under ``path`` (driver-side
    bounded metadata — one listing, no data read)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                out.append((full, os.path.getsize(full)))
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path`` into ``ceil(total_bytes / target)`` files.

    No-op (and no rewrite amplification) when the directory already has
    fewer than ``min_files`` files or one file would not shrink the
    count. Returns a summary dict; the rewrite is a plain scan +
    repartition — one shuffle-free coalesce when shrinking.
    """
    files = parquet_files(path)
    total = sum(b for _f, b in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if len(files) < min_files or n_target >= len(files):
        return {"files_before": len(files), "files_after": len(files), "skipped": True}

    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: shrinking file counts needs no shuffle
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    old = f"{tmp}_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": len(files),
        "files_after": len(parquet_files(path)),
        "bytes": total,
        "skipped": False,
    }
