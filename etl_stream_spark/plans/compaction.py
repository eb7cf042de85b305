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
