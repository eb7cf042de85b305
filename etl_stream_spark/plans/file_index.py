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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Arrow types whose parquet min/max statistics are exact and totally
#: ordered — the footer fast path only trusts these. (Strings can be
#: truncated by the writer; float NaN ordering is writer-dependent;
#: timestamps carry timezone-normalization semantics the manifest
#: must not re-interpret — all of those take the distributed pass.)
_STAT_SAFE_PREFIXES = ("int", "uint", "date")

#: Parquet key-value-metadata key under which the footer-built manifest
#: stores the base table's Spark schema (``StructType.json()``), so
#: ``read_pruned`` never has to re-open the base table's footers for
#: schema — the per-query constant comes from the manifest itself.
_SCHEMA_KEY = b"etl.spark_table_schema"


def _footer_stats(table_path: str, cols: list[str]):
    """Per-file (file URI, n_rows, min/max per col) read from parquet
    FOOTERS — driver-side, bounded by file count, no data scan (the
    Iceberg/Delta manifest-build move: the writer already computed the
    stats). Returns ``(rows, manifest_arrow_schema)``, or ``None`` when
    any file lacks exact stats for any requested column (missing
    column, disabled statistics, or a type whose stats are not
    trustworthy) — callers fall back to the distributed pass."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = []
    fields = None
    for root, _dirs, files in os.walk(table_path):
        for f in sorted(files):
            if not f.endswith(".parquet") or f.startswith("_"):
                continue
            full = os.path.join(root, f)
            md = pq.ParquetFile(full).metadata
            arrow_schema = pq.read_schema(full)
            row = {"file": f"file://{os.path.abspath(full)}", "n_rows": md.num_rows}
            try:
                idx = {c: md.schema.to_arrow_schema().names.index(c) for c in cols}
            except ValueError:
                return None
            for c in cols:
                if not str(arrow_schema.field(c).type).startswith(_STAT_SAFE_PREFIXES):
                    return None
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        return None
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is None:
                    return None
                row[f"min_{c}"] = lo
                row[f"max_{c}"] = hi
            if fields is None:
                fields = [pa.field("file", pa.string()), pa.field("n_rows", pa.int64())]
                for c in cols:
                    t = arrow_schema.field(c).type
                    fields += [pa.field(f"min_{c}", t), pa.field(f"max_{c}", t)]
            out.append(row)
    if not out:
        return None
    return out, pa.schema(fields)


def build_index(
    spark: SparkSession, table_path: str, cols: list[str], index_path: str
) -> None:
    """Per-file min/max for ``cols`` persisted as a single-file parquet
    manifest at ``index_path``. Fast path (r8): lift the stats straight
    out of the parquet FOOTERS and write the manifest DRIVER-SIDE —
    one metadata read per data file, zero data scanned, zero Spark
    jobs (exactly how Iceberg builds manifests from add-file stats;
    the manifest is bounded metadata, the ``write_small_text``
    discipline applied to a parquet file). Commits via stage+rename so
    readers never see a half-written manifest. Falls back to the
    original ONE distributed pass (``input_file_name()`` + groupBy,
    map-side combinable, output bounded by file count) whenever a
    footer lacks exact stats for a requested column."""
    stats = _footer_stats(table_path, cols)
    if stats is not None:
        import shutil
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows, schema = stats
        # Stamp the table's Spark-inferred schema into the manifest's
        # KV metadata (once per BUILD — spark.read schema inference is
        # driver-side listing + one footer, no job) so every later
        # read_pruned takes its schema from the manifest instead of
        # re-opening the base table.
        schema = schema.with_metadata(
            {_SCHEMA_KEY: spark.read.parquet(table_path).schema.json().encode()}
        )
        stage = f"{index_path.rstrip('/')}_stage_{uuid.uuid4().hex[:8]}"
        os.makedirs(stage)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=schema),
            os.path.join(stage, "part-00000-manifest.parquet"),
        )
        if os.path.exists(index_path):
            old = f"{stage}_old"
            os.rename(index_path, old)
            os.rename(stage, index_path)
            shutil.rmtree(old)
        else:
            os.rename(stage, index_path)
        return
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


def _manifest_rows(spark: SparkSession, index_path: str):
    """Driver-side manifest read: ``(rows, spark_schema_json | None)``.
    The manifest is bounded by the FILE COUNT, so reading it on the
    driver (pyarrow, zero Spark jobs) is the Iceberg-planner move —
    replaces the per-query Spark read+collect job. Handles both
    manifest shapes (footer-built single file, Spark-written fallback
    directory — pyarrow ignores ``_SUCCESS`` by default). Falls back
    to the original Spark read on any driver-read failure."""
    try:
        import pyarrow.parquet as pq

        tbl = pq.read_table(index_path)
        meta = tbl.schema.metadata or {}
        sj = meta.get(_SCHEMA_KEY)
        return tbl.to_pylist(), (sj.decode() if sj is not None else None)
    except Exception:
        return [r.asDict() for r in spark.read.parquet(index_path).collect()], None


def _survives(row: dict, ranges: dict[str, tuple]) -> bool:
    """Mirror of the SQL interval-intersection filter, including NULL
    semantics: a file whose stat is NULL on a bounded column is pruned
    (NULL min/max means the column is all-NULL in that file — it cannot
    match a range predicate, and SQL ``NULL >= lo`` is not true)."""
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            mx = row.get(f"max_{c}")
            if mx is None or not mx >= lo:
                return False
        if hi is not None:
            mn = row.get(f"min_{c}")
            if mn is None or not mn <= hi:
                return False
    return True


def pruned_files(
    spark: SparkSession,
    index_path: str,
    ranges: dict[str, tuple],
) -> list[str]:
    """Files whose [min, max] intervals intersect EVERY requested
    ``col: (lo, hi)`` range (``None`` bound = open). Pure driver-side
    work bounded by the file count — manifest-sized, never data-sized,
    zero Spark jobs."""
    rows, _sj = _manifest_rows(spark, index_path)
    return [r["file"] for r in rows if _survives(r, ranges)]


def read_pruned(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    ranges: dict[str, tuple],
) -> DataFrame:
    """Read only the files the manifest says can match; the predicate
    itself must still be applied by the caller (zone maps bound, they
    do not filter). Returns an empty frame with the table's schema when
    nothing survives. The schema comes from the manifest's KV metadata
    when present (footer-built manifests stamp it at build time), so
    the base table's footers are never re-opened per query; manifests
    from the distributed fallback keep the old schema-inference path."""
    rows, schema_json = _manifest_rows(spark, index_path)
    files = [r["file"] for r in rows if _survives(r, ranges)]
    if schema_json is not None:
        import json

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(schema_json))
    else:
        schema = spark.read.parquet(table_path).schema
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)
