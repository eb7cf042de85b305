"""Locality-preserving compaction: content preserved (multiset), file
count reduced to the bin plan, z-order locality retained so the
manifest keeps pruning after the rewrite — the property the plain
coalesce rewrite (``compact_parquet``, covered by
``test_dlq_compaction``) does not give a clustered layout."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from etl_stream_spark.plans.compaction import (
    compact_clustered,
    parquet_files,
    plan_bins,
)
from etl_stream_spark.session import load_table


def test_plan_bins_packs_consecutive_only():
    files = [(f"f{i:02d}", 10) for i in range(10)]
    bins = plan_bins(files, 30)
    # greedy consecutive: [f0,f1,f2][f3,f4,f5][f6,f7,f8][f9]
    assert [len(b) for b in bins] == [3, 3, 3, 1]
    assert bins[0] == ["f00", "f01", "f02"]
    # oversized file stays alone
    bins = plan_bins([("a", 100), ("b", 10), ("c", 10)], 25)
    assert bins == [["a"], ["b", "c"]]


def test_compact_clustered_preserves_content(spark, tmp_path):
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "t")
    orders.repartition(24).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 24

    sizes = [s for _p, s in parquet_files(path)]
    target = sum(sizes) // 5
    stats = compact_clustered(spark, path, target_file_bytes=target)
    files_after = glob.glob(os.path.join(path, "*.parquet"))
    assert stats["files_before"] == 24
    assert stats["files_after"] == len(files_after)
    assert 1 < len(files_after) < 24
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    # re-compacting converges (never grows the file count) and a
    # third pass with the same target is a guaranteed no-op — no
    # rewrite-amplification loop
    stats2 = compact_clustered(spark, path, target_file_bytes=target)
    assert stats2["files_after"] <= stats["files_after"]
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before
    stats3 = compact_clustered(spark, path, target_file_bytes=target)
    if not stats3["skipped"]:
        assert stats3["files_after"] == stats2["files_after"]
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_compact_clustered_keeps_zorder_locality(spark, tmp_path):
    """Packing CONSECUTIVE part files of a z-ordered layout
    concatenates adjacent hyper-rectangles: per-file spans stay far
    from full-domain and the manifest still skips files on a slice."""
    from etl_stream_spark.plans.file_index import build_index, pruned_files
    from etl_stream_spark.plans.zorder import write_zordered
    from tests.test_zorder import _avg_span_frac, _file_spans

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
        ).cast("long").alias("day"),
    )
    zpath = str(tmp_path / "z")
    write_zordered(orders, zpath, "o_custkey", "day", num_files=32, bits=16)
    sizes = [s for _p, s in parquet_files(zpath)]
    stats = compact_clustered(spark, zpath, target_file_bytes=sum(sizes) // 8)
    assert stats["files_after"] < stats["files_before"]
    # locality: each compacted file still covers a fraction of each
    # clustered domain (a size-ordered coalesce rewrite would not)
    assert _avg_span_frac(_file_spans(zpath, "o_custkey")) < 0.75
    assert _avg_span_frac(_file_spans(zpath, "day")) < 0.75
    ipath = str(tmp_path / "idx")
    build_index(spark, zpath, ["o_custkey", "day"], ipath)
    n_total = len(glob.glob(os.path.join(zpath, "*.parquet")))
    n_read = len(pruned_files(spark, ipath, {"o_custkey": (30, 90)}))
    assert 0 < n_read < n_total, (n_read, n_total)


def test_compact_clustered_parallel_bins_deterministic(spark, tmp_path):
    """The per-bin rewrite jobs run from a thread pool (r8: the bins
    are independent, and at micro-bin sizes the sequential loop was
    pure per-job scheduling constants — guide §2.6 back-fill). Pin
    that concurrency never leaks into the RESULT: with more bins than
    pool workers and a mix of single-/multi-file bins, the content
    multiset, the bin-indexed file names, and the rewritten count all
    match the sequential plan exactly."""
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "t")
    orders.repartition(30).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    files = parquet_files(path)
    # target ≈ 2 consecutive files per bin → ~15 bins (> the 8-worker
    # pool), and the odd leftover keeps at least one single-file bin
    target = 2 * (sum(s for _p, s in files) // len(files)) + 1
    expected_bins = plan_bins(files, target)
    single = sum(1 for b in expected_bins if len(b) == 1)
    assert len(expected_bins) > 8 and single >= 0

    stats = compact_clustered(spark, path, target_file_bytes=target)
    assert stats["files_after"] == len(expected_bins)
    assert stats["rewritten"] == sum(1 for b in expected_bins if len(b) > 1)
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(path, "*.parquet"))
    )
    # bin index i → part-{i:05d}-{kept|packed}: names are a pure
    # function of the bin plan, not of thread completion order
    assert [n[:10] for n in names] == [
        f"part-{i:05d}" for i in range(len(expected_bins))
    ]
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == before


def test_compactors_refuse_hive_partitioned_layouts(spark, tmp_path):
    """Partition-column VALUES live only in directory names; a flat
    whole-directory rewrite would silently drop them (single-file bins
    are byte-copied without the dirname, multi-file bins read the
    column back as NULL). Both whole-directory compactors must refuse
    rather than corrupt — per-partition calls are the supported path."""
    import pytest
    from pyspark.sql import functions as F

    from etl_stream_spark.plans.compaction import compact_clustered, compact_parquet

    path = str(tmp_path / "pt")
    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 4).alias("day")
    )
    df.repartition(4).write.partitionBy("day").parquet(path)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_clustered(spark, path, target_file_bytes=1 << 30)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_parquet(spark, path, target_file_bytes=1 << 30)
    # per-leaf calls remain legal: the leaf dirname (and with it the
    # partition value) survives the in-place swap, rows intact
    stats = compact_parquet(spark, f"{path}/day=0", target_file_bytes=1 << 30)
    assert stats["skipped"] is False and stats["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.filter(F.col("day") == 0).count() == 50
    assert back.count() == 200
