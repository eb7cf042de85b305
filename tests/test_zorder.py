"""Z-order clustering: Morton-value correctness and actual file-level
data-skipping value (per-file min/max spans narrow on BOTH columns)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from etl_stream_spark.plans.zorder import with_z_value, write_zordered, z_value


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 0), (0, 2), (3, 3)], "a long, b long"
    )
    out = df.select(
        "a", "b", z_value([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()
    got = {(r["a"], r["b"]): r["z"] for r in out}
    # bit b of coord i lands at position b*2 + i
    assert got[(0, 0)] == 0
    assert got[(1, 1)] == 3
    assert got[(2, 0)] == 4  # a bit1 -> position 2
    assert got[(0, 2)] == 8  # b bit1 -> position 3
    assert got[(3, 3)] == 15


def test_z_value_rejects_long_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        z_value([F.lit(1), F.lit(1), F.lit(1), F.lit(1)], bits=16)


def test_with_z_value_handles_constant_column(spark):
    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "a long, b long")
    rows = with_z_value(df, ["a", "b"], bits=4).collect()
    # constant column contributes coordinate 0 everywhere; no divide error
    assert all(r["_z"] >= 0 for r in rows)


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        spans.append((min(mins), max(maxs)))
    return spans


def test_zorder_write_narrows_file_spans(spark, tmp_path):
    """Each Z-ordered file must cover a small fraction of BOTH key
    ranges — the property that lets parquet skip files for predicates
    on either column. A hash-partitioned write covers ~everything."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % n).alias("x"),
        (F.col("id") * 16807 % n).alias("y"),
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], n_files=16)

    base = str(tmp_path / "plain")
    df.repartition(16).write.parquet(base)

    for col in ("x", "y"):
        z_spans = _file_spans(zpath, col)
        p_spans = _file_spans(base, col)
        z_avg = sum(mx - mn for mn, mx in z_spans) / len(z_spans)
        p_avg = sum(mx - mn for mn, mx in p_spans) / len(p_spans)
        # 16 files x 2 columns: each Z file should span ~1/4 of each
        # range (sqrt(16)); hash files span ~the whole range
        assert z_avg < 0.45 * n, f"{col}: z files too wide ({z_avg})"
        assert z_avg < 0.6 * p_avg, f"{col}: no win over hash layout"

    # round trip preserves the data
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("x")).first()[0] == df.agg(F.sum("x")).first()[0]
