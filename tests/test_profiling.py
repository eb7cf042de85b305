"""Table profiler: per-column stats semantics + the column-pruning
claim (each union branch's scan must read exactly one field)."""

from __future__ import annotations

import re

from etl_stream_spark.schema.profiling import profile_table


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 4.5, None), (3, 4.5, None)],
        "k long, x double, s string",
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "x", "s"}
    k, x, s = rows["k"], rows["x"], rows["s"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 0, 3)
    assert (k.min_value, k.max_value) == (1.0, 3.0)
    assert (x.n_rows, x.n_nulls, x.n_distinct) == (4, 1, 2)
    assert (x.min_value, x.max_value) == (2.5, 4.5)
    # non-numeric: distinct counts non-null values, min/max contractually NULL
    assert (s.n_nulls, s.n_distinct) == (2, 2)
    assert s.min_value is None and s.max_value is None
    assert (k.dtype, x.dtype, s.dtype) == ("bigint", "double", "string")


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert [r.col_name for r in profile_table(df, ["s"]).collect()] == ["s"]


def test_profile_scans_prune_to_one_column(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 2.5, "a", 7)], "k long, x double, s string, y long"
    ).write.parquet(path)
    plan = profile_table(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(read_schemas) == 4
    for rs in read_schemas:
        assert rs.count(":") == 1, f"branch reads more than one column: {rs}"
