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


def test_suggested_expectations_round_trip(spark):
    from etl_stream_spark.schema import expectations as ex
    from etl_stream_spark.schema.profiling import suggest_expectations

    df = spark.createDataFrame(
        [
            (1, 10.5, "A", None),
            (2, 20.0, "B", "x"),
            (3, 15.0, "A", "y"),
        ],
        "id long, price double, status string, note string",
    )
    rules = suggest_expectations(df)
    by_name = {r.name: r for r in rules}
    # id: never null, all distinct, ranged; status: enum; note: nullable
    assert "not_null(id)" in by_name and "unique(id)" in by_name
    assert "in_range(id)" in by_name and "in_range(price)" in by_name
    assert "accepted_values(status)" in by_name
    assert "not_null(note)" not in by_name
    # every suggested rule passes on the profiled data by construction
    report = ex.check(df, rules)
    assert all(r.passed for r in report.collect())
    # and a drifted batch trips exactly the right rules
    drifted = spark.createDataFrame(
        [(None, 99.0, "C", "z")], "id long, price double, status string, note string"
    )
    failed = {
        r.expectation for r in ex.check(drifted, rules).collect() if not r.passed
    }
    assert "not_null(id)" in failed
    assert "in_range(price)" in failed
    assert "accepted_values(status)" in failed


def test_suggestion_range_slack(spark):
    from etl_stream_spark.schema import expectations as ex
    from etl_stream_spark.schema.profiling import suggest_expectations

    df = spark.createDataFrame([(0.0,), (100.0,)], "v double")
    rules = [
        r
        for r in suggest_expectations(df, range_slack=0.1)
        if r.name == "in_range(v)"
    ]
    assert len(rules) == 1
    # slack widens the observed [0, 100] to [-10, 110]: 105 passes, 115 fails
    inside = spark.createDataFrame([(105.0,)], "v double")
    outside = spark.createDataFrame([(115.0,)], "v double")
    assert ex.check(inside, rules).collect()[0].passed
    assert not ex.check(outside, rules).collect()[0].passed
