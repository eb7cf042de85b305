"""Validation (P10), TTL+LRU schema cache, catalog introspection (S4/S5/S7)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from etl_stream_spark.schema.cache import TtlLruCache
from etl_stream_spark.schema.introspection import (
    describe_columns,
    list_tables,
    path_schema,
    table_exists,
)
from etl_stream_spark.schema.validation import (
    ValidationReport,
    decimal_fits,
    validate_frame,
)


class TestValidation:
    def test_decimal_fits(self):
        assert decimal_fits(38, 10)
        assert decimal_fits(76, 38)
        assert not decimal_fits(77, 10)
        assert not decimal_fits(76, 39)

    def test_validate_frame_counts_violations(self, spark):
        df = spark.createDataFrame(
            [
                (1.0, datetime.date(2024, 1, 1)),
                (float("nan"), datetime.date(2024, 1, 1)),
                (float("inf"), None),
                (None, datetime.date(2024, 1, 1)),
            ],
            "x double, d date",
        )
        reports = {(r.column, r.rule): r.violations for r in validate_frame(df)}
        assert reports[("x", "finite")] == 2
        assert reports[("d", "date_range")] == 0

    def test_validate_frame_no_applicable_columns(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, s string")
        assert validate_frame(df) == []


class TestTtlLruCache:
    def test_ttl_expiry(self):
        now = {"t": 0.0}
        c: TtlLruCache[str] = TtlLruCache(ttl_s=300, clock=lambda: now["t"])
        c.put("k", "v")
        assert c.get("k") == "v"
        now["t"] = 301.0
        assert c.get("k") is None

    def test_lru_eviction(self):
        c: TtlLruCache[int] = TtlLruCache(max_entries=2, clock=lambda: 0.0)
        c.put("a", 1)
        c.put("b", 2)
        c.get("a")  # touch a → b becomes LRU
        c.put("c", 3)
        assert c.get("b") is None
        assert c.get("a") == 1 and c.get("c") == 3

    def test_get_or_load_loads_once(self):
        calls = []
        c: TtlLruCache[str] = TtlLruCache(clock=lambda: 0.0)
        for _ in range(3):
            c.get_or_load("k", lambda: calls.append(1) or "v")
        assert len(calls) == 1

    def test_cleanup_expired(self):
        now = {"t": 0.0}
        c: TtlLruCache[int] = TtlLruCache(ttl_s=10, clock=lambda: now["t"])
        c.put("a", 1)
        now["t"] = 5.0
        c.put("b", 2)
        now["t"] = 12.0
        assert c.cleanup_expired() == 1
        assert len(c) == 1 and c.get("b") == 2


class TestIntrospection:
    def test_table_exists_and_list(self, spark):
        spark.createDataFrame([(1,)], "id long").createOrReplaceTempView("intros_t")
        assert table_exists(spark, "intros_t")
        assert not table_exists(spark, "intros_missing")
        assert "intros_t" in list_tables(spark)

    def test_path_schema_reads_footer(self, spark):
        sch = path_schema(spark, "/root/testdata/sf0.001/region.parquet")
        assert {f.name for f in sch.fields} >= {"r_regionkey", "r_name"}

    def test_describe_columns_pk_heuristic(self):
        sch = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
            ]
        )
        cols = describe_columns(sch)
        assert (cols[0].name, cols[0].data_type, cols[0].nullable, cols[0].is_primary) == (
            "id",
            "bigint",
            False,
            True,
        )
        assert cols[1].is_primary is False

    def test_describe_columns_explicit_keys(self):
        sch = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.LongType())])
        cols = describe_columns(sch, keys=["b"])
        assert [c.is_primary for c in cols] == [False, True]
