"""Scalar function layer: serialization (P4/P5), parsing (P7), sequences."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_stream_spark.functions import (
    array_json,
    cell_json,
    is_numeric_string,
    lsn_sequence,
    lsn_sequence_expr,
    numeric_string_expr,
    parse_json_columns,
    sanitize_floats,
)


class TestSerialization:
    def test_sanitize_floats_nan_inf_null(self, spark):
        df = spark.createDataFrame(
            [(1.5,), (float("nan"),), (float("inf"),), (float("-inf"),), (None,)],
            "v double",
        )
        out = [r[0] for r in df.select(sanitize_floats(F.col("v")).alias("v")).collect()]
        assert out == [1.5, None, None, None, None]

    def test_cell_json_bytes_base64(self, spark):
        df = spark.createDataFrame([(b"\x01\x02",)], "b binary")
        out = df.select(cell_json(F.col("b"), T.BinaryType()).alias("j")).first()[0]
        assert out == "AQI="

    def test_cell_json_bool_and_decimal(self, spark):
        df = spark.createDataFrame(
            [(True, Decimal("12.34"))], "f boolean, d decimal(10,2)"
        )
        row = df.select(
            cell_json(F.col("f"), T.BooleanType()).alias("f"),
            cell_json(F.col("d"), T.DecimalType(10, 2)).alias("d"),
        ).first()
        assert (row["f"], row["d"]) == ("true", "12.34")

    def test_cell_json_timestamp_rfc3339(self, spark):
        df = spark.sql("SELECT timestamp'2024-01-02 03:04:05.123456 UTC' AS ts")
        out = df.select(cell_json(F.col("ts"), T.TimestampType()).alias("j")).first()[0]
        assert out.startswith("2024-01-02T03:04:05.123456")
        assert out.endswith("Z") or "+" in out

    def test_array_json_float_nan_becomes_null(self, spark):
        df = spark.createDataFrame([([1.0, float("nan"), 2.0],)], "a array<double>")
        out = df.select(array_json(F.col("a"), T.DoubleType()).alias("j")).first()[0]
        assert out == "[1.0,null,2.0]"

    def test_array_json_bytes_base64(self, spark):
        df = spark.createDataFrame([([b"\x00", b"\xff"],)], "a array<binary>")
        out = df.select(array_json(F.col("a"), T.BinaryType()).alias("j")).first()[0]
        assert out == '["AA==","/w=="]'


class TestParsing:
    @pytest.mark.parametrize(
        ("value", "expected"),
        [("123", True), ("-4.5", True), ("1.", False), ("abc", False), ("", False)],
    )
    def test_is_numeric_string(self, value, expected):
        assert is_numeric_string(value) is expected

    def test_numeric_string_expr_matches_python(self, spark):
        vals = ["123", "-4.5", "1.", "abc", "1e5", "007"]
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        got = {
            r["s"]: r["m"]
            for r in df.select("s", numeric_string_expr(F.col("s")).alias("m")).collect()
        }
        assert got == {v: is_numeric_string(v) for v in vals}

    def test_parse_json_columns_try_semantics(self, spark):
        df = spark.createDataFrame(
            [(1, '["a","b"]', '{"k": 2}'), (2, "not-json", None)],
            "id long, tags string, meta string",
        )
        out = parse_json_columns(
            df, {"tags": "array<string>", "meta": "map<string,int>"}
        ).collect()
        by_id = {r["id"]: r for r in out}
        assert by_id[1]["tags"] == ["a", "b"] and by_id[1]["meta"] == {"k": 2}
        assert by_id[2]["tags"] is None and by_id[2]["meta"] is None


class TestSequences:
    def test_lsn_sequence_order_matches_numeric(self):
        pairs = [(1, 5), (1, 50), (2, 1), (16, 0), (255, 255), (2**40, 7)]
        seqs = [lsn_sequence(c, s) for c, s in pairs]
        assert seqs == sorted(seqs)
        assert all(len(s) == 33 for s in seqs)

    def test_lsn_sequence_expr_matches_python(self, spark):
        df = spark.createDataFrame([(2**40, 7), (255, 255)], "c long, s long")
        got = [
            r[0]
            for r in df.select(
                lsn_sequence_expr(F.col("c"), F.col("s")).alias("q")
            ).collect()
        ]
        assert got == [lsn_sequence(2**40, 7), lsn_sequence(255, 255)]


class TestMasking:
    """functions/masking.py: deterministic in-flight column masking."""

    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 123.4, "00000000000000000042"), (2, None, "x")],
            "user_id long, v double, seq string",
        )

    def test_hash_is_salted_and_join_stable(self, spark):
        from etl_stream_spark.functions.masking import mask_columns

        a = mask_columns(self._df(spark), {"user_id": "hash"}, salt="s1")
        b = mask_columns(self._df(spark), {"user_id": "hash"}, salt="s1")
        c = mask_columns(self._df(spark), {"user_id": "hash"}, salt="s2")
        va = {r.user_id for r in a.collect()}
        assert va == {r.user_id for r in b.collect()}  # deterministic
        assert va.isdisjoint({r.user_id for r in c.collect()})  # salt matters
        assert all(len(v) == 32 for v in va)

    def test_bucket_generalizes_and_null_passes(self, spark):
        from etl_stream_spark.functions.masking import mask_columns

        rows = {r.user_id: r.v for r in
                mask_columns(self._df(spark), {"v": "bucket:50"}).collect()}
        assert rows[1] == 100 and rows[2] is None

    def test_keep_last_handles_short_strings(self, spark):
        from etl_stream_spark.functions.masking import mask_columns

        rows = {r.user_id: r.seq for r in
                mask_columns(self._df(spark), {"seq": "keep_last:4"}).collect()}
        assert rows[1] == "****************0042"
        assert rows[2] == "x"  # shorter than the kept tail: nothing to star

    def test_null_strategy_keeps_type(self, spark):
        from etl_stream_spark.functions.masking import mask_columns

        m = mask_columns(self._df(spark), {"v": "null"})
        assert dict(m.dtypes)["v"] == "double"
        assert all(r.v is None for r in m.collect())

    def test_unknown_column_and_strategy_raise(self, spark):
        import pytest as _pytest

        from etl_stream_spark.functions.masking import mask_columns

        with _pytest.raises(ValueError):
            mask_columns(self._df(spark), {"nope": "hash"})
        with _pytest.raises(ValueError):
            mask_columns(self._df(spark), {"v": "rot13"}).collect()
        with _pytest.raises(ValueError):
            mask_columns(self._df(spark), {"v": "bucket:0"}).collect()
