"""Schema-layer unit tests — fixtures per FIXTURES.md F3 (derived from the
reference's own pytest surface: test_task_conversion.py, test_ddl_validation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_stream_spark.schema import (
    decode_numeric_typmod,
    decode_varchar_typmod,
    detect_primary_key,
    escape_table_name,
    infer_spark_type,
    infer_struct_type,
    oid_to_spark_type,
    pg_type_name_to_spark_type,
    unescape_table_name,
    validate_identifier,
)
from etl_stream_spark.schema.identifiers import (
    InvalidIdentifierError,
    is_valid_identifier,
    normalize_namespace,
)
from etl_stream_spark.schema.type_mapping import ColumnSpec, columns_to_struct_type


class TestTypeMapping:
    def test_scalar_oids(self):
        assert oid_to_spark_type(16) == T.BooleanType()
        assert oid_to_spark_type(21) == T.ShortType()
        assert oid_to_spark_type(23) == T.IntegerType()
        assert oid_to_spark_type(20) == T.LongType()
        assert oid_to_spark_type(26) == T.LongType()  # oid/u32 widened
        assert oid_to_spark_type(700) == T.FloatType()
        assert oid_to_spark_type(701) == T.DoubleType()
        assert oid_to_spark_type(25) == T.StringType()
        assert oid_to_spark_type(17) == T.BinaryType()
        assert oid_to_spark_type(1082) == T.DateType()
        assert oid_to_spark_type(1083) == T.LongType()  # time → µs
        assert oid_to_spark_type(1184) == T.TimestampType()
        assert oid_to_spark_type(2950) == T.StringType()  # uuid
        assert oid_to_spark_type(3802) == T.StringType()  # jsonb
        assert oid_to_spark_type(1186) == T.StringType()  # interval

    def test_timestamp_ntz(self):
        assert oid_to_spark_type(1114) == T.TimestampNTZType()

    def test_unknown_oid_falls_back_to_string(self):
        assert oid_to_spark_type(999999) == T.StringType()

    def test_array_oids(self):
        assert oid_to_spark_type(1009) == T.ArrayType(T.StringType(), True)
        assert oid_to_spark_type(1007) == T.ArrayType(T.IntegerType(), True)
        assert oid_to_spark_type(1022) == T.ArrayType(T.DoubleType(), True)

    def test_numeric_typmod_decode(self):
        # typmod = ((p << 16) | s) + 4
        assert decode_numeric_typmod(((12 << 16) | 2) + 4) == (12, 2)
        assert decode_numeric_typmod(((5 << 16) | 4) + 4) == (5, 4)
        assert decode_numeric_typmod(((18 << 16) | 8) + 4) == (18, 8)
        assert decode_numeric_typmod(-1) == (38, 10)  # unconstrained default
        # precision above Spark/Snowflake cap is clamped to 38
        assert decode_numeric_typmod(((76 << 16) | 10) + 4) == (38, 10)

    def test_numeric_oid_with_typmod(self):
        assert oid_to_spark_type(1700, ((12 << 16) | 2) + 4) == T.DecimalType(12, 2)
        assert oid_to_spark_type(1700) == T.DecimalType(38, 10)

    def test_varchar_typmod(self):
        assert decode_varchar_typmod(104) == 100  # varchar(100)
        assert decode_varchar_typmod(-1) is None

    def test_type_names(self):
        assert pg_type_name_to_spark_type("int4") == T.IntegerType()
        assert pg_type_name_to_spark_type("text") == T.StringType()
        assert pg_type_name_to_spark_type("text[]") == T.ArrayType(T.StringType(), True)
        assert pg_type_name_to_spark_type("_int4") == T.ArrayType(T.IntegerType(), True)
        assert pg_type_name_to_spark_type("numeric(12,2)") == T.DecimalType(12, 2)
        assert pg_type_name_to_spark_type("numeric(76,10)") == T.DecimalType(38, 10)
        assert pg_type_name_to_spark_type("character varying(100)") == T.StringType()
        assert pg_type_name_to_spark_type("double precision") == T.DoubleType()
        assert pg_type_name_to_spark_type("timestamp with time zone") == T.TimestampType()
        assert pg_type_name_to_spark_type("no_such_type") == T.StringType()

    def test_columns_to_struct(self):
        cols = [
            ColumnSpec("sale_id", 20, "int8", nullable=False, primary=True),
            ColumnSpec("unit_price", 1700, "numeric", typmod=((12 << 16) | 2) + 4),
            ColumnSpec("tags", 1009, "text[]"),
        ]
        st = columns_to_struct_type(cols)
        assert st == T.StructType(
            [
                T.StructField("sale_id", T.LongType(), False),
                T.StructField("unit_price", T.DecimalType(12, 2), True),
                T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            ]
        )


class TestIdentifiers:
    @pytest.mark.parametrize("name", ["table_name", "_private", "Table123", "a" * 255])
    def test_valid(self, name):
        assert validate_identifier(name) == name

    @pytest.mark.parametrize(
        "name",
        ["", "1table", "ta ble", "ta;ble", 'ta"ble', "ta-ble", "a" * 256, "drop", "SELECT"],
    )
    def test_invalid(self, name):
        with pytest.raises(InvalidIdentifierError):
            validate_identifier(name)
        assert not is_valid_identifier(name)

    def test_escape_roundtrip(self):
        for schema, table in [
            ("public", "users"),
            ("my_schema", "my_table"),
            ("a_b_c", "d_e"),
            ("_x", "y_"),
        ]:
            flat = escape_table_name(schema, table)
            assert unescape_table_name(flat) == (schema, table)

    def test_escape_collision_free(self):
        # (a_b, c) vs (a, b_c) must not collide
        assert escape_table_name("a_b", "c") != escape_table_name("a", "b_c")

    def test_normalize_namespace(self):
        assert normalize_namespace("My-Schema.X") == "my_schema_x"
        assert normalize_namespace("9abc").startswith("_")


class TestPkDetection:
    def test_exact_id(self):
        assert detect_primary_key(["id", "name", "user_id"]) == ["id"]

    def test_single_suffix_id(self):
        assert detect_primary_key(["user_id", "name"]) == ["user_id"]

    def test_multiple_ids_known_pattern_wins(self):
        assert detect_primary_key(["user_id", "record_id", "order_id"]) == ["record_id"]

    def test_uuid_fallback(self):
        assert detect_primary_key(["uuid", "name"]) == ["uuid"]
        assert detect_primary_key(["txn_uuid", "name"]) == ["txn_uuid"]

    def test_none(self):
        assert detect_primary_key(["name", "value"]) == []


class TestInference:
    def test_scalars(self):
        assert infer_spark_type(True) == T.BooleanType()
        assert infer_spark_type(3) == T.LongType()
        assert infer_spark_type(3.5) == T.DoubleType()
        assert infer_spark_type("x") == T.StringType()
        assert infer_spark_type(b"x") == T.BinaryType()
        assert infer_spark_type(None) == T.StringType()

    def test_numeric_string_promotion(self):
        assert infer_spark_type("42") == T.LongType()
        assert infer_spark_type("-7") == T.LongType()
        assert infer_spark_type("3.14") == T.DecimalType(38, 10)
        assert infer_spark_type("3.14.15") == T.StringType()

    def test_containers(self):
        assert infer_spark_type([1, 2]) == T.ArrayType(T.LongType(), True)
        assert infer_spark_type({"a": 1}) == T.StringType()  # opaque JSON

    def test_struct_inference(self):
        rows = [
            {"a": None, "b": 1, "c": "x"},
            {"a": True, "b": 2, "c": 1.5},  # c conflicts → string
        ]
        st = infer_struct_type(rows)
        assert st["a"].dataType == T.BooleanType()
        assert st["b"].dataType == T.LongType()
        assert st["c"].dataType == T.StringType()


class TestArrowInference:
    def test_arrow_schema_roundtrip(self):
        import pyarrow as pa

        from etl_stream_spark.schema.inference import arrow_to_struct_type
        from pyspark.sql import types as T

        arrow = pa.schema(
            [
                pa.field("id", pa.int64(), nullable=False),
                pa.field("name", pa.string()),
                pa.field("score", pa.float64()),
                pa.field("tags", pa.list_(pa.string())),
                pa.field("ts", pa.timestamp("us")),
            ]
        )
        st = arrow_to_struct_type(arrow)
        assert st["id"].dataType == T.LongType()
        assert st["id"].nullable is True  # forced nullable
        assert st["tags"].dataType == T.ArrayType(T.StringType())
        assert isinstance(st["ts"].dataType, T.TimestampNTZType)
