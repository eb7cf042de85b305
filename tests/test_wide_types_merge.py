"""End-to-end CDC merge over the canonical wide-type schema (FIXTURES
F1 / reference ``sql/dummy_data.sql:1-35``): every major type class —
UUID strings, DATE, TIMESTAMPTZ, tri-state BOOLEAN, INTEGER, three
decimal shapes, DOUBLE (NaN→null policy), REAL, TEXT[], JSONB — must
survive landing parquet, last-writer-wins dedup, and the bucketed
MERGE with values intact."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from etl_stream_spark.cdc import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ParquetMergeTable,
    make_sequence,
)

SALES_SCHEMA = T.StructType(
    [
        T.StructField("sale_id", T.LongType(), False),
        T.StructField("transaction_uuid", T.StringType(), True),
        T.StructField("customer_name", T.StringType(), True),
        T.StructField("region_code", T.StringType(), True),
        T.StructField("transaction_date", T.DateType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("is_vip_customer", T.BooleanType(), True),
        T.StructField("is_refunded", T.BooleanType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("unit_price", T.DecimalType(12, 2), True),
        T.StructField("discount_pct", T.DecimalType(5, 4), True),
        T.StructField("tax_amount", T.DoubleType(), True),
        T.StructField("shipping_weight_kg", T.FloatType(), True),
        T.StructField("exchange_rate", T.DecimalType(18, 8), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("metadata", T.StringType(), True),  # JSONB as raw string
        T.StructField("operation", T.StringType(), False),
        T.StructField("sequence", T.StringType(), False),
    ]
)

UUID1 = "123e4567-e89b-12d3-a456-426614174000"


def row(sale_id, op, seq_idx, **over):
    base = dict(
        sale_id=sale_id,
        transaction_uuid=UUID1,
        customer_name="Alice",
        region_code="EU1",
        transaction_date=dt.date(2026, 3, 1),
        created_at=dt.datetime(2026, 3, 1, 12, 30, 0),
        is_vip_customer=True,
        is_refunded=None,  # tri-state null
        quantity=3,
        unit_price=Decimal("19.99"),
        discount_pct=Decimal("0.1250"),
        tax_amount=1.25,
        shipping_weight_kg=2.5,
        exchange_rate=Decimal("1.23456789"),
        tags=["a", "b"],
        metadata='{"k1": 1, "k2": "x"}',
        operation=op,
        sequence=make_sequence(1_700_000_000_000_000, seq_idx),
    )
    base.update(over)
    return tuple(base[f.name] for f in SALES_SCHEMA.fields)


@pytest.fixture()
def target(spark, tmp_path):
    return ParquetMergeTable(
        spark, str(tmp_path / "sales"), keys=["sale_id"], num_buckets=4
    )


def test_wide_types_survive_merge(spark, target):
    batch1 = spark.createDataFrame(
        [
            row(1, OP_INSERT, 0),
            row(2, OP_INSERT, 1, customer_name="Bob", is_refunded=False,
                tax_amount=float("nan"), tags=[], metadata=None),
            row(3, OP_INSERT, 2, quantity=None, unit_price=Decimal("0.01")),
        ],
        SALES_SCHEMA,
    )
    # NaN→null policy applied at the envelope boundary (reference nulls
    # NaN/Inf before landing, snowflake_destination.rs:1106-1125)
    batch1 = batch1.withColumn(
        "tax_amount", F.when(F.isnan("tax_amount"), None).otherwise(F.col("tax_amount"))
    )
    target.merge(batch1)

    batch2 = spark.createDataFrame(
        [
            row(2, OP_UPDATE, 3, customer_name="Bobby", unit_price=Decimal("21.50"),
                tags=["x", "y", "z"], is_refunded=True, tax_amount=float("inf"),
                metadata=None),
            row(3, OP_DELETE, 4),
            row(1, OP_UPDATE, 1, customer_name="STALE"),  # seq 1 > insert's 0 → applies
        ],
        SALES_SCHEMA,
    )
    batch2 = batch2.withColumn(
        "tax_amount",
        F.when(
            F.isnan("tax_amount") | F.col("tax_amount").isin(float("inf"), float("-inf")),
            None,
        ).otherwise(F.col("tax_amount")),
    )
    target.merge(batch2)

    state = {r["sale_id"]: r for r in target.read().collect()}
    assert set(state) == {1, 2}

    r1, r2 = state[1], state[2]
    # update with a newer sequence applied
    assert r1["customer_name"] == "STALE"
    # full type round-trip on the updated row
    assert r2["customer_name"] == "Bobby"
    assert r2["transaction_uuid"] == UUID1
    assert r2["region_code"] == "EU1"
    assert r2["transaction_date"] == dt.date(2026, 3, 1)
    assert r2["created_at"] == dt.datetime(2026, 3, 1, 12, 30, 0)
    assert r2["is_vip_customer"] is True and r2["is_refunded"] is True
    assert r2["quantity"] == 3
    assert r2["unit_price"] == Decimal("21.50")
    assert r2["discount_pct"] == Decimal("0.1250")
    assert r2["tax_amount"] is None  # Inf nulled at ingestion
    assert abs(r2["shipping_weight_kg"] - 2.5) < 1e-6
    assert r2["exchange_rate"] == Decimal("1.23456789")
    assert r2["tags"] == ["x", "y", "z"]
    assert r2["metadata"] is None
    # null tri-state preserved on the untouched row
    assert r1["is_refunded"] is None and r1["tax_amount"] == 1.25
    assert r1["metadata"] == '{"k1": 1, "k2": "x"}'


def test_stale_update_loses_on_wide_schema(spark, target):
    target.merge(
        spark.createDataFrame([row(1, OP_INSERT, 5, customer_name="fresh")], SALES_SCHEMA)
    )
    target.merge(
        spark.createDataFrame([row(1, OP_UPDATE, 2, customer_name="stale")], SALES_SCHEMA)
    )
    state = {r["sale_id"]: r["customer_name"] for r in target.read().collect()}
    assert state == {1: "fresh"}


def test_exact_batch_replay_is_idempotent(spark, target):
    """Exactly-once under at-least-once delivery: re-merging the very
    same batch (identical sequences) must leave the target unchanged —
    checkpoint recovery replays batches, the merge must absorb them."""
    batch = spark.createDataFrame(
        [row(1, OP_INSERT, 0), row(2, OP_INSERT, 1),
         row(2, OP_UPDATE, 2, customer_name="Bobby")],
        SALES_SCHEMA,
    )
    def snapshot():
        return sorted(
            (r["sale_id"], r["customer_name"], str(r["unit_price"]))
            for r in target.read().collect()
        )

    target.merge(batch)
    first = snapshot()
    assert [(i, n) for i, n, _p in first] == [(1, "Alice"), (2, "Bobby")]
    target.merge(batch)  # replay after a simulated checkpoint recovery
    assert snapshot() == first


def test_json_metadata_parses_after_merge(spark, target):
    from etl_stream_spark.functions.parsing import parse_json_columns

    target.merge(spark.createDataFrame([row(1, OP_INSERT, 0)], SALES_SCHEMA))
    parsed = parse_json_columns(
        target.read(), {"metadata": T.StructType([T.StructField("k1", T.LongType())])}
    )
    assert parsed.select("metadata.k1").first()[0] == 1
