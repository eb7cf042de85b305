"""Composite primary keys through the whole CDC surface — the reference
builds its MERGE ON clause from a pk LIST
(etl-snowflake-py/etl_snowflake/task.py:130-133), so multi-column keys
must work end-to-end: LWW dedup (both forms), the merge engine, and
SCD2 history."""

from __future__ import annotations

from etl_stream_spark.cdc import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ParquetMergeTable,
    Scd2Table,
    last_writer_wins,
    last_writer_wins_agg,
)

SCHEMA = "tenant string, id long, v long, operation string, sequence string"


def seq(i: int) -> str:
    return f"{i:020d}"


ROWS = [
    ("a", 1, 10, OP_INSERT, seq(1)),
    ("b", 1, 20, OP_INSERT, seq(2)),   # same id, different tenant
    ("a", 1, 11, OP_UPDATE, seq(3)),
    ("b", 1, 0, OP_DELETE, seq(4)),
    ("a", 2, 30, OP_INSERT, seq(5)),
]


def test_lww_both_forms_key_on_all_columns(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    for fn in (last_writer_wins, last_writer_wins_agg):
        got = {
            (r["tenant"], r["id"]): (r["v"], r["sequence"])
            for r in fn(df, ["tenant", "id"]).collect()
        }
        assert got == {
            ("a", 1): (11, seq(3)),
            ("b", 1): (0, seq(4)),
            ("a", 2): (30, seq(5)),
        }, fn.__name__


def test_merge_engine_composite_pk(spark, tmp_path):
    t = ParquetMergeTable(
        spark, str(tmp_path / "t"), keys=["tenant", "id"], num_buckets=4
    )
    t.merge(spark.createDataFrame(ROWS, SCHEMA))
    got = {(r["tenant"], r["id"]): r["v"] for r in t.read().collect()}
    # (b,1) deleted; (a,1) updated — id=1 alone must NOT collide tenants
    assert got == {("a", 1): 11, ("a", 2): 30}

    # stale event on one composite key loses; fresh on the other wins
    t.merge(
        spark.createDataFrame(
            [("a", 1, 99, OP_UPDATE, seq(2)), ("a", 2, 31, OP_UPDATE, seq(6))],
            SCHEMA,
        )
    )
    got = {(r["tenant"], r["id"]): r["v"] for r in t.read().collect()}
    assert got == {("a", 1): 11, ("a", 2): 31}


def test_scd2_composite_pk(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "h"), keys=["tenant", "id"], num_buckets=4)
    t.apply_batch(spark.createDataFrame(ROWS[:2], SCHEMA))
    t.apply_batch(spark.createDataFrame(ROWS[2:], SCHEMA))
    got = {
        (r["tenant"], r["id"], r["valid_from_seq"]): (
            r["valid_to_seq"],
            r["is_current"],
        )
        for r in t.read().collect()
    }
    assert got == {
        ("a", 1, seq(1)): (seq(3), False),
        ("a", 1, seq(3)): (None, True),
        ("b", 1, seq(2)): (seq(4), False),  # closed by its tenant's delete
        ("a", 2, seq(5)): (None, True),
    }


def test_merge_on_read_composite_pk(spark, tmp_path):
    """MOR engine with a composite key: L0 resolution keys on the full
    tuple (id alone must not collide tenants), across compactions."""
    t = ParquetMergeTable(
        spark,
        str(tmp_path / "mor"),
        keys=["tenant", "id"],
        num_buckets=4,
        merge_on_read=True,
        compact_threshold=1,
    )
    for row in ROWS:  # one batch per event → maximal generation count
        t.merge(spark.createDataFrame([row], SCHEMA))
    got = {(r["tenant"], r["id"]): r["v"] for r in t.read().collect()}
    assert got == {("a", 1): 11, ("a", 2): 30}
    t.compact()
    assert {(r["tenant"], r["id"]): r["v"] for r in t.read().collect()} == got
