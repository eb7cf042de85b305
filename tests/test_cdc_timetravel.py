"""Time-travel surface over the CDC log: point-in-time snapshot, SCD2
history, snapshot-diff change feed (catalog entries ``cdc_point_in_time``,
``cdc_scd2_history``, ``cdc_change_feed``).

The catalog entries run against the events table with a derived op
column; these tests pin the semantics on a tiny hand-built log where
every expected row is enumerable by eye. The log drives event_type
through the same signup=INSERT / error=DELETE mapping the catalog uses.
"""

from __future__ import annotations

import pytest

from etl_stream_spark.catalog import (
    cdc_change_feed,
    cdc_point_in_time,
    cdc_scd2_history,
)

# (event_id, ts, user_id, event_type, value, props)
# max(event_id)=10 → point-in-time cutoff floor(10*3/5)=6,
# change-feed cutoffs a=floor(10*2/5)=4, b=floor(10*4/5)=8.
LOG = [
    (1, "2024-01-01 00:00:00", 1, "signup", 10.0, "{}"),   # u1 insert
    (2, "2024-01-01 00:01:00", 2, "signup", 20.0, "{}"),   # u2 insert
    (3, "2024-01-01 00:02:00", 1, "click", 11.0, "{}"),    # u1 update
    (4, "2024-01-01 00:03:00", 3, "signup", 30.0, "{}"),   # u3 insert
    (5, "2024-01-01 00:04:00", 2, "error", 0.0, "{}"),     # u2 delete (≤ cutoff 6)
    (6, "2024-01-01 00:05:00", 1, "click", 12.0, "{}"),    # u1 update (≤ cutoff 6)
    (7, "2024-01-01 00:06:00", 3, "error", 0.0, "{}"),     # u3 delete (> 6, ≤ 8)
    (8, "2024-01-01 00:07:00", 4, "signup", 40.0, "{}"),   # u4 insert (≤ 8)
    (9, "2024-01-01 00:08:00", 1, "click", 13.0, "{}"),    # u1 update (> 8)
    (10, "2024-01-01 00:09:00", 5, "signup", 50.0, "{}"),  # u5 insert (> 8)
]
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("tt")
    df = spark.createDataFrame(
        LOG,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def seq(i: int) -> str:
    return f"{i:020d}"


def test_point_in_time_state_at_60pct(spark, sf_dir):
    # cutoff 6: u1 last=6 (12.0), u2 deleted at 5, u3 alive at 4 (30.0)
    rows = {
        r["user_id"]: (r["last_value"], r["asof_sequence"])
        for r in cdc_point_in_time(spark, sf_dir).collect()
    }
    assert rows == {1: (12.0, seq(6)), 3: (30.0, seq(4))}


def test_scd2_intervals_close_and_current(spark, sf_dir):
    rows = {
        (r["user_id"], r["valid_from_seq"]): (
            r["valid_to_seq"],
            r["is_current"],
        )
        for r in cdc_scd2_history(spark, sf_dir).collect()
    }
    # u1: four versions chained 1→3→6→9, last open
    assert rows[(1, seq(1))] == (seq(3), False)
    assert rows[(1, seq(3))] == (seq(6), False)
    assert rows[(1, seq(6))] == (seq(9), False)
    assert rows[(1, seq(9))] == (None, True)
    # u2: single version closed by its DELETE, so not current
    assert rows[(2, seq(2))] == (seq(5), False)
    # the DELETE itself emits no version row
    assert (2, seq(5)) not in rows
    # u3 closed by delete at 7; u4/u5 open
    assert rows[(3, seq(4))] == (seq(7), False)
    assert rows[(4, seq(8))] == (None, True)
    assert rows[(5, seq(10))] == (None, True)


def test_change_feed_classifies_diff(spark, sf_dir):
    # state@4: u1(seq3), u2(seq2), u3(seq4); state@8: u1(seq6), u4(seq8)
    rows = {
        r["user_id"]: (
            r["change_type"],
            r["old_sequence"],
            r["new_sequence"],
        )
        for r in cdc_change_feed(spark, sf_dir).collect()
    }
    assert rows == {
        1: ("UPDATE", seq(3), seq(6)),
        2: ("DELETE", seq(2), None),
        3: ("DELETE", seq(4), None),
        4: ("INSERT", None, seq(8)),
    }
