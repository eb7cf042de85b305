"""Incremental gold rollup == full recompute, across inserts, updates,
deletes, and group extinction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_stream_spark.cdc import OP_DELETE, OP_INSERT, OP_UPDATE, ParquetMergeTable, make_sequence
from etl_stream_spark.cdc.rollup import IncrementalRollup

SCHEMA = "id long, grp string, v long, operation string, sequence string"


def ev(id_, grp, v, op, i):
    return (id_, grp, v, op, make_sequence(1000, i))


@pytest.fixture()
def tables(spark, tmp_path):
    silver = ParquetMergeTable(spark, str(tmp_path / "silver"), keys=["id"], num_buckets=4)
    rollup = IncrementalRollup(
        spark,
        silver,
        str(tmp_path / "gold"),
        group_cols=["grp"],
        aggs={
            "n_rows": lambda: F.count(F.lit(1)).cast("long"),
            "sum_v": lambda: F.sum("v").cast("long"),
        },
        num_buckets=2,
    )
    return silver, rollup


def full_recompute(silver):
    return {
        r["grp"]: (r["n_rows"], r["sum_v"])
        for r in silver.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"), F.sum("v").cast("long").alias("sum_v"))
        .collect()
    }


def gold_state(rollup):
    return {r["grp"]: (r["n_rows"], r["sum_v"]) for r in rollup.read().collect()}


def apply_batch(spark, silver, rollup, rows):
    batch = spark.createDataFrame(rows, SCHEMA)
    silver.merge(batch)
    rollup.refresh(batch)


def test_rollup_tracks_full_recompute(spark, tables):
    silver, rollup = tables
    apply_batch(
        spark, silver, rollup,
        [ev(1, "a", 10, OP_INSERT, 0), ev(2, "a", 5, OP_INSERT, 1), ev(3, "b", 7, OP_INSERT, 2)],
    )
    assert gold_state(rollup) == full_recompute(silver) == {"a": (2, 15), "b": (1, 7)}

    # update moves a row's value; delete shrinks group a
    apply_batch(
        spark, silver, rollup,
        [ev(2, "a", 50, OP_UPDATE, 3), ev(1, "a", 0, OP_DELETE, 4)],
    )
    assert gold_state(rollup) == full_recompute(silver) == {"a": (1, 50), "b": (1, 7)}

    # group b goes extinct → gold row must disappear
    apply_batch(spark, silver, rollup, [ev(3, "b", 0, OP_DELETE, 5)])
    assert gold_state(rollup) == full_recompute(silver) == {"a": (1, 50)}

    # new group appears later
    apply_batch(spark, silver, rollup, [ev(9, "c", 3, OP_INSERT, 6)])
    assert gold_state(rollup) == full_recompute(silver) == {"a": (1, 50), "c": (1, 3)}


def test_pk_only_delete_shrinks_its_group(spark, tables):
    """A DELETE carrying only the PK (no group value — the reference's
    no-REPLICA-IDENTITY-FULL case) must still shrink the right group:
    merge_and_refresh captures the pre-image group before the merge."""
    silver, rollup = tables
    b1 = spark.createDataFrame(
        [ev(1, "a", 10, OP_INSERT, 0), ev(2, "a", 5, OP_INSERT, 1), ev(3, "b", 7, OP_INSERT, 2)],
        SCHEMA,
    )
    rollup.merge_and_refresh(b1)
    assert gold_state(rollup) == {"a": (2, 15), "b": (1, 7)}

    # PK-only delete: grp and v are NULL in the event
    b2 = spark.createDataFrame(
        [(1, None, None, OP_DELETE, make_sequence(1000, 3))], SCHEMA
    )
    rollup.merge_and_refresh(b2)
    assert gold_state(rollup) == full_recompute(silver) == {"a": (1, 5), "b": (1, 7)}

    # PK-only delete of a group's last row → group extinction in gold
    b3 = spark.createDataFrame(
        [(3, None, None, OP_DELETE, make_sequence(1000, 4))], SCHEMA
    )
    rollup.merge_and_refresh(b3)
    assert gold_state(rollup) == full_recompute(silver) == {"a": (1, 5)}


def test_streaming_medallion_applier_with_rollup(spark, tmp_path):
    """Full medallion in one stream: CDC files → foreachBatch applier →
    silver merge → incremental gold, with a truncate mid-stream."""
    from etl_stream_spark.cdc.pipeline import CdcBatchApplier, CdcTableConfig

    silver = ParquetMergeTable(spark, str(tmp_path / "s" / "t1"), keys=["id"], num_buckets=4)
    rollup = IncrementalRollup(
        spark, silver, str(tmp_path / "gold"), ["grp"],
        {"n_rows": lambda: F.count(F.lit(1)).cast("long"),
         "sum_v": lambda: F.sum("v").cast("long")},
        num_buckets=2,
    )
    applier = CdcBatchApplier(
        spark, str(tmp_path / "s"), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)},
        rollups={"t1": rollup},
    )
    applier._targets["t1"] = silver  # share the instance the rollup wraps

    import json, os

    src = tmp_path / "in"
    src.mkdir()
    batches = [
        [dict(id=1, grp="a", v=10, operation="INSERT"),
         dict(id=2, grp="b", v=5, operation="INSERT")],
        [dict(id=1, grp="a", v=20, operation="UPDATE"),
         dict(id=0, grp=None, v=None, operation="TRUNCATE"),
         dict(id=3, grp="c", v=9, operation="INSERT")],
    ]
    seq = 0
    for i, b in enumerate(batches):
        rows = []
        for r in b:
            r = dict(r, sequence=make_sequence(1000, seq), table="t1")
            seq += 1
            rows.append(json.dumps(r))
        f = src / f"b{i}.json"
        f.write_text("\n".join(rows))
        os.utime(f, (1_000_000_000 + i * 100,) * 2)

    schema = "id long, grp string, v long, operation string, sequence string, table string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(str(src))
    q = (
        stream.writeStream.foreachBatch(applier.apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # post-truncate state: only id=3 survives
    assert {r["id"]: r["grp"] for r in silver.read().collect()} == {3: "c"}
    assert gold_state(rollup) == {"c": (1, 9)}


def test_untouched_groups_not_recomputed(spark, tables):
    """The refresh only scans touched groups: a batch touching only
    group c must not rewrite group a's gold bucket files."""
    import os

    silver, rollup = tables
    apply_batch(
        spark, silver, rollup,
        [ev(1, "a", 1, OP_INSERT, 0), ev(2, "c", 2, OP_INSERT, 1)],
    )

    def gold_files():
        out = {}
        for root, _d, files in os.walk(rollup.gold.path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = gold_files()
    apply_batch(spark, silver, rollup, [ev(3, "c", 5, OP_INSERT, 2)])
    after = gold_files()
    changed = {p for p in before if p not in after or after[p] != before[p]} | (
        set(after) - set(before)
    )
    # every changed file lives in group c's bucket, not a's
    a_bucket = rollup.gold._bucket_expr()
    buckets = {
        r["g"]: r["b"]
        for r in spark.createDataFrame([("a",), ("c",)], "grp string")
        .select(F.col("grp").alias("g"), a_bucket.alias("b"))
        .collect()
    }
    if buckets["a"] != buckets["c"]:  # only meaningful if they differ
        a_dir = f"_bucket={buckets['a']}"
        assert not any(a_dir in p for p in changed)
    assert gold_state(rollup) == full_recompute(silver)


def test_restart_resumes_refresh_counter(spark, tables, tmp_path):
    """A process restart must not reset the refresh counter: a fresh
    IncrementalRollup against an existing gold path resumes from gold's
    stored _seq, so post-restart refreshes are not discarded as stale."""
    silver, rollup = tables
    apply_batch(
        spark, silver, rollup,
        [ev(1, "a", 10, OP_INSERT, 0), ev(2, "b", 7, OP_INSERT, 1)],
    )
    apply_batch(spark, silver, rollup, [ev(1, "a", 20, OP_UPDATE, 2)])
    assert rollup._refresh_seq >= 2

    # simulate restart: new instance, same paths
    restarted = IncrementalRollup(
        spark,
        silver,
        rollup.gold.path,
        group_cols=["grp"],
        aggs={
            "n_rows": lambda: F.count(F.lit(1)).cast("long"),
            "sum_v": lambda: F.sum("v").cast("long"),
        },
        num_buckets=2,
    )
    assert restarted._refresh_seq == rollup._refresh_seq
    apply_batch(spark, silver, restarted, [ev(1, "a", 99, OP_UPDATE, 3)])
    assert gold_state(restarted) == full_recompute(silver)
    assert gold_state(restarted)["a"] == (1, 99)
