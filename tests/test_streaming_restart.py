"""Checkpoint-restart parity for the round-6 monitor shapes.

``streaming_cusum_monitor`` (complete-mode windowed counts feeding the
batch CUSUM) and ``streaming_dq_monitor`` (watermarked windowed
expectation sums) must survive a crash/redeploy: a query restarted on
the SAME checkpoint after new input arrived has to produce exactly the
state a single uninterrupted run produces. The memory sink refuses
checkpoint recovery, so the runs here go through ``foreachBatch`` (the
CLAUDE.md rule) capturing the last complete snapshot.

Crash simulation: run 1 sees only batch-0 files (availableNow drains
and terminates); batch-1 files are added AFTER it stops; run 2 reuses
the checkpoint — the offset log must skip batch 0's files while the
state store restores its aggregation state, so day/hour buckets that
straddle the restart keep their pre-crash counts.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

SCHEMA = "event_id long, ts timestamp, value double, event_type string, props string"

_B0 = [
    {"event_id": 1, "ts": "2026-01-01 01:00:00", "value": 10.0,
     "event_type": "click", "props": "{}"},
    {"event_id": 2, "ts": "2026-01-01 09:30:00", "value": None,
     "event_type": "view", "props": "{}"},
    {"event_id": 3, "ts": "2026-01-02 03:00:00", "value": 900.0,
     "event_type": "click", "props": "oops"},
    {"event_id": 4, "ts": "2026-01-02 04:00:00", "value": 20.0,
     "event_type": "bogus", "props": "{}"},
]
_B1 = [
    {"event_id": 5, "ts": "2026-01-02 05:00:00", "value": 30.0,
     "event_type": "purchase", "props": "{}"},
    {"event_id": 6, "ts": "2026-01-04 10:00:00", "value": None,
     "event_type": "click", "props": "{}"},
    {"event_id": 7, "ts": "2026-01-04 11:00:00", "value": 40.0,
     "event_type": "view", "props": "{}"},
]


def _write(src, name: str, rows: list[dict], mtime: int) -> None:
    f = src / name
    f.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(f, (mtime, mtime))


def _drain(spark, src, ckpt, agg_builder, snapshots: list):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )

    def sink(batch_df, _bid):
        snapshots.append([tuple(r) for r in batch_df.collect()])

    q = (
        agg_builder(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _cusum_agg(stream):
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("window.start").alias("day"), "n")
    )


def _dq_agg(stream):
    from etl_stream_spark.schema import expectations as ex

    rules = [
        ex.not_null("value"),
        ex.in_range("value", 0, 300),
        ex.accepted_values("event_type", ["click", "view", "purchase", "signup"]),
        ex.matches("props", r"^\{"),
    ]
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.sum(F.when(r.violation(stream), 1).otherwise(0))
                .cast("long")
                .alias(f"v{i}")
                for i, r in enumerate(rules)
            ],
        )
        .select(F.col("window.start").alias("hour"), "n_rows", "v0", "v1", "v2", "v3")
    )


def _restart_parity(spark, tmp_path, agg_builder):
    # interrupted run: batch 0, crash, batch 1 on the same checkpoint
    src = tmp_path / "src"
    src.mkdir()
    _write(src, "b0.json", _B0, 1_000_000_000)
    snaps: list = []
    _drain(spark, src, tmp_path / "ckpt", agg_builder, snaps)
    assert snaps, "first run drained nothing"
    _write(src, "b1.json", _B1, 1_000_000_100)
    _drain(spark, src, tmp_path / "ckpt", agg_builder, snaps)
    restarted = sorted(snaps[-1])

    # uninterrupted reference run: both files, fresh checkpoint
    src2 = tmp_path / "src2"
    src2.mkdir()
    _write(src2, "b0.json", _B0, 1_000_000_000)
    _write(src2, "b1.json", _B1, 1_000_000_100)
    ref: list = []
    _drain(spark, src2, tmp_path / "ckpt_ref", agg_builder, ref)
    single = sorted(ref[-1])

    assert restarted == single and len(restarted) > 0
    return restarted


def test_cusum_monitor_restart_with_state_parity(spark, tmp_path):
    rows = _restart_parity(spark, tmp_path, _cusum_agg)
    # the day straddling the restart (Jan 2: 2 pre-crash + 1 post) must
    # have merged state, not a post-restart-only count
    by_day = {r[0].day: r[1] for r in rows}
    assert by_day[2] == 3 and by_day[1] == 2 and by_day[4] == 2

    # and the downstream exact CUSUM over the restored frame equals the
    # batch operator over the same buckets
    from etl_stream_spark.catalog import _zero_fill_buckets
    from etl_stream_spark.operators.anomaly import cusum_changepoints

    frame = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "day timestamp, n long"
    )
    out = cusum_changepoints(
        _zero_fill_buckets(frame, "day", "day"), "day", "n"
    ).collect()
    assert len(out) == 4  # dense Jan 1..4 spine (Jan 3 zero-filled)
    assert sum(1 for r in out if r["is_peak"]) == 1


def test_dq_monitor_restart_with_state_parity(spark, tmp_path):
    rows = _restart_parity(spark, tmp_path, _dq_agg)
    # violation accounting across the restart: null value (b0 + b1),
    # range breach, accepted-values breach, props regex breach
    tot = [sum(r[i] for r in rows) for i in (2, 3, 4, 5)]
    assert tot == [2, 1, 1, 1]
