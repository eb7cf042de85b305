"""Watermark semantics, pinned with deterministic two-batch runs.

FileStreamSource with ``maxFilesPerTrigger=1`` admits files in
modification-time order (mtimes set explicitly), so batch boundaries —
and therefore watermark advancement — are reproducible:

* batch 1 fixes the watermark from its max event time;
* batch 2 delivers a row older than that watermark → it must be
  dropped (windowed agg) / a fresh duplicate → it must be suppressed
  (dedup), with state bounded by the same watermark.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from etl_stream_spark.streaming.windows import dedup_within_watermark, tumbling_counts

SCHEMA = "k string, ts timestamp"


def _write_batches(tmp_path, *batches: list[dict]) -> str:
    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate(batches):
        f = src / f"b{i}.json"
        f.write_text("\n".join(json.dumps(r) for r in batch))
        os.utime(f, (1_000_000_000 + 100 * i,) * 2)  # mtime order = batch order
    return str(src)


def _run(spark, tmp_path, df, mode: str):
    name = "wm_" + tmp_path.name.replace("-", "_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).collect()


def test_late_row_beyond_watermark_is_dropped(spark, tmp_path):
    # batch 0: two rows in the 10:00 window + one at 11:00, which sets
    # the watermark to 10:50 (effective one batch later — the progress
    # `eventTime.watermark` is the post-batch value); batch 1 keeps the
    # stream moving; batch 2: a 10:04 straggler, now beyond the
    # effective watermark → must NOT reopen the 10:00 window.
    src = _write_batches(
        tmp_path,
        [
            {"k": "a", "ts": "2026-01-01 10:00:00"},
            {"k": "a", "ts": "2026-01-01 10:05:00"},
            {"k": "a", "ts": "2026-01-01 11:00:00"},
        ],
        [{"k": "a", "ts": "2026-01-01 11:01:00"}],
        [{"k": "a", "ts": "2026-01-01 10:04:00"}],  # late beyond watermark
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(src)
    )
    name = "wm_drop_" + tmp_path.name.replace("-", "_")
    q = (
        tumbling_counts(stream, ts_col="ts", key_col="k")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.table(name).collect()
    ten = [r for r in rows if r["window_start"].hour == 10 and r["window_start"].minute == 0]
    # the 10:00 window only ever held its on-time rows
    assert {r["n_events"] for r in ten} == {2}
    # and the state operator accounted for exactly one dropped late row
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_on_time_row_within_watermark_is_counted(spark, tmp_path):
    # same shape, but the batch-2 straggler (10:55) is NEWER than the
    # watermark (10:50) → it must be merged into its window.
    src = _write_batches(
        tmp_path,
        [
            {"k": "a", "ts": "2026-01-01 10:55:00"},
            {"k": "a", "ts": "2026-01-01 11:00:00"},
        ],
        [{"k": "a", "ts": "2026-01-01 10:56:00"}],  # within watermark
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(src)
    )
    rows = _run(
        spark,
        tmp_path,
        tumbling_counts(stream, ts_col="ts", key_col="k"),
        "update",
    )
    fifty = [r for r in rows if r["window_start"].minute == 50]
    assert max(r["n_events"] for r in fifty) == 2  # 10:55 + 10:56


def test_sliding_windows_overlap(spark, tmp_path):
    # one row at 10:07 with window=10m slide=5m lands in BOTH the
    # 10:00 and the 10:05 window instances
    src = _write_batches(tmp_path, [{"k": "a", "ts": "2026-01-01 10:07:00"}])
    stream = spark.readStream.schema(SCHEMA).json(src)
    name = "slide_" + tmp_path.name.replace("-", "_")
    q = (
        tumbling_counts(stream, ts_col="ts", key_col="k", slide="5 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    starts = sorted(
        (r["window_start"].minute, r["n_events"]) for r in spark.table(name).collect()
    )
    assert starts == [(0, 1), (5, 1)]


def test_stream_stream_join_with_time_bound(spark, tmp_path):
    """Stream-stream inner join: clicks matched to purchases of the same
    user within the preceding hour. Watermarks on both sides bound the
    join state; the inner-join result itself is batching-invariant."""
    cdir, pdir = tmp_path / "clicks", tmp_path / "purch"
    cdir.mkdir(), pdir.mkdir()
    (cdir / "c.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"cu": "u1", "c_ts": "2026-01-01 10:30:00"},  # purchase 10:00 in range
                {"cu": "u1", "c_ts": "2026-01-01 11:30:00"},  # 10:00 too old
                {"cu": "u2", "c_ts": "2026-01-01 10:30:00"},  # no purchase for u2
            ]
        )
    )
    (pdir / "p.json").write_text(
        json.dumps({"pu": "u1", "p_ts": "2026-01-01 10:00:00"})
    )
    clicks = (
        spark.readStream.schema("cu string, c_ts timestamp").json(str(cdir))
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        spark.readStream.schema("pu string, p_ts timestamp").json(str(pdir))
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        F.expr("cu = pu AND p_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"),
    )
    name = "ssj_" + tmp_path.name.replace("-", "_")
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.table(name).collect()
    assert len(rows) == 1
    assert rows[0]["cu"] == "u1" and rows[0]["c_ts"].hour == 10


def test_dedup_within_watermark_suppresses_cross_batch_duplicate(spark, tmp_path):
    src = _write_batches(
        tmp_path,
        [
            {"k": "id1", "ts": "2026-01-01 10:00:00"},
            {"k": "id1", "ts": "2026-01-01 10:00:30"},  # same-batch dup
            {"k": "id2", "ts": "2026-01-01 10:05:00"},
        ],
        [
            {"k": "id1", "ts": "2026-01-01 10:06:00"},  # cross-batch dup, in delay
            {"k": "id3", "ts": "2026-01-01 10:07:00"},
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(src)
    )
    rows = _run(
        tmp_path=tmp_path,
        spark=spark,
        df=dedup_within_watermark(stream, ["k"], ts_col="ts"),
        mode="append",
    )
    assert sorted(r["k"] for r in rows) == ["id1", "id2", "id3"]
