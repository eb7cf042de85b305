"""Timer-based alerting: an alert fires on wall-clock sustain with NO
further observations — the semantics applyInPandasWithState cannot give.

Integration test with real (short) wall-clock timers: one observation
crosses WARNING, then the source goes silent; the processing-time timer
must fire the alert a few seconds later on a subsequent (empty) batch.
"""

from __future__ import annotations

import importlib.util
import json
import time

import pytest

from etl_stream_spark.streaming.alerting_timers import (
    sustained_threshold_alerts_timers,
)

# transformWithStateInPandas launches a protobuf-speaking driver worker;
# without google.protobuf the query crashes at initialization
# (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # parent package "google" absent entirely
    _HAS_PROTOBUF = False


@pytest.mark.slow
def test_timer_fires_without_new_data(spark, tmp_path):
    """With protobuf: full timer semantics. Without it: the documented
    feature gate — query initialization fails with the runner error, and
    the equivalent timer semantics are covered by
    ``tests/test_alerting_timeout.py`` (applyInPandasWithState +
    ProcessingTimeTimeout, no protobuf needed)."""
    if not _HAS_PROTOBUF:
        _assert_gate_fails_loudly(spark, tmp_path)
        return
    src = tmp_path / "obs"
    src.mkdir()
    (src / "a.json").write_text(
        json.dumps({"source": "s1", "wal_size_mb": 4000.0})
        + "\n"
        + json.dumps({"source": "quiet", "wal_size_mb": 1.0})
    )
    stream = spark.readStream.schema("source string, wal_size_mb double").json(str(src))
    alerts = sustained_threshold_alerts_timers(stream, sustain_mins=3 / 60.0)  # 3 s
    q = (
        alerts.writeStream.format("memory")
        .queryName("timer_alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # the WARNING episode starts on the first batch; no further data
        # ever arrives for s1 — only the timer can fire the alert
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM timer_alerts").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) == 1
    a = rows[0]
    assert a["source"] == "s1" and a["status"] == "WARNING"
    assert a["wal_size_mb"] == 4000.0 and a["threshold_mb"] == 3000.0
    assert a["duration_mins"] * 60 >= 2.9  # sustained at least ~3 s


def _assert_gate_fails_loudly(spark, tmp_path):
    """The documented failure mode without protobuf: query startup dies
    with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE rather than
    hanging or silently dropping timers."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "obs"
    src.mkdir()
    (src / "a.json").write_text(json.dumps({"source": "s1", "wal_size_mb": 4000.0}))
    stream = spark.readStream.schema("source string, wal_size_mb double").json(str(src))
    alerts = sustained_threshold_alerts_timers(stream, sustain_mins=3 / 60.0)
    q = (
        alerts.writeStream.format("memory")
        .queryName("timer_alerts_gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        with pytest.raises(StreamingQueryException) as exc:
            q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()
        # the visible message is the stream-failure wrapper; the runner
        # initialization error is its cause (seen in the driver log)
        msg = str(exc.value).upper()
        assert "STREAM_FAILED" in msg or "PYTHON" in msg
    finally:
        q.stop()
