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
@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas requires google.protobuf at runtime",
)
def test_timer_fires_without_new_data(spark, tmp_path):
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
