"""Processing-time timer semantics WITHOUT protobuf: the
applyInPandasWithState + ProcessingTimeTimeout form must fire an alert
for a sustained episode even when the source sends no further data
(reference behavior: src/alert_manager.rs:113-177)."""

from __future__ import annotations

import json
import time

from etl_stream_spark.streaming.alerting import sustained_threshold_alerts_timeout


def test_timeout_fires_for_quiet_source(spark, tmp_path):
    src = tmp_path / "obs"
    src.mkdir()
    # one DANGER observation for s1, then silence from s1; a heartbeat
    # key keeps micro-batches flowing so the timeout can be evaluated
    (src / "a.json").write_text(
        json.dumps({"source": "s1", "wal_size_mb": 9000.0})
        + "\n"
        + json.dumps({"source": "hb", "wal_size_mb": 1.0})
    )
    stream = spark.readStream.schema("source string, wal_size_mb double").json(
        str(src)
    )
    alerts = sustained_threshold_alerts_timeout(stream, sustain_mins=2 / 60.0)  # 2 s
    q = (
        alerts.writeStream.format("memory")
        .queryName("timeout_alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        hb = 0
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM timeout_alerts").collect()
            if rows:
                break
            # keep the stream busy so timed-out keys are re-evaluated
            hb += 1
            (src / f"hb{hb}.json").write_text(
                json.dumps({"source": "hb", "wal_size_mb": 1.0})
            )
            time.sleep(1.0)
        assert rows, "sustained alert never fired from the timeout path"
        assert rows[0]["source"] == "s1"
        assert rows[0]["status"] == "DANGER"
        assert rows[0]["duration_mins"] >= 2 / 60.0 * 0.9
        # once per episode: give it a few more beats, still exactly one
        for i in range(3):
            (src / f"tail{i}.json").write_text(
                json.dumps({"source": "hb", "wal_size_mb": 1.0})
            )
            time.sleep(1.0)
        assert len(spark.sql("SELECT * FROM timeout_alerts").collect()) == 1
    finally:
        q.stop()
