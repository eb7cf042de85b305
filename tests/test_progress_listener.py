"""The listener turns Spark query-progress events into registry metric
families (rows, batches, durations) usable by the exposition endpoint."""

from __future__ import annotations

import json
import time

from etl_stream_spark.streaming.metrics import MetricsRegistry
from etl_stream_spark.streaming.progress import ProgressMetricsListener


def test_progress_metrics_flow(spark, tmp_path):
    registry = MetricsRegistry()
    listener = ProgressMetricsListener(registry)
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(json.dumps({"x": i}) for i in range(25))
        )
        stream = spark.readStream.schema("x long").json(str(src))
        q = (
            stream.groupBy().count()
            .writeStream.format("memory")
            .queryName("prog_metrics")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # listener delivery is async — poll briefly
        labels = {"query": "prog_metrics"}
        deadline = time.time() + 30
        while time.time() < deadline:
            if registry.get("stream_input_rows_total", labels) >= 25:
                break
            time.sleep(0.5)
        assert registry.get("stream_input_rows_total", labels) == 25
        assert registry.get("stream_batches_total", labels) >= 1
        text = registry.exposition()
        assert "stream_input_rows_total" in text and 'query="prog_metrics"' in text
    finally:
        spark.streams.removeListener(listener)
