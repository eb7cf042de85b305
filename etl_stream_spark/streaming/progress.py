"""StreamingQueryListener → MetricsRegistry bridge.

The reference polls Postgres for WAL size and serves Prometheus
counters from its own bookkeeping (``src/wal_monitor.rs``,
``etl-telemetry``). Spark already *measures* everything per micro-batch
— rows, durations, watermarks, state size — via query progress events;
this listener is the missing bridge that turns those into the engine's
pipeline-level metric families, so the same exposition endpoint serves
both custom counters (merge cycles, alerts) and execution telemetry.
Driver-side only; no executor cost.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

from etl_stream_spark.streaming.metrics import MetricsRegistry


class ProgressMetricsListener(StreamingQueryListener):
    """Feeds per-query progress into a :class:`MetricsRegistry`.

    Metric families (labeled by query name, falling back to the run id):

    * ``stream_input_rows_total`` — counter of rows admitted
    * ``stream_batches_total`` — counter of micro-batches completed
    * ``stream_batch_duration_ms`` — gauge, last batch wall time
    * ``stream_input_rows_per_sec`` — gauge, source-reported rate
    * ``stream_state_rows`` — gauge, total stateful-operator rows
    * ``stream_active`` — gauge 1/0 per query lifecycle
    """

    def __init__(self, registry: MetricsRegistry) -> None:
        self.registry = registry
        self._started_labels: dict[str, str] = {}  # runId → gauge label
        self._label_owner: dict[str, str] = {}  # gauge label → newest runId
        registry.describe("stream_input_rows_total", "Rows admitted per query")
        registry.describe("stream_batches_total", "Micro-batches completed")
        registry.describe("stream_batch_duration_ms", "Last batch duration")
        registry.describe("stream_input_rows_per_sec", "Source input rate")
        registry.describe("stream_state_rows", "Stateful operator rows")
        registry.describe("stream_active", "Query active flag")

    # -- listener contract -------------------------------------------------

    def onQueryStarted(self, event) -> None:
        label = event.name or str(event.runId)
        # terminated events carry only the runId — remember the label we
        # used at start so the SAME gauge series is flipped to 0 later.
        # The label OWNER is the newest run: a restarted query re-takes
        # the label, and the old run's (async, possibly late) terminated
        # event must not flip the live query's gauge to 0.
        rid = str(event.runId)
        self._started_labels[rid] = label
        self._label_owner[label] = rid
        self.registry.set_gauge("stream_active", 1.0, {"query": label})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        labels = {"query": p.name or p.runId}
        self.registry.inc("stream_input_rows_total", float(p.numInputRows), labels)
        self.registry.inc("stream_batches_total", 1.0, labels)
        self.registry.set_gauge(
            "stream_batch_duration_ms",
            float(p.durationMs.get("triggerExecution", 0)),
            labels,
        )
        self.registry.set_gauge(
            "stream_input_rows_per_sec", float(p.inputRowsPerSecond or 0.0), labels
        )
        state_rows = sum(op.numRowsTotal for op in p.stateOperators)
        self.registry.set_gauge("stream_state_rows", float(state_rows), labels)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        rid = str(event.runId)
        label = self._started_labels.pop(rid, rid)
        if self._label_owner.get(label, rid) == rid:
            self._label_owner.pop(label, None)
            self.registry.set_gauge("stream_active", 0.0, {"query": label})
