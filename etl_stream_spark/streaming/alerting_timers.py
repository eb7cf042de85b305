"""Timer-based sustained-threshold alerting (`transformWithStateInPandas`).

The reference measures sustain with *wall-clock* durations
(``src/alert_manager.rs:152-155`` uses processing-time instants — SURVEY
§7.3 risk 7), so an alert must fire once the threshold has been exceeded
for N minutes **even if no new observation arrives**. The
``applyInPandasWithState`` variant (:mod:`.alerting`) is data-driven and
can only fire on arrival; this variant uses Spark 4's
``transformWithStateInPandas`` with processing-time timers to close that
gap:

* on an observation, classify status; a status *change* starts a new
  episode — persist (status, episode_start_ms, notified, last_mb) and
  register a timer at ``episode_start + sustain``;
* when the timer expires, if the episode is still alerting and not yet
  notified, emit the alert — no new data required;
* an observation arriving after the sustain point (timer raced data)
  also fires, keeping at-most-once per episode via the ``notified`` flag.

State is one value row + at most one live timer per source key.

Runtime dependency: ``transformWithStateInPandas`` starts a
protobuf-speaking Python driver worker, so ``google.protobuf`` must be
importable on driver and executors (it ships with ``pyspark[connect]``).
Environments without it should use the data-driven
:func:`etl_stream_spark.streaming.alerting.sustained_threshold_alerts`
variant, which matches the reference's poll-driven behavior.
"""

from __future__ import annotations

import pandas as pd

try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover — PySpark < 4
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]

from pyspark.sql import DataFrame

from etl_stream_spark.streaming.alerting import (
    DEFAULT_DANGER_MB,
    DEFAULT_SUSTAIN_MINS,
    DEFAULT_WARNING_MB,
    ALERT_OUTPUT_SCHEMA,
    AlertStatus,
)

_STATE_SCHEMA = "status string, since_ms long, notified boolean, last_mb double"


class TimerAlertProcessor(StatefulProcessor):
    """Keyed processor: episode tracking on data, firing on timers."""

    def __init__(
        self,
        warning_mb: float = DEFAULT_WARNING_MB,
        danger_mb: float = DEFAULT_DANGER_MB,
        sustain_mins: float = DEFAULT_SUSTAIN_MINS,
        size_col: str = "wal_size_mb",
    ) -> None:
        self.warning_mb = warning_mb
        self.danger_mb = danger_mb
        self.sustain_ms = int(sustain_mins * 60_000)
        self.size_col = size_col

    # -- helpers -----------------------------------------------------------

    def _classify(self, mb: float) -> str:
        if mb >= self.danger_mb:
            return AlertStatus.DANGER
        if mb >= self.warning_mb:
            return AlertStatus.WARNING
        return AlertStatus.NORMAL

    def _threshold(self, status: str) -> float:
        return self.danger_mb if status == AlertStatus.DANGER else self.warning_mb

    def _alert_frame(self, source: str, status: str, mb: float, since_ms: int, now_ms: int):
        return pd.DataFrame(
            {
                "source": [source],
                "status": [status],
                "wal_size_mb": [mb],
                "threshold_mb": [self._threshold(status)],
                "duration_mins": [(now_ms - since_ms) / 60_000.0],
                "alert_ts": [now_ms / 1000.0],
            }
        )

    def _clear_timers(self) -> None:
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)

    # -- StatefulProcessor contract ----------------------------------------

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.handle = handle
        self.state = handle.getValueState("episode", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        source = key[0]
        now = timerValues.getCurrentProcessingTimeInMs()
        prev = self.state.get() if self.state.exists() else None
        status, since, notified, last_mb = prev or (None, now, False, 0.0)

        for pdf in rows:
            for mb in pdf[self.size_col]:
                mb = float(mb)
                new_status = self._classify(mb)
                if new_status != status:  # episode boundary
                    status, since, notified = new_status, now, False
                    self._clear_timers()
                    if new_status != AlertStatus.NORMAL:
                        self.handle.registerTimer(since + self.sustain_ms)
                last_mb = mb
                if (
                    status != AlertStatus.NORMAL
                    and not notified
                    and now - since >= self.sustain_ms
                ):  # data raced the timer
                    notified = True
                    yield self._alert_frame(source, status, mb, since, now)

        self.state.update((status, since, notified, last_mb))

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        source = key[0]
        now = timerValues.getCurrentProcessingTimeInMs()
        if not self.state.exists():
            return
        status, since, notified, last_mb = self.state.get()
        if status != AlertStatus.NORMAL and not notified:
            self.state.update((status, since, True, last_mb))
            yield self._alert_frame(source, status, float(last_mb), int(since), now)

    def close(self) -> None:
        pass


def sustained_threshold_alerts_timers(
    observations: DataFrame,
    warning_mb: float = DEFAULT_WARNING_MB,
    danger_mb: float = DEFAULT_DANGER_MB,
    sustain_mins: float = DEFAULT_SUSTAIN_MINS,
    source_col: str = "source",
    size_col: str = "wal_size_mb",
) -> DataFrame:
    """Timer-driven alert stream over (source, wal_size_mb) observations."""
    return observations.groupBy(source_col).transformWithStateInPandas(
        TimerAlertProcessor(warning_mb, danger_mb, sustain_mins, size_col),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
