"""Pipeline reconciliation (§3.1/§3.3): config rows ↔ running queries.

Reproduces ``sync_pipelines_internal`` (``src/pipeline_manager.rs:
190-319``): on each poll tick, diff desired pipeline specs against the
running map — START ∧ not-running → start; PAUSE ∧ running → stop;
deleted → stop. New-table detection (``pipeline_manager.rs:97-174``)
compares each source's current table set against the set captured at
start and restarts the affected pipeline; Structured Streaming's
checkpoint makes the restart exactly-once, so killing in-flight work is
safe (SURVEY §7.3 risk 8).

All driver-side control plane — no data moves through this module.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from etl_stream_spark.sources.config_db import STATUS_START, PipelineSpec


def detect_new_tables(known: set[str], current: Iterable[str]) -> set[str]:
    """Set difference driving restart-on-new-table
    (``HashSet::difference``, ``src/pipeline_manager.rs:127-144``)."""
    return set(current) - known


class PipelineManager:
    """Driver-side reconciler of desired specs vs running StreamingQuerys.

    ``build`` is the pipeline factory: given (spark, spec) it wires
    readStream → transform → writeStream and returns the *started*
    query. The manager owns lifecycle only.
    """

    def __init__(
        self,
        spark: SparkSession,
        build: Callable[[SparkSession, PipelineSpec], StreamingQuery],
    ) -> None:
        self.spark = spark
        self.build = build
        self.running: dict[str, StreamingQuery] = {}
        self.known_tables: dict[str, set[str]] = {}

    def sync(self, specs: list[PipelineSpec]) -> dict[str, str]:
        """One reconcile tick; returns {pipeline_id: action} for audit."""
        actions: dict[str, str] = {}
        desired = {s.pipeline_id: s for s in specs}

        for pid in list(self.running):
            spec = desired.get(pid)
            if spec is None or spec.status != STATUS_START:
                self._stop(pid)
                del self.running[pid]
                self.known_tables.pop(pid, None)
                actions[pid] = "stopped" if spec else "removed"

        for pid, spec in desired.items():
            if spec.status != STATUS_START:
                continue
            query = self.running.get(pid)
            if query is not None and query.isActive:
                continue
            self.running[pid] = self.build(self.spark, spec)
            self.known_tables[pid] = set(spec.tables)
            actions[pid] = "restarted" if query is not None else "started"
        return actions

    def check_new_tables(self, current_tables: dict[str, Iterable[str]]) -> list[str]:
        """Restart pipelines whose source grew new tables (§3.3). Takes
        {pipeline_id: currently-published tables}; returns restarted ids."""
        restarted = []
        for pid, current in current_tables.items():
            if pid not in self.running:
                continue
            if detect_new_tables(self.known_tables.get(pid, set()), current):
                self._stop(pid)
                del self.running[pid]  # next sync() restarts with fresh spec
                restarted.append(pid)
        return restarted

    def _stop(self, pid: str) -> None:
        query = self.running.get(pid)
        if query is not None and query.isActive:
            query.stop()

    def stop_all(self) -> None:
        for pid in list(self.running):
            self._stop(pid)
        self.running.clear()
