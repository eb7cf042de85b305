"""Metrics registry + health snapshot (SURVEY.md §0.7 operational layer).

The reference exposes Prometheus counters/gauges and health endpoints
(``etl-telemetry``, health/metrics servers wired in ``src/``). Spark
publishes most execution metrics natively; what the rebuild adds is the
pipeline-level registry — events applied, merge cycles, alert counts,
circuit-breaker state — rendered in the Prometheus text exposition
format (a stable public format), plus a health snapshot aggregating the
pipeline manager's query states. Driver-side only; serving the strings
over HTTP is deployment wiring, not engine logic.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from etl_stream_spark.streaming.manager import PipelineManager


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


class MetricsRegistry:
    """Thread-safe counters and gauges with Prometheus text exposition."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple[str, tuple], float] = defaultdict(float)
        self._gauges: dict[tuple[str, tuple], float] = {}
        self._help: dict[str, str] = {}

    @staticmethod
    def _key(name: str, labels: dict[str, str] | None) -> tuple[str, tuple]:
        return name, tuple(sorted((labels or {}).items()))

    def describe(self, name: str, help_text: str) -> None:
        self._help[name] = help_text

    def inc(self, name: str, amount: float = 1.0, labels: dict[str, str] | None = None) -> None:
        with self._lock:
            self._counters[self._key(name, labels)] += amount

    def set_gauge(self, name: str, value: float, labels: dict[str, str] | None = None) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def get(self, name: str, labels: dict[str, str] | None = None) -> float:
        key = self._key(name, labels)
        with self._lock:
            if key in self._counters:
                return self._counters[key]
            return self._gauges.get(key, 0.0)

    def exposition(self) -> str:
        """Prometheus text format (one block per metric family)."""
        lines: list[str] = []
        with self._lock:
            families: dict[str, list[tuple[tuple, float, str]]] = defaultdict(list)
            for (name, labels), v in self._counters.items():
                families[name].append((labels, v, "counter"))
            for (name, labels), v in self._gauges.items():
                families[name].append((labels, v, "gauge"))
            for name in sorted(families):
                kind = families[name][0][2]
                if name in self._help:
                    lines.append(f"# HELP {name} {self._help[name]}")
                lines.append(f"# TYPE {name} {kind}")
                for labels, v, _ in sorted(families[name]):
                    # repr: shortest round-trip form — full precision
                    # ('{:g}' keeps 6 significant digits, silently
                    # rounding counters past ~1e6) without 17-digit noise
                    lines.append(f"{name}{_fmt_labels(dict(labels))} {v!r}")
        return "\n".join(lines) + "\n"


def health_snapshot(manager: PipelineManager) -> dict:
    """Health-endpoint payload: per-pipeline liveness + overall status
    (healthy ⇔ every desired pipeline's query is active)."""
    pipelines = {}
    for pid, query in manager.running.items():
        active = bool(getattr(query, "isActive", False))
        pipelines[pid] = {
            "active": active,
            "tables": sorted(manager.known_tables.get(pid, set())),
        }
    healthy = all(p["active"] for p in pipelines.values()) if pipelines else True
    return {"status": "healthy" if healthy else "degraded", "pipelines": pipelines}
