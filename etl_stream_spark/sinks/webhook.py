"""HTTP/webhook delivery (K4/K5).

Alert webhook semantics from ``src/alert_manager.rs:180-237`` +
``src/constants.rs:52-61``: POST JSON, 3 retries, exponential backoff
1 s/2 s/4 s, 10 s timeout. Receiver shape at ``webhook/webhook.py:5-13``.
Stdlib ``urllib`` only — no external HTTP dependency.

The streaming form posts per *partition* on the executors (each
partition opens one connection sequence), so webhook fan-out scales with
the cluster rather than serializing through the driver. Intended for
low-volume alert/notification streams, not bulk data.
"""

from __future__ import annotations

import dataclasses
import json
import time
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_TIMEOUT_S = 10.0
DEFAULT_BACKOFFS_S = (1.0, 2.0, 4.0)


def post_json(
    url: str,
    payload: dict,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    backoffs_s: tuple[float, ...] = DEFAULT_BACKOFFS_S,
    opener: Callable = urllib.request.urlopen,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """POST with the reference's retry envelope; returns HTTP status.
    Raises after the final attempt fails."""
    body = json.dumps(payload).encode("utf-8")
    last_error: Exception | None = None
    for attempt, delay in enumerate((*backoffs_s, None)):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}, method="POST"
        )
        try:
            with opener(req, timeout=timeout_s) as resp:
                status = getattr(resp, "status", 200)
                if status < 500:
                    return status
                last_error = RuntimeError(f"server error {status}")
        except Exception as exc:  # noqa: BLE001 — retry any transport error
            last_error = exc
        if delay is None:
            break
        sleep(delay)
    raise RuntimeError(f"webhook POST failed after {len(backoffs_s) + 1} attempts") from last_error


class WebhookSink:
    """foreachBatch sink posting each row as one JSON object (K4/K5)."""

    def __init__(self, url: str, timeout_s: float = DEFAULT_TIMEOUT_S) -> None:
        self.url = url
        self.timeout_s = timeout_s

    def post_payload(self, payload) -> int:
        if dataclasses.is_dataclass(payload):
            payload = dataclasses.asdict(payload)
        return post_json(self.url, payload, timeout_s=self.timeout_s)

    def foreach_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        url, timeout_s = self.url, self.timeout_s

        def post_partition(rows) -> None:
            for row in rows:
                post_json(url, row.asDict(recursive=True), timeout_s=timeout_s)

        batch.rdd.foreachPartition(post_partition)
