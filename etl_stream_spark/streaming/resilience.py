"""Circuit breaker and retry — sink-I/O failure handling (§2.8).

Plain Python wrappers used around destination I/O inside
``foreachBatch``, mirroring the reference's defaults exactly:

* circuit breaker: Closed→Open after 5 failures within 60 s; Open→
  HalfOpen after a 30 s cooldown; HalfOpen→Closed after 2 successes,
  HalfOpen→Open on any failure (``src/circuit_breaker.rs:35-44,93-205``);
* retry: N attempts with exponential backoff — Redis flavor 3×50 ms·2ⁿ
  (``src/store/redis_store.rs:363-384``), alert flavor 1/2/4 s
  (``src/alert_manager.rs:203-234``).

Clock and sleep are injectable for deterministic tests.
"""

from __future__ import annotations

import time
from collections import deque
from collections.abc import Callable
from typing import Any

CLOSED = "closed"
OPEN = "open"
HALF_OPEN = "half_open"


class CircuitOpenError(RuntimeError):
    """Raised when a call is rejected by an open circuit."""


class CircuitBreaker:
    def __init__(
        self,
        failure_threshold: int = 5,
        failure_window_s: float = 60.0,
        open_cooldown_s: float = 30.0,
        close_after_successes: int = 2,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.failure_threshold = failure_threshold
        self.failure_window_s = failure_window_s
        self.open_cooldown_s = open_cooldown_s
        self.close_after_successes = close_after_successes
        self._clock = clock
        self.state = CLOSED
        self._failures: deque[float] = deque()
        self._opened_at = 0.0
        self._half_open_successes = 0

    def call(self, fn: Callable[[], Any]) -> Any:
        if self.state == OPEN:
            if self._clock() - self._opened_at >= self.open_cooldown_s:
                self.state = HALF_OPEN
                self._half_open_successes = 0
            else:
                raise CircuitOpenError("circuit is open")
        try:
            result = fn()
        except Exception:
            self._on_failure()
            raise
        self._on_success()
        return result

    def _on_success(self) -> None:
        if self.state == HALF_OPEN:
            self._half_open_successes += 1
            if self._half_open_successes >= self.close_after_successes:
                self.state = CLOSED
                self._failures.clear()

    def _on_failure(self) -> None:
        now = self._clock()
        if self.state == HALF_OPEN:
            self._trip(now)
            return
        self._failures.append(now)
        while self._failures and now - self._failures[0] > self.failure_window_s:
            self._failures.popleft()
        if len(self._failures) >= self.failure_threshold:
            self._trip(now)

    def _trip(self, now: float) -> None:
        self.state = OPEN
        self._opened_at = now
        self._failures.clear()


def retry_with_backoff(
    fn: Callable[[], Any],
    attempts: int = 3,
    base_delay_s: float = 0.05,
    factor: float = 2.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Run ``fn``; on failure retry up to ``attempts`` total with
    ``base_delay_s * factor**n`` backoff. Re-raises the last error."""
    delay = base_delay_s
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except Exception:
            if attempt == attempts:
                raise
            sleep(delay)
            delay *= factor
