"""Event-time windowed streaming operators with watermark semantics.

The reference has no event-time windows (SURVEY §2.8: "Windows …
none") — its late-data story is the monotone-SEQUENCE LWW dedup at
merge time. At 100 TB stream scale, watermarks are what bound state:
a windowed aggregation without one accumulates every window forever.
These wrappers standardize the engine's watermark discipline:

* :func:`tumbling_counts` — fixed windows, state dropped once the
  watermark passes a window's end; late rows beyond the watermark are
  filtered before they touch state.
* :func:`dedup_within_watermark` — cross-batch duplicate suppression
  with bounded state (`dropDuplicatesWithinWatermark`): the streaming
  analog of the CDC landing table's replay guard, for sources that can
  re-deliver (Kafka producer retries, at-least-once upstreams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Per-window (optionally per-key) event counts with a watermark.

    Rows older than the watermark are dropped, never re-opening closed
    windows — the property the late-data tests pin down. State per key
    is one count, evicted at ``window end < watermark``.

    With ``slide`` set shorter than ``window``, windows overlap
    (sliding): each row contributes to ``window/slide`` window
    instances, and state grows by the same factor — size the watermark
    accordingly.
    """
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    keys = [win.alias("win")]
    if key_col is not None:
        keys.append(F.col(key_col))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            *( [F.col(key_col)] if key_col is not None else [] ),
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit each id once; duplicates arriving within the watermark delay
    are suppressed, and the dedup state is evicted once the watermark
    passes (bounded memory, unlike ``dropDuplicates`` on a stream)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
