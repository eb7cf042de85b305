"""Sessionization + event-stream aggregations over the ``events`` table.

Composed from built-in window functions (lag + conditional cumsum), the
standard Spark sessionization idiom — one shuffle on the user key; both
window passes share that single partitioning (no re-shuffle between
lag and cumsum, Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session id per (user, burst of activity): a new session
    starts when the gap since the previous event exceeds ``gap_minutes``."""
    # Order and gap both use truncated epoch seconds so results are
    # reproducible across engines (sub-second ordering noise removed).
    secs = F.col(ts_col).cast("long")
    by_user = Window.partitionBy(user_col).orderBy(secs, F.col("event_id"))
    gap_s = secs - F.lag(secs).over(by_user)
    new_session = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session statistics: session count, events, total value."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col).agg(
        F.max("session_seq").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        # exact decimal sum internally; DOUBLE+ROUND at the boundary so
        # the driver's hash normalizer sees engine-portable types
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)"), 2
        ).cast("double").alias("total_value"),
    )


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type (the batch twin of the
    streaming windowed aggregation)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum internally; rounded decimal → DOUBLE at
            # the boundary (engine-portable, halfway-safe)
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)"), 2
            ).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
