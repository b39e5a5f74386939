"""Structured-Streaming twins of :mod:`..operators.events`.

Watermarked tumbling-window stats and session windows over an event
stream. Both reuse the batch operator's aggregation shape so batch ≡
stream equivalence is a direct DataFrame comparison
(tests/test_events.py); the watermark bounds state (windows older than
``watermark`` behind the max event time are finalized and evicted),
which is what makes the operator runnable forever on an unbounded
100 TB/day log — state is O(active windows × event types), not O(log).

``countDistinct`` is not available under streaming aggregation, so the
streaming stats carry ``approx_count_distinct(user_id)`` instead; the
deterministic columns (count / sum) are the equivalence surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def stream_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window per-type stats (append-capable once
    the watermark passes a window's end)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def stream_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session windows (native ``session_window`` — the
    streaming-legal form of gap sessionization; lag/cumsum is not
    expressible over an unbounded stream). A session finalizes when the
    watermark passes its close, so state is bounded by concurrently
    open sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"),
                          "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
