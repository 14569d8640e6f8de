"""Event-stream analytics over the `events` table — tumbling-window
aggregation, batch and streaming forms.

The reference has no event-time operators (SURVEY.md §2.10: Gigablast
is batch-incremental); this is the Structured-Streaming extension a
training-data pipeline needs for ingest telemetry (docs/sec, error
rates, per-source volumes). The batch form is driver-oracle-checked
(DuckDB time_bucket == Spark tumbling window for whole-hour windows);
the streaming form adds an event-time WATERMARK and is exercised by
tests/test_streaming.py (late rows beyond the watermark are dropped,
closed windows emit exactly once in append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "1 hour"


def windowed_event_counts(events: DataFrame, window: str = WINDOW) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) per tumbling
    window — partial+final hash agg, shuffle keyed by (window, type)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 5).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def windowed_event_counts_sql(window_hours: int = 1) -> str:
    return f"""
SELECT time_bucket(INTERVAL '{window_hours} hour', ts) AS window_start,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 5) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type"""


def streaming_windowed_counts(
    events_stream: DataFrame,
    window: str = WINDOW,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin with an event-time watermark: rows later than
    ``watermark`` behind the max seen ts are dropped, and in append
    mode a window emits once, when the watermark passes its end —
    bounded state, exactly-once window emission."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 5).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def driver_queries():
    return {
        "events_windowed_agg": lambda s, d: windowed_event_counts(
            s.read.parquet(f"{d}/events.parquet")
        ),
    }


def driver_oracles():
    return {"events_windowed_agg": windowed_event_counts_sql()}
