"""Structured-Streaming operators (SURVEY.md §2.8 'Spark mapping').

The reference's replication loop is micro-batch-by-construction; these are
the genuinely-streaming equivalents for continuous sources: event-time
tumbling windows with watermarks for late data, and session windows.
The same transformations run unchanged on a batch DataFrame (Spark's
unified API) — which is also how they are unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.

    On a streaming DataFrame the watermark bounds state; on a batch frame
    it is a no-op and the aggregation is identical.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            F.round("total_value", 2).alias("total_value"),
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native session windows (``F.session_window``) — the streaming form
    of the batch gap-sessionization in plans/queries.user_sessions."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
