"""Structured Streaming variants of the batch temporal operators.

The reference has NO streaming surface (SURVEY.md §2.12); these are the
engine-side generalizations for unbounded page/event streams:
- gap sessionization (batch W6) → F.session_window + watermark
- rolling aggregates (W4) → tumbling/sliding window aggs + watermark
- calendar features (W1) → pure projections, identical code to batch

Stateful custom ops (e.g. streaming as-of join) would use
applyInPandasWithState; out of scope for v1 (no streaming source in the
driver harness). These transformations are source-agnostic: they accept
either a streaming or a batch DataFrame (tests drive them in batch mode,
where session_window/window aggregate identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.operators.timefeatures import add_calendar_features


def stream_sessionize(
    events: DataFrame,
    keys: list[str],
    ts: str,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    value: str | None = None,
) -> DataFrame:
    """Session windows per entity with a late-data watermark: one row per
    closed session with start/end, event count, and optional value sum."""
    df = events.withWatermark(ts, watermark) if (watermark and events.isStreaming) else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(F.sum(value).alias(f"{value}_sum"))
    return (
        df.groupBy(*keys, F.session_window(F.col(ts), gap).alias("session"))
        .agg(*aggs)
        .select(
            *keys,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            *([f"{value}_sum"] if value is not None else []),
        )
    )


def stream_windowed_agg(
    events: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding) windowed aggregates with watermarked late
    data — the streaming analog of rolling_agg (W4)."""
    df = events.withWatermark(ts, watermark) if (watermark and events.isStreaming) else events
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        df.groupBy(*keys, win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value).alias(f"{value}_sum"),
            F.avg(value).alias(f"{value}_avg"),
        )
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            f"{value}_sum",
            f"{value}_avg",
        )
    )


def stream_calendar_features(events: DataFrame, ts: str) -> DataFrame:
    """W1 projections work unchanged on streams (stateless)."""
    return add_calendar_features(events, ts, crosses=False)
