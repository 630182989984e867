"""Streaming OHLC bars — the continuous-aggregate twin of the batch
``events_ohlc_hourly`` gate (queries/temporal.py).

Same single-aggregate shape: open/close are lexicographic struct MIN/MAX
over (ts, event_id, value) — both are DeclarativeAggregates with bounded
per-window state, so the streaming form keeps exactly one small struct
per (window, type) regardless of event volume, and merges map-side like
any algebraic aggregate. With a watermark the state is also evictable:
closed bars finalize and leave the store. tests/test_ohlc_stream.py pins
exact agreement between this and the batch query on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_bars(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Per-(window, event_type) OHLC + volume; set ``streaming=True`` on
    a streaming frame to bound state with the watermark."""
    df = events
    if streaming:
        df = df.withWatermark("ts", watermark)
    first_s = F.min(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    last_s = F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    return (
        df.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            first_s.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_s.getField("value").alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
            "volume",
        )
    )
