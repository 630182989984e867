"""Streaming deduplication — the at-least-once → exactly-once repair
stage every event pipeline runs in front of its sinks (the batch analog
is operators/dedup.exact_dedup; SURVEY §2.9 streaming extension,
docs/proposals.md).

Spark-first shape: ``dropDuplicatesWithinWatermark`` — keys live in the
state store only until the watermark passes them, so state is bounded by
(arrival rate × watermark horizon) instead of growing with the stream's
lifetime. That bound is what makes the operator 100 TB-viable: a plain
``dropDuplicates`` on a stream retains every key forever and OOMs the
state store on an unbounded source. Re-deliveries inside the horizon
(the real-world duplicate shape: source retries, at-least-once
replays) are dropped exactly; a duplicate arriving later than the
horizon is by definition indistinguishable from a new event without
unbounded state — the standard trade, made explicit by the watermark
parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drop re-delivered events (same ``key_cols``) within the watermark
    horizon. State per key is just the key + a timestamp — bounded and
    aged out automatically by the engine."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
