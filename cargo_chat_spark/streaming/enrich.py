"""Streaming point-in-time enrichment: the as-of join (operators/asof.py)
applied per micro-batch against a static (or slowly-refreshed) dimension —
the streaming form of a feature-store lookup ("latest feature value at or
before event time").

Shape: `readStream` → `foreachBatch(asof_join against the static side)` →
append sink. foreachBatch rather than a stream-stream join because as-of
needs "latest right row ≤ ts" ORDER semantics, which stream-stream interval
joins don't express; the static side is the already-materialized feature
table, re-read per batch only if the caller passes a loader.

Exactly-once: the sink writes per-batch parquet under the streaming
checkpoint's batch-id contract, same pattern as streaming/incremental.py —
re-running a committed batch overwrites the same directory.

At scale each micro-batch pays one shuffle of (batch ∪ right) on the key —
bounded by batch size, not corpus size, when the right side is broadcast
or pre-bucketed on the key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from cargo_chat_spark.operators.asof import asof_join


def enrich_stream_asof(
    stream: DataFrame,
    right: DataFrame,
    *,
    on: str,
    payload: dict[str, str],
    right_id: str,
    sink_dir: str,
    checkpoint_dir: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> StreamingQuery:
    """Start an availableNow streaming query enriching ``stream`` rows with
    the as-of payload from ``right``; output appends to ``sink_dir``."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            right,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            payload=payload,
            right_id=right_id,
        )
        # idempotent per batch id: a replayed batch overwrites its own dir
        out.write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
