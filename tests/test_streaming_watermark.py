"""Real Structured Streaming runs (readStream → watermark → window →
memory sink), checking convergence with the batch oracle and late-data
drop semantics (SURVEY §2.9 extension)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.incremental import windowed_event_counts

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_streaming_window_converges_to_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = windowed_event_counts(stream, streaming=True)
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["window_start"], r["event_type"]): (r["event_count"], round(r["value_sum"], 6))
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["event_count"], round(r["value_sum"], 6))
        for r in windowed_event_counts(events).collect()
    }
    assert streamed == batch


@pytest.mark.slow
def test_watermark_drops_late_rows(spark, tmp_path):
    """Append mode with a 2h watermark: a row arriving two batches later,
    20h behind max event time, must be dropped from its (closed) window."""
    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    from datetime import datetime as dt

    def write_batch(name: str, rows):
        rows = [(i, dt.fromisoformat(ts), u, et, v) for i, ts, u, et, v in rows]
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))

    # batch 1: events up to 2026-01-02 00:00 — watermark ends near there
    write_batch("b1", [
        (1, "2026-01-01 00:10:00", 1, "click", 1.0),
        (2, "2026-01-01 00:20:00", 2, "click", 1.0),
        (3, "2026-01-02 00:00:00", 3, "view", 1.0),
    ])

    schema = spark.read.parquet(str(src)).schema

    sink_dir = str(tmp_path / "late_sink")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours",
                                    streaming=True)

        def sink(batch_df, batch_id):
            # append-mode: only watermark-finalized windows arrive here
            batch_df.write.mode("append").parquet(sink_dir)

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: one on-time row (advances watermark) + one 20h-late row for
    # the already-closed 00:00 window of Jan 1
    write_batch("b2", [
        (4, "2026-01-02 04:00:00", 4, "view", 1.0),
        (5, "2026-01-01 00:30:00", 5, "click", 99.0),  # LATE — must drop
    ])
    run_once()
    # batch 3: push watermark far forward so every surviving window emits
    write_batch("b3", [(6, "2026-01-03 12:00:00", 6, "view", 1.0)])
    run_once()

    rows = spark.read.parquet(sink_dir).select(
        "window_start", "event_type", "event_count"
    ).collect()
    emitted = {
        (str(r["window_start"]), r["event_type"]): r["event_count"] for r in rows
    }
    key = ("2026-01-01 00:00:00", "click")
    assert key in emitted, f"window never emitted: {emitted}"
    # the two on-time clicks counted; the late event_id=5 click dropped
    assert emitted[key] == 2, f"late row leaked into closed window: {emitted}"
