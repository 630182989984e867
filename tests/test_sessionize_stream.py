"""Stateful streaming sessionization (applyInPandasWithState) — sessions
close via event-time timeout and match the hand-computed expectation."""

from __future__ import annotations

from datetime import datetime as dt

import pytest

from cargo_chat_spark.streaming.sessionize import sessionize_stream


@pytest.mark.slow
def test_sessionize_stream_closes_on_timeout(spark, tmp_path):
    src = tmp_path / "sess_src"
    src.mkdir()
    ckpt = str(tmp_path / "sess_ckpt")
    sink_dir = str(tmp_path / "sess_sink")

    def write_batch(rows):
        rows = [(i, dt.fromisoformat(ts), u, "e", 1.0) for i, ts, u in rows]
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
        ).coalesce(1).write.mode("append").parquet(str(src))

    # user 1: two events 10 min apart (one session), then 2h gap (new one)
    # user 2: single event
    write_batch([
        (1, "2026-01-01 00:00:00", 1),
        (2, "2026-01-01 00:10:00", 1),
        (3, "2026-01-01 02:10:00", 1),
        (4, "2026-01-01 00:05:00", 2),
    ])

    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = sessionize_stream(stream, watermark="30 minutes")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(sink_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # advance watermark far beyond every open session's end + gap
    write_batch([(5, "2026-01-02 00:00:00", 3)])
    run_once()
    write_batch([(6, "2026-01-03 00:00:00", 3)])
    run_once()

    rows = spark.read.parquet(sink_dir).collect()
    sessions = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in rows
    }
    assert (1, "2026-01-01 00:00:00", "2026-01-01 00:10:00", 2) in sessions
    assert (1, "2026-01-01 02:10:00", "2026-01-01 02:10:00", 1) in sessions
    assert (2, "2026-01-01 00:05:00", "2026-01-01 00:05:00", 1) in sessions
