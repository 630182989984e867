"""transformWithStateInPandas sessionizer — same scenario as
test_sessionize_stream.py (the applyInPandasWithState form): sessions close
on a later in-batch event or via the event-time timer once the watermark
passes end+gap."""

from __future__ import annotations

from datetime import datetime as dt

import pytest

from cargo_chat_spark.streaming.sessionize_tws import (
    sessionize_stream_tws,
    tws_available,
)


def test_tws_gate_is_honest():
    """The availability probe mirrors what the runtime actually needs:
    the state-server protocol imports google.protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        assert tws_available()
    except ImportError:
        assert not tws_available()


@pytest.mark.slow
def test_sessionize_tws_closes_on_timer(spark, tmp_path):
    if not tws_available():
        pytest.skip(
            "transformWithStateInPandas needs google.protobuf "
            "(absent in this container); applyInPandasWithState form is "
            "tested in test_sessionize_stream.py"
        )
    src = tmp_path / "tws_src"
    src.mkdir()
    ckpt = str(tmp_path / "tws_ckpt")
    sink_dir = str(tmp_path / "tws_sink")

    def write_batch(rows):
        rows = [(i, dt.fromisoformat(ts), u, "e", 1.0) for i, ts, u in rows]
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
        ).coalesce(1).write.mode("append").parquet(str(src))

    write_batch([
        (1, "2026-01-01 00:00:00", 1),
        (2, "2026-01-01 00:10:00", 1),
        (3, "2026-01-01 02:10:00", 1),   # 2h gap → closes session 1 in-batch
        (4, "2026-01-01 00:05:00", 2),
    ])

    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = sessionize_stream_tws(stream, watermark="30 minutes")
        q = (
            out.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(sink_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # sentinel batches advance the watermark so the registered timers fire
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
