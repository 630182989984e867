"""Left-outer stream-stream interval join: unmatched left rows must emit
exactly once, with NULL right columns, and only after the right
watermark provably closes their match window (the streaming abandonment
detector). Sentinel rows on both streams advance the watermark; two
extra availableNow passes flush the outer results (outer rows emit in
the batch AFTER the watermark passes — same choreography as the
sessionizer's timeout dance)."""

from __future__ import annotations

from datetime import datetime as dt

import pytest

from cargo_chat_spark.streaming.interval_join import interval_join_streams


@pytest.mark.slow
def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    lsrc = tmp_path / "left"
    rsrc = tmp_path / "right"
    lsrc.mkdir()
    rsrc.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    schema = "event_id bigint, ts timestamp, user_id bigint, value double"

    def write(src, rows):
        spark.createDataFrame(
            [(i, dt.fromisoformat(t), u, 1.0) for i, t, u in rows], schema
        ).coalesce(1).write.mode("append").parquet(str(src))

    # user 1: purchase 10 matched by view 20 (+2 min); purchase 11 has no
    # view inside 5 min (view 21 is +20 min). user 2: purchase 12, no
    # views at all.
    write(lsrc, [
        (10, "2026-01-01 00:00:00", 1),
        (11, "2026-01-01 00:10:00", 1),
        (12, "2026-01-01 00:00:00", 2),
    ])
    write(rsrc, [
        (20, "2026-01-01 00:02:00", 1),
        (21, "2026-01-01 00:30:00", 1),
    ])

    def run_once():
        left = spark.readStream.schema(schema).parquet(str(lsrc))
        right = spark.readStream.schema(schema).parquet(str(rsrc))
        out = interval_join_streams(
            left,
            right,
            key="user_id",
            id_col="event_id",
            tol_seconds=300,
            watermark="1 minutes",
            how="left_outer",
        )
        q = (
            out.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(sink)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    for i, sentinel in enumerate(("2026-01-01 02:00:00", "2026-01-01 03:00:00")):
        write(lsrc, [(-100 - i, sentinel, -1)])
        write(rsrc, [(-200 - i, sentinel, -1)])
        run_once()

    got = spark.read.parquet(sink).where("user_id > 0")
    rows = {
        (r["user_id"], r["id_a"], r["id_b"]): r["gap_seconds"]
        for r in got.collect()
    }
    assert rows == {
        (1, 10, 20): 120.0,   # matched pair, gap 2 min
        (1, 11, None): None,  # window closed with no view
        (2, 12, None): None,  # no views at all
    }
