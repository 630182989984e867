"""Stream-stream interval join (streaming/interval_join.py): the two-stream
join must converge to exactly the batch bucketed range join on the same
data, across multiple micro-batches (state carried between batches)."""

from __future__ import annotations

from datetime import datetime as dt

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.operators.rangejoin import within_tolerance_pairs
from cargo_chat_spark.streaming.interval_join import interval_join_streams

# Two users; pairs within 300 s, incl. a cross-batch pair (events 2 and 3
# land in different micro-batches but within tolerance) and a same-ts pair.
_EVENTS = [
    # (event_id, ts, user_id, event_type)
    (1, "2026-01-01 10:00:00", 1, "view"),
    (2, "2026-01-01 10:03:00", 1, "click"),
    (3, "2026-01-01 10:06:00", 1, "purchase"),   # pairs with 2, not 1
    (4, "2026-01-01 10:03:00", 1, "error"),      # same ts as 2 → id order
    (5, "2026-01-01 11:00:00", 1, "view"),       # out of range of all
    (6, "2026-01-01 10:00:30", 2, "view"),
    (7, "2026-01-01 10:04:30", 2, "click"),      # 240 s after 6
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, dt.fromisoformat(ts), u, et) for i, ts, u, et in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )


@pytest.mark.slow
def test_stream_interval_join_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files + maxFilesPerTrigger=1 → two micro-batches: events 1-2/6
    # first, the rest second (pair 2↔3 spans the batch boundary — the
    # join state store must hold 2 until 3 arrives)
    _df(spark, _EVENTS[:2] + _EVENTS[5:6]).coalesce(1).write.mode("append").parquet(str(src))
    _df(spark, _EVENTS[2:5] + _EVENTS[6:]).coalesce(1).write.mode("append").parquet(str(src))

    schema = spark.read.parquet(str(src)).schema

    def run():
        left = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        right = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        out = interval_join_streams(
            left,
            right,
            key="user_id",
            id_col="event_id",
            ts="ts",
            tol_seconds=300,
            watermark="2 hours",  # > fixture span: file order is mtime-based, so
            # either batch may come first — nothing may be late-dropped
            payload=("event_type",),
        )
        q = (
            out.writeStream.format("memory")
            .queryName("interval_join_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()

    got = {
        (r.user_id, r.id_a, r.id_b, r.gap_seconds, r.event_type_a, r.event_type_b)
        for r in spark.table("interval_join_sink").collect()
    }

    batch = within_tolerance_pairs(
        _df(spark, _EVENTS),
        key="user_id",
        ts="ts",
        id_col="event_id",
        tol_seconds=300,
        payload=("event_type",),
    )
    want = {
        (r.user_id, r.id_a, r.id_b, r.gap_seconds, r.event_type_a, r.event_type_b)
        for r in batch.collect()
    }
    assert got == want
    # sanity on the fixture's intent: the cross-batch and same-ts pairs exist
    assert (1, 2, 3) in {(u, a, b) for u, a, b, *_ in want}
    assert (1, 2, 4) in {(u, a, b) for u, a, b, *_ in want}
