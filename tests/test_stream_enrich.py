"""Streaming as-of enrichment (streaming/enrich.py): the foreachBatch
stream-static form must converge to exactly the batch asof_join result,
and a replayed batch must not duplicate output (idempotent sink)."""

from __future__ import annotations

import glob
from datetime import datetime as dt

import pytest

from cargo_chat_spark.operators.asof import asof_join
from cargo_chat_spark.streaming.enrich import enrich_stream_asof

_CLICKS = [
    (1, "2026-01-01 10:00:00", 1),
    (2, "2026-01-01 12:00:00", 1),
    (3, "2026-01-01 13:00:00", 2),
    (4, "2026-01-01 09:00:00", 2),
]
_PURCHASES = [
    (100, "2026-01-01 11:00:00", 1, 5.0),
    (101, "2026-01-01 12:00:00", 1, 7.0),
    (102, "2026-01-01 10:30:00", 2, 9.0),
]


def _clicks_df(spark, rows):
    return spark.createDataFrame(
        [(i, dt.fromisoformat(ts), u) for i, ts, u in rows],
        "click_id bigint, ts timestamp, user_id bigint",
    )


def _purchases_df(spark):
    return spark.createDataFrame(
        [(i, dt.fromisoformat(ts), u, v) for i, ts, u, v in _PURCHASES],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )


@pytest.mark.slow
def test_stream_enrich_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # two micro-batches of clicks
    _clicks_df(spark, _CLICKS[:2]).coalesce(1).write.mode("append").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    right = _purchases_df(spark)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = enrich_stream_asof(
            stream,
            right,
            on="user_id",
            payload={"event_id": "p_id", "value": "p_value"},
            right_id="event_id",
            sink_dir=sink,
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    run_once()
    _clicks_df(spark, _CLICKS[2:]).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    # replay with the same checkpoint: no new batches, no duplicate rows
    run_once()

    got = spark.read.parquet(*glob.glob(f"{sink}/batch=*"))
    want = asof_join(
        _clicks_df(spark, _CLICKS),
        right,
        on="user_id",
        payload={"event_id": "p_id", "value": "p_value"},
        right_id="event_id",
    )
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows, f"stream={got_rows}\nbatch={want_rows}"
    assert got.count() == len(_CLICKS)  # replay added nothing
