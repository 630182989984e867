"""Streaming OHLC bars must agree EXACTLY with the batch form on the same
input — volume is exact decimal and open/close resolve by the same
(ts, event_id) struct order, so the comparison is equality, not
tolerance. Runs the fixture events through a file-source stream in two
availableNow passes (checkpointed) to prove cross-micro-batch state
merging, complete-mode output."""

from __future__ import annotations

import pytest

from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.ohlc import ohlc_bars
from tests.conftest import SF_DIR_SMALL


@pytest.mark.slow
def test_streaming_ohlc_matches_batch(spark, tmp_path):
    e = load_table(spark, SF_DIR_SMALL, "events")
    first = e.where(e.event_id % 2 == 0)
    second = e.where(e.event_id % 2 == 1)
    src = str(tmp_path / "src")
    first.coalesce(1).write.mode("append").parquet(src)

    schema = e.schema
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            ohlc_bars(stream, streaming=True)
            .writeStream.format("memory")
            .queryName("ohlc_mem")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    second.coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = {
        (r["window_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["volume"]
        )
        for r in spark.sql("SELECT * FROM ohlc_mem").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["volume"]
        )
        for r in ohlc_bars(e).collect()
    }
    assert got == want
