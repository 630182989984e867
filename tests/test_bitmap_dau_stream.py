"""Incremental bitmap DAU must EXACTLY equal batch COUNT(DISTINCT) after
draining overlapping micro-batches — a user appearing in several batches
(and in replayed rows) counts once, because bitmap OR-merge is
idempotent."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.bitmap_dau import (
    read_daily_actives,
    run_dau_stream,
)
from tests.conftest import SF_DIR_SMALL


@pytest.mark.slow
def test_incremental_bitmap_dau_matches_batch(spark, tmp_path):
    e = load_table(spark, SF_DIR_SMALL, "events")
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # two arrival waves with HEAVY user overlap (even ids appear in both)
    first = e.where((e.event_id % 3) < 2)
    second = e.where((e.event_id % 3) != 1)  # overlaps `first` on %3==0
    first.coalesce(1).write.mode("append").parquet(src)
    schema = e.schema
    run_dau_stream(spark, src, schema, state, ckpt)
    second.coalesce(1).write.mode("append").parquet(src)
    run_dau_stream(spark, src, schema, state, ckpt)

    got = {
        r["day"]: r["active_users"]
        for r in read_daily_actives(spark, state).collect()
    }
    want = {
        r["day"]: r["n"]
        for r in (
            first.unionByName(second)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert got == want
