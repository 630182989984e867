"""Bucketed-table co-located join: the write-once-shuffle-once lever.

Pins the load-bearing physical property: a self-join of two tables
bucketed on the join key runs WITHOUT any Exchange (the scan itself
reports hash-partitioned output), while the identical join on plain
parquet shuffles both sides. This is the difference between an O(data)
shuffle per query and a one-time cost at write time — at 100 TB the
bucketed layout is what makes repeated fact⋈fact joins viable.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.sources.bucketed import (
    drop_table,
    read_bucketed,
    write_bucketed,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


@pytest.fixture()
def no_broadcast(spark):
    """Force the merge-join path so the Exchange assertion is meaningful."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, no_broadcast):
    events = load_table(spark, SF_DIR_SMALL, "events")
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    try:
        write_bucketed(
            events.select("event_id", "user_id", "event_type"),
            "ev_bucketed_a", "user_id", 4, f"{tmp}/a",
        )
        write_bucketed(
            events.select("event_id", "user_id", "value"),
            "ev_bucketed_b", "user_id", 4, f"{tmp}/b",
        )
        a = read_bucketed(spark, "ev_bucketed_a")
        b = read_bucketed(spark, "ev_bucketed_b")
        joined = a.join(b, "user_id")
        plan = _executed(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed join should not shuffle either side:\n" + plan
        )
        # bucketed-sorted same-key aggregation also reuses the layout
        agg = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        agg_plan = _executed(agg)
        assert "Exchange" not in agg_plan, (
            "groupBy on the bucket key should reuse the bucketing:\n"
            + agg_plan
        )
        # correctness: same result as the plain join
        plain = events.select("event_id", "user_id", "event_type").join(
            events.select("event_id", "user_id", "value"), "user_id"
        )
        assert joined.count() == plain.count()
    finally:
        drop_table(spark, "ev_bucketed_a")
        drop_table(spark, "ev_bucketed_b")
        shutil.rmtree(tmp, ignore_errors=True)


def test_unbucketed_join_shuffles_both_sides(spark, no_broadcast):
    events = load_table(spark, SF_DIR_SMALL, "events")
    a = events.select("event_id", "user_id", "event_type")
    b = events.select("event_id", "user_id", "value")
    plan = _executed(a.join(b, "user_id"))
    assert plan.count("Exchange hashpartitioning") >= 2, (
        "contrast case: plain parquet join must shuffle both sides:\n"
        + plan
    )
