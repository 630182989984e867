"""As-of join operator edge semantics (operators/asof.py): inclusive
equal-timestamp matches, largest-id tie-break, NULL before any right row,
per-key isolation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cargo_chat_spark.operators.asof import asof_join


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2026-01-01T10:00:00")),  # before any right row
            (2, 10, _ts("2026-01-01T12:00:00")),  # equal-ts: inclusive
            (3, 10, _ts("2026-01-01T13:00:00")),  # strictly after
            (4, 20, _ts("2026-01-01T12:30:00")),  # other key, no right rows
        ],
        "click_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2026-01-01T12:00:00"), 1.0),
            (101, 10, _ts("2026-01-01T12:00:00"), 2.0),  # same ts, larger id
            (102, 30, _ts("2026-01-01T09:00:00"), 9.0),  # unrelated key
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    out = {
        r["click_id"]: r
        for r in asof_join(
            left,
            right,
            on="user_id",
            payload={"event_id": "p_id", "value": "p_value"},
            right_id="event_id",
        ).collect()
    }
    assert out[1]["p_id"] is None and out[1]["p_value"] is None
    # inclusive at equal ts, and among equal-ts right rows the largest id wins
    assert out[2]["p_id"] == 101 and out[2]["p_value"] == 2.0
    assert out[3]["p_id"] == 101
    # keys never bleed across: user 20 sees nothing from user 30
    assert out[4]["p_id"] is None


def test_asof_join_single_shuffle_plan(spark):
    """Scale contract: the union-and-carry as-of is ONE exchange on the
    join key — no range join, no cartesian."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T10:00:00"))],
        "click_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts("2026-01-01T09:00:00"), 1.0)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    plan = (
        asof_join(
            left,
            right,
            on="user_id",
            payload={"event_id": "p_id"},
            right_id="event_id",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert n_exchanges == 1, f"expected 1 user_id exchange, got {n_exchanges}:\n{plan}"
