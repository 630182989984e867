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


def test_asof_join_randomized_vs_naive(spark):
    """Seeded random datasets vs a quadratic Python reference — catches
    window-frame/tie-break mistakes the hand-built fixture can't."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n_left, n_right = 40, 30
        left_rows = [
            (i, rng.randrange(4), _ts("2026-01-01T00:00:00").replace(
                hour=rng.randrange(24), minute=rng.randrange(60)))
            for i in range(n_left)
        ]
        right_rows = [
            (100 + i, rng.randrange(4), _ts("2026-01-01T00:00:00").replace(
                hour=rng.randrange(24), minute=rng.randrange(60)), float(i))
            for i in range(n_right)
        ]
        left = spark.createDataFrame(
            left_rows, "click_id bigint, user_id bigint, ts timestamp"
        )
        right = spark.createDataFrame(
            right_rows, "event_id bigint, user_id bigint, ts timestamp, value double"
        )
        got = {
            r["click_id"]: (r["p_id"], r["p_value"])
            for r in asof_join(
                left, right, on="user_id",
                payload={"event_id": "p_id", "value": "p_value"},
                right_id="event_id",
            ).collect()
        }
        for cid, key, lts in left_rows:
            cands = [
                (rts, rid, val)
                for rid, rkey, rts, val in right_rows
                if rkey == key and rts <= lts
            ]
            want = max(cands)[1:] if cands else (None, None)
            assert got[cid] == (want[0], want[1] if cands else None), (
                f"seed {seed} click {cid}: {got[cid]} != {want}"
            )


def test_asof_join_null_payload_not_torn(spark):
    """A right row with a legitimately-NULL payload FIELD must win intact:
    the whole payload comes from that one row (value=NULL), never a splice
    of its id with an older row's non-NULL value (struct-carry contract)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T12:00:00"))],
        "click_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2026-01-01T10:00:00"), 5.0),
            (101, 10, _ts("2026-01-01T11:00:00"), None),  # newest, NULL value
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    row = asof_join(
        left,
        right,
        on="user_id",
        payload={"event_id": "p_id", "value": "p_value"},
        right_id="event_id",
    ).collect()[0]
    assert row["p_id"] == 101
    assert row["p_value"] is None, (
        f"torn enrichment: value {row['p_value']} carried from an older row"
    )


def test_rangejoin_pre_epoch_timestamps(spark):
    """Floor (not truncate) bucketing: pre-1970 timestamps must still pair
    correctly — the float-division form collapsed bins around epoch 0."""
    from cargo_chat_spark.operators.rangejoin import within_tolerance_pairs

    rows = [
        (1, 1, _ts("1969-12-31T23:58:00")),
        (2, 1, _ts("1969-12-31T23:59:30")),  # 90 s after id 1
        (3, 1, _ts("1970-01-01T00:01:00")),  # 90 s after id 2, 180 after id 1
        (4, 1, _ts("1969-12-31T23:50:00")),  # > 300 s from all others
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    got = {
        (r["id_a"], r["id_b"])
        for r in within_tolerance_pairs(
            df, key="user_id", ts="ts", id_col="event_id", tol_seconds=300
        ).collect()
    }
    assert got == {(1, 2), (2, 3), (1, 3)}, got


def test_rangejoin_randomized_vs_naive(spark):
    from cargo_chat_spark.operators.rangejoin import within_tolerance_pairs

    import random

    for seed in (5, 41):
        rng = random.Random(seed)
        rows = [
            (i, rng.randrange(3), _ts("2026-01-01T00:00:00").replace(
                hour=rng.randrange(4), minute=rng.randrange(60),
                second=rng.randrange(60)))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
        got = {
            (r["id_a"], r["id_b"])
            for r in within_tolerance_pairs(
                df, key="user_id", ts="ts", id_col="event_id", tol_seconds=300
            ).collect()
        }
        want = set()
        for ida, ka, ta in rows:
            for idb, kb, tb in rows:
                if ka != kb:
                    continue
                if (ta, ida) < (tb, idb) and (tb - ta).total_seconds() <= 300:
                    want.add((ida, idb))
        assert got == want, (
            f"seed {seed}: missing={want - got} extra={got - want}"
        )


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
