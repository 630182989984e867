"""Randomized semantic pins for the analytics operators, independent of
the driver fixture: generated event frames (seeded) are written as a
stand-in events.parquet and the REGISTERED callables run against them,
compared to straightforward pandas/python references. Catches semantics
the fixed fixture can't (empty hours at the spine edges, single-event
types, users active on disjoint day patterns)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest

from cargo_chat_spark.queries.analytics import (
    events_gap_fill_locf,
    rolling_7d_actives,
)

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _random_events(rng, n):
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base
                + timedelta(
                    hours=rng.randrange(0, 200), seconds=rng.randrange(3600)
                ),
                rng.randrange(6),
                rng.choice(["a", "b", "c"]),
                round(rng.uniform(0, 100), 2),
                "{}",
            )
        )
    return rows


def _write_fixture(spark, tmp_path, rows, name):
    d = tmp_path / name
    d.mkdir()
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 23, 101])
def test_gap_fill_matches_pandas_locf(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = _random_events(rng, 300)
    sf_dir = _write_fixture(spark, tmp_path, rows, f"gf{seed}")

    got = {
        (r["event_type"], r["hour_start"]): (
            round(r["filled_sum"], 6) if r["filled_sum"] is not None else None,
            r["is_observed"],
            r["n_events"],
        )
        for r in events_gap_fill_locf(spark, sf_dir).collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["hour"] = pdf["ts"].dt.floor("h")
    expected = {}
    for etype, g in pdf.groupby("event_type"):
        hourly = g.groupby("hour")["value"].agg(["sum", "count"])
        spine = pd.date_range(hourly.index.min(), hourly.index.max(), freq="h")
        dense = hourly.reindex(spine)
        filled = dense["sum"].ffill()
        for h in spine:
            observed = not pd.isna(dense.loc[h, "sum"])
            expected[(etype, h.to_pydatetime())] = (
                round(float(filled.loc[h]), 6),
                observed,
                int(dense.loc[h, "count"]) if observed else 0,
            )
    assert got == expected


@pytest.mark.parametrize("seed", [5, 77])
@pytest.mark.slow
def test_rolling_7d_matches_bruteforce(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = _random_events(rng, 250)
    sf_dir = _write_fixture(spark, tmp_path, rows, f"r7{seed}")

    got = {
        r["report_day"]: r["active_users_7d"]
        for r in rolling_7d_actives(spark, sf_dir).collect()
    }

    user_days = {(r[2], r[1].date()) for r in rows}
    days = sorted({d for _, d in user_days})
    expected = {}
    for d in days:
        lo = d - timedelta(days=6)
        expected[d] = len({u for (u, ud) in user_days if lo <= ud <= d})
    assert got == expected


def test_funnel_conversion_ordering_and_window(spark, tmp_path):
    """Controlled fixture pinning the funnel semantics: strict event
    ORDER (a click before the first view never counts) and the 24h
    per-stage conversion window (first-touch chaining)."""
    from cargo_chat_spark.queries.analytics import funnel_conversion

    H = 3_600
    rows = [
        # user 1: clean full conversion
        (1, 1, "view", 0), (2, 1, "click", H), (3, 1, "purchase", 2 * H),
        # user 2: click BEFORE the first view — must not convert stage 2
        (4, 2, "click", 0), (5, 2, "view", H), (6, 2, "purchase", 2 * H),
        # user 3: click 25h after first view — outside the window
        (7, 3, "view", 0), (8, 3, "click", 25 * H),
        # user 4: purchase 25h after first qualifying click — stage 3 out
        (9, 4, "view", 0), (10, 4, "click", H), (11, 4, "purchase", 26 * H),
        # user 5: never views — appears in no stage
        (12, 5, "click", 0), (13, 5, "purchase", H),
    ]
    df = spark.createDataFrame(
        [(i, u, t, s) for i, u, t, s in rows],
        "event_id bigint, user_id bigint, event_type string, ts_s bigint",
    ).selectExpr("event_id", "user_id", "event_type",
                 "timestamp_seconds(ts_s) AS ts")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    got = {
        r["stage"]: r["users"]
        for r in funnel_conversion(spark, sf).collect()
    }
    assert got == {"view": 4, "view_click": 2, "view_click_purchase": 1}


def test_phrase_match_adjacency_semantics(spark, tmp_path):
    """Phrase matching is positional: 'table x hash' must NOT match,
    repeats count each adjacency, and extra interior spaces don't
    break adjacency (the ' +' split rule)."""
    from cargo_chat_spark.queries.textstats import phrase_match_docs

    docs = [
        (1, "table hash"),                      # 1 match
        (2, "table x hash"),                    # bag-of-words trap: 0
        (3, "table hash table hash"),           # 2 matches
        (4, "hash table"),                      # reversed: 0
        (5, "a table  hash b"),                 # double space: still 1
        (6, " table hash"),                     # leading space: still 1
        (7, "tablehash table"),                 # substring trap: 0
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_docs(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 3: 2, 5: 1, 6: 1}
