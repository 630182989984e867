"""Stream-stream interval join: the co-occurrence pairing of
operators/rangejoin.py expressed as a TRUE two-stream join (Structured
Streaming's stream-stream inner join with event-time range condition).

streaming/enrich.py covers stream-STATIC lookups; this covers the case
where BOTH sides arrive continuously (clickstream ⋈ purchase stream,
sensor ⋈ sensor). Spark buffers each side's rows in join state until the
other side's watermark passes the end of their match window — the range
condition ``ts_b BETWEEN ts_a AND ts_a + tol`` plus the two watermarks is
exactly what lets the state store evict: a left row is droppable once the
right watermark exceeds ``ts_a + tol``, so state is bounded by
(rate × (tol + watermark delay)) per side, independent of stream length.

Scale posture: the join shuffles both streams on the key (hash exchange
per micro-batch); hot keys are the same skew story as the batch bucketed
form — at 100 TB the batch backfill runs operators/rangejoin.py
(equi-join on (key, tol-bin), no per-key quadratic state) while THIS form
handles the live tail, and the two agree exactly (pinned by
tests/test_interval_join_stream.py).

Reference analog: none — the reference is batch-only; this is part of the
docs/proposals.md streaming extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    id_col: str,
    ts: str = "ts",
    tol_seconds: int,
    watermark: str = "10 minutes",
    payload: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames (same schema) into ordered co-occurrence
    pairs: same ``key``, ``0 <= ts_b - ts_a <= tol_seconds``, orientation
    ``(ts_a, id_a) < (ts_b, id_b)`` so each unordered pair appears once.

    Output columns match operators/rangejoin.py::within_tolerance_pairs:
    key, id_a, id_b, ts_a, ts_b, gap_seconds, <payload>_a, <payload>_b.

    ``how="left_outer"`` additionally emits each UNMATCHED left row once
    — with NULL right columns — but only after the right watermark passes
    ``ts_a + tol`` (Spark cannot declare a row unmatched while a match
    could still arrive). That makes the outer mode the streaming
    "abandonment detector": purchases with no follow-up event inside the
    tolerance surface exactly when their match window provably closed.
    State bound is identical to the inner form.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join mode: {how}")
    a = left.select(
        F.col(key).alias(key),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("ts_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
    ).withWatermark("ts_a", watermark)
    b = right.select(
        F.col(key).alias("__k_b"),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("ts_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    ).withWatermark("ts_b", watermark)
    cond = (
        (F.col(key) == F.col("__k_b"))
        & (F.col("ts_b") >= F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {int(tol_seconds)} SECONDS"))
        & (
            (F.col("ts_b") > F.col("ts_a"))
            | (F.col("id_b") > F.col("id_a"))
        )
    )
    gap = (
        (F.unix_micros(F.col("ts_b")) - F.unix_micros(F.col("ts_a"))).cast("double")
        / 1_000_000.0
    )
    return (
        a.join(b, cond, how)
        .drop("__k_b")
        .withColumn("gap_seconds", gap)
        .select(
            key,
            "id_a",
            "id_b",
            "ts_a",
            "ts_b",
            "gap_seconds",
            *[f"{c}_a" for c in payload],
            *[f"{c}_b" for c in payload],
        )
    )
