"""Continuously-maintained materialized join view (streaming IVM).

The production wiring for queries/storage.py::incremental_join_cdc's
one-shot identity: a materialized ``orders ⋈ customer`` per-nation
rollup FOLLOWS both snapshot tables as they mutate — each refresh
advances the view from the last-applied (a_version, b_version) pair to
the tables' current versions using only signed manifest-diff deltas
(sources/snapshots.py::snap_file_deltas), never re-executing the full
join:

    agg(A_la ⋈ B_lb) = state(va, vb)
                     + agg(ΔA[va→la] ⋈ B_lb,  sign = ΔA.sgn)
                     + agg(A_va ⋈ ΔB[vb→lb],  sign = ΔB.sgn)

(asymmetric delta-join form; A_va is the OLD orders version, served by
time travel, so refreshes compose: refresh(v0→v1) then refresh(v1→v2)
equals refresh(v0→v2) exactly.)

Exactness: group counts are ints; money sums are accumulated as INTEGER
CENTS (sgn × decimal(18,2) × 100), so cancellation of copy-on-write
survivors and composition across refreshes are bit-exact at any
parallelism. The emitted double is cents/100.0 — cents < 2^53 keeps the
long→double conversion and the division correctly rounded, identical to
DuckDB's DECIMAL→DOUBLE cast of the same rational.

Exactly-once: the WHOLE view state (group totals + both applied
versions) lives in one sidecar JSON published atomically
(temp + os.replace) — the kmeans_stream discipline. A refresh replayed
after publish sees the versions already applied and no-ops; a crash
before publish leaves the old consistent state; there is no other side
effect, so there is no crash window at all. The foreachBatch follower
(run_ivm_follow) upserts each micro-batch into the orders table and
refreshes the view in the same handler; batches are WHOLE-ROW upserts,
so a replayed merge is logically idempotent and its no-op commit's
deltas cancel to zero in the refresh.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.functions.localframe import local_frame
from cargo_chat_spark.sources.snapshots import (
    manifest,
    snap_file_deltas,
    snap_merge,
    snap_read,
)

# view spec: orders ⋈ customer on custkey, per-nation rollup (fixed —
# generic IVM needs a query compiler; the refresh algebra is what this
# module demonstrates and every term below is spec-local)
_JOIN_A = "o_custkey"
_JOIN_B = "c_custkey"
_GROUP = "c_nationkey"
_MEASURE_A = "o_totalprice"
_MEASURE_B = "c_acctbal"


def _state_path(view_path: str) -> str:
    return view_path.rstrip("/") + ".ivm_state.json"


def read_ivm_state(view_path: str) -> dict | None:
    try:
        with open(_state_path(view_path)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        # Defaulting is SAFE here, unlike the ingest/model fences (see
        # heavy_hitters/kmeans/dedup_ingest): the IVM state is a pure
        # cache of the full base-join rollup at (a_version, b_version) —
        # a None answer makes ivm_refresh recompute it from the snapshot
        # log (correct, just not incremental) and overwrite the bad
        # sidecar with a fresh one. Self-healing by recompute.
        return None


def _publish(view_path: str, state: dict) -> None:
    tmp = _state_path(view_path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, _state_path(view_path))


def _nation_rollup(
    orders_side: DataFrame,
    cust_side: DataFrame,
    bcast_cust: bool = False,
    bcast_orders: bool = False,
) -> DataFrame:
    """(group, dn, revenue_cents, balance_cents) with BOTH sides
    pre-aggregated by the join key before the join (guide §2.3,
    aggregate-before-shuffle): each side carries a signed ``sgn``
    column; the join then probes key-cardinality aggregates instead of
    raw rows, and the per-nation totals factorize exactly —

        dn = Σ_k n(k)·m(k)   dr = Σ_k pc(k)·m(k)   db = Σ_k n(k)·ac(k)

    where n/pc are the orders side's signed count / signed price-cents
    per key and m/ac the customer side's signed count / signed
    acctbal-cents per key (the group column is key-functional). All
    quantities are exact int64 cents, so the factorized products equal
    the old per-joined-row fold bit-for-bit at any parallelism."""
    cents_a = (F.col(_MEASURE_A).cast("decimal(18,2)") * 100).cast("long")
    cents_b = (F.col(_MEASURE_B).cast("decimal(18,2)") * 100).cast("long")
    oa = orders_side.groupBy(F.col(_JOIN_A).alias("k")).agg(
        F.sum("sgn").cast("long").alias("n"),
        F.sum(F.col("sgn") * cents_a).cast("long").alias("pc"),
    )
    cb = cust_side.groupBy(F.col(_JOIN_B).alias("k"), F.col(_GROUP)).agg(
        F.sum("sgn").cast("long").alias("m"),
        F.sum(F.col("sgn") * cents_b).cast("long").alias("ac"),
    )
    if bcast_cust:
        cb = F.broadcast(cb)
    if bcast_orders:
        oa = F.broadcast(oa)
    return oa.join(cb, "k").groupBy(_GROUP).agg(
        F.sum(F.col("n") * F.col("m")).cast("long").alias("dn"),
        F.sum(F.col("pc") * F.col("m")).cast("long").alias("dr"),
        F.sum(F.col("n") * F.col("ac")).cast("long").alias("db"),
    )


def _fold(state: dict, rows: list) -> None:
    groups = state["groups"]
    for r in rows:
        g = str(r[_GROUP])
        cur = groups.get(g, [0, 0, 0])
        groups[g] = [
            cur[0] + int(r["dn"] or 0),
            cur[1] + int(r["dr"] or 0),
            cur[2] + int(r["db"] or 0),
        ]


def ivm_refresh(
    spark: SparkSession, view_path: str, a_path: str, b_path: str
) -> dict:
    """Advance the view to both tables' CURRENT versions; returns the
    published (or already-current) state. First call materializes the
    base join once; every later call costs O(changed files) per table
    plus one streamed scan of the OTHER table per delta term."""
    la = int(manifest(a_path)["version"])
    lb = int(manifest(b_path)["version"])
    state = read_ivm_state(view_path)
    one = F.lit(1)
    if state is None:
        a = snap_read(spark, a_path, la).withColumn("sgn", one)
        b = snap_read(spark, b_path, lb).withColumn("sgn", one)
        state = {"groups": {}, "a_version": la, "b_version": lb}
        _fold(state, _nation_rollup(a, b).collect())
        _publish(view_path, state)
        return state
    va, vb = int(state["a_version"]), int(state["b_version"])
    if (va, vb) == (la, lb):
        return state  # fenced no-op (replay or idle tick)
    # both delta terms contribute additively to the same per-group fold,
    # so when BOTH tables advanced they union into ONE rollup job (the
    # per-nation totals are associative longs) instead of two collect
    # round trips; each term pre-aggregates BOTH join sides by custkey
    # (see _nation_rollup) so neither join ever ships raw rows
    terms = []
    if la > va:
        d_a = snap_file_deltas(spark, a_path, va, la)
        b_new = snap_read(spark, b_path, lb).withColumn("sgn", one)
        terms.append(_nation_rollup(d_a, b_new, bcast_orders=True))
    if lb > vb:
        d_b = snap_file_deltas(spark, b_path, vb, lb)
        a_old = snap_read(spark, a_path, va).withColumn("sgn", one)
        terms.append(_nation_rollup(a_old, d_b, bcast_cust=True))
    if terms:
        t = terms[0] if len(terms) == 1 else terms[0].unionByName(terms[1])
        _fold(state, t.collect())
    state["a_version"], state["b_version"] = la, lb
    _publish(view_path, state)
    return state


def view_frame(spark: SparkSession, view_path: str) -> DataFrame:
    """The maintained view as a DataFrame (groups with n > 0)."""
    state = read_ivm_state(view_path)
    if state is None:
        raise ValueError(f"no IVM state at {view_path}")
    rows = [
        (int(g), v[0], v[1], v[2])
        for g, v in state["groups"].items()
        if v[0] > 0
    ]
    df = local_frame(spark, 
        rows, "c_nationkey int, n_orders long, rc long, bc long"
    )
    return df.select(
        "c_nationkey",
        "n_orders",
        (F.col("rc") / 100.0).alias("revenue"),
        (F.col("bc") / 100.0).alias("balance_weight"),
    )


def run_ivm_follow(
    spark: SparkSession,
    source_dir: str,
    schema,
    a_path: str,
    b_path: str,
    view_path: str,
    key_col: str = "o_orderkey",
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``source_dir`` (availableNow) of whole-row order upsert
    batches: each micro-batch MERGEs into the orders table and the view
    refreshes in the same handler, so the view tracks the table
    batch-by-batch. Replays are safe end-to-end: the merge of an
    already-applied whole-row batch is logically a no-op whose file
    deltas cancel, and the refresh itself is version-fenced."""

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snap_merge(spark, a_path, batch_df, key_col)
        ivm_refresh(spark, view_path, a_path, b_path)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option(
            "checkpointLocation", checkpoint_dir or view_path + ".ckpt"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
