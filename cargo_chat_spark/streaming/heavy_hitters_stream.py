"""Streaming Misra-Gries heavy hitters — the unbounded-domain frequent
items follower.

Batch twin: queries/sketch_queries.py::heavy_hitters_mg. Here the
stream drains through Structured Streaming foreachBatch and the sketch
state is ONE bounded k-counter summary that follows the whole history:

- each micro-batch reduces DISTRIBUTED to its ≤ partitions·k candidate
  summary (operators/sketches.misra_gries_summaries — map-only,
  Arrow-batched), which is the only thing collected (bounded by the
  sketch, never by the batch's vocabulary);
- the driver folds that summary into the persisted k-counter state with
  the mergeable-summaries truncation (subtract the (k+1)-th largest,
  keep positives — Agarwal et al. 2012), so after any number of
  batches the state's underestimate is ≤ N_total/(k+1) and every item
  with true count > N_total/(k+1) is present;
- state publishes under the ivm_stream fence discipline: immutable
  ``counters_v{batch}`` parquet dirs + an atomically os.replace'd JSON
  fence {"max_batch", "n_total", "dir"}. foreachBatch replays of an
  already-folded batch_id no-op on the fence, keeping the fold
  exactly-once under crash/replay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from cargo_chat_spark.operators.sketches import misra_gries_summaries
from cargo_chat_spark.functions.localframe import local_frame


def _fence_path(state_dir: str) -> str:
    return state_dir.rstrip("/") + ".hh_state.json"


def read_hh_state(state_dir: str) -> dict | None:
    # an existing-but-unreadable fence must not silently restart the
    # fold from zero (sources/sidecar.py)
    from cargo_chat_spark.sources.sidecar import read_json_sidecar

    return read_json_sidecar(
        _fence_path(state_dir),
        default=None,
        what="heavy-hitters fence",
        hint="replay the stream from a clean state dir",
    )


def _publish(
    state_dir: str, batch_id: int, n_total: int, checkpoint: str | None
) -> None:
    tmp = _fence_path(state_dir) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "max_batch": batch_id,
                "n_total": n_total,
                "dir": f"counters_v{batch_id}",
                # stream run identity: batch ids are only monotone WITHIN
                # one checkpoint lineage, so the replay fence must key on
                # (checkpoint, batch_id), not batch_id alone
                "checkpoint": checkpoint,
            },
            fh,
        )
    os.replace(tmp, _fence_path(state_dir))


def _canon_ckpt(checkpoint: str | None) -> str | None:
    """Lineage identity must survive spelling differences ('/x/ckpt' vs
    '/x/ckpt/' vs a relative path resolving to the same dir) — compare
    normalized absolute paths, not raw strings, or a valid resume raises."""
    if checkpoint is None:
        return None
    return os.path.normpath(os.path.abspath(checkpoint))


def _truncate(counters: dict[str, int], k: int) -> dict[str, int]:
    """Mergeable-summaries reduce to ≤ k entries: subtract the (k+1)-th
    largest count from everything, keep strictly positive remainders."""
    if len(counters) <= k:
        return counters
    kth = sorted(counters.values(), reverse=True)[k]
    return {w: c - kth for w, c in counters.items() if c > kth}


def merge_batch_into_state(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    k: int,
    item_col: str = "item",
    checkpoint: str | None = None,
) -> None:
    checkpoint = _canon_ckpt(checkpoint)
    state = read_hh_state(state_dir)
    stored_ckpt = _canon_ckpt(state.get("checkpoint")) if state else None
    if state is not None and batch_id <= state["max_batch"]:
        if stored_ckpt is not None and checkpoint is not None and (
            stored_ckpt != checkpoint
        ):
            # a DIFFERENT checkpoint lineage re-numbers batches from 0:
            # batch_id <= max_batch here is genuinely NEW data, not a
            # foreachBatch replay — silently no-oping would drop it, and
            # folding it would break exactly-once for true replays.
            raise RuntimeError(
                f"heavy-hitters state {state_dir} was folded under "
                f"checkpoint {stored_ckpt!r} up to batch "
                f"{state['max_batch']}, but checkpoint {checkpoint!r} is "
                f"replaying batch {batch_id} — resume with the original "
                "checkpoint, or replay the full source from a clean "
                "state dir"
            )
        return  # replayed batch: already folded (fence is the commit)
    # distributed per-partition summaries; only the bounded candidate
    # rows (≤ partitions·k) and the batch count reach the driver
    summ = misra_gries_summaries(
        batch.select(item_col), item_col, k
    ).collect()
    n_batch = batch.count()
    counters: dict[str, int] = {}
    if state is not None:
        prev = spark.read.parquet(
            os.path.join(state_dir, state["dir"])
        ).collect()
        counters = {r["item"]: r["est"] for r in prev}
    for r in summ:
        counters[r["item"]] = counters.get(r["item"], 0) + r["est"]
    counters = _truncate(counters, k)
    n_total = (state["n_total"] if state else 0) + n_batch
    out_dir = os.path.join(state_dir, f"counters_v{batch_id}")
    local_frame(spark, 
        [(w, int(c)) for w, c in counters.items()] or [("", 0)],
        "item string, est long",
    ).where("item <> '' OR est <> 0").coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_dir)
    # never DISARM the fence: a direct call with the checkpoint=None API
    # default (tests/backfills) must not overwrite a known lineage with
    # null — else a later fresh-checkpoint replay of lower batch ids
    # would silently pass the guard (the exact bug the guard prevents)
    _publish(state_dir, batch_id, n_total, checkpoint or stored_ckpt)


def run_hh_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    k: int,
    item_col: str = "item",
) -> None:
    """Drain ``source_dir`` (availableNow) folding each micro-batch into
    the k-counter heavy-hitter state."""
    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(
            lambda b, bid: merge_batch_into_state(
                spark, b, bid, state_dir, k, item_col,
                checkpoint=checkpoint_dir,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_heavy_hitters(spark: SparkSession, state_dir: str) -> DataFrame:
    """(item, est) candidate summary at the current fence; raises on a
    missing state (nothing has been folded)."""
    state = read_hh_state(state_dir)
    if state is None:
        raise RuntimeError(f"no heavy-hitter state at {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, state["dir"]))
