"""Streaming (mini-batch) KMeans over embedding waves.

The online member of the clustering family (`operators/clustering.py`
is the batch trainer): a continuous embedding feed drains through
Structured Streaming, each micro-batch is assigned to the CURRENT
centroids (the same shuffle-free literal-centroid kernel), and the
model advances from cumulative per-(cluster, dim) integer sums and
per-cluster counts — the standard sequential mini-batch scheme, made
fully deterministic by the fixed-point discipline:

- centroid after any batch = ``floor(cum_sum / cum_count)`` per dim,
  all integers — bit-reproducible across engines and replays;
- a cluster with no members yet serves its INIT centroid (derived
  state: recomputed from totals every batch, so there is no drifting
  "previous centroid" to corrupt);
- init = the K smallest-id vectors of the FIRST batch.

Exactly-once under foreachBatch's at-least-once contract: the whole
model state (sums, counts, init, last batch id) lives in ONE sidecar
JSON published atomically (temp + os.replace) — state size is O(K × D)
ints, far under any sane JSON limit at production K. A replayed batch
recomputes the identical assignment (centroids derive from state, and
state hasn't advanced) and publishes once; a replay after the publish
is a fenced no-op. No other side effect exists, so there is no crash
window at all — simpler than the ingest loops with data-file outputs.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.operators.clustering import assign_clusters
from cargo_chat_spark.sources.sidecar import read_json_sidecar


def _state_path(path: str) -> str:
    return path.rstrip("/") + ".kmeans_state.json"


def read_kmeans_state(path: str) -> dict | None:
    # the folded sums/counts are NOT recomputable from a drained source
    # — an exists-but-unreadable state raises (sources/sidecar.py)
    return read_json_sidecar(
        _state_path(path),
        default=None,
        what="kmeans state",
        hint="replay the stream from a clean state path",
    )


def _publish(path: str, state: dict) -> None:
    tmp = _state_path(path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, _state_path(path))


def centroids_of(state: dict) -> list[list[int]]:
    """Derived centroids: floor(cum_sum / cum_count) per dim; clusters
    without members serve their init centroid."""
    out = []
    for ci in range(state["k"]):
        n = state["counts"][ci]
        if n > 0:
            out.append(
                [math.floor(s / n) for s in state["sums"][ci]]
            )
        else:
            out.append(list(state["init"][ci]))
    return out


def kmeans_stream_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    k: int = 8,
    id_col: str = "vec_id",
    q_col: str = "q",
) -> None:
    """Fold one micro-batch of quantized vectors into the model (the
    foreachBatch body, also directly callable for tests/backfills)."""
    bid = int(batch_id)
    state = read_kmeans_state(state_path)
    if state is not None and state["batch"] >= bid:
        return  # fenced replay
    if state is None:
        init_rows = (
            batch_df.select(id_col, q_col).orderBy(id_col).limit(k).collect()
        )
        if len(init_rows) < k:
            raise ValueError(
                f"first batch must carry at least k={k} vectors"
            )
        init = [list(r[q_col]) for r in init_rows]
        dims = len(init[0])
        state = {
            "k": k,
            "dims": dims,
            "init": init,
            "sums": [[0] * dims for _ in range(k)],
            "counts": [0] * k,
            "batch": -1,
        }
    cents = centroids_of(state)
    assigned = assign_clusters(batch_df, cents, q_col)
    # one map-side-combined agg; collect is exactly K*D + K rows
    rows = (
        assigned.select("cluster", F.posexplode(q_col).alias("dim", "qv"))
        .groupBy("cluster", "dim")
        .agg(
            F.sum("qv").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    )
    for r in rows:
        state["sums"][r["cluster"]][r["dim"]] += int(r["s"])
    for r in rows:
        if r["dim"] == 0:
            state["counts"][r["cluster"]] += int(r["n"])
    state["batch"] = bid
    _publish(state_path, state)


def run_kmeans_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_path: str,
    k: int = 8,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain ``source_dir`` (availableNow) of (vec_id, q) parquet
    batches into the model."""

    def _apply(batch_df, batch_id: int) -> None:
        kmeans_stream_batch(spark, batch_df, batch_id, state_path, k)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir or state_path + ".ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
