"""Streaming near-dup ingest over the persisted band store.

Closes the loop `sources/band_store.py` opens: a continuous document
feed drains through Structured Streaming, and each micro-batch is
(1) probed against everything ingested before it — candidate near-dup
pairs land in a per-batch output partition — then (2) appended to the
store, becoming history for every later batch. The batch pipeline's
whole-corpus recompute never happens; per micro-batch cost is
O(batch × bands) signature work plus an unshuffled store scan.

Exactly-once accounting under foreachBatch's at-least-once contract:

- the PAIRS output for batch N writes with ``overwrite`` into its own
  ``batch=N`` partition directory, so a replay rewrites the identical
  result instead of duplicating it;
- the store append is NOT fenced before the batch completes — a crash
  between the append and the fence re-appends the batch's band rows on
  replay, which is HARMLESS by construction: probe results are
  DISTINCT pairs, and a new doc joining its own already-stored copy is
  excluded by the ``doc_id`` inequality, so the replayed probe emits
  byte-identical pairs (pinned by
  tests/test_dedup_ingest_stream.py::test_replay_after_crash_window);
- the fence (highest fully-ingested batch id, a sidecar next to the
  store) makes CLEAN replays no-ops — the common restart case skips
  both the probe and the duplicate append.

Same availableNow drain pattern as streaming/index_stream.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.sources.sidecar import read_json_sidecar
from cargo_chat_spark.sources.band_store import (
    append_band_store,
    probe_band_store,
)

_FENCE_SUFFIX = ".ingest_fence.json"


def _fence_path(store_path: str) -> str:
    # next to (not inside) the store dir — mirrors the rollup sink's
    # compaction watermark: no store rewrite can truncate it
    return store_path.rstrip("/") + _FENCE_SUFFIX


def read_ingest_fence(store_path: str) -> int:
    """Highest fully-ingested batch id (-1 if none). A silent -1 on an
    unreadable fence would re-ingest landed batches (the band-store
    append is at-least-once) — so it raises (sources/sidecar.py)."""
    return int(
        read_json_sidecar(
            _fence_path(store_path),
            default=-1,
            field="max_ingested_batch",
            what="ingest fence",
        )
    )


def _write_fence(store_path: str, batch_id: int) -> None:
    with open(_fence_path(store_path), "w") as fh:
        json.dump({"max_ingested_batch": int(batch_id)}, fh)


def dedup_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    pairs_dir: str,
) -> None:
    """Probe-then-ingest one micro-batch (the foreachBatch body, also
    directly callable for tests/backfills)."""
    if batch_id <= read_ingest_fence(store_path):
        return  # clean replay of a fully-ingested batch
    pairs = probe_band_store(spark, store_path, batch_df)
    (
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={int(batch_id)}")
        )
    )
    append_band_store(batch_df, store_path)
    _write_fence(store_path, batch_id)


def run_dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    store_path: str,
    pairs_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain ``source_dir`` (availableNow) of (doc_id, text) parquet
    batches through probe-then-ingest."""

    def _apply(batch_df, batch_id: int) -> None:
        dedup_ingest_batch(spark, batch_df, batch_id, store_path, pairs_dir)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_all_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """Every discovered pair with the batch that found it (partition
    column ``batch``)."""
    return (
        spark.read.option("basePath", pairs_dir)
        .parquet(pairs_dir)
        .select("doc_a", "doc_b", F.col("batch").cast("bigint").alias("batch"))
    )
