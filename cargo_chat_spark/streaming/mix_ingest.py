"""Streaming token-budget mixture assembly — the incremental form of
``token_budget_mix`` (queries/sampling.py): documents arrive in waves
and each source's token budget fills in INGEST order (doc_id order
within a batch), with the crossing doc kept (the first-fit boundary
rule the batch gate pins). When waves arrive in id order the streamed
kept-set equals the batch gate's exactly (pinned); out-of-order
delivery legitimately changes which docs fill the budget — arrival
order IS the streaming contract, as for any first-come quota.

Exactly-once under foreachBatch's at-least-once contract — the
simplest of the ingest loops, because ALL mutable state (per-source
running token totals + the batch fence) lives in ONE atomically
replaced JSON sidecar, published AFTER the batch's kept rows land in
their own overwrite-idempotent ``batch=N`` partition:

- clean replay (fence already covers the batch): no-op;
- crash between the kept-rows write and the sidecar publish: the
  replay recomputes from the OLD totals — same decisions, the
  overwrite rewrites byte-identical rows, then the publish lands.

State is O(sources); per-batch cost is one pass over the batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window

from cargo_chat_spark.functions.localframe import local_frame
from pyspark.sql import functions as F

_STATE_SUFFIX = ".mix_state.json"


def _state_path(out_dir: str) -> str:
    return out_dir.rstrip("/") + _STATE_SUFFIX


def read_mix_state(out_dir: str) -> dict:
    """The sidecar state, or the genuine empty-store default when the
    sidecar does not exist. A sidecar that EXISTS but cannot be parsed
    raises: defaulting would silently restart the totals from zero
    (double-filling budgets on the next batch) and fence out intact
    data (an empty report with no error)."""
    p = _state_path(out_dir)
    if not os.path.exists(p):
        return {"totals": {}, "max_ingested_batch": -1}
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"mix state sidecar {p} exists but is unreadable ({e!r}); "
            "refusing to default the fence/totals — repair or remove "
            "the sidecar explicitly"
        ) from e


def _publish(out_dir: str, state: dict) -> None:
    tmp = _state_path(out_dir) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, _state_path(out_dir))


def mix_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    budget: int,
) -> None:
    """Fill budgets from one micro-batch (the foreachBatch body, also
    directly callable for tests/backfills)."""
    state = read_mix_state(out_dir)
    if batch_id <= int(state["max_ingested_batch"]):
        return  # clean replay
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = batch_df.select(
        "doc_id", "source", n_tokens.alias("n_tokens")
    ).withColumn(
        "before_in_batch", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    prior = state["totals"]
    prior_rows = [(s, int(t)) for s, t in prior.items()] or [("", 0)]
    prior_df = F.broadcast(
        local_frame(spark, prior_rows, "source string, prior bigint")
    )
    decided = toks.join(prior_df, "source", "left").select(
        "doc_id",
        "source",
        "n_tokens",
        (F.coalesce(F.col("prior"), F.lit(0)) + F.col("before_in_batch"))
        .alias("before_total"),
    )
    kept = decided.where(F.col("before_total") < budget).select(
        "doc_id", "source", "n_tokens"
    )
    kept.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={int(batch_id)}")
    )
    # totals advance by EVERY seen doc's tokens (kept or not — the batch
    # gate's running sum counts all rows; past the budget it only keeps
    # the exclusion decision stable)
    batch_totals = {
        r["source"]: r["t"]
        for r in toks.groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("t"))
        .collect()  # bounded: one row per source
    }
    for s, t in batch_totals.items():
        prior[s] = int(prior.get(s, 0)) + int(t)
    state["max_ingested_batch"] = int(batch_id)
    _publish(out_dir, state)


def run_mix_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    budget: int,
) -> None:
    """Drain ``source_dir`` (availableNow) of (doc_id, source, text)
    parquet waves through the budget filler."""

    def _apply(batch_df, batch_id: int) -> None:
        mix_ingest_batch(spark, batch_df, batch_id, out_dir, budget)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_mix_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-source keep card over everything ingested — the batch gate's
    output shape (source, n_docs_kept, tokens_kept, last_doc).

    Reads ONLY fenced batches (``batch <= max_ingested_batch``): a
    ``batch=N`` dir written in the crash window — kept rows landed but
    the sidecar fence not yet published — is invisible to readers until
    the replay re-lands it and the fence advances, so the report never
    transiently over-counts docs/tokens. The filter is on the partition
    column, so unfenced dirs are partition-pruned, not scanned."""
    state = read_mix_state(out_dir)
    max_fenced = int(state["max_ingested_batch"])
    if max_fenced < 0:
        # Fence says "nothing ever ingested" — if batch dirs exist the
        # sidecar was lost (not a fresh store): an empty report here
        # would silently hide intact fenced data.
        try:
            has_data = any(
                e.name.startswith("batch=")
                for e in os.scandir(out_dir)
            )
        except FileNotFoundError:
            has_data = False  # no store dir at all: genuinely empty
        if has_data:
            raise ValueError(
                f"mix store at {out_dir} has batch data but no state "
                "sidecar — the fence was lost; re-run the ingest stream "
                "(replay republishes it) instead of reading an empty "
                "report"
            )
    kept = (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .where(F.col("batch") <= F.lit(max_fenced))
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )
