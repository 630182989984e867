"""Idempotent partition-overwrite sink: exactly-once-per-partition upserts.

The missing piece between a streaming aggregation and a queryable table is
a sink that can be REPLAYED: when a micro-batch is re-delivered after a
failure (foreachBatch is at-least-once), appending would double-count.
With no transactional table format in this environment (no Delta/Iceberg),
the Spark-native idempotent sink is DYNAMIC partition overwrite: each
batch rewrites exactly the partitions it touches and leaves the rest of
the table alone, so replaying a batch converges to the same table state
instead of duplicating it. This is the standard "hourly rollup table
maintained by a stream" pattern at warehouse scale — partition by the
window/day key, and each late-data update replaces one partition, not the
table.

`tests/test_upsert_sink.py` pins the two load-bearing properties:
re-delivering a batch leaves the table unchanged (idempotence), and a
batch touching partition P does not disturb partition Q (locality).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from cargo_chat_spark.sources.sidecar import read_json_sidecar

# Sidecar recording the highest batch id folded into a ``src_batch = -1``
# row by compact_rollup. Replays of batches at or below this watermark
# must be rejected: their contribution is inside the compacted row, so
# the != batch_id fence can no longer peel it out and a replay would
# double-count. The sidecar lives NEXT TO the table directory, not inside
# it: compaction's static overwrite truncates the table dir, and a crash
# after the truncate but before a rewrite of an in-table sidecar would
# silently lose the fence (read would return -1) — the failure mode the
# docstring's 'ENFORCED' claim forbids.
_WATERMARK_SUFFIX = ".compaction_watermark.json"


def _local_path(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _watermark_path(path: str) -> str:
    return _local_path(path).rstrip("/") + _WATERMARK_SUFFIX


def read_compaction_watermark(path: str) -> int:
    """Highest batch id absorbed by compaction (-1 if never compacted).
    Compaction DESTROYS the per-row src_batch fence for absorbed
    batches, so a silently-reset watermark would double-fold a replayed
    compacted batch — it raises instead (sources/sidecar.py)."""
    return int(
        read_json_sidecar(
            _watermark_path(path),
            default=-1,
            field="max_compacted_batch",
            what="compaction watermark",
        )
    )


def _write_compaction_watermark(path: str, batch_id: int) -> None:
    with open(_watermark_path(path), "w") as f:
        json.dump({"max_compacted_batch": int(batch_id)}, f)


def overwrite_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Rewrite only the partitions present in ``df`` (dynamic mode), leaving
    all other partitions of the parquet table at ``path`` intact."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def upsert_batch_writer(path: str, partition_col: str, key_cols: list[str]):
    """foreachBatch callback: collapse the micro-batch to one row per key
    (last-write-wins within the batch) and overwrite the touched
    partitions. Safe to replay: same batch in → same table out."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        deduped = batch_df.dropDuplicates(key_cols)
        overwrite_partitions(deduped, path, partition_col)

    return write


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_rollup_writer(path: str, partition_col: str = "day"):
    """foreachBatch callback maintaining an incremental (day, event_type)
    rollup: counts and exact-decimal value sums accumulate across
    micro-batches instead of replacing each other.

    Exactly-once under replay via a CONTRIBUTION LOG with batch-id
    fencing: the table stores one row per (group, src_batch) — batches
    are never blended together in storage, only at read time
    (``read_rollup_agg``). On (re)delivery of batch B the writer rewrites
    each touched partition as (existing rows minus any stamped B) plus
    B's fresh delta, so replaying ANY batch converges to the same table:
    a batch's contribution is removable precisely because it was never
    merged into other batches' rows. (A first cut that merged groups
    across batches and fenced on max(src_batch) was WRONG — discarding a
    replayed batch's stamped row also discarded the older contributions
    merged into it; the regression test below caught it.) This is the
    log-structured design a transactional table format gives you for
    free; storage stays bounded because rows are pre-aggregated per group
    within each batch, and a periodic compaction of committed batches
    would keep the log at ~one row per group.

    The touched-partition list is collected to the driver: bounded by
    partitions-per-batch (hours/days of event time), not data volume.
    Single-writer assumption, as with any non-transactional table format.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = (
            batch_df.groupBy(
                F.col("ts").cast("date").cast("string").alias(partition_col),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("value_sum"),
            )
            .withColumn("src_batch", F.lit(batch_id).cast("bigint"))
        )
        if batch_id <= read_compaction_watermark(path):
            # Replay of a batch already folded into the compacted row —
            # its delta is not removable via the fence anymore, so the
            # only idempotent action is a no-op.
            return
        touched = [r[0] for r in delta.select(partition_col).distinct().collect()]
        if not touched:
            return
        try:
            current = spark.read.parquet(path).where(
                F.col(partition_col).isin(touched)
                & (F.col("src_batch") != batch_id)  # fence: drop replayed rows
            )
        except AnalysisException:
            current = None
        out = delta if current is None else current.unionByName(delta)
        overwrite_partitions(out, path, partition_col)

    return write


def read_rollup_agg(spark: SparkSession, path: str) -> DataFrame:
    """Fold the contribution log to the logical rollup (one row per
    (day, event_type)): counts and exact-decimal sums add across the
    per-batch contribution rows."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("value_sum").alias("value_sum"),
        )
    )


def compact_rollup(spark: SparkSession, path: str, partition_col: str = "day") -> None:
    """Offline compaction of the contribution log: fold each group's
    per-batch rows into a single row stamped ``src_batch = -1``. Run only
    while the stream is STOPPED (i.e. every written batch has committed):
    replay can then only involve batches newer than anything compacted,
    so the fence never needs to peel a compacted row apart. Keeps the log
    at one row per group between maintenance windows — the same
    rewrite-partitions primitive, so it is itself idempotent.

    The stopped-stream precondition is ENFORCED, not just documented: the
    max batch id folded away is persisted to a sidecar watermark and
    ``merge_rollup_writer`` no-ops any (re)delivery at or below it, so a
    replayed already-compacted batch cannot double-count."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(path)
    max_row = src.agg(F.max("src_batch")).first()[0]
    watermark = max(
        read_compaction_watermark(path),
        int(max_row) if max_row is not None else -1,
    )
    compacted = (
        src.groupBy(partition_col, "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("value_sum").alias("value_sum"),
        )
        .withColumn("src_batch", F.lit(-1).cast("bigint"))
    )
    # Fence FIRST, then overwrite: the watermark is a monotonic max, so a
    # crash between the two steps can only OVER-fence (a batch wrongly
    # rejected converges via re-running compaction), never under-fence
    # (a replayed already-compacted batch double-counting). The sidecar
    # also lives outside the table dir, so the truncate cannot eat it.
    _write_compaction_watermark(path, watermark)
    # static overwrite of the whole table: compaction touches every
    # partition by definition. localCheckpoint first — the plan reads the
    # same files the overwrite truncates.
    compacted = compacted.localCheckpoint(eager=True)
    compacted.write.mode("overwrite").partitionBy(partition_col).parquet(path)
