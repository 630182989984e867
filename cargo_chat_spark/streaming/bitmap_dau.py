"""Incremental EXACT distinct actives: per-(day, bucket) bitmaps merged
across micro-batches with bitmap_or_agg — the streaming complement of the
batch ``daily_active_bitmap`` gate.

Why this beats both alternatives at 100 TB:

- ``approx_count_distinct`` streams fine but is approximate;
- exact streaming COUNT(DISTINCT) needs every id in the state store;
- bitmaps are EXACT and their per-(day, bucket) state is a fixed-size
  blob that merges associatively (OR), so re-delivered rows are idempotent
  by construction — replay cannot double-count an id.

State lives as a day-partitioned parquet table maintained with dynamic
partition overwrite (only touched days rewrite — the upsert_sink lever);
the read side sums bucket cardinalities. tests/test_bitmap_dau_stream.py
pins exact agreement with batch COUNT(DISTINCT) across overlapping
micro-batches (same user in two batches must count once).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_batch_into_state(
    spark: SparkSession, batch: DataFrame, state_dir: str
) -> None:
    """OR-merge one micro-batch's per-(day, bucket) bitmaps into the
    day-partitioned state table."""
    delta = (
        batch.select(
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    try:
        state = spark.read.parquet(state_dir)
    except AnalysisException:  # first batch: no state table yet
        # Match merge_rollup_writer: only the plan-time "missing path"
        # failure means empty state. Runtime read/collect failures must
        # propagate, or a dynamic overwrite of the touched days would
        # silently replace merged bitmaps with one batch's worth.
        merged = delta
    else:
        touched = [r["day"] for r in delta.select("day").distinct().collect()]
        merged = (
            state.where(F.col("day").isin(touched))
            .unionByName(delta)
            .groupBy("day", "bucket")
            .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("day").parquet(state_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def read_daily_actives(spark: SparkSession, state_dir: str) -> DataFrame:
    """(day, active_users) from the bitmap state — exact distinct."""
    return (
        spark.read.parquet(state_dir)
        .select("day", F.expr("bitmap_count(bm)").alias("c"))
        .groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("active_users"))
    )


def run_dau_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain ``source_dir`` (availableNow) maintaining the bitmap state."""
    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(
            lambda b, _id: merge_batch_into_state(spark, b, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates on its own once the backlog drains; wait
    # without a timeout so callers never observe half-merged state. (The
    # prior 300 s-bounded wait discarded awaitTermination's boolean and
    # could return mid-merge on a slow drain.)
    q.awaitTermination()
