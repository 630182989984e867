"""Pins for streaming/upsert_sink.py: idempotent replay + partition
locality of the dynamic-partition-overwrite sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.streaming.upsert_sink import (
    overwrite_partitions,
    read_rollup,
    upsert_batch_writer,
)


def _snapshot(spark, path):
    return sorted(
        tuple(r)
        for r in read_rollup(spark, path)
        .select(F.col("day").cast("string").alias("day"), "event_type", "n")
        .collect()
    )


def test_replay_is_idempotent_and_partition_local(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day1 = spark.createDataFrame(
        [("2024-01-01", "click", 10), ("2024-01-01", "view", 7)],
        "day string, event_type string, n int",
    )
    day2 = spark.createDataFrame(
        [("2024-01-02", "click", 3)],
        "day string, event_type string, n int",
    )
    overwrite_partitions(day1, path, "day")
    overwrite_partitions(day2, path, "day")
    base = _snapshot(spark, path)
    assert len(base) == 3

    # replay of day2 (at-least-once redelivery): table unchanged
    overwrite_partitions(day2, path, "day")
    assert _snapshot(spark, path) == base

    # late update to day1 replaces ONLY day1; day2 untouched
    day1_fixed = spark.createDataFrame(
        [("2024-01-01", "click", 11), ("2024-01-01", "view", 7)],
        "day string, event_type string, n int",
    )
    overwrite_partitions(day1_fixed, path, "day")
    after = _snapshot(spark, path)
    assert after == [
        ("2024-01-01", "click", 11),
        ("2024-01-01", "view", 7),
        ("2024-01-02", "click", 3),
    ]


def test_foreachbatch_writer_through_real_stream(spark, tmp_path):
    """Drive the writer through an actual rate-limited memory stream so
    the foreachBatch signature and checkpointing are exercised."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("2024-01-01", "click", 1), ("2024-01-02", "view", 2)],
        "day string, event_type string, n int",
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("day string, event_type string, n int")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            upsert_batch_writer(path, "day", ["day", "event_type"])
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        tuple(r)
        for r in read_rollup(spark, path)
        .select(F.col("day").cast("string").alias("day"), "event_type", "n")
        .collect()
    )
    assert rows == [
        ("2024-01-01", "click", 1),
        ("2024-01-02", "view", 2),
    ]
