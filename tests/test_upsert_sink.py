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


def test_merge_rollup_end_to_end_matches_batch(spark, tmp_path):
    """Full incremental pipeline: events streamed in 3 micro-batches →
    batch-id-fenced merge rollup → final table equals the one-shot batch
    aggregation; replaying the last micro-batch changes nothing."""
    from cargo_chat_spark.sources.testdata import load_table
    from cargo_chat_spark.streaming.upsert_sink import merge_rollup_writer
    from tests.conftest import SF_DIR_SMALL

    events = load_table(spark, SF_DIR_SMALL, "events").select(
        "ts", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.repartition(3).write.mode("overwrite").parquet(src)
    path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    writer = merge_rollup_writer(path, "day")
    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from cargo_chat_spark.streaming.upsert_sink import read_rollup_agg

    def snapshot():
        return sorted(
            tuple(r)
            for r in read_rollup_agg(spark, path)
            .select(
                F.col("day").cast("string").alias("day"),
                "event_type",
                "n",
                F.col("value_sum").cast("double"),
            )
            .collect()
        )

    got = snapshot()
    expected = sorted(
        tuple(r)
        for r in events.groupBy(
            F.col("ts").cast("date").cast("string").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .collect()
    )
    assert got == expected



def test_merge_rollup_fence_makes_last_batch_replay_idempotent(spark, tmp_path):
    """Drive the merge writer directly so batch contents are controlled:
    re-delivering the LAST batch (the only one Structured Streaming can
    replay) must leave the table bit-identical."""
    from cargo_chat_spark.streaming.upsert_sink import merge_rollup_writer

    path = str(tmp_path / "rollup")
    writer = merge_rollup_writer(path, "day")
    b0 = spark.createDataFrame(
        [("2024-01-01 10:00:00", "click", 1.5),
         ("2024-01-01 11:00:00", "view", 2.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = spark.createDataFrame(
        [("2024-01-01 12:00:00", "click", 4.0),
         ("2024-01-02 09:00:00", "click", 8.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    writer(b0, 0)
    writer(b1, 1)

    from cargo_chat_spark.streaming.upsert_sink import read_rollup_agg

    def snapshot():
        return sorted(
            tuple(r)
            for r in read_rollup_agg(spark, path)
            .select(
                F.col("day").cast("string"), "event_type", "n",
                F.col("value_sum").cast("double"),
            )
            .collect()
        )

    base = snapshot()
    assert ("2024-01-01", "click", 2, 5.5) in base  # folded across batches
    assert ("2024-01-02", "click", 1, 8.0) in base

    # crash-after-write-before-commit: batch 1 re-delivered — must not
    # double-count batch 1 NOR lose batch 0's contribution (the
    # merged-stamp fence bug this design replaced)
    writer(b1, 1)
    assert snapshot() == base
    # and replaying an OLDER batch also converges (contribution-log
    # property a last-batch-only fence cannot give)
    writer(b0, 0)
    assert snapshot() == base


def test_compaction_preserves_totals_and_shrinks_log(spark, tmp_path):
    from cargo_chat_spark.streaming.upsert_sink import (
        compact_rollup,
        merge_rollup_writer,
        read_rollup_agg,
    )

    path = str(tmp_path / "rollup")
    writer = merge_rollup_writer(path, "day")
    for i in range(4):
        b = spark.createDataFrame(
            [(f"2024-01-0{1 + i % 2} 0{i}:00:00", "click", float(i + 1))],
            "ts string, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        writer(b, i)

    def agg_snapshot():
        return sorted(
            tuple(r)
            for r in read_rollup_agg(spark, path)
            .select(
                F.col("day").cast("string"), "event_type", "n",
                F.col("value_sum").cast("double"),
            )
            .collect()
        )

    before = agg_snapshot()
    raw_before = spark.read.parquet(path).count()
    compact_rollup(spark, path, "day")
    assert agg_snapshot() == before
    raw_after = spark.read.parquet(path).count()
    assert raw_after < raw_before  # 4 contribution rows -> 2 groups
    # post-compaction stream resumption: a NEW batch merges normally
    writer(
        spark.createDataFrame(
            [("2024-01-01 09:00:00", "click", 10.0)],
            "ts string, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp")),
        4,
    )
    after = agg_snapshot()
    d1 = [r for r in after if r[0] == "2024-01-01"][0]
    b1 = [r for r in before if r[0] == "2024-01-01"][0]
    assert d1[2] == b1[2] + 1 and abs(d1[3] - (b1[3] + 10.0)) < 1e-9


def test_compaction_watermark_rejects_replayed_compacted_batch(spark, tmp_path):
    """Round-6 advice: after compact_rollup folds batches into the
    src_batch=-1 row, replaying an already-compacted batch id must no-op
    (the fence can no longer peel its contribution out), while a NEW
    batch id still merges normally."""
    from cargo_chat_spark.streaming.upsert_sink import (
        compact_rollup,
        merge_rollup_writer,
        read_compaction_watermark,
        read_rollup_agg,
    )

    path = str(tmp_path / "rollup")
    write = merge_rollup_writer(path)

    def batch(rows):
        return spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        ).selectExpr("ts", "event_type", "value")

    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    write(batch([(t, "view", 1.0), (t, "view", 2.0)]), 0)
    write(batch([(t, "view", 4.0)]), 1)
    before = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["value_sum"]))
        for r in read_rollup_agg(spark, path).collect()
    }
    assert before[(str(t.date()), "view")] == (3, 7.0)

    compact_rollup(spark, path)
    assert read_compaction_watermark(path) == 1
    # replay of compacted batch 1: must not double-count
    write(batch([(t, "view", 4.0)]), 1)
    after = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["value_sum"]))
        for r in read_rollup_agg(spark, path).collect()
    }
    assert after == before
    # a genuinely new batch still lands
    write(batch([(t, "view", 10.0)]), 2)
    final = read_rollup_agg(spark, path).collect()
    row = [r for r in final if r["event_type"] == "view"][0]
    assert (row["n"], float(row["value_sum"])) == (4, 17.0)


def test_compaction_watermark_survives_crash_window(spark, tmp_path):
    """Round-6 advice (medium): the fence must hold even if compaction
    crashes between its two steps. The sidecar lives OUTSIDE the table
    directory (the static overwrite truncates the table dir) and is
    written BEFORE the overwrite, so a crash can only over-fence — a
    replayed already-compacted batch can never double-count."""
    import datetime as dt
    import os

    from pyspark.sql.functions import lit

    from cargo_chat_spark.streaming.upsert_sink import (
        _watermark_path,
        compact_rollup,
        merge_rollup_writer,
        read_compaction_watermark,
        read_rollup_agg,
    )

    path = str(tmp_path / "rollup")
    write = merge_rollup_writer(path)
    t = dt.datetime(2024, 1, 1, 12, 0, 0)

    def batch(rows):
        return spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        )

    write(batch([(t, "view", 1.0)]), 0)
    write(batch([(t, "view", 2.0)]), 1)
    compact_rollup(spark, path)

    # sidecar is outside the table dir, so no table write can delete it
    assert not _watermark_path(path).startswith(path + os.sep)
    assert read_compaction_watermark(path) == 1

    # simulate the crash window: table overwritten (sidecar would have
    # been truncated under the old in-dir layout) — fence must survive
    spark.read.parquet(path).withColumn("src_batch", lit(-1).cast("bigint")) \
        .localCheckpoint(eager=True) \
        .write.mode("overwrite").partitionBy("day").parquet(path)
    assert read_compaction_watermark(path) == 1, (
        "overwrite of the table dir lost the compaction fence"
    )
    before = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["value_sum"]))
        for r in read_rollup_agg(spark, path).collect()
    }
    write(batch([(t, "view", 2.0)]), 1)  # replay of compacted batch
    after = {
        (str(r["day"]), r["event_type"]): (r["n"], float(r["value_sum"]))
        for r in read_rollup_agg(spark, path).collect()
    }
    assert after == before
