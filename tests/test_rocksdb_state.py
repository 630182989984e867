"""RocksDB state store provider — the 100 TB-grade streaming state
backend. The default HDFSBackedStateStoreProvider keeps every key's state
in executor memory (bounded by heap); RocksDB spills to local disk with
incremental checkpointing, which is what a production watermarked
aggregation runs on. This test pins that the engine's streaming
aggregation produces IDENTICAL results under RocksDB, so flipping the
provider at deployment time is a pure config change."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.incremental import windowed_event_counts
from tests.conftest import SF_DIR_SMALL

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.mark.slow
def test_windowed_counts_identical_under_rocksdb(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events")
    src = str(tmp_path / "src")
    events.write.mode("overwrite").parquet(src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKS)
    try:
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = windowed_event_counts(stream, streaming=True)

        def write(batch_df, _bid):
            batch_df.write.mode("append").parquet(sink)

        q = (
            out.writeStream.foreachBatch(write)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", old
        )

    # update-mode emits the final value per (window, type) for this
    # single-batch run; compare against the batch form
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(sink)
        .select(
            "window_start", "window_end", "event_type",
            "event_count", F.round("value_sum", 6).alias("value_sum"),
        )
        .collect()
    )
    expected = sorted(
        tuple(r)
        for r in windowed_event_counts(events)
        .select(
            "window_start", "window_end", "event_type",
            "event_count", F.round("value_sum", 6).alias("value_sum"),
        )
        .collect()
    )
    assert got == expected
    # the RocksDB provider actually engaged: state dir contains rocksdb
    # SST/checkpoint artifacts
    import os

    state_root = os.path.join(ckpt, "state")
    rocks_artifacts = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(state_root)
        for f in files
        if f.endswith(".zip") or f.endswith(".sst") or f.endswith(".changelog")
    ]
    assert rocks_artifacts, (
        "no RocksDB snapshot/SST artifacts under the state dir — provider "
        "did not engage"
    )
