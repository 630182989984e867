"""Streaming near-dup ingest (streaming/dedup_ingest.py): the streamed
probe-then-ingest loop must equal the serial band-store calls, clean
replays must be fenced no-ops, and a crash between the store append and
the fence must converge to identical results on replay."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from cargo_chat_spark.sources.band_store import (
    append_band_store,
    probe_band_store,
    read_band_store,
    write_band_store,
)
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.dedup_ingest import (
    dedup_ingest_batch,
    read_all_pairs,
    read_ingest_fence,
    run_dedup_ingest_stream,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

SCHEMA = "doc_id bigint, text string"


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def _waves(spark):
    docs = load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    )
    return [docs.where(F.col("doc_id") % 3 == m) for m in range(3)]


@pytest.mark.slow
def test_streamed_ingest_matches_serial_calls(spark, tmp_path):
    w = _waves(spark)

    # serial reference, in streaming order per wave: probe FIRST (wave 0
    # sees an empty store -> within-batch pairs only), then append
    ref_store = str(tmp_path / "ref_store")
    ref = {}
    for i, wave in enumerate(w):
        ref[i] = _pairs(probe_band_store(spark, ref_store, wave))
        append_band_store(wave, ref_store)

    # streamed: one parquet file per wave, drained availableNow per wave
    # (each drain sees exactly one new file -> one micro-batch)
    feed = str(tmp_path / "feed")
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    for i, wave in enumerate(w):
        wave.coalesce(1).write.mode("append").parquet(feed)
        run_dedup_ingest_stream(spark, feed, SCHEMA, store, pairs_dir, ckpt)

    got = read_all_pairs(spark, pairs_dir)
    for i in range(3):
        assert _pairs(got.where(F.col("batch") == i)) == ref[i], f"wave {i}"
    assert any(ref[i] for i in range(3)), "fixture must produce pairs"

    # store content equals the serial store's (same rows, any order)
    a = sorted(map(tuple, read_band_store(spark, store).collect()))
    b = sorted(map(tuple, read_band_store(spark, ref_store).collect()))
    assert a == b
    assert read_ingest_fence(store) == 2


def test_clean_replay_is_fenced_noop(spark, tmp_path):
    w = _waves(spark)
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    dedup_ingest_batch(spark, w[0], 0, store, pairs_dir)
    n_store = read_band_store(spark, store).count()
    p0 = _pairs(read_all_pairs(spark, pairs_dir))

    dedup_ingest_batch(spark, w[0], 0, store, pairs_dir)  # clean replay
    assert read_band_store(spark, store).count() == n_store, (
        "fenced replay must not re-append"
    )
    assert _pairs(read_all_pairs(spark, pairs_dir)) == p0


@pytest.mark.slow
def test_replay_after_crash_window(spark, tmp_path):
    """Crash between the store append and the fence: the replay
    re-probes against a store that already contains the batch's rows
    and re-appends them — the pairs output must be byte-identical
    (self-rows excluded by the doc_id inequality, distinct collapses
    the duplicates) and a LATER batch's probe must be unaffected."""
    w = _waves(spark)
    store = str(tmp_path / "store")
    pairs_dir = str(tmp_path / "pairs")
    dedup_ingest_batch(spark, w[0], 0, store, pairs_dir)

    # batch 1 crashes after the append but before the fence:
    probe_1 = _pairs(probe_band_store(spark, store, w[1]))
    (
        probe_band_store(spark, store, w[1])
        .write.mode("overwrite")
        .parquet(os.path.join(pairs_dir, "batch=1"))
    )
    append_band_store(w[1], store)
    assert read_ingest_fence(store) == 0  # fence never advanced

    # replay of batch 1 (at-least-once delivery)
    dedup_ingest_batch(spark, w[1], 1, store, pairs_dir)
    assert read_ingest_fence(store) == 1
    got_1 = _pairs(
        read_all_pairs(spark, pairs_dir).where(F.col("batch") == 1)
    )
    assert got_1 == probe_1, "replayed probe must be identical"

    # a later batch sees the same history as if no crash had happened
    ref_store = str(tmp_path / "ref_store")
    write_band_store(w[0], ref_store)
    append_band_store(w[1], ref_store)
    want_2 = _pairs(probe_band_store(spark, ref_store, w[2]))
    dedup_ingest_batch(spark, w[2], 2, store, pairs_dir)
    got_2 = _pairs(
        read_all_pairs(spark, pairs_dir).where(F.col("batch") == 2)
    )
    assert got_2 == want_2
