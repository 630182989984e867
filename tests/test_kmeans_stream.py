"""Streaming mini-batch KMeans (streaming/kmeans_stream.py): the
streamed drain must equal serial batch folds, clean replays must be
fenced no-ops, state must be fully deterministic across runs, and the
first-batch init contract must be enforced."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cargo_chat_spark.operators.clustering import quantize_embeddings
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.kmeans_stream import (
    centroids_of,
    kmeans_stream_batch,
    read_kmeans_state,
    run_kmeans_stream,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

SCHEMA = "vec_id bigint, q array<bigint>"


def _waves(spark):
    e = quantize_embeddings(
        load_table(spark, SF_DIR_SMALL, "embeddings")
    ).select("vec_id", "q")
    return [e.where(F.col("vec_id") % 3 == m) for m in range(3)]


def test_streamed_drain_equals_serial_folds(spark, tmp_path):
    w = _waves(spark)

    ref = str(tmp_path / "ref")
    for i, wave in enumerate(w):
        kmeans_stream_batch(spark, wave, i, ref)

    feed = str(tmp_path / "feed")
    st = str(tmp_path / "streamed")
    for wave in w:
        wave.coalesce(1).write.mode("append").parquet(feed)
        run_kmeans_stream(spark, feed, SCHEMA, st)

    a, b = read_kmeans_state(ref), read_kmeans_state(st)
    assert a["batch"] == b["batch"] == 2
    assert (a["sums"], a["counts"], a["init"]) == (
        b["sums"],
        b["counts"],
        b["init"],
    )
    assert centroids_of(a) == centroids_of(b)
    # the model moved off its init and uses real mass
    assert sum(a["counts"]) == sum(wv.count() for wv in w)
    assert centroids_of(a) != a["init"]


def test_clean_replay_is_fenced_noop(spark, tmp_path):
    w = _waves(spark)
    p = str(tmp_path / "m")
    kmeans_stream_batch(spark, w[0], 0, p)
    s0 = read_kmeans_state(p)
    kmeans_stream_batch(spark, w[0], 0, p)  # at-least-once redelivery
    assert read_kmeans_state(p) == s0


def test_state_is_deterministic_across_runs(spark, tmp_path):
    w = _waves(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    for i, wave in enumerate(w):
        kmeans_stream_batch(spark, wave, i, p1)
        kmeans_stream_batch(spark, wave, i, p2)
    assert read_kmeans_state(p1) == read_kmeans_state(p2)


def test_small_first_batch_raises(spark, tmp_path):
    w = _waves(spark)
    tiny = w[0].limit(3)
    try:
        kmeans_stream_batch(spark, tiny, 0, str(tmp_path / "m"), k=8)
    except ValueError as exc:
        assert "k=8" in str(exc)
    else:
        raise AssertionError("expected ValueError")
    assert read_kmeans_state(str(tmp_path / "m")) is None, (
        "a failed init must not publish state"
    )
