"""Streaming inverted-index ingest (streaming/lexical_ingest.py): the
streamed loop must equal batch builds, BM25 over the streamed store must
equal the batch gate, clean replays must be no-ops, and the crash window
(postings written, stats not yet published) must converge on replay
without double-counting postings or stats."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.queries.hybrid import _bm25_scored
from cargo_chat_spark.sources.inverted_index import (
    _doc_stats,
    _postings_path,
    bm25_query,
    postings_of,
    read_index_stats,
    read_postings,
)
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.lexical_ingest import (
    lexical_ingest_batch,
    read_lex_fence,
    run_lexical_ingest_stream,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

SCHEMA = "doc_id bigint, text string"
TERMS = ["spark", "join", "window"]


def _docs(spark):
    return load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")


def _waves(spark):
    d = _docs(spark)
    return [d.where(F.col("doc_id") % 3 == m) for m in range(3)]


def _postings_rows(spark, path):
    return sorted(
        map(
            tuple,
            read_postings(spark, path)
            .select("token", "doc_id", "tf", "dl")
            .collect(),
        )
    )


@pytest.mark.slow
def test_streamed_ingest_matches_batch_and_serves_bm25(spark, tmp_path):
    w = _waves(spark)
    feed = str(tmp_path / "feed")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    for wave in w:
        wave.coalesce(1).write.mode("append").parquet(feed)
        run_lexical_ingest_stream(spark, feed, SCHEMA, idx, ckpt)
    assert read_lex_fence(idx) == 2

    # postings equal the one-shot computation over the full corpus
    want = sorted(
        map(
            tuple,
            postings_of(_docs(spark))
            .select("token", "doc_id", "tf", "dl")
            .collect(),
        )
    )
    assert _postings_rows(spark, idx) == want

    # BM25 over the streamed store == the batch gate, full score set
    got = sorted(map(tuple, bm25_query(spark, idx, TERMS).collect()))
    ref = sorted(map(tuple, _bm25_scored(spark, SF_DIR_SMALL).collect()))
    assert got == ref and len(got) > 0


def test_clean_replay_is_noop(spark, tmp_path):
    w = _waves(spark)
    idx = str(tmp_path / "idx")
    lexical_ingest_batch(spark, w[0], 0, idx)
    stats0 = read_index_stats(idx)
    rows0 = _postings_rows(spark, idx)
    lexical_ingest_batch(spark, w[0], 0, idx)  # at-least-once redelivery
    assert read_index_stats(idx) == stats0
    assert _postings_rows(spark, idx) == rows0


@pytest.mark.slow
def test_replay_after_crash_window(spark, tmp_path):
    """Crash after the postings overwrite but before the stats publish:
    the replay re-overwrites batch=1's partitions (idempotent) and folds
    the stats exactly once."""
    w = _waves(spark)
    idx = str(tmp_path / "idx")
    lexical_ingest_batch(spark, w[0], 0, idx)

    # simulate the crash: batch 1's postings land, stats never publish
    (
        postings_of(w[1])
        .withColumn("batch", F.lit(1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "shard")
        .parquet(_postings_path(idx))
    )
    assert read_lex_fence(idx) == 0  # commit point never reached
    stats_before = read_index_stats(idx)

    # at-least-once replay of batch 1
    lexical_ingest_batch(spark, w[1], 1, idx)
    assert read_lex_fence(idx) == 1
    n1, s1 = _doc_stats(w[1])
    assert read_index_stats(idx) == (
        stats_before[0] + n1,
        stats_before[1] + s1,
    ), "stats fold exactly once across the crashed attempt + replay"

    # postings equal a clean two-wave build (no duplicated tf rows)
    clean = str(tmp_path / "clean")
    lexical_ingest_batch(spark, w[0], 0, clean)
    lexical_ingest_batch(spark, w[1], 1, clean)
    assert _postings_rows(spark, idx) == _postings_rows(spark, clean)
