"""Version-fenced word-frequency follower (streaming/wordfreq_follow.py):
every refresh must equal a from-scratch word_freqs of the table's
current version, refreshes must COMPOSE (sequential == one-shot),
idle/replayed refreshes are fenced no-ops, merge-on-read deletes are
seen (the round-8 snap_file_deltas DV-diff pass), and a crash between
the dict write and the fence publish converges on re-run."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from cargo_chat_spark.operators.bpe import word_freqs
from cargo_chat_spark.sources.snapshots import (
    snap_delete,
    snap_delete_rows,
    snap_merge,
    snap_read,
    snap_write,
)
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.wordfreq_follow import (
    read_wordfreq,
    read_wordfreq_state,
    wordfreq_refresh,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401


def _docs(spark):
    return load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    )


def _scratch(spark, table):
    return {
        (r["word"], r["freq"])
        for r in word_freqs(snap_read(spark, table)).collect()
    }


def _dict(spark, state):
    return {
        (r["word"], r["freq"]) for r in read_wordfreq(spark, state).collect()
    }


def _advance(spark, docs, table, step):
    if step == 0:  # MERGE: text edit + re-keyed inserts
        upd = docs.where(F.col("doc_id") % 10 == 3).withColumn(
            "text", F.concat(F.col("text"), F.lit(" zzfollow"))
        )
        ins = docs.where(F.col("doc_id") % 10 == 7).withColumn(
            "doc_id", F.col("doc_id") + F.lit(200_000_000)
        )
        snap_merge(spark, table, upd.unionByName(ins), "doc_id")
    elif step == 1:  # merge-on-read delete: DV-only commit
        snap_delete_rows(
            spark, table,
            docs.where(F.col("doc_id") % 10 == 4).select("doc_id"),
            "doc_id",
        )
    else:  # CoW delete
        snap_delete(
            spark, table,
            docs.where(F.col("doc_id") % 10 == 1).select("doc_id"),
            "doc_id",
        )


@pytest.mark.slow
def test_sequential_refreshes_track_scratch(spark, tmp_path):
    docs = _docs(spark)
    table = str(tmp_path / "t")
    state = str(tmp_path / "wf")
    snap_write(docs, table)
    wordfreq_refresh(spark, state, table)
    assert _dict(spark, state) == _scratch(spark, table)
    for step in range(3):
        _advance(spark, docs, table, step)
        wordfreq_refresh(spark, state, table)
        assert _dict(spark, state) == _scratch(spark, table), f"step {step}"
    # idle refresh: fence no-op, state byte-identical
    before = read_wordfreq_state(state)
    wordfreq_refresh(spark, state, table)
    assert read_wordfreq_state(state) == before


def test_one_shot_refresh_equals_sequential(spark, tmp_path):
    docs = _docs(spark)
    table = str(tmp_path / "t")
    snap_write(docs, table)
    for step in range(3):
        _advance(spark, docs, table, step)
    state = str(tmp_path / "wf1")
    # fenceless first call at v3 = from-scratch ground truth
    wordfreq_refresh(spark, state, table)
    # twin table: fence at v0 first, then ONE refresh over all 3 commits
    # — the incremental path must land on the same dict (composition)
    table2 = str(tmp_path / "t2")
    snap_write(docs, table2)
    state2 = str(tmp_path / "wf2")
    wordfreq_refresh(spark, state2, table2)
    for step in range(3):
        _advance(spark, docs, table2, step)
    wordfreq_refresh(spark, state2, table2)  # ONE refresh over 3 commits
    assert _dict(spark, state2) == _dict(spark, state)


def test_crash_window_converges(spark, tmp_path):
    """A dict dir written without its fence (crash before publish) is
    overwritten by the re-run; the fence stays the only commit point."""
    docs = _docs(spark)
    table = str(tmp_path / "t")
    state = str(tmp_path / "wf")
    snap_write(docs, table)
    wordfreq_refresh(spark, state, table)
    _advance(spark, docs, table, 0)
    # simulate the crash: materialize the would-be dict dir with garbage
    import json

    cur_fence = read_wordfreq_state(state)
    orphan = os.path.join(state, "dict_v1")
    spark.createDataFrame([("zzz", 999)], "word string, freq long").write.mode(
        "overwrite"
    ).parquet(orphan)
    assert read_wordfreq_state(state) == cur_fence  # fence untouched
    wordfreq_refresh(spark, state, table)
    assert _dict(spark, state) == _scratch(spark, table)
