"""Streaming ingest into the snapshot table (streaming/snap_stream.py):
the drained table equals a batch build, every micro-batch boundary is a
time-travelable version, and a re-delivered micro-batch is fenced (no
double-append)."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from cargo_chat_spark.sources.snapshots import manifest, snap_read, versions
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.snap_stream import (
    append_batch,
    run_snapshot_ingest,
)
from tests.conftest import SF_DIR_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _feed(spark, tmp_path, parts):
    """Write each frame in ``parts`` as one file into a stream source dir
    (one micro-batch each under maxFilesPerTrigger=1)."""
    src = str(tmp_path / "feed")
    os.makedirs(src)
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("append").parquet(src)
    return src


def test_stream_ingest_matches_batch_and_versions_are_batch_boundaries(
    spark, tmp_path
):
    e = load_table(spark, SF_DIR_SMALL, "events")
    waves = [
        e.where(F.col("user_id") < 5),
        e.where((F.col("user_id") >= 5) & (F.col("user_id") < 10)),
        e.where(F.col("user_id") >= 10),
    ]
    table = str(tmp_path / "table")
    # drive foreachBatch directly with deterministic batch ids (the
    # streaming wiring itself is the same availableNow pattern pinned by
    # test_index_stream; what matters here is the commit protocol)
    for i, w in enumerate(waves):
        assert append_batch(w, table, i) == i

    assert versions(table) == [0, 1, 2]
    assert _rows(snap_read(spark, table)) == _rows(e)
    # each version is exactly the prefix of the stream
    assert _rows(snap_read(spark, table, 0)) == _rows(waves[0])
    assert _rows(snap_read(spark, table, 1)) == _rows(
        waves[0].unionByName(waves[1])
    )


def test_replayed_batch_is_fenced(spark, tmp_path):
    e = load_table(spark, SF_DIR_SMALL, "events")
    w0 = e.where(F.col("user_id") < 5)
    w1 = e.where(F.col("user_id") >= 5)
    table = str(tmp_path / "table")
    assert append_batch(w0, table, 0) == 0
    assert append_batch(w1, table, 1) == 1
    want = _rows(snap_read(spark, table))

    # at-least-once: both earlier batches re-delivered
    assert append_batch(w0, table, 0) is None
    assert append_batch(w1, table, 1) is None
    assert versions(table) == [0, 1]
    assert _rows(snap_read(spark, table)) == want
    assert manifest(table)["batch_id"] == 1


@pytest.mark.slow
def test_run_snapshot_ingest_end_to_end(spark, tmp_path):
    e = load_table(spark, SF_DIR_SMALL, "events").limit(200)
    src = _feed(
        spark, tmp_path,
        [e.where(F.col("event_id") % 2 == 0), e.where(F.col("event_id") % 2 == 1)],
    )
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    run_snapshot_ingest(
        spark, src, e.schema, table, ckpt, max_files_per_trigger=1
    )
    assert _rows(snap_read(spark, table)) == _rows(e)
    # one source file per micro-batch -> one committed version each
    assert versions(table) == [0, 1]
    # rerunning the drained stream (same checkpoint) commits nothing new
    run_snapshot_ingest(
        spark, src, e.schema, table, ckpt, max_files_per_trigger=1
    )
    assert versions(table) == [0, 1]
    assert _rows(snap_read(spark, table)) == _rows(e)


@pytest.mark.slow
def test_fence_survives_interleaved_non_stream_commits(spark, tmp_path):
    """The review scenario: a maintenance commit (CoW delete) lands
    BETWEEN stream batches; its manifest has no batch_id, but a replay
    of an earlier micro-batch must still be fenced."""
    from cargo_chat_spark.sources.snapshots import snap_delete

    e = load_table(spark, SF_DIR_SMALL, "events")
    w0 = e.where(F.col("user_id") < 5)
    w1 = e.where(F.col("user_id") >= 5)
    table = str(tmp_path / "table")
    assert append_batch(w0, table, 0) == 0
    assert append_batch(w1, table, 1) == 1

    # interleaved maintenance: delete users 7/11 (manifest without txn)
    snap_delete(
        spark, table, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    assert manifest(table).get("batch_id") is None
    want = _rows(snap_read(spark, table))

    # at-least-once redelivery of both stream batches: fenced
    assert append_batch(w0, table, 0) is None
    assert append_batch(w1, table, 1) is None
    assert _rows(snap_read(spark, table)) == want

    # a genuinely NEW batch still commits
    w2 = e.where(F.col("user_id").isin(7, 11))
    assert append_batch(w2, table, 2) is not None
    assert _rows(snap_read(spark, table)) == _rows(
        e.where(~F.col("user_id").isin(7, 11)).unionByName(w2)
    )


def test_streamed_append_carries_deletion_vector(spark, tmp_path):
    """A MoR delete followed by one streamed micro-batch must NOT
    resurrect the deleted rows: append_batch carries the previous
    manifest's deletion vector verbatim (the append ∘ DV interaction
    the snapshot model test caught in snap_append, here for the
    STREAMING commit path)."""
    from cargo_chat_spark.sources.snapshots import (
        snap_delete_rows,
        snap_read,
        snap_write,
    )
    from cargo_chat_spark.streaming.snap_stream import append_batch

    out = str(tmp_path / "t")
    e = load_table(spark, SF_DIR_SMALL, "events")
    snap_write(e.where(F.col("user_id") < 8), out)
    snap_delete_rows(
        spark, out,
        e.where(F.col("user_id") == 3).select("event_id"),
        "event_id",
    )
    assert snap_read(spark, out).where(F.col("user_id") == 3).count() == 0

    batch = e.where(F.col("user_id") == 9)
    v = append_batch(batch, out, batch_id=0)
    assert v is not None
    after = snap_read(spark, out, v)
    assert after.where(F.col("user_id") == 3).count() == 0, (
        "streamed append resurrected MoR-deleted rows"
    )
    assert after.where(F.col("user_id") == 9).count() == batch.count()


@pytest.mark.slow
def test_stream_auto_compaction_heals_small_files(spark, tmp_path):
    """compact_every=3 bin-packs the sink's residue mid-stream: content
    equals the full input, the final file count is below one-per-batch,
    a full worst-case replay (fresh checkpoint) is content-stable, and
    fenced replays never trigger extra data rewrites."""
    e = load_table(spark, SF_DIR_SMALL, "events")
    parts = [e.where(F.col("user_id") % 6 == m) for m in range(6)]
    src = _feed(spark, tmp_path, parts)
    tbl = str(tmp_path / "tbl")

    run_snapshot_ingest(
        spark, src, e.schema, tbl, str(tmp_path / "ck"),
        max_files_per_trigger=1, compact_every=3,
        small_bytes=1 << 30, target_bytes=1 << 30,
    )
    want = _rows(e)
    assert _rows(snap_read(spark, tbl)) == want
    n_files = len(manifest(tbl)["files"])
    assert n_files < 6, f"compaction never ran ({n_files} files)"
    n_versions = len(versions(tbl))
    assert n_versions > 6, "layout commits must appear in the history"

    # worst-case replay: every batch re-delivered; appends fence, so no
    # new data versions land and content is unchanged
    run_snapshot_ingest(
        spark, src, e.schema, tbl, str(tmp_path / "ck2"),
        max_files_per_trigger=1, compact_every=3,
        small_bytes=1 << 30, target_bytes=1 << 30,
    )
    assert _rows(snap_read(spark, tbl)) == want
    assert len(versions(tbl)) == n_versions, (
        "fenced replays must not commit anything"
    )
