"""CDC-driven inverted-index maintenance (sources/inverted_index.py::
sync_index_from_snapshot / apply_index_cdc): after any sequence of
snapshot commits, the synced index must serve postings and BM25 equal to
a from-scratch build over the table's latest logical state — including
delete-then-reinsert across tombstone generations — and the stats
sidecar must track the live corpus exactly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.sources import snapshots as S
from cargo_chat_spark.sources.inverted_index import (
    apply_index_cdc,
    bm25_query,
    read_index_stats,
    read_postings,
    sync_index_from_snapshot,
    synced_version,
    write_inverted_index,
    _doc_stats,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

TERMS = ["spark", "join", "window"]


def _docs(spark):
    return load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")


def _live_rows(spark, path):
    return sorted(
        map(
            tuple,
            read_postings(spark, path)
            .select("token", "doc_id", "tf", "dl")
            .collect(),
        )
    )


def _fresh_rows(spark, docs, tmp_path, name):
    ref = str(tmp_path / name)
    write_inverted_index(docs, ref)
    return _live_rows(spark, ref)


@pytest.mark.slow
def test_cdc_lifecycle_tracks_fresh_build(spark, tmp_path):
    docs = _docs(spark)
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")

    S.snap_write(docs.where(F.col("doc_id") % 5 != 0), table)
    assert sync_index_from_snapshot(spark, idx, table) == 0

    # insert wave
    S.snap_append(docs.where(F.col("doc_id") % 5 == 0), table)
    apply_index_cdc(spark, idx, table)
    assert _live_rows(spark, idx) == _fresh_rows(spark, docs, tmp_path, "f1")

    # update wave (MERGE rewrites text -> old generation must die)
    upd = docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.concat("text", F.lit(" spark")).alias("text")
    )
    S.snap_merge(spark, table, upd, "doc_id")
    apply_index_cdc(spark, idx, table)
    state2 = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" spark"))
        ).otherwise(F.col("text")),
    )
    assert _live_rows(spark, idx) == _fresh_rows(spark, state2, tmp_path, "f2")

    # delete wave
    S.snap_delete(spark, table, docs.where(F.col("doc_id") % 7 == 0), "doc_id")
    apply_index_cdc(spark, idx, table)
    state3 = state2.where(F.col("doc_id") % 7 != 0)
    assert _live_rows(spark, idx) == _fresh_rows(spark, state3, tmp_path, "f3")

    # stats track the live corpus exactly -> BM25 is bit-identical
    n, s = _doc_stats(state3)
    assert read_index_stats(idx) == (n, s)
    got = sorted(map(tuple, bm25_query(spark, idx, TERMS).collect()))
    want = sorted(
        map(
            tuple,
            bm25_query(
                spark,
                (lambda p: (write_inverted_index(state3, p), p)[1])(
                    str(tmp_path / "fresh_q")
                ),
                TERMS,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert synced_version(idx) == 3


@pytest.mark.slow
def test_delete_then_reinsert_survives_tombstone(spark, tmp_path):
    docs = _docs(spark)
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    S.snap_write(docs, table)
    sync_index_from_snapshot(spark, idx, table)

    victim = docs.where(F.col("doc_id") == 7)
    S.snap_delete(spark, table, victim, "doc_id")
    apply_index_cdc(spark, idx, table)
    assert (
        read_postings(spark, idx).where(F.col("doc_id") == 7).count() == 0
    )

    # reinsert the same key at a LATER version: its new generation must
    # outlive the old tombstone (ver >= cutoff)
    S.snap_append(victim, table)
    apply_index_cdc(spark, idx, table)
    live = _live_rows(spark, idx)
    assert live == _fresh_rows(spark, docs, tmp_path, "fresh")
    n, s = _doc_stats(docs)
    assert read_index_stats(idx) == (n, s)


def test_noop_cdc_is_stable(spark, tmp_path):
    docs = _docs(spark)
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    S.snap_write(docs, table)
    sync_index_from_snapshot(spark, idx, table)
    before = (read_index_stats(idx), synced_version(idx))
    apply_index_cdc(spark, idx, table)  # already at latest
    assert (read_index_stats(idx), synced_version(idx)) == before


def test_unsynced_index_raises(spark, tmp_path):
    docs = _docs(spark)
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    S.snap_write(docs, table)
    write_inverted_index(docs, idx)  # plain build: no synced_version
    try:
        apply_index_cdc(spark, idx, table)
    except ValueError as exc:
        assert "sync_index_from_snapshot" in str(exc)
    else:
        raise AssertionError("expected ValueError")


@pytest.mark.slow
def test_compaction_materializes_tombstones(spark, tmp_path):
    import glob
    import os

    from cargo_chat_spark.sources.inverted_index import (
        _postings_path,
        _tombstones_path,
        compact_index_tombstones,
    )

    docs = _docs(spark)
    table = str(tmp_path / "table")
    idx = str(tmp_path / "idx")
    S.snap_write(docs, table)
    sync_index_from_snapshot(spark, idx, table)
    S.snap_delete(spark, table, docs.where(F.col("doc_id") % 7 == 0), "doc_id")
    apply_index_cdc(spark, idx, table)

    before_rows = _live_rows(spark, idx)
    before_bm25 = sorted(map(tuple, bm25_query(spark, idx, TERMS).collect()))
    all_files = set(glob.glob(os.path.join(_postings_path(idx), "*", "*.parquet")))

    n = compact_index_tombstones(spark, idx)
    assert n > 0, "the delete wave must dirty at least one file"
    assert not os.path.isdir(_tombstones_path(idx))
    after_files = set(glob.glob(os.path.join(_postings_path(idx), "*", "*.parquet")))
    # clean files survive by identity; dirty ones were replaced
    assert len(all_files & after_files) == len(all_files) - n

    assert _live_rows(spark, idx) == before_rows
    assert sorted(map(tuple, bm25_query(spark, idx, TERMS).collect())) == before_bm25

    # idempotent: nothing left to do
    assert compact_index_tombstones(spark, idx) == 0
