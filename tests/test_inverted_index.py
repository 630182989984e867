"""Persisted inverted index (sources/inverted_index.py): incremental
waves must equal a single build, the term lookup must prune shard
partitions and push the token filter, the persisted BM25 must equal the
batch recompute bit-for-bit, and the stats sidecar must stay additive."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.sources.inverted_index import (
    append_inverted_index,
    bm25_query,
    read_index_stats,
    read_postings,
    shard_of,
    write_inverted_index,
)
from cargo_chat_spark.sources import inverted_index as II
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

TERMS = ["spark", "join", "window"]


def _docs(spark):
    return load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_waves_equal_single_build(spark, tmp_path):
    docs = _docs(spark)
    once = str(tmp_path / "once")
    waves = str(tmp_path / "waves")
    write_inverted_index(docs, once)
    write_inverted_index(docs.where(F.col("doc_id") % 3 == 0), waves)
    for m in (1, 2):
        append_inverted_index(docs.where(F.col("doc_id") % 3 == m), waves)
    a = _rows(read_postings(spark, once))
    b = _rows(read_postings(spark, waves))
    assert a == b and len(a) > 0
    assert read_index_stats(once) == read_index_stats(waves)


def test_stats_sidecar_is_additive_and_exact(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    write_inverted_index(docs.limit(0), path)
    assert read_index_stats(path) == (0, 0)
    append_inverted_index(docs, path)
    n_docs, sum_dl = read_index_stats(path)
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    assert sum_dl == toks.count()
    assert n_docs == docs.where(F.length(F.trim("text")) > 0).count()


def test_term_lookup_prunes_shards_and_pushes_filter(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)
    plan = (
        read_postings(spark, path, TERMS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    shards = sorted({shard_of(t) for t in TERMS})
    assert "PartitionFilters" in plan and "shard" in plan, plan[:500]
    assert "PushedFilters" in plan and "token" in plan
    # the scan's partition filter names the probe shards only
    got = read_postings(spark, path, TERMS).select("shard").distinct()
    assert {r["shard"] for r in got.collect()} <= set(shards)


def test_persisted_bm25_equals_batch_gate(spark, tmp_path):
    # compare FULL score sets (not just top-20) against the batch
    # recompute — the persisted path must be bit-identical
    from cargo_chat_spark.queries.hybrid import _bm25_scored

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    write_inverted_index(docs.where(F.col("doc_id") % 2 == 0), path)
    append_inverted_index(docs.where(F.col("doc_id") % 2 == 1), path)
    got = _rows(bm25_query(spark, path, TERMS))
    want = _rows(_bm25_scored(spark, SF_DIR_SMALL))
    assert got == want and len(got) > 0


def test_empty_index_raises(spark, tmp_path):
    path = str(tmp_path / "idx")
    try:
        bm25_query(spark, path, TERMS)
    except ValueError as exc:
        assert "empty" in str(exc)
    else:
        raise AssertionError("expected ValueError")


@pytest.mark.slow
def test_positions_invariant_and_phrase_cdc_interplay(spark, tmp_path):
    """tf == size(positions) for every posting; phrase matches served
    from a CDC-maintained index drop with a deleted doc and follow an
    updated doc's NEW text (tombstone-aware phrase path)."""
    from cargo_chat_spark.sources.snapshots import (
        snap_delete,
        snap_merge,
        snap_write,
    )

    docs = [
        (1, "alpha beta alpha beta"),
        (2, "alpha x beta"),
        (3, "alpha beta gamma"),
    ]
    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "idx")
    snap_write(
        spark.createDataFrame(docs, "doc_id bigint, text string"), tbl
    )
    II.sync_index_from_snapshot(spark, idx, tbl)

    p = II.read_postings(spark, idx)
    assert p.where(F.col("tf") != F.size("positions")).count() == 0

    def matches():
        return {
            r["doc_id"]: r["n_matches"]
            for r in II.phrase_query(spark, idx, ("alpha", "beta")).collect()
        }

    assert matches() == {1: 2, 3: 1}

    # update doc 3 to break the phrase; delete doc 1
    snap_merge(
        spark, tbl,
        spark.createDataFrame(
            [(3, "alpha gamma beta")], "doc_id bigint, text string"
        ),
        "doc_id",
    )
    snap_delete(
        spark, tbl,
        spark.createDataFrame([(1,)], "doc_id bigint"), "doc_id",
    )
    II.apply_index_cdc(spark, idx, tbl)
    assert matches() == {}
    # and compaction preserves the (empty) phrase answer
    II.compact_index_tombstones(spark, idx)
    assert matches() == {}
