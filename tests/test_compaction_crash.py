"""The journaled-swap crash window, pinned on the two OLDER persisted
stores (band signatures, lexical postings) now that they share the
forest's crash-safe compaction (sources/_compaction.py — the round-9
ADVICE window existed identically in all three): crash AFTER every
dirty file is removed but BEFORE staged survivors move in; the next
maintenance run must recover to the exact pre-compaction logical rows.
The forest's own (more extensive) crash suite lives in
tests/test_forest_store.py."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.sources import _compaction as C
from cargo_chat_spark.sources import snapshots as S
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401


def _crash_mid_swap(monkeypatch, module):
    real = module._complete_compaction_swap

    def crashing(path, journal):
        for f in journal["dirty"]:
            if os.path.exists(f):
                os.remove(f)
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(module, "_complete_compaction_swap", crashing)
    return real


@pytest.mark.slow
def test_band_compaction_crash_recovers(spark, tmp_path, monkeypatch):
    import cargo_chat_spark.sources.band_store as bs

    docs = load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    ).limit(40)
    table = str(tmp_path / "t")
    store = str(tmp_path / "b")
    S.snap_write(docs, table)
    bs.sync_band_store_from_snapshot(spark, store, table)
    upd = docs.where(F.col("doc_id") % 3 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" resigned"))
    )
    S.snap_merge(spark, table, upd, "doc_id")
    bs.apply_band_cdc(spark, store, table)

    def live():
        return sorted(
            map(
                tuple,
                bs.read_band_store_live(spark, store)
                .select("doc_id", "band", "key")
                .collect(),
            )
        )

    want = live()
    real = _crash_mid_swap(monkeypatch, bs)
    with pytest.raises(RuntimeError, match="simulated crash"):
        bs.compact_band_tombstones(spark, store)
    monkeypatch.setattr(bs, "_complete_compaction_swap", real)
    assert bs.compact_band_tombstones(spark, store) == 0  # resumes first
    assert live() == want
    assert not os.path.exists(C.journal_path(store))


@pytest.mark.slow
def test_index_compaction_crash_recovers(spark, tmp_path, monkeypatch):
    import cargo_chat_spark.sources.inverted_index as ii

    docs = load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "text"
    ).limit(40)
    table = str(tmp_path / "t")
    idx = str(tmp_path / "i")
    S.snap_write(docs, table)
    ii.sync_index_from_snapshot(spark, idx, table)
    upd = docs.where(F.col("doc_id") % 3 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" retok"))
    )
    S.snap_merge(spark, table, upd, "doc_id")
    ii.apply_index_cdc(spark, idx, table)

    def live():
        return sorted(
            map(
                tuple,
                ii.read_postings(spark, idx)
                .select("doc_id", "token", "tf")
                .collect(),
            )
        )

    want = live()
    real = _crash_mid_swap(monkeypatch, ii)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ii.compact_index_tombstones(spark, idx)
    monkeypatch.setattr(ii, "_complete_compaction_swap", real)
    assert ii.compact_index_tombstones(spark, idx) == 0
    assert live() == want
    assert not os.path.exists(C.journal_path(idx))
