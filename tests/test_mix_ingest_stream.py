"""Streaming token-budget mixture (streaming/mix_ingest.py): in-order
waves must reproduce the batch gate exactly, clean replays are fenced
no-ops, and the crash window (kept rows written, sidecar not yet
published) converges byte-identical on replay."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cargo_chat_spark.queries.sampling import _MIX_BUDGET, token_budget_mix
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming.mix_ingest import (
    mix_ingest_batch,
    read_mix_report,
    read_mix_state,
    run_mix_ingest_stream,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

_SCHEMA = "doc_id bigint, source string, text string"


def _docs(spark):
    return load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "source", "text"
    )


def _batch_want(spark):
    return {
        (r["source"], r["n_docs_kept"], r["tokens_kept"], r["last_doc"])
        for r in token_budget_mix(spark, SF_DIR_SMALL).collect()
    }


def _got(spark, out):
    return {
        (r["source"], r["n_docs_kept"], r["tokens_kept"], r["last_doc"])
        for r in read_mix_report(spark, out).collect()
    }


def _waves(spark, docs, src_dir, cuts):
    lo = None
    for i, hi in enumerate(cuts):
        w = docs.where(F.col("doc_id") < hi)
        if lo is not None:
            w = w.where(F.col("doc_id") >= lo)
        w.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"wave{i}")
        )
        lo = hi


def test_in_order_stream_equals_batch_gate(spark, tmp_path):
    docs = _docs(spark)
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # id-ordered waves: the file stream lists files in discovery order;
    # drive the batches DIRECTLY to make the order deterministic
    cuts = [hi // 3, 2 * hi // 3, hi]
    _waves(spark, docs, src, cuts)
    for i in range(3):
        wave = spark.read.parquet(os.path.join(src, f"wave{i}"))
        mix_ingest_batch(spark, wave, i, out, _MIX_BUDGET)
    assert _got(spark, out) == _batch_want(spark)
    # clean replay of every batch: fence no-ops, state unchanged
    st = read_mix_state(out)
    for i in range(3):
        wave = spark.read.parquet(os.path.join(src, f"wave{i}"))
        mix_ingest_batch(spark, wave, i, out, _MIX_BUDGET)
    assert read_mix_state(out) == st
    assert _got(spark, out) == _batch_want(spark)


def test_crash_window_replay_is_byte_identical(spark, tmp_path):
    docs = _docs(spark)
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _waves(spark, docs, src, [hi // 2, hi])
    w0 = spark.read.parquet(os.path.join(src, "wave0"))
    w1 = spark.read.parquet(os.path.join(src, "wave1"))
    mix_ingest_batch(spark, w0, 0, out, _MIX_BUDGET)
    fenced_report = _got(spark, out)
    # crash window for batch 1: kept rows land, sidecar does NOT
    st_before = read_mix_state(out)
    mix_ingest_batch(spark, w1, 1, out, _MIX_BUDGET)
    import json

    with open(out.rstrip("/") + ".mix_state.json", "w") as fh:
        json.dump(st_before, fh)  # roll the sidecar back = the crash
    # ADVICE-r8 pin: the UNFENCED batch=1 dir is invisible to readers —
    # the report during the crash window equals the last fenced state,
    # never a transient over-count
    assert _got(spark, out) == fenced_report
    rows_in_window = sorted(
        map(tuple, spark.read.parquet(os.path.join(out, "batch=1")).collect())
    )
    mix_ingest_batch(spark, w1, 1, out, _MIX_BUDGET)  # the replay
    # the replay's decisions are byte-identical (same prior totals)
    assert sorted(
        map(tuple, spark.read.parquet(os.path.join(out, "batch=1")).collect())
    ) == rows_in_window
    assert _got(spark, out) == _batch_want(spark)


def test_available_now_drain_matches_batch(spark, tmp_path):
    """The real Structured Streaming drive: one availableNow drain over
    the wave files; file-source ordering is id-ordered here because the
    waves are disjoint id ranges written in order."""
    docs = _docs(spark)
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lo = None
    for cut in (hi // 3, 2 * hi // 3, hi):
        w = docs.where(F.col("doc_id") < cut)
        if lo is not None:
            w = w.where(F.col("doc_id") >= lo)
        w.coalesce(1).write.mode("append").parquet(src)  # flat feed dir
        lo = cut
    run_mix_ingest_stream(spark, src, _SCHEMA, out, ckpt, _MIX_BUDGET)
    # the drain may group waves into fewer micro-batches; the kept set
    # must still equal the batch gate because delivery stayed id-ordered
    assert _got(spark, out) == _batch_want(spark)


def test_lost_or_corrupt_sidecar_fails_loud(spark, tmp_path):
    """ADVICE r9: a store with intact fenced data must never yield an
    empty report silently. Pins: (a) corrupt sidecar raises on read
    (defaulting would restart totals AND fence out intact data);
    (b) sidecar deleted while batch dirs exist → read_mix_report raises
    instead of returning an empty frame; (c) a genuinely empty store
    (no sidecar, no data) still reads as the -1 default state."""
    import pytest

    from cargo_chat_spark.streaming.mix_ingest import _state_path

    out = str(tmp_path / "mix")
    os.makedirs(out, exist_ok=True)
    docs = _docs(spark).where(F.col("doc_id") < 200)
    mix_ingest_batch(spark, docs, 0, out, _MIX_BUDGET)
    assert _got(spark, out)  # healthy store reads

    # (a) corrupt sidecar
    with open(_state_path(out), "w") as fh:
        fh.write("{broken")
    with pytest.raises(ValueError, match="unreadable"):
        read_mix_state(out)

    # (b) sidecar lost, data present
    os.remove(_state_path(out))
    with pytest.raises(ValueError, match="no state sidecar"):
        read_mix_report(spark, out)

    # (c) genuinely empty store
    empty = str(tmp_path / "empty")
    os.makedirs(empty, exist_ok=True)
    assert read_mix_state(empty)["max_ingested_batch"] == -1
