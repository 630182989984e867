"""Streaming Misra-Gries state must carry the batch sketch's exact
guarantees after draining overlapping arrival waves, and the fence must
make replayed folds no-ops (exactly-once under foreachBatch replay)."""

from __future__ import annotations

import json
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D
from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.streaming import heavy_hitters_stream as HH
from tests.conftest import SF_DIR_SMALL

K = 24


def _word_rows(docs):
    return docs.select(D.tokens(F.col("text")).alias("tk")).select(
        F.explode("tk").alias("item")
    )


@pytest.mark.slow
def test_stream_hh_guarantees_and_fence(spark, tmp_path):
    docs = load_table(spark, SF_DIR_SMALL, "documents")
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    first = _word_rows(docs.where("doc_id % 2 = 0"))
    second = _word_rows(docs.where("doc_id % 2 = 1"))
    first.coalesce(1).write.mode("append").parquet(src)
    schema = first.schema
    HH.run_hh_stream(spark, src, schema, state, ckpt, K)
    second.coalesce(1).write.mode("append").parquet(src)
    HH.run_hh_stream(spark, src, schema, state, ckpt, K)

    truth = Counter(
        r["item"] for r in _word_rows(docs).collect()
    )
    n = sum(truth.values())
    fence = HH.read_hh_state(state)
    assert fence["n_total"] == n

    cand = {
        r["item"]: r["est"]
        for r in HH.read_heavy_hitters(spark, state).collect()
    }
    assert len(cand) <= K
    bound = n / (K + 1)
    for item, est in cand.items():
        assert est <= truth[item]
        assert truth[item] - est <= bound
    for item, cnt in truth.items():
        if cnt * (K + 1) > n:
            assert item in cand, f"stream dropped heavy hitter {item}"

    # a genuine foreachBatch replay (same checkpoint lineage, batch id
    # at-or-below the fence) must not re-fold: exactly-once on crash
    before = sorted(cand.items())
    HH.merge_batch_into_state(
        spark, first, 0, state, K, checkpoint=ckpt
    )
    after = sorted(
        (r["item"], r["est"])
        for r in HH.read_heavy_hitters(spark, state).collect()
    )
    assert after == before
    assert HH.read_hh_state(state)["n_total"] == n

    # a DIFFERENT checkpoint re-numbering batches from 0 is NOT a
    # replay — batch ids alias genuinely-new data, and the fence must
    # refuse rather than silently drop it (ADVICE r10)
    with pytest.raises(Exception, match="checkpoint"):
        HH.run_hh_stream(
            spark, src, schema, state, str(tmp_path / "ckpt2"), K
        )
    # ... and the refused run must leave the state untouched
    untouched = sorted(
        (r["item"], r["est"])
        for r in HH.read_heavy_hitters(spark, state).collect()
    )
    assert untouched == before
    assert HH.read_hh_state(state)["n_total"] == n

    # lineage identity survives path spelling: a trailing-slash respelling
    # of the SAME checkpoint is a valid resume, not a cross-lineage raise
    HH.merge_batch_into_state(
        spark, first, 0, state, K, checkpoint=ckpt + "/"
    )
    assert HH.read_hh_state(state)["n_total"] == n

    # the fence must not be DISARMABLE: a NEW fold through the
    # checkpoint=None API default (tests/backfills) must preserve the
    # stored lineage in the republished fence...
    HH.merge_batch_into_state(spark, first, 2, state, K)
    fence2 = HH.read_hh_state(state)
    assert fence2["max_batch"] == 2
    assert fence2["checkpoint"] == HH._canon_ckpt(ckpt)
    # ...so the cross-lineage refusal still fires afterwards
    with pytest.raises(Exception, match="checkpoint"):
        HH.run_hh_stream(
            spark, src, schema, state, str(tmp_path / "ckpt3"), K
        )


def test_corrupt_fence_raises(tmp_path):
    state = str(tmp_path / "state")
    with open(HH._fence_path(state), "w") as fh:
        fh.write("{not json")
    with pytest.raises(RuntimeError, match="unreadable"):
        HH.read_hh_state(state)


def test_unreadable_fence_oserror_raises(tmp_path):
    # a fence that EXISTS but cannot be opened (EISDIR standing in for
    # EACCES/EIO) must raise, not silently restart the fold from zero
    state = str(tmp_path / "state")
    (tmp_path / "state.hh_state.json").mkdir()
    with pytest.raises(RuntimeError, match="unreadable"):
        HH.read_hh_state(state)
    # only a genuinely-missing fence means "no state yet"
    assert HH.read_hh_state(str(tmp_path / "other")) is None


def test_truncate_reduce():
    c = {"a": 10, "b": 7, "c": 5, "d": 3}
    out = HH._truncate(dict(c), 2)
    # (k+1)-th largest of [10,7,5,3] with k=2 is 5 → subtract 5, keep >0
    assert out == {"a": 5, "b": 2}
    assert HH._truncate({"a": 1}, 4) == {"a": 1}


@pytest.mark.slow
def test_stream_hh_random_waves_model(spark, tmp_path):
    """Model-based randomized guard (the snapshots/index CDC test
    discipline): random Zipf token waves of random sizes drain through
    the stream one wave at a time; after EVERY drain the fenced state
    must satisfy the mergeable-summaries contract against a pure-Python
    Counter model of everything folded so far — underestimates only,
    bounded by N/(k+1), no heavy hitter missing."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(120)]
    weights = [1.0 / (i + 1) ** 1.4 for i in range(120)]
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    k = 16
    model = Counter()
    schema = None
    for wave in range(4):
        n = rng.randrange(500, 2500)
        words = rng.choices(vocab, weights, k=n)
        model.update(words)
        df = spark.createDataFrame([(w,) for w in words], "item string")
        schema = schema or df.schema
        df.coalesce(2).write.mode("append").parquet(src)
        HH.run_hh_stream(spark, src, schema, state, ckpt, k)

        total = sum(model.values())
        fence = HH.read_hh_state(state)
        assert fence["n_total"] == total, wave
        cand = {
            r["item"]: r["est"]
            for r in HH.read_heavy_hitters(spark, state).collect()
        }
        assert len(cand) <= k
        bound = total / (k + 1)
        for item, est in cand.items():
            assert est <= model[item], (wave, item)
            assert model[item] - est <= bound, (wave, item)
        for item, cnt in model.items():
            if cnt * (k + 1) > total:
                assert item in cand, (wave, item, cnt)
