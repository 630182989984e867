"""Distributed BPE (operators/bpe.py): the Spark trainer must reproduce
the textbook in-memory algorithm merge-for-merge (ties included), the
encoder must agree with the trainer's final symbolization, and the
per-iteration pair-count aggregate must stay JVM-side (the Arrow stage
is only the merge application over pre-filtered rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators.bpe import (
    encode_words,
    initial_pair_counts,
    reference_bpe,
    train_bpe,
    word_freqs,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

# tie-heavy fixture: iteration 0 has three pairs at count 4 ('a a',
# 'e s', 'l o') so the lexicographic tie-break is exercised immediately
_WORDS = {
    "low": 3,
    "lower": 1,
    "newest": 3,
    "widest": 1,
    "aaaa": 1,
    "aa": 1,
    "a": 1,
}


def _wf(spark):
    return spark.createDataFrame(
        list(_WORDS.items()), "word string, freq bigint"
    )


def test_trainer_matches_reference_with_ties(spark):
    want = reference_bpe(_WORDS, 8)
    got, _ = train_bpe(_wf(spark), 8, checkpoint_every=3)
    assert got == want
    # hand-checked head: 'a a' wins the 3-way tie at count 4
    assert got[0] == ("a", "a", 4)
    assert [m[:2] for m in got[:5]] == [
        ("a", "a"), ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")
    ]


def test_trainer_on_corpus_prefix_matches_reference(spark):
    docs = load_table(spark, SF_DIR_SMALL, "documents").limit(40)
    wf = word_freqs(docs)
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    want = reference_bpe(freqs, 5)
    got, _ = train_bpe(wf, 5)
    assert got == want


def test_encoder_agrees_with_trainer_final_state(spark):
    merges, final = train_bpe(_wf(spark), 8)
    enc = encode_words(_wf(spark), merges)
    final_map = {r["word"]: r["syms"] for r in final.collect()}
    enc_map = {r["word"]: r["tokens"] for r in enc.collect()}
    assert enc_map == final_map
    # tokens reassemble the word exactly
    for w, toks in enc_map.items():
        assert "".join(toks) == w
    # something actually merged
    assert enc_map["aaaa"] == ["aa", "aa"]


def test_encoder_lowest_rank_first_not_training_order(spark):
    # rank 0 merges (s,t); rank 1 (e,st). For 'best' the ONLY valid
    # first step is rank 0 even though (e,s) appears earlier in the
    # word — pins lowest-rank-first over leftmost-first.
    out = encode_words(
        spark.createDataFrame([("best",)], "word string"),
        [("s", "t"), ("e", "st"), ("b", "est")],
    ).collect()
    assert out[0]["tokens"] == ["best"]


def test_pair_count_aggregate_is_jvm_side(spark):
    wf = _wf(spark)
    plan = (
        initial_pair_counts(wf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan, (
        "iteration pair counts must not cross into Python"
    )


def test_merge_stage_prefilters_untouched_rows(spark):
    # words without the merged pair must not enter the Arrow stage: the
    # exists() pre-filter keeps them JVM-side via the CASE WHEN branch
    wf = _wf(spark)
    _, state = train_bpe(wf, 1)
    # after merge ('a','a'): only the a-words change; others identical
    rows = {r["word"]: r["syms"] for r in state.collect()}
    assert rows["aaaa"] == ["aa", "aa"]
    assert rows["low"] == list("low")
