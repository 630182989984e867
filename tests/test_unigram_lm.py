"""Unigram-LM tokenizer guarantees (operators/unigram_lm.py): the
Viterbi kernel must equal brute-force enumeration over ALL
segmentations for arbitrary vocab/word inputs (the same differential
relationship the DuckDB oracle pins, exercised here on adversarial
random inputs), and the integer cost formula must mirror across
Python/Spark derivations."""

from __future__ import annotations

import random
from itertools import product

from cargo_chat_spark.operators import unigram_lm as U
from cargo_chat_spark.queries import catalog
from tests.conftest import SF_DIR_SMALL


def _all_segmentations(word: str, vocab: dict[str, int], max_len: int):
    """Yield (cost, pieces_str) for every full segmentation."""
    n = len(word)

    def rec(pos: int, cost: int, pieces: list[str]):
        if pos == n:
            yield (cost, " ".join(pieces))
            return
        for ln in range(1, min(max_len, n - pos) + 1):
            p = word[pos : pos + ln]
            if p in vocab:
                yield from rec(pos + ln, cost + vocab[p], pieces + [p])

    yield from rec(0, 0, [])


def test_viterbi_equals_bruteforce_random(spark):
    rng = random.Random(7)
    alphabet = "abcd"
    for trial in range(6):
        # random vocab: all single chars + random multi-char pieces
        vocab = {c: rng.randrange(1, 1 << 40) for c in alphabet}
        for _ in range(12):
            ln = rng.randrange(2, U.PIECE_MAX_LEN + 1)
            p = "".join(rng.choice(alphabet) for _ in range(ln))
            vocab[p] = rng.randrange(1, 1 << 40)
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9)))
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            [(w, i + 1) for i, w in enumerate(words)], "word string, freq long"
        )
        got = {
            r["word"]: (r["total_cost"], r["pieces_str"], r["n_pieces"])
            for r in U.viterbi_encode(df, vocab).collect()
        }
        for w in set(words):
            best = min(_all_segmentations(w, vocab, U.PIECE_MAX_LEN))
            assert got[w][0] == best[0], (trial, w)
            assert got[w][1] == best[1], (trial, w)
            assert got[w][2] == best[1].count(" ") + 1


def test_cost_formula_mirrors(spark):
    """cost_py must reproduce the Spark-derived vocab costs exactly."""
    rows = catalog.SPARK_QUERIES["unigram_piece_vocab"](
        spark, SF_DIR_SMALL
    ).collect()
    total = sum(r["cnt"] for r in rows)
    for r in rows:
        assert r["cost"] == U.cost_py(r["piece"], r["cnt"], total), r


def test_vocab_contains_alphabet_and_is_bounded(spark):
    rows = catalog.SPARK_QUERIES["unigram_piece_vocab"](
        spark, SF_DIR_SMALL
    ).collect()
    singles = {r["piece"] for r in rows if len(r["piece"]) == 1}
    # every char appearing in any word must be present (totality)
    corpus_chars = set()
    enc = catalog.SPARK_QUERIES["unigram_viterbi_encode"](
        spark, SF_DIR_SMALL
    ).collect()
    for r in enc:
        corpus_chars |= set(r["word"])
    assert corpus_chars <= singles
    assert len(rows) <= U.VOCAB_TOP + len(singles)
    # frequent multi-char pieces made it in, and encoding uses them
    assert any(len(r["piece"]) > 1 for r in rows)
    assert any(" " not in r["pieces_str"] and len(r["word"]) > 1 for r in enc) or any(
        len(p) > 1 for r in enc for p in r["pieces_str"].split(" ")
    )
