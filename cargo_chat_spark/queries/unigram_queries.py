"""Unigram-LM tokenizer gates (operators/unigram_lm.py).

Differential-algorithm oracle, the neardup_components precedent: the
Spark side segments by Viterbi DP (minimum-cost path, Arrow-batched
kernel); the DuckDB oracle ENUMERATES every segmentation of each word
through a recursive CTE and takes the per-word minimum — two
different algorithms that must agree exactly, which they can because
the cost table is pure-integer (no libm) and path sums are
md5-disambiguated (see the operator docstring).

- ``unigram_piece_vocab`` — the candidate-piece table (piece, cnt,
  cost): one exploded-substring aggregate over the word-freq dict +
  a bounded global top-V, all integer.
- ``unigram_viterbi_encode`` — minimum-cost segmentation of the
  TOP_WORDS highest-frequency words (the bpe_encode_sample window)
  under that vocabulary.

Together with the BPE family this gives the engine both of the
standard subword trainer/encoder shapes; fertility/compression cards
(bpe_compression_report, bpe_fertility_by_lang) apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cargo_chat_spark.caching import register_memo as memo_register
from cargo_chat_spark.operators import unigram_lm as U
from cargo_chat_spark.operators.bpe import word_freqs
from cargo_chat_spark.queries.bpe_queries import TOP_WORDS, _wf_cte
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

_VOCAB_SQL = f"""
WITH {_wf_cte()},{U.vocab_cost_sql('wf')}
SELECT piece, cnt, cost FROM vocab
"""

_ENCODE_SQL = f"""
WITH RECURSIVE {_wf_cte()},{U.vocab_cost_sql('wf')},
topw AS (
    SELECT word, freq FROM wf ORDER BY freq DESC, word ASC LIMIT {TOP_WORDS}
),
seg AS (
    SELECT word, CAST(freq AS BIGINT) AS freq, 0 AS pos,
           '' AS pieces_str, CAST(0 AS BIGINT) AS cost
    FROM topw
    UNION ALL
    SELECT s.word, s.freq, s.pos + length(v.piece),
           CASE WHEN s.pieces_str = '' THEN v.piece
                ELSE s.pieces_str || ' ' || v.piece END,
           s.cost + v.cost
    FROM seg s JOIN vocab v
      ON s.pos < length(s.word)
     AND length(v.piece) <= length(s.word) - s.pos
     AND substring(s.word, s.pos + 1, length(v.piece)) = v.piece
)
SELECT word, freq, pieces_str,
       CAST(length(pieces_str) - length(replace(pieces_str, ' ', ''))
            + 1 AS INT) AS n_pieces,
       cost AS total_cost
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY word ORDER BY cost, pieces_str
    ) AS rn
    FROM seg WHERE pos = length(word)
) WHERE rn = 1
"""

_VOCAB_MEMO: dict = {}
memo_register(_VOCAB_MEMO)


def _vocab_map(spark, sf_dir) -> dict[str, int]:
    """piece → cost, collected once per (session, sf_dir). Bounded:
    VOCAB_TOP + alphabet rows (the merges-list discipline — a model
    artifact, not a data collect)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _VOCAB_MEMO.get(key)
    if cached is None:
        wf = word_freqs(load_table(spark, sf_dir, "documents"))
        cached = {
            r["piece"]: r["cost"]
            for r in U.piece_vocab(wf).collect()
        }
        _VOCAB_MEMO[key] = cached
    return cached


@register("unigram_piece_vocab", sql=_VOCAB_SQL)
def unigram_piece_vocab(spark, sf_dir):
    """The unigram candidate-piece table with quantized integer costs
    (top-80 substrings by weighted count + every single character)."""
    wf = word_freqs(load_table(spark, sf_dir, "documents"))
    return U.piece_vocab(wf)


@register("unigram_viterbi_encode", sql=_ENCODE_SQL)
def unigram_viterbi_encode(spark, sf_dir):
    """Minimum-cost Viterbi segmentation of the TOP_WORDS most frequent
    words under the unigram piece vocabulary — checked against an
    exhaustive-enumeration oracle (recursive CTE over all
    segmentations)."""
    wf = word_freqs(load_table(spark, sf_dir, "documents"))
    # top-TOP_WORDS via TakeOrderedAndProject — rank only selects, so no
    # window at all (the global sort never leaves the map side)
    topw = (
        wf.orderBy(F.desc("freq"), F.asc("word"))
        .limit(TOP_WORDS)
        .select("word", F.col("freq").cast("bigint").alias("freq"))
    )
    return U.viterbi_encode(topw, _vocab_map(spark, sf_dir))
