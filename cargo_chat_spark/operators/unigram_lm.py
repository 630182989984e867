"""Unigram-LM (SentencePiece-style) subword tokenizer with integer costs.

The second major tokenizer family next to BPE (operators/bpe.py): where
BPE greedily merges, the unigram model segments each word into the
MINIMUM-COST piece sequence under per-piece costs ≈ −log p(piece)
(Kudo 2018). Two engineering choices make the whole pipeline
value-hash deterministic across engines:

- **Quantized integer costs.** cost(p) packs a half-bit-resolution
  −log₂(cnt/total) band with an md5 tie-break:
  ``(floor(log2(total²)) − floor(log2(cnt²))) · 2³² + h32(p)``.
  floor(log2(x²)) is ``length(bin(x*x)) − 1`` — pure integer in Spark
  and DuckDB alike, no libm anywhere (a float log's 1-ulp divergence
  could flip a Viterbi argmin). Valid while cnt ≤ ~3·10⁹ per piece
  (x² within int64); corpus substring mass here is ~10⁶.
- **Almost-surely-unique path sums.** The 32-bit md5 term makes
  distinct pieces carry distinct costs, so distinct segmentations of a
  word collide on total cost with probability ~paths²/2³³ — and the
  residual tie is still pinned: both the DP kernel and the oracle
  break exact-cost ties by the lexicographically smallest
  space-joined piece string.

Scale shape: the candidate-piece count is one exploded-substring
aggregate over the WORD-FREQUENCY dict (never the raw corpus — the
bpe.word_freqs discipline); the vocabulary is a bounded global top-V
(TakeOrderedAndProject); encoding runs over dict rows (|unique words|,
not corpus tokens) with the bounded vocab in the kernel closure. The
corpus-level token stream then joins the (word → pieces) map exactly
like bpe_pack_tokens.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cargo_chat_spark.functions.hashing import h32_py

PIECE_MAX_LEN = 4
VOCAB_TOP = 80
_BAND = 1 << 32


def piece_counts(wf: DataFrame) -> DataFrame:
    """(piece, cnt): freq-weighted occurrence counts of every substring
    of length 1..PIECE_MAX_LEN over the word-frequency dict."""
    subs = F.expr(
        f"flatten(transform(sequence(1, length(word)), st -> "
        f"transform(sequence(1, least({PIECE_MAX_LEN}, length(word) - st + 1)), "
        f"l -> substring(word, st, l))))"
    )
    return (
        wf.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def piece_vocab(wf: DataFrame) -> DataFrame:
    """(piece, cnt, cost): global top-VOCAB_TOP pieces by
    (cnt DESC, piece ASC) plus ALL single characters (segmentation
    totality), with the quantized integer cost. The rank is a global
    window over the piece-count frame — bounded rows (substring types,
    not occurrences), TakeOrdered shape at scale."""
    from pyspark.sql import Window

    pc = piece_counts(wf)
    rk = F.row_number().over(
        Window.orderBy(F.desc("cnt"), F.asc("piece"))
    )
    kept = (
        pc.withColumn("rk", rk)
        .where((F.col("rk") <= VOCAB_TOP) | (F.length("piece") == 1))
        .drop("rk")
    )
    tot = kept.agg(F.sum("cnt").cast("bigint").alias("total"))
    bits2 = lambda c: F.expr(f"length(bin({c} * {c})) - 1")  # noqa: E731
    h32 = F.conv(F.substring(F.md5(F.col("piece")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        (
            (bits2("total") - bits2("cnt")).cast("bigint") * F.lit(_BAND)
            + h32
        ).alias("cost"),
    )


def vocab_cost_sql(wf_cte: str) -> str:
    """DuckDB twin of piece_vocab as a CTE chain ending in ``vocab``;
    caller embeds after a ``wf(word, freq)`` CTE named ``{wf_cte}``."""
    return f"""
pieces AS (
    SELECT substring(word, st, l) AS piece, freq
    FROM {wf_cte},
         unnest(generate_series(1, length(word))) AS ts(st),
         unnest(generate_series(1, {PIECE_MAX_LEN})) AS tl(l)
    WHERE st + l - 1 <= length(word)
),
pc AS (
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM pieces GROUP BY piece
),
keptv AS (
    SELECT piece, cnt FROM (
        SELECT piece, cnt,
               row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
        FROM pc
    ) WHERE rk <= {VOCAB_TOP} OR length(piece) = 1
),
vtot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM keptv),
vocab AS (
    SELECT piece, cnt,
        CAST((length(bin((SELECT total FROM vtot) * (SELECT total FROM vtot))) - 1)
           - (length(bin(cnt * cnt)) - 1) AS BIGINT) * {_BAND}
        + (('0x' || substring(md5(piece), 1, 8))::BIGINT) AS cost
    FROM keptv
)"""


def cost_py(piece: str, cnt: int, total: int) -> int:
    """Python mirror of the cost formula (tests)."""
    return (
        ((total * total).bit_length() - 1) - ((cnt * cnt).bit_length() - 1)
    ) * _BAND + h32_py(piece)


def viterbi_encode(
    words: DataFrame, vocab: dict[str, int]
) -> DataFrame:
    """Minimum-cost segmentation of each (word, freq) row under the
    piece→cost map — classic Viterbi DP, Arrow-batched; the inner loop
    is per dict word (|unique words| rows), never per corpus token.
    Exact-cost ties (md5-precluded up to ~2⁻³³ per word) break to the
    lexicographically smallest space-joined piece string, mirroring
    the oracle's ORDER BY (cost, pieces_str)."""
    max_len = PIECE_MAX_LEN
    inf = 1 << 62

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"word": [], "freq": [], "pieces_str": [], "n_pieces": [], "total_cost": []}
            for word, freq in zip(b["word"], b["freq"]):
                n = len(word)
                # best[i] = (cost, pieces_str) over segmentations of word[:i]
                best: list[tuple[int, str]] = [(0, "")] + [(inf, "")] * n
                for i in range(1, n + 1):
                    cand = None
                    for ln in range(1, min(max_len, i) + 1):
                        c = vocab.get(word[i - ln : i])
                        if c is None or best[i - ln][0] >= inf:
                            continue
                        pc, ps = best[i - ln]
                        t = (
                            pc + c,
                            (ps + " " + word[i - ln : i]) if ps else word[i - ln : i],
                        )
                        if cand is None or t < cand:
                            cand = t
                    if cand is not None:
                        best[i] = cand
                cost, pieces = best[n]
                if cost >= inf:
                    # unreachable while all single chars are in vocab
                    raise ValueError(f"unsegmentable word: {word!r}")
                out["word"].append(word)
                out["freq"].append(int(freq))
                out["pieces_str"].append(pieces)
                out["n_pieces"].append(pieces.count(" ") + 1)
                out["total_cost"].append(cost)
            yield pd.DataFrame(out)

    return words.select("word", "freq").mapInPandas(
        kernel,
        "word string, freq bigint, pieces_str string, n_pieces int, "
        "total_cost bigint",
    )
