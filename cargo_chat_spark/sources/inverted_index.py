"""Persisted inverted index — incremental lexical (BM25) search state.

Completes the persisted-index triad: ANN cells (`index_io.
upsert_index_cells`), near-dup band store (`band_store.py`), and now the
lexical posting lists a production retrieval stack pairs with them. The
batch `bm25_topk` gate recomputes tf/df/dl from the corpus per query;
at 100 TB the index is built ONCE and queried forever:

- **Layout.** Postings `(token, doc_id, tf, dl)` partitioned by
  ``shard = crc32(token) % n_shards`` and token-sorted within each shard
  file, so a term lookup prunes to |terms| shard partitions (partition
  pruning, plan-pinned) and parquet row-group min/max stats line up with
  the pushed ``token IN (...)`` filter. The document length rides IN the
  posting row (the classic forward-index denormalization, +8 bytes/row):
  query-time scoring needs NO join against an O(corpus) doc-length
  table — one pruned scan is the whole read.
- **Corpus stats** (n_docs, sum_dl — BM25's avgdl numerator) live in a
  JSON sidecar maintained additively on append; integer-exact, so the
  persisted path scores bit-identically to the batch recompute.
- **Appends are O(wave)**: a new wave's postings append into the shard
  partitions without touching existing files; waves must carry NEW
  doc_ids (the ingest contract every store in this family shares —
  re-ingest goes through the snapshot MERGE path instead).

The df of a term is exactly its pruned-scan row count (each doc
contributes one posting per distinct term), so df/idf need no separate
maintained table.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D

_POSTINGS_SUBDIR = "postings"
_STATS_SUFFIX = ".stats.json"
N_SHARDS = 16


def _postings_path(path: str) -> str:
    return os.path.join(path, _POSTINGS_SUBDIR)


def _stats_path(path: str) -> str:
    # next to (not inside) the postings dir — an overwrite of the store
    # can never truncate it (the dedup_ingest fence precedent)
    return path.rstrip("/") + _STATS_SUFFIX


def shard_of(token: str, n_shards: int = N_SHARDS) -> int:
    """Driver-side twin of the Spark shard expression (crc32 of UTF-8
    bytes — zlib.crc32 == F.crc32)."""
    return zlib.crc32(token.encode("utf-8")) % n_shards


def postings_of(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(shard, token, doc_id, tf, dl) posting rows for ``docs`` — same
    tokenizer as the batch BM25 gate (operators/dedup.py::tokens)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(D.tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    return tf.join(dl, "doc_id").select(
        F.pmod(F.crc32(F.col("token")), F.lit(n_shards)).cast("int").alias("shard"),
        "token",
        "doc_id",
        "tf",
        "dl",
    )


def _doc_stats(docs: DataFrame, text_col: str = "text") -> tuple[int, int]:
    """(n_docs, sum_dl) of a frame, counting docs with >=1 token —
    integer-exact, matching the batch gate's dl CTE."""
    row = (
        docs.select(F.size(D.tokens(F.col(text_col))).alias("n"))
        .where(F.col("n") > 0)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("sum_dl"),
        )
        .collect()[0]
    )
    return int(row["n_docs"] or 0), int(row["sum_dl"] or 0)


def _read_stats_raw(path: str) -> dict:
    try:
        with open(_stats_path(path)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def read_index_stats(path: str) -> tuple[int, int]:
    s = _read_stats_raw(path)
    try:
        return int(s["n_docs"]), int(s["sum_dl"])
    except (ValueError, KeyError):
        return 0, 0


def _write_stats(path: str, n_docs: int, sum_dl: int, **extra) -> None:
    """Atomic publish (temp + os.replace): the streaming ingest loop
    uses the stats file as its per-batch commit point."""
    tmp = _stats_path(path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"n_docs": n_docs, "sum_dl": sum_dl, **extra}, fh)
    os.replace(tmp, _stats_path(path))


def _write(p: DataFrame, path: str, mode: str, n_token_files: int) -> None:
    (
        p.repartitionByRange(n_token_files, "token")
        .sortWithinPartitions("token")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(_postings_path(path))
    )


def write_inverted_index(
    docs: DataFrame, path: str, n_token_files: int = 4
) -> None:
    """Create (or replace) the index from ``docs``."""
    _write(postings_of(docs), path, "overwrite", n_token_files)
    _write_stats(path, *_doc_stats(docs))


def append_inverted_index(
    docs: DataFrame, path: str, n_token_files: int = 4
) -> None:
    """Ingest a wave of NEW doc_ids: O(wave) partition appends + an
    additive stats update. Existing shard files are immutable."""
    _write(postings_of(docs), path, "append", n_token_files)
    n0, s0 = read_index_stats(path)
    n1, s1 = _doc_stats(docs)
    _write_stats(path, n0 + n1, s0 + s1)


def read_postings(
    spark: SparkSession, path: str, terms: list[str] | None = None
) -> DataFrame:
    """Posting rows, pruned to ``terms`` when given: the shard IN (...)
    predicate prunes partitions at planning time and token IN (...)
    pushes into the parquet scan (both plan-pinned by
    tests/test_inverted_index.py)."""
    p = spark.read.parquet(_postings_path(path))
    if terms is not None:
        shards = sorted({shard_of(t) for t in terms})
        p = p.where(F.col("shard").isin(shards)).where(
            F.col("token").isin(list(terms))
        )
    return p


def bm25_query(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scores from the persisted index: ONE pruned postings scan —
    df aggregates from the scanned rows, corpus stats come from the
    sidecar as plan literals, no O(corpus) table is touched. Scores are
    bit-identical to the batch recompute (same integer inputs, same
    float expression shape, 6-dp rounding)."""
    n_docs, sum_dl = read_index_stats(path)
    if n_docs == 0:
        raise ValueError(f"empty or missing index at {path}")
    avgdl = float(sum_dl) / float(n_docs)
    tf = read_postings(spark, path, terms)
    df = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = F.log(
        F.lit(1)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
