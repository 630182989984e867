"""Streaming ingest into a persisted inverted index.

The lexical twin of `streaming/dedup_ingest.py`: a continuous document
feed drains through Structured Streaming and each micro-batch appends
its postings to inverted-index state, becoming searchable for every
later BM25 query. Per-batch cost is O(batch) tokenize + partition
writes; the index is never rebuilt.

Exactly-once under foreachBatch's at-least-once contract — a stricter
problem than the dedup loop's (whose DISTINCT pair output absorbs
duplicates): double-appended postings would double tf. Two mechanisms:

- **Idempotent postings writes.** A streaming-managed index partitions
  postings by ``(batch, shard)``; batch N's write is a DYNAMIC partition
  overwrite of its own ``batch=N`` directories, so a replay rewrites
  identical files instead of appending duplicates. Shard pruning is
  unaffected (``shard`` stays a partition column).
- **Atomic stats publish as the commit point.** The corpus-stats sidecar
  carries ``stats_batch`` (the last batch folded in) and is replaced
  atomically (temp + ``os.replace``). It is written LAST: a crash
  anywhere earlier replays the idempotent overwrite and folds the stats
  exactly once; a crash after it makes the replay a fenced no-op.

Crash-window convergence is pinned by
tests/test_lexical_ingest_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.sources.inverted_index import (
    _doc_stats,
    _postings_path,
    _read_stats_raw,
    _write_stats,
    postings_of,
)


def lexical_ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    n_token_files: int = 4,
) -> None:
    """Ingest one micro-batch of NEW doc_ids (the foreachBatch body,
    also directly callable for tests/backfills)."""
    bid = int(batch_id)
    st = _read_stats_raw(index_path)
    if st.get("stats_batch", -1) >= bid:
        return  # fully applied (stats are the commit point)
    (
        postings_of(batch_df)
        .withColumn("batch", F.lit(bid))
        .repartitionByRange(n_token_files, "token")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "shard")
        .parquet(_postings_path(index_path))
    )
    n1, s1 = _doc_stats(batch_df)
    _write_stats(
        index_path,
        int(st.get("n_docs", 0)) + n1,
        int(st.get("sum_dl", 0)) + s1,
        stats_batch=bid,
    )


def read_lex_fence(index_path: str) -> int:
    """Highest fully-ingested batch id (-1 if none)."""
    return int(_read_stats_raw(index_path).get("stats_batch", -1))


def run_lexical_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain ``source_dir`` (availableNow) of (doc_id, text) parquet
    batches into the inverted index."""

    def _apply(batch_df, batch_id: int) -> None:
        lexical_ingest_batch(spark, batch_df, batch_id, index_path)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
