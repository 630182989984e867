"""Persisted RP-LSH forest index — the scale path for the forest ANN.

The batch gate (queries/ann_lsh.py::rp_lsh_forest_topk) recomputes every
corpus vector's 12 table keys PER QUERY RUN — the round-8 decade probe
measured that as the most data-proportional headline kernel (exponent
0.78: 10x corpus → 6.1x wall). This store materializes the keys once:

- Layout: (vec_id, t, bkey) POSTING rows — the vector itself is NOT
  duplicated into the 12 tables (12x key storage, 1x vector storage —
  the production forest trade; the reference's RP forest keeps 16 full
  trees, ann.rs:254). Partitioned by table id ``t``, bkey-range-
  clustered and bkey-sorted files within each partition so probe-side
  runtime filters land on aligned row-group stats (the band_store
  discipline, sources/band_store.py).
- Probe: the query batch's keys (same NumPy kernel, bit-identical to
  the HOF/SQL forms) BROADCAST; the store side reaches the (t, bkey)
  equi-join unshuffled; candidate ids dedup and fetch their vectors
  from the base embeddings table for the exact re-rank. Per-probe cost
  is O(|Q| keys + matching buckets + candidate fetch), independent of
  how the corpus keys were produced.
- Append: a new vector wave appends its posting rows — existing files
  immutable, O(wave).

Results are BIT-IDENTICAL to the batch forest gate (same keys, same
distances, same tie-breaks), so the persisted gate shares its DuckDB
oracle verbatim — the bm25_topk_persisted precedent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cargo_chat_spark.functions import vectors
from cargo_chat_spark.queries.ann_lsh import _forest_keys_numpy

_FOREST_SUBDIR = "forest"


def _forest_path(path: str) -> str:
    return os.path.join(path, _FOREST_SUBDIR)


def write_forest_store(
    emb: DataFrame, path: str, n_key_files: int = 4, mode: str = "overwrite"
) -> None:
    """Materialize the forest postings for ``emb`` (vec_id, embedding)."""
    keys = _forest_keys_numpy(
        emb.select("vec_id", "embedding"),
        "embedding", "vec_id", "vec_id", "embedding",
    ).select("vec_id", "t", "bkey")
    (
        keys.repartitionByRange(n_key_files, "bkey")
        .sortWithinPartitions("bkey")
        .write.mode(mode)
        .partitionBy("t")
        .parquet(_forest_path(path))
    )


def append_forest_store(
    emb: DataFrame, path: str, n_key_files: int = 4
) -> None:
    """Ingest a vector wave: append its posting rows (O(wave))."""
    write_forest_store(emb, path, n_key_files, mode="append")


def read_forest_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(_forest_path(path))


def probe_forest_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    emb: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` neighbors for ``queries`` (query_id, qvec) against the
    persisted forest, exact re-rank over the union of the queries'
    bucket candidates. ``emb`` is the base vector table the candidate
    ids fetch from (the store holds postings, not vectors)."""
    qkeys = _forest_keys_numpy(
        queries.select(
            F.col("query_id").alias("vec_id"),
            F.col("qvec").alias("embedding"),
        ),
        "embedding", "vec_id", "query_id", "qvec",
    )
    store = read_forest_store(spark, path)
    cand = (
        store.join(F.broadcast(qkeys), ["t", "bkey"])
        .select("query_id", "qvec", "vec_id")
        .distinct()
    )
    dim = vectors.infer_dim(emb, "embedding")
    dist = F.expr(vectors.euclidean_fixed_sql("`qvec`", "`embedding`", dim))
    scored = cand.join(emb.select("vec_id", "embedding"), "vec_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dist.alias("distance"),
    )
    w = Window.partitionBy("query_id").orderBy("distance", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
