"""The ``query`` entry point as a Spark pipeline (SURVEY §3.2).

Reference lifecycle (hyde.rs:468-576): classify → HyDE → embed+search(k*2)
→ classification filters → truncate(k) → (rerank | distance sort) →
context assembly → answer stream.

Two modes:
- ``reference`` — post-filter semantics reproduced verbatim (over-fetch 2k,
  filters AFTER retrieval, possibly < k results — hyde.rs:500-519).
- ``improved`` — filters pushed BEFORE the kNN (predicate pushdown to the
  index scan; strictly better recall under filters, flagged as the
  non-reference mode per SURVEY §4).
"""

from __future__ import annotations

from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cargo_chat_spark.models.provider import Classification, ModelProvider
from cargo_chat_spark.operators import filters, ranking
from cargo_chat_spark.operators.knn import knn_join
from cargo_chat_spark.functions.localframe import local_frame


def _classification_df(
    spark: SparkSession, cls: Classification, query_id: int, k: int
) -> DataFrame:
    row = {
        "query_id": query_id,
        "q_language": cls.language,
        "intent": cls.intent,
        "wants_code": cls.wants_code,
        "confidence": float(cls.confidence),
        "target_folders": cls.target_folders,
        "target_extensions": cls.target_extensions,
        "exclude_patterns": cls.exclude_patterns,
        "k": k,
    }
    schema = (
        "query_id bigint, q_language string, intent string, wants_code boolean, "
        "confidence double, target_folders array<string>, "
        "target_extensions array<string>, exclude_patterns array<string>, k int"
    )
    return local_frame(spark, [row], schema)


def _with_chunk_index(hits: DataFrame) -> DataFrame:
    """Assign the reference's HydeResult.index: the 0-based enumerate
    position over the RAW k*2 similarity output, BEFORE filtering/rerank
    (hyde.rs:1227-1231). P6 prints this as Chunk ID, so when filters drop
    candidates the printed ids are non-contiguous, like the reference."""
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return hits.withColumn("chunk_index", (F.row_number().over(w) - 1).cast("int"))


def _apply_filters(df: DataFrame) -> DataFrame:
    return df.where(
        filters.folder_match(F.col("file"), F.col("target_folders"))
        & filters.extension_match(
            F.col("extension"), F.col("file"), F.col("target_extensions")
        )
        & filters.exclude_match(F.col("file"), F.col("exclude_patterns"))
    )


def _rerank_map_fn(provider_spec, query: str):
    """Arrow-batched (chunk_id, code) -> rerank_score kernel. The
    provider is instantiated INSIDE the Python worker when a factory is
    passed (the embed_chunks per-executor-singleton pattern — real
    cross-encoder weights load worker-side, never pickle); a stateless
    picklable instance (the mock) ships as-is. Scores are per-document
    (rerank.rs:7-19 scores each pair independently), so Arrow batch
    boundaries cannot change them."""
    from collections.abc import Iterator

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = (
            provider_spec
            if hasattr(provider_spec, "rerank_scores")
            else provider_spec()
        )
        for pdf in batches:
            scores = (
                provider.rerank_scores(query, pdf["code"].tolist())
                if len(pdf)
                else []
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "chunk_id": pdf["chunk_id"],
                    "rerank_score": pd.Series(scores, dtype="float64"),
                }
            )

    return fn


def retrieve(
    spark: SparkSession,
    index: DataFrame,
    query: str,
    k: int,
    provider: ModelProvider,
    use_rerank: bool = False,
    mode: str = "reference",
    rerank_distributed: bool | None = None,
) -> dict:
    """Full retrieve() (hyde.rs:468-576) under a pluggable provider.

    Returns {"classification", "hypothetical", "results" (DataFrame with
    rank order), "answer" (token iterator)}.
    """
    cls = provider.classify_query(query)  # M3 (driver-side: one tiny call)
    hypo = provider.hyde_document(query, cls.intent, 1000)  # M4
    # M2 — embeds the HYPOTHETICAL doc only, not the raw query
    # (hyde.rs:500, SURVEY §2.11)
    qvec = provider.embed_batch([hypo])[0]

    queries = local_frame(spark, 
        [(0, qvec)], "query_id bigint, query_vec array<double>"
    )
    cls_df = _classification_df(spark, cls, 0, k)

    corpus = index.withColumnRenamed("chunk_id", "vec_id")
    if mode == "improved":
        # predicate pushdown: filter the corpus BEFORE the distance scan.
        # The 2k over-fetch is kept — the intent doc-caps in reference_rank
        # depend on the retrieved set and still run afterwards, so fetching
        # exactly k could under-fill; the candidate set here is a strict
        # superset of reference mode's (any filtered row in the global
        # top-2k is also in the filtered top-2k).
        pre = corpus.crossJoin(F.broadcast(cls_df.drop("query_id", "k")))
        pre = _apply_filters(pre).select(corpus.columns)
        hits = knn_join(
            queries, pre, 2 * k,
            keep_corpus_cols=["file", "code", "language", "extension"],
        )
        joined = _with_chunk_index(hits).join(F.broadcast(cls_df), "query_id")
    else:
        hits = knn_join(
            queries, corpus, 2 * k,  # O2 over-fetch (hyde.rs:500)
            keep_corpus_cols=["file", "code", "language", "extension"],
        )
        joined = _with_chunk_index(hits).join(F.broadcast(cls_df), "query_id")
        joined = _apply_filters(joined)

    candidates = joined.select(
        "query_id",
        F.col("neighbor_id").alias("chunk_id"),
        "file", "code", "language", "extension", "distance", "chunk_index",
        "q_language", "intent", "wants_code", "confidence", "k",
    )
    ranked = ranking.reference_rank(candidates)

    if use_rerank:
        # M5/J2/O4: score (query, code) pairs, re-sort descending.
        # Default path is the EXECUTOR-SIDE Arrow stage (SURVEY M5's
        # mapInPandas mapping, hyde.rs:530-542): candidates never
        # round-trip through the driver, so the rerank scales with
        # executors like the embed stage does. The driver path survives
        # only for the small interactive case (k <= 50 → at most 2k=100
        # candidates, where one tiny in-process provider call beats a
        # Python-worker launch).
        if rerank_distributed is None:
            rerank_distributed = k > 50
        if rerank_distributed:
            score_df = ranked.select("query_id", "chunk_id", "code").mapInPandas(
                _rerank_map_fn(provider, query),
                schema="query_id bigint, chunk_id bigint, rerank_score double",
            ).drop("query_id")
        else:
            rows = ranked.select("chunk_id", "code").collect()
            scores = provider.rerank_scores(query, [r["code"] for r in rows])
            score_df = local_frame(spark, 
                [(r["chunk_id"], s) for r, s in zip(rows, scores)],
                "chunk_id bigint, rerank_score double",
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("rerank_score"), F.asc("chunk_id")
        )
        ranked = (
            ranked.join(F.broadcast(score_df), "chunk_id")
            .withColumn("rank", F.row_number().over(w))
        )

    # P6 context assembly — reference-exact prompt format (hyde.rs:645-740)
    from cargo_chat_spark.operators.context import assemble_prompt

    prompt_rows = assemble_prompt(
        ranked.withColumn("query_text", F.lit(query)), F.col("query_text")
    ).collect()
    prompt = prompt_rows[0]["user_prompt"] if prompt_rows else query
    answer = provider.synthesize_answer(prompt)  # M6

    return {
        "classification": asdict(cls),
        "hypothetical": hypo,
        "results": ranked,
        "answer": answer,
    }
