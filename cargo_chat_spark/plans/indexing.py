"""The ``index`` entry point as a Spark pipeline (SURVEY §3.1).

Reference shape (main.rs:274-382): walk → chunk → embed(batch 32, join_all)
→ build ANN → persist JSON. Spark shape: scan DF → char-window explode →
mapInPandas embed (Arrow-batched, per-executor provider instance) → parquet
index + profile aggregates. Sequential single-thread chunking becomes
executor-parallel; the ANN build disappears (exact kNN is a query-time
window; LSH/IVF are alternative query paths).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cargo_chat_spark.functions.language import detect_language_expr, is_supported_extension
from cargo_chat_spark.operators.chunking import chunk_text
from cargo_chat_spark.sources.index_io import write_index


def _embed_map_fn(provider_factory, text_col: str, dim: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        provider = provider_factory()  # once per Python worker task
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(embedding=pd.Series([], dtype=object))
                continue
            vecs = provider.embed_batch(pdf[text_col].tolist())
            for v in vecs:
                if len(v) != dim:
                    # P7 dim validation (embedding.rs:119-125)
                    raise ValueError(f"embedding dim {len(v)} != {dim}")
            out = pdf.copy()
            out["embedding"] = vecs
            yield out

    return fn


def embed_chunks(chunks: DataFrame, provider_factory, dim: int) -> DataFrame:
    """M1 as an Arrow-batched mapInPandas stage. provider_factory is
    pickled to executors; the provider loads once per task (the
    per-executor-singleton pattern for model weights, SURVEY §4)."""
    schema = chunks.schema.simpleString().rstrip(">")[len("struct<"):]
    out_schema = f"{schema},embedding:array<double>"
    return chunks.mapInPandas(
        _embed_map_fn(provider_factory, "chunk_text", dim), schema=out_schema
    )


def build_index(
    files: DataFrame,
    provider_factory,
    dim: int,
    index_dir: str | None = None,
    max_chars: int = 1000,
) -> DataFrame:
    """files(path, content, extension) → index DF (FIXTURES.md §2 schema).

    Mirrors execute_index_command (main.rs:274-382): F1 supported-extension
    filter → P3 chunking → M1 embedding → S6 sink."""
    supported = files.where(is_supported_extension(F.col("extension")))
    chunks = chunk_text(
        supported.withColumn("language", detect_language_expr(F.col("extension"))),
        text_col="content",
        id_cols=("path", "language", "extension"),
        max_chars=max_chars,
    )
    # chunk_id: deterministic hash of (path, seq) — unlike a global
    # row_number window this needs no single-partition sort, so id
    # assignment scales with executors (the reference's positional ids are
    # an artifact of its in-memory Vec, SURVEY §2.11)
    chunks = chunks.select(
        F.xxhash64("path", "chunk_seq").alias("chunk_id"),
        F.col("path").alias("file"),
        F.col("chunk_text"),
        "language",
        "extension",
    )
    embedded = embed_chunks(chunks, provider_factory, dim)
    index = embedded.select(
        "chunk_id",
        "file",
        F.col("chunk_text").alias("code"),
        "language",
        "extension",
        "embedding",
    )
    if index_dir:
        write_index(index, index_dir, dim)
    return index
