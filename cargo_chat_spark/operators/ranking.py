"""Reference retrieval ranking (SURVEY §2.5 O1-O7) as one window pass.

Reproduces apply_llm_based_filtering (/root/reference/src/hyde.rs:975-1215)
plus the final truncate(k) (hyde.rs:519) declaratively:

high-confidence code branch (wants_code AND confidence > 0.7):
  1. partition candidates into code/doc (filters.is_code)
  2. code sorted by (lang_match DESC when query.language set, distance)
  3. docs sorted by distance, capped at doc_limit:
       confidence > 0.8                      -> 0
       intent how_it_works, ≥3 code hits     -> 0, else 1
       intent implementation | debugging     -> 0
       intent explanation                    -> 1
       other                                 -> 0
  4. code first, then allowed docs
else branch:
  sort by (is_doc_simple DESC when NOT wants_code, distance)

The reference relies on stable Vec sorts for tie order; Spark sorts are not
stable across partitions, so every ordering adds the chunk_id tie-break
(SURVEY §2.11) — this makes results totally ordered and oracle-hashable.

Physical shape: everything is expressed as window functions over
(query_id) — Catalyst plans ONE shuffle on query_id shared by all four
windows (count, doc_rank, rank), and WindowGroupLimit prunes per-partition
before the exchange for the final rank<=k filter. No driver-side loops, no
UDFs; scales with executors × candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cargo_chat_spark.functions.language import detect_language_expr
from cargo_chat_spark.operators import filters


def lang_match(language: Column, extension: Column, target_lang: Column) -> Column:
    """O5 language match (hyde.rs:1065-1103): metadata language equals the
    target case-insensitively, OR the extension-detected language's display
    name does."""
    meta_match = F.lower(language) == F.lower(target_lang)
    ext_match = F.lower(detect_language_expr(extension)) == F.lower(target_lang)
    return F.coalesce(meta_match, F.lit(False)) | F.coalesce(ext_match, F.lit(False))


def reference_rank(
    candidates: DataFrame, k_col: str = "k", final_sort: bool = True
) -> DataFrame:
    """Input: candidate rows already joined with their query's
    classification columns (query_id, chunk_id, file, extension, language,
    distance, wants_code, confidence, intent, q_language, k).

    Output: rows surviving filtering + doc caps + truncate(k), with a
    1-based ``rank`` encoding the reference's output order.

    ``final_sort=True`` models the full retrieve(): after truncate(k) the
    reference re-sorts the survivors purely by ascending distance
    (hyde.rs:545-552, non-rerank path) — the tier order only chooses WHICH
    rows survive. ``final_sort=False`` stops at the selection order, i.e.
    the output of apply_llm_based_filtering itself (what the reference's
    unit tests assert against, hyde.rs:1451-1549).
    """
    branch_a = filters.high_confidence_code(F.col("wants_code"), F.col("confidence"))
    code = filters.is_code(F.col("extension"), F.col("file"))
    doc_simple = filters.is_doc_simple(F.col("extension"))
    lmatch = lang_match(F.col("language"), F.col("extension"), F.col("q_language"))

    df = (
        candidates.withColumn("_branch_a", branch_a)
        .withColumn("_is_code", code)
        # tier: branch A puts code first; branch B puts docs first only
        # when NOT wants_code (hyde.rs:1184-1205)
        .withColumn(
            "_tier",
            F.when(F.col("_branch_a"), F.when(code, 0).otherwise(1)).otherwise(
                F.when(~F.col("wants_code") & doc_simple, 0).otherwise(1)
            ),
        )
        # language priority applies only in branch A, to code rows, when the
        # classification carries a language (hyde.rs:1065-1103)
        .withColumn(
            "_langkey",
            F.when(
                F.col("_branch_a")
                & code
                & F.col("q_language").isNotNull()
                & lmatch,
                0,
            ).otherwise(1),
        )
    )

    per_query = Window.partitionBy("query_id")
    code_count = F.sum(F.when(F.col("_branch_a") & F.col("_is_code"), 1).otherwise(0)).over(
        per_query
    )

    doc_window = Window.partitionBy("query_id", "_is_code").orderBy(
        F.asc("distance"), F.asc("chunk_id")
    )
    df = (
        df.withColumn("_code_count", code_count)
        .withColumn("_doc_rank", F.row_number().over(doc_window))
        .withColumn(
            "_doc_limit",
            F.when(F.col("confidence") > 0.8, 0).otherwise(
                F.when(
                    F.col("intent") == "how_it_works",
                    F.when(F.col("_code_count") >= 3, 0).otherwise(1),
                )
                .when(F.col("intent").isin("implementation", "debugging"), 0)
                .when(F.col("intent") == "explanation", 1)
                .otherwise(0)
            ),
        )
        .withColumn(
            "_included",
            ~F.col("_branch_a")
            | F.col("_is_code")
            | (F.col("_doc_rank") <= F.col("_doc_limit")),
        )
    )

    # The tiered order only decides WHICH rows survive truncate(k); the
    # reference then re-sorts the truncated results purely by ascending
    # distance (hyde.rs:545-552, non-rerank path). That Vec sort is STABLE:
    # on exact distance ties it preserves the tiered selection order — so
    # the final window tie-breaks on _sel_rank (the selection rank), not
    # chunk_id (ADVICE r2). _sel_rank is unique per query, so the output
    # stays totally ordered and oracle-hashable.
    select_window = Window.partitionBy("query_id").orderBy(
        F.asc("_tier"), F.asc("_langkey"), F.asc("distance"), F.asc("chunk_id")
    )
    final_window = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("_sel_rank")
    )
    out = (
        df.where(F.col("_included"))
        .withColumn("_sel_rank", F.row_number().over(select_window))
        .where(F.col("_sel_rank") <= F.col(k_col))
    )
    rank_col = (
        F.row_number().over(final_window) if final_sort else F.col("_sel_rank")
    )
    return (
        out.withColumn("rank", rank_col)
        .drop(
            "_branch_a",
            "_is_code",
            "_tier",
            "_langkey",
            "_code_count",
            "_doc_rank",
            "_doc_limit",
            "_included",
            "_sel_rank",
        )
    )


def global_topk_ranked(
    df: DataFrame,
    order: list[Column],
    k: int,
    rank_col: str,
    cast: str = "int",
) -> DataFrame:
    """``row_number() OVER (ORDER BY <order>) <= k`` without a
    corpus-wide single-partition sort.

    Every global-top-k consumer previously ran the rank window over the
    FULL frame — Spark 4.1 does not insert a WindowGroupLimit for an
    empty partition spec, so at scale all rows move to one partition
    (the bench-tail "No Partition Defined for Window" warnings,
    optimization guide §2.1). ``orderBy(...).limit(k)`` instead plans as
    TakeOrderedAndProject — a map-side per-partition top-k plus an
    O(partitions x k) driver merge — and the rank window then runs over
    exactly k rows. Output-identical to the window-then-filter form
    BECAUSE the callers' orderings are total (explicit id tie-break):
    the global top-k set and the ranks within it are the same rows in
    the same order.
    """
    top = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w).cast(cast))
