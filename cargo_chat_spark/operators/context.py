"""P6 context assembly, reference-exact format (SURVEY §2.2 P6).

Reproduces the prompt construction of /root/reference/src/hyde.rs:645-740
character-for-character:

- snippet block per candidate (idx+1 header, cleaned path, ".ext" suffix,
  " [LANG]" uppercased, %.3f distance, **Chunk ID** = the 0-based
  enumerate rank — the §2.11 quirk, NOT a corpus id)
- fence language = candidate language, defaulting to "rust" (the
  reference's unwrap_or("rust"), quirk preserved)
- intent-conditioned instruction (hyde.rs:688-694)
- system context from the repo profile description, else the generic line
- fixed investigative response template (hyde.rs:696-719)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INTENT_INSTRUCTIONS = {
    "how_it_works": "Focus on tracing the execution flow and explaining the algorithmic approach. Show how data moves through the system and what makes each component work internally.",
    "implementation": "Examine the code patterns and implementation techniques. Show concrete examples of how the system is built and what patterns can be reused.",
    "explanation": "Provide a comprehensive explanation that connects high-level concepts to specific implementation details. Make complex algorithms accessible while maintaining technical accuracy.",
    "debugging": "Analyze potential failure points and debugging strategies. Look for error patterns, edge cases, and areas for improvement in the provided code.",
}
DEFAULT_INSTRUCTION = "Analyze the code systematically to provide a complete understanding of how this part of the system works."

# The reference template contains trailing double-spaces on two lines
# (markdown hard breaks) — {SP2} placeholders keep them survivable under
# editor whitespace-stripping.
OUTPUT_TEMPLATE = """===== RESPONSE TEMPLATE =====

## 1. Analysis Overview
<One sentence restating the user's question and what you discovered>

## 2. Investigation Plan{SP2}
<2-4 bullets outlining your analytical approach based on the code references>

## 3. Code Analysis
<For each relevant code reference, explain:>
- **Code Reference X** (file_path): <explanation of what this code does and its role>
- **Key Functions/Structures:** <important symbols found>
- **Role in System:** <how this fits into the bigger picture>

## 4. System Flow & Architecture
<Narrative explanation connecting all the pieces:>
- <How the components interact>
- <Data flow through the system>{SP2}
- <Key architectural decisions visible in the code>

## 5. Core Insight
<The fundamental concept or mechanism that makes this system work - explain the "why" behind the implementation>

=============================""".replace("{SP2}", "  ")


def snippet_block(
    rank: Column, file: Column, code: Column, language: Column, extension: Column,
    distance: Column, chunk_index: Column | None = None,
) -> Column:
    """One "## Code Reference N" block (hyde.rs:648-685); ``rank`` is the
    1-based output rank (idx+1). **Chunk ID** prints ``chunk_index`` — the
    0-based enumerate position HydeResult.index carries from the RAW k*2
    similarity output, assigned BEFORE filtering/rerank (hyde.rs:1227-1231)
    — so after filters drop candidates the printed ids are non-contiguous,
    exactly like the reference. Falls back to rank-1 (contiguous) only when
    no index column is supplied."""
    clean = F.regexp_replace(file, r"^(\./)+", "")
    ext_info = F.when(extension.isNotNull(), F.concat(F.lit("."), extension)).otherwise("")
    lang_info = F.when(
        language.isNotNull(), F.concat(F.lit(" ["), F.upper(language), F.lit("]"))
    ).otherwise("")
    fence = F.coalesce(language, F.lit("rust"))
    cid = (rank - 1) if chunk_index is None else chunk_index
    return F.concat(
        F.lit("## Code Reference "), rank.cast("string"), F.lit(" - "),
        clean, ext_info, lang_info, F.lit("\n"),
        F.lit("**Location:** "), clean, F.lit("\n"),
        F.lit("**Relevance Score:** "), F.format_string("%.3f", distance),
        F.lit(" (lower = more relevant)\n"),
        F.lit("**Chunk ID:** "), cid.cast("string"), F.lit("\n\n"),
        F.lit("```"), fence, F.lit("\n"),
        # Rust str::trim strips ALL whitespace; Spark's trim() only strips
        # spaces — regexp matches the reference exactly
        F.regexp_replace(code, r"^\s+|\s+$", ""), F.lit("```\n"),
    )


def intent_instruction(intent: Column) -> Column:
    result = None
    for k, v in INTENT_INSTRUCTIONS.items():
        clause = (intent == k, F.lit(v))
        result = F.when(*clause) if result is None else result.when(*clause)
    return result.otherwise(F.lit(DEFAULT_INSTRUCTION))


def assemble_prompt(
    ranked: DataFrame,
    query_text: Column,
    repo_description: str | None = None,
) -> DataFrame:
    """ranked (query_id, rank, file, code, language, extension, distance,
    intent, + query_text col, optionally chunk_index) → one user_prompt row
    per query (hyde.rs:722-740 layout). When ``chunk_index`` is present it
    is printed as Chunk ID (the reference's pre-filter enumerate index)."""
    system_context = (
        f"You are analyzing {repo_description}"
        if repo_description
        else "You are analyzing a software repository"
    )
    block = snippet_block(
        F.col("rank"), F.col("file"), F.col("code"),
        F.col("language"), F.col("extension"), F.col("distance"),
        chunk_index=(
            F.col("chunk_index") if "chunk_index" in ranked.columns else None
        ),
    )
    return (
        ranked.withColumn("_block", block)
        .groupBy("query_id")
        .agg(
            F.concat(
                F.lit("# User Query\n"), F.first(query_text),
                F.lit("\n\n# Analysis Task\n"),
                F.first(intent_instruction(F.col("intent"))),
                F.lit("\n\n# System Context\n"), F.lit(system_context),
                F.lit("\n\n# Available Code References\n"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("rank", "_block"))),
                        lambda x: x["_block"],
                    ),
                    "\n\n",
                ),
                F.lit("\n\n"), F.lit(OUTPUT_TEMPLATE),
            ).alias("user_prompt")
        )
    )
