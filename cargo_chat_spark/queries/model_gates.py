"""M3/M4 mock-provider oracle gates (SURVEY §2.8).

The reference's query classification (hyde.rs:353-392: strict-JSON LLM
structured output) and HyDE expansion (hyde.rs:317-347: hypothetical
document, budgeted to the chunk size — main.rs:497) are per-request,
driver-side model calls. Their deterministic mock semantics
(models/mock.py:50-72) were previously pytest-pinned only; these gates
value-hash the ACTUAL ``MockProvider`` output against an independent
DuckDB re-statement of the rule contract over a VALUES fixture of query
texts, shrinking the §2 test-only set to M6's answer stream alone.

The Spark side runs the real Python provider per query — bounded and
honest: classification IS a per-request driver-side step in the
reference (one query per chat turn); the fixture is the "requests".
The rows then distribute via createDataFrame like any request batch.
The oracle side re-derives every field in SQL (first-match CASE chains
in the exact keyword order the provider iterates), so a drift in either
the provider code or the contract fails the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.functions.localframe import local_frame

# One query per rule branch, plus order-sensitivity probes:
# - "how does" vs "how do" (prefix-overlapping keywords, list order wins)
# - "javascript" vs "java" (substring-overlapping languages, list order wins)
# - mixed case (provider lowercases before matching)
# - multiple intent keywords in one query (first in LIST order, not in
#   string order: "explain this implementation" -> implementation)
# - no keyword at all (default intent, no language, confidence 0.6)
# - a long query that the HyDE budget must truncate
_QUERY_FIXTURE: list[tuple[int, str]] = [
    (0, "how does the tokenizer split words"),
    (1, "how do I configure the Rust build"),
    (2, "implement a binary search in python"),
    (3, "bug in the JavaScript event loop"),
    (4, "error when importing the java module"),
    (5, "explain the Go scheduler"),
    (6, "what is a typescript union type"),
    (7, "summarize the release notes"),
    (8, "Explain this implementation bug"),
    (9, "HOW DOES rust handle lifetimes"),
    (10, "profiling the python interpreter"),
    (11, "what is the difference between java and javascript"),
    (12, "fix the error in the parser"),
    (
        13,
        "how does the incremental view maintenance pipeline keep the "
        "materialized join in sync with both source snapshot logs when "
        "merge-on-read deletes only grow the deletion vector",
    ),
    (14, "deploy checklist"),
    (15, "how do typescript decorators work"),
]

_HYDE_MAX_CHARS = 64

_INTENT_CASE = """CASE
        WHEN contains(ql, 'how does') THEN 'how_it_works'
        WHEN contains(ql, 'how do') THEN 'how_it_works'
        WHEN contains(ql, 'implement') THEN 'implementation'
        WHEN contains(ql, 'bug') THEN 'debugging'
        WHEN contains(ql, 'error') THEN 'debugging'
        WHEN contains(ql, 'explain') THEN 'explanation'
        WHEN contains(ql, 'what is') THEN 'explanation'
        ELSE 'explanation' END"""

_LANG_CASE = """CASE
        WHEN contains(ql, 'rust') THEN 'rust'
        WHEN contains(ql, 'python') THEN 'python'
        WHEN contains(ql, 'javascript') THEN 'javascript'
        WHEN contains(ql, 'typescript') THEN 'typescript'
        WHEN contains(ql, 'go') THEN 'go'
        WHEN contains(ql, 'java') THEN 'java'
        ELSE CAST(NULL AS VARCHAR) END"""


def _fixture_values_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{q.replace(chr(39), chr(39) * 2)}')"
        for qid, q in _QUERY_FIXTURE
    )
    return f"(VALUES {rows}) AS t(query_id, query)"


_CLASSIFIED_CTE = f"""
WITH qs AS (
    SELECT query_id, query, lower(query) AS ql FROM {_fixture_values_sql()}
),
classified AS (
    SELECT query_id, query,
        {_LANG_CASE} AS language,
        {_INTENT_CASE} AS intent
    FROM qs
)
"""

_CLASSIFY_SQL = f"""{_CLASSIFIED_CTE}
SELECT query_id, query, language, intent,
    CAST(intent IN ('implementation', 'debugging', 'how_it_works') AS INT)
        AS wants_code,
    CASE WHEN language IS NOT NULL THEN CAST(0.9 AS DOUBLE)
         WHEN intent IN ('implementation', 'debugging', 'how_it_works')
             THEN CAST(0.75 AS DOUBLE)
         ELSE CAST(0.6 AS DOUBLE) END AS confidence
FROM classified
"""


@register("query_classify_mock", sql=_CLASSIFY_SQL)
def query_classify_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 (hyde.rs:353-392): the rule-based mock classifier over the
    query fixture — language/intent keyword matching in list order,
    wants_code from the intent class, tiered confidence. The PYTHON
    provider produces the rows (driver-side, bounded: one call per
    fixture query — per-request semantics); the oracle re-derives them
    in SQL."""
    from cargo_chat_spark.models.mock import MockProvider

    p = MockProvider()
    rows = []
    for qid, q in _QUERY_FIXTURE:
        c = p.classify_query(q)
        rows.append(
            (qid, q, c.language, c.intent, int(c.wants_code),
             float(c.confidence))
        )
    return local_frame(spark, 
        rows,
        "query_id bigint, query string, language string, intent string, "
        "wants_code int, confidence double",
    )


_HYDE_SQL = f"""{_CLASSIFIED_CTE}
SELECT query_id,
    substring('[' || intent || '] ' || query, 1, {_HYDE_MAX_CHARS})
        AS hyde_doc,
    CAST(length(substring('[' || intent || '] ' || query, 1,
                          {_HYDE_MAX_CHARS})) AS INT) AS n_chars
FROM classified
"""


@register("hyde_expand_mock", sql=_HYDE_SQL)
def hyde_expand_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (hyde.rs:317-347; budget from main.rs:497): classify then
    expand — the mock's budgeted echo ``[<intent>] <query>`` capped at
    64 chars (fixture query 13 actually truncates). Driver-side
    per-request calls as in M3; the oracle nests the classify CTE and
    re-states the cap as substring."""
    from cargo_chat_spark.models.mock import MockProvider

    p = MockProvider()
    rows = []
    for qid, q in _QUERY_FIXTURE:
        c = p.classify_query(q)
        doc = p.hyde_document(q, c.intent, max_chars=_HYDE_MAX_CHARS)
        rows.append((qid, doc, len(doc)))
    return local_frame(spark, 
        rows, "query_id bigint, hyde_doc string, n_chars int"
    )


# ---------------------------------------------------------------- M6 mock
# The answer-synthesis MOCK semantics (models/mock.py:86; the real
# provider is the SSE stream of main.rs:497-520, pytest-pinned in
# tests/test_models.py — the stream PARSE stays out of the data plane by
# SURVEY design). The deterministic mock's contract — one answer chunk,
# "[mock-answer:<len(prompt)> chars of context]" — composes with the
# SQL-expressible context assembly (P6), so the classify→retrieve→
# assemble→synthesize tail is value-hash-oracled end to end: the oracle
# nests context_assembly's SQL verbatim and re-derives the answer from
# the context length.


def _answer_sql() -> str:
    from cargo_chat_spark.queries.retrieval import _CONTEXT_SQL

    return f"""
WITH ctx AS ({_CONTEXT_SQL})
SELECT query_id,
    '[mock-answer:' || CAST(length(context) AS VARCHAR)
        || ' chars of context]' AS answer
FROM ctx
"""


@register("answer_synthesize_mock", sql=_answer_sql())
def answer_synthesize_mock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 mock (hyde.rs answer tail; mock contract models/mock.py:86):
    assemble each query's retrieval context (P6, the gated
    context_assembly plan), feed it to the REAL provider's
    synthesize_answer driver-side (bounded: one call per request — 4
    fixture queries), drain the chunk iterator, and emit (query_id,
    answer). A drift in either the mock's answer format or the context
    assembly it consumes fails the hash."""
    from cargo_chat_spark.models.mock import MockProvider
    from cargo_chat_spark.queries.retrieval import context_assembly

    p = MockProvider()
    rows = []
    # bounded collect: one context row per fixture query (4)
    for r in context_assembly(spark, sf_dir).collect():
        answer = "".join(p.synthesize_answer(r["context"]))
        rows.append((r["query_id"], answer))
    return local_frame(spark, rows, "query_id bigint, answer string")
