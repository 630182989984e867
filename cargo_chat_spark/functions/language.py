"""Language detection from file extension (SURVEY §2.2 P2, §2.3 F1).

Mirrors the reference's static 12-language table
(/root/reference/src/language.rs:57-72 extensions, :39-54 display names,
:76-100 case-insensitive lookup). Unknown extension → NULL.

Two interchangeable Spark forms:
- ``detect_language_expr`` — a chained CASE expression (stays inside
  whole-stage codegen; best for a 24-branch literal table)
- ``language_lookup_df`` — a 24-row lookup DataFrame for broadcast joins
  (the idiomatic form when the mapping is data, not code)

``detect_language_sql_case`` emits the equivalent DuckDB/ANSI CASE so
oracle SQL stays literally in sync with the Spark expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from cargo_chat_spark.functions.localframe import local_frame
from pyspark.sql import functions as F

# language display name -> extensions (language.rs:57-72)
LANGUAGE_EXTENSIONS: dict[str, list[str]] = {
    "Rust": ["rs"],
    "JavaScript": ["js", "jsx", "mjs"],
    "TypeScript": ["ts", "tsx"],
    "Java": ["java"],
    "C++": ["cpp", "cxx", "cc", "hpp", "hxx", "hh"],
    "C": ["c", "h"],
    "Ruby": ["rb"],
    "C#": ["cs"],
    "Swift": ["swift"],
    "Go": ["go"],
    "Python": ["py", "pyx", "pyi"],
    "Markdown": ["md", "markdown"],
}

EXT_TO_LANGUAGE: dict[str, str] = {
    ext: lang for lang, exts in LANGUAGE_EXTENSIONS.items() for ext in exts
}

# All supported extensions, language-table order (language.rs:103-125)
SUPPORTED_EXTENSIONS: list[str] = [
    ext for exts in LANGUAGE_EXTENSIONS.values() for ext in exts
]

# Doc extensions for the code/doc partition, high-confidence branch
# (hyde.rs:1016 "md" | "txt" | "rst" | "adoc")
DOC_EXTENSIONS = ["md", "txt", "rst", "adoc"]
# NOTE: the low-confidence branch (hyde.rs:1190-1199) checks only
# {md, txt, rst} — adoc intentionally absent; preserve the quirk.
DOC_EXTENSIONS_SIMPLE = ["md", "txt", "rst"]


# The 24-entry lookup as ONE map literal, built lazily once per JVM
# gateway: the historical 24-branch when-chain cost ~100 py4j round
# trips (~0.2 s) PER CALL SITE per query build — pure driver-side
# construction overhead (guide §1: the gap before the first job). The
# Column wraps py4j objects, so the cache is keyed by the LIVE gateway
# (r14 ADVICE: a process-lifetime global would serve a dead JVM
# reference after a SparkContext teardown/rebuild in the same process).
_LANG_MAP_CACHE: dict[int, Column] = {}


def _lang_map_col() -> Column:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    key = id(sc._gateway) if sc is not None else 0
    col = _LANG_MAP_CACHE.get(key)
    if col is None:
        pairs: list[Column] = []
        for e, lang in EXT_TO_LANGUAGE.items():
            pairs += [F.lit(e), F.lit(lang)]
        col = F.create_map(*pairs)
        _LANG_MAP_CACHE.clear()  # a dead gateway's Column is useless
        _LANG_MAP_CACHE[key] = col
    return col


def detect_language_expr(ext: Column) -> Column:
    """ext (no leading dot, any case) -> display name; NULL if unknown.

    try_element_at (not element_at): under ANSI semantics element_at
    raises on a missing map key; try_ returns NULL — the CASE ... ELSE
    NULL semantics of the oracle's emitted SQL."""
    return F.try_element_at(_lang_map_col(), F.lower(ext))


def detect_language_sql_case(ext_sql: str) -> str:
    """DuckDB CASE expression equivalent to ``detect_language_expr``."""
    whens = "\n        ".join(
        f"WHEN '{e}' THEN '{lang}'" for e, lang in EXT_TO_LANGUAGE.items()
    )
    return f"(CASE lower({ext_sql})\n        {whens}\n        ELSE NULL END)"


def language_lookup_df(spark: SparkSession) -> DataFrame:
    """24-row (extension, language) table for broadcast joins."""
    rows = [(e, lang) for e, lang in EXT_TO_LANGUAGE.items()]
    return local_frame(spark, rows, "extension string, language string")


def is_supported_extension(ext: Column) -> Column:
    """Ingest filter F1 (chunker.rs:44-62): case-insensitive membership in
    the 24 supported extensions."""
    return F.lower(ext).isin(SUPPORTED_EXTENSIONS)
