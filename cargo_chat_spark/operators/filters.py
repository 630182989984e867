"""Classification-driven candidate filters (SURVEY §2.3 F2-F5, F8).

Each predicate is implemented twice, deliberately adjacent so they cannot
drift: a Spark Column expression and a DuckDB SQL emitter used by the oracle
queries. Semantics are exactly the reference's retain() closures:

- F2 folder filter      /root/reference/src/hyde.rs:825-866
- F3 extension filter   /root/reference/src/hyde.rs:869-927
- F4 exclude patterns   /root/reference/src/hyde.rs:930-964
- F5 code/doc split     /root/reference/src/hyde.rs:1012-1056 (high-conf
                        branch; path fallback when extension is NULL) and
                        hyde.rs:1190-1199 (simple ext-only variant, no adoc)

A NULL or empty array means "filter disabled" (the reference wraps each in
``if let Some(..) if !empty``).

Scale note: these are pure predicates over already-partitioned data — they
fuse into the same whole-stage-codegen span as the kNN distance projection,
so at 100 TB they cost a scan, never a shuffle. In "improved mode"
(plans.retrieval) they are applied BEFORE the kNN so Catalyst pushes them
into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cargo_chat_spark.functions.language import (
    DOC_EXTENSIONS,
    DOC_EXTENSIONS_SIMPLE,
)


def _disabled(arr: Column) -> Column:
    return arr.isNull() | (F.size(arr) == 0)


# ---------------------------------------------------------------- F2 folder
def folder_match(file: Column, folders: Column) -> Column:
    """∃ folder f: file contains "/f/" OR file startswith "f/" OR
    (file contains "/f" AND file endswith "/" + last-segment(f))."""

    def one(f: Column) -> Column:
        last_seg = F.element_at(F.split(f, "/"), -1)
        return (
            file.contains(F.concat(F.lit("/"), f, F.lit("/")))
            | file.startswith(F.concat(f, F.lit("/")))
            | (
                file.contains(F.concat(F.lit("/"), f))
                & file.endswith(F.concat(F.lit("/"), last_seg))
            )
        )

    return _disabled(folders) | F.exists(folders, one)


def folder_match_sql(file: str, folders: str) -> str:
    return f"""(
        {folders} IS NULL OR len({folders}) = 0 OR
        len(list_filter({folders}, f ->
            contains({file}, '/' || f || '/')
            OR starts_with({file}, f || '/')
            OR (contains({file}, '/' || f)
                AND ends_with({file}, '/' || list_extract(string_split(f, '/'), len(string_split(f, '/')))))
        )) > 0
    )"""


# ------------------------------------------------------------- F3 extension
def extension_match(ext: Column, file: Column, targets: Column) -> Column:
    """Dot-normalized equality on extension; path-suffix fallback when the
    extension column is NULL."""

    def norm(t: Column) -> Column:
        return F.regexp_replace(t, r"^\.+", "")

    by_ext = F.exists(targets, lambda t: norm(ext) == norm(t))
    by_path = F.exists(targets, lambda t: file.endswith(F.concat(F.lit("."), norm(t))))
    return _disabled(targets) | F.when(ext.isNotNull(), by_ext).otherwise(by_path)


def extension_match_sql(ext: str, file: str, targets: str) -> str:
    return f"""(
        {targets} IS NULL OR len({targets}) = 0 OR
        CASE WHEN {ext} IS NOT NULL
             THEN len(list_filter({targets}, t ->
                  regexp_replace({ext}, '^\\.+', '') = regexp_replace(t, '^\\.+', ''))) > 0
             ELSE len(list_filter({targets}, t ->
                  ends_with({file}, '.' || regexp_replace(t, '^\\.+', '')))) > 0
        END
    )"""


# -------------------------------------------------------------- F4 exclude
def exclude_match(file: Column, patterns: Column) -> Column:
    """TRUE when the row should be KEPT (no pattern matches). Patterns are
    lowercased; path lowercased. NB: the first clause (plain contains)
    subsumes the others — preserved verbatim from the reference."""
    file_lower = F.lower(file)

    def one(p: Column) -> Column:
        pl = F.lower(p)
        return (
            file_lower.contains(pl)
            | file_lower.contains(F.concat(F.lit("/"), pl, F.lit("/")))
            | file_lower.startswith(F.concat(pl, F.lit("/")))
            | file_lower.endswith(F.concat(F.lit("/"), pl))
        )

    return _disabled(patterns) | ~F.exists(patterns, one)


def exclude_match_sql(file: str, patterns: str) -> str:
    return f"""(
        {patterns} IS NULL OR len({patterns}) = 0 OR
        len(list_filter({patterns}, p ->
            contains(lower({file}), lower(p))
            OR contains(lower({file}), '/' || lower(p) || '/')
            OR starts_with(lower({file}), lower(p) || '/')
            OR ends_with(lower({file}), '/' || lower(p))
        )) = 0
    )"""


# ---------------------------------------------------------- F5 code vs doc
_PATH_DOC_MARKERS = ["/docs/", "readme", "resources", "changelog", "license"]


def is_code(ext: Column, file: Column) -> Column:
    """High-confidence branch partition (hyde.rs:1016-1056): with an
    extension, code = ext ∉ {md,txt,rst,adoc}; without, path analysis."""
    file_lower = F.lower(file)
    path_is_code = (
        ~file_lower.endswith(".md")
        & ~file_lower.endswith(".txt")
        & ~file_lower.contains("/docs/")
        & ~file_lower.contains("readme")
        & ~file_lower.contains("resources")
        & ~file_lower.contains("changelog")
        & ~file_lower.contains("license")
    )
    return F.when(ext.isNotNull(), ~ext.isin(DOC_EXTENSIONS)).otherwise(path_is_code)


def is_code_sql(ext: str, file: str) -> str:
    doc_exts = ", ".join(f"'{e}'" for e in DOC_EXTENSIONS)
    not_markers = " AND ".join(
        f"NOT contains(lower({file}), '{m}')" for m in _PATH_DOC_MARKERS[2:]
    )
    return f"""(
        CASE WHEN {ext} IS NOT NULL THEN {ext} NOT IN ({doc_exts})
             ELSE NOT ends_with(lower({file}), '.md')
                  AND NOT ends_with(lower({file}), '.txt')
                  AND NOT contains(lower({file}), '/docs/')
                  AND NOT contains(lower({file}), 'readme')
                  AND {not_markers}
        END
    )"""


def is_doc_simple(ext: Column) -> Column:
    """Low-confidence branch doc flag (hyde.rs:1190-1199): ext-only,
    {md,txt,rst} — the reference omits adoc here; quirk preserved."""
    return F.when(ext.isNotNull(), ext.isin(DOC_EXTENSIONS_SIMPLE)).otherwise(F.lit(False))


def is_doc_simple_sql(ext: str) -> str:
    exts = ", ".join(f"'{e}'" for e in DOC_EXTENSIONS_SIMPLE)
    return f"(COALESCE({ext} IN ({exts}), FALSE))"


# ----------------------------------------------------------- F8 confidence
def high_confidence_code(wants_code: Column, confidence: Column) -> Column:
    """Branch gate (hyde.rs:1008): wants_code AND confidence > 0.7."""
    return wants_code & (confidence > 0.7)
