"""Path / snippet scalar expressions (SURVEY §2.2 P1, P4, P5).

All pure column expressions — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# P1: path -> extension (chunker.rs:43; language.rs:77 lowercases for compare).
# Last dot-separated segment that contains no '/' or '\'; empty -> NULL.
_EXT_RE = r"\.([^./\\]+)$"


def extension_from_path(path: Column) -> Column:
    ext = F.regexp_extract(path, _EXT_RE, 1)
    return F.when(ext == "", F.lit(None).cast("string")).otherwise(ext)


def extension_from_path_sql(path_sql: str) -> str:
    return (
        f"nullif(regexp_extract({path_sql}, '\\.([^./\\\\]+)$', 1), '')"
    )


# P4: display snippet — first 200 chars of trimmed code + "..." when longer
# (main.rs:414-419).
def snippet(code: Column, max_len: int = 200) -> Column:
    trimmed = F.trim(code)
    return F.when(
        F.length(trimmed) > max_len,
        F.concat(F.substring(trimmed, 1, max_len), F.lit("...")),
    ).otherwise(trimmed)


def snippet_sql(code_sql: str, max_len: int = 200) -> str:
    return (
        f"CASE WHEN length(trim({code_sql})) > {max_len} "
        f"THEN substring(trim({code_sql}), 1, {max_len}) || '...' "
        f"ELSE trim({code_sql}) END"
    )


# P5: strip leading "./" for display (hyde.rs:663).
def clean_path(path: Column) -> Column:
    return F.regexp_replace(path, r"^\./", "")


def clean_path_sql(path_sql: str) -> str:
    return f"regexp_replace({path_sql}, '^\\./', '')"
