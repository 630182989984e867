"""Query registry: every correctness-gated operator registers a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent DuckDB oracle SQL.

Cross-engine rules (FIXTURES.md canonicalization + hard-won gotchas):

- Alias every computed column identically on both sides (driver hashes
  values after sorting columns by name).
- Do float math in DOUBLE with identical fold order; never rely on
  engine-specific aggregate summation order for big double sums — route
  money-like sums through DECIMAL(18,2) (exact) and cast the result back to
  DOUBLE.
- Every top-k / LIMIT needs a total order (explicit id tie-break) or the two
  engines may legitimately keep different rows.
- DuckDB numeric literals are DECIMAL — CAST to DOUBLE explicitly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, SparkQuery] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a Spark query and its DuckDB oracle SQL.

    ``sql=None`` marks a genuinely non-SQL-expressible op (streaming,
    iterative, Python-model-backed) — the driver then records a weaker
    rows-only check.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco
