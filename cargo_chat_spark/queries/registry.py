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


# Lifecycle-gate phase builders (r8 verdict item 7): a gate whose callable
# first materializes a persisted fixture (store build, snapshot-commit
# lifecycle) and then probes it registers the BUILD step here so bench.py
# can time the two phases separately — the fixture cost is one-time at
# production scale (the store persists; probes are the steady state), so
# reporting it fused with the probe reads as a query regression on any
# single-shot axis. Builders are memoized per (session, sf_dir) by their
# owning module; calling one twice in a session is a cheap no-op, which is
# what lets bench time "build" (first call) and "probe" (the registered
# query, memo warm) without changing gate semantics anywhere else.
PHASE_BUILDERS: dict[str, Callable[[SparkSession, str], object]] = {}


def register_phase_builder(name: str, fn) -> None:
    PHASE_BUILDERS[name] = fn
