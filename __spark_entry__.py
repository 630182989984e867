"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides; floats are computed in
DOUBLE with matching fold order so the driver's 6-d.p. canonicalized hash
matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cargo_chat_spark.queries import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact kNN top-10 over the embeddings table at sf0.001."""
    return catalog.SPARK_QUERIES["knn_exact"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE_SQL)
