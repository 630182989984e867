"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides; floats are computed in
DOUBLE with matching fold order so the driver's 6-d.p. canonicalized hash
matches.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may import this file by path; make the package importable (and
# visible to executor Python workers) regardless of the caller's sys.path
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    else os.environ["PYTHONPATH"]
)

from pyspark.sql import DataFrame, SparkSession

from cargo_chat_spark.queries import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact kNN top-10 over the embeddings table at sf0.001."""
    return catalog.SPARK_QUERIES["knn_exact"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE_SQL)
