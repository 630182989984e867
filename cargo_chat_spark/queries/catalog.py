"""Aggregates all registered correctness queries.

Importing this module populates ``SPARK_QUERIES`` / ``ORACLE_SQL`` from every
domain module. ``__spark_entry__.py`` re-exports these to the driver.
"""

from __future__ import annotations

from cargo_chat_spark.queries import ann_lsh  # noqa: F401
from cargo_chat_spark.queries import dedup  # noqa: F401
from cargo_chat_spark.queries import rerank  # noqa: F401
from cargo_chat_spark.queries import profiling  # noqa: F401
from cargo_chat_spark.queries import relational  # noqa: F401
from cargo_chat_spark.queries import retrieval  # noqa: F401
from cargo_chat_spark.queries import similarity  # noqa: F401
from cargo_chat_spark.queries import streaming_queries  # noqa: F401
from cargo_chat_spark.queries import textstats  # noqa: F401
from cargo_chat_spark.queries import vector_search  # noqa: F401
from cargo_chat_spark.queries.registry import ORACLE_SQL, SPARK_QUERIES

__all__ = ["SPARK_QUERIES", "ORACLE_SQL"]
