"""Bucketed-table sink/source: the co-located-join lever for 100 TB joins.

A repeated big⋈big join (fact⋈fact on user_id, index⋈index on chunk_id)
pays a full shuffle of BOTH sides every query. Writing both sides bucketed
on the join key (same bucket count) stores each key's rows in a known
bucket file, so Spark's scan reports a `HashPartitioning(key, n)` output
partitioning and the sort-merge join runs with ZERO Exchange — the shuffle
is paid once at write time and amortized over every subsequent join,
aggregation, or window on that key. `tests/test_bucketed_join.py` pins the
exchange-free plan (and the contrast: the same join on plain parquet shows
two Exchanges).

At cluster scale the same API writes to the shared catalog/metastore; in
this single-JVM harness tables live in the session catalog with explicit
external paths. SCALE.md "Relational core" documents when to reach for
this vs broadcast (dim small enough) vs AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and optionally
    sorted) by ``key``. Sorting within buckets additionally enables
    sort-elision in merge joins when each bucket maps to one file, and
    keeps parquet min/max row-group pruning effective on the key."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucketing
    metadata only applies on catalog reads — ``spark.read.parquet`` on the
    same files would NOT report the bucketed output partitioning)."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
