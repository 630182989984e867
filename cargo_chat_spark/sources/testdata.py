"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``/root/testdata/sf*/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # set defensively (runtime SQL confs) — the driver's own session may
        # not have gone through session.get_spark. nanosAsLong makes a
        # TIMESTAMP(NANOS) fixture readable at all (Spark otherwise refuses);
        # UTC keeps NTZ→LTZ normalization value-identical to the DuckDB
        # oracle's naive timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
        # generations (loaded as BIGINT nanos via nanosAsLong) and plain
        # timestamp[us] in others. Branch on the dtype actually loaded so
        # both generations work; output is always TIMESTAMP (LTZ, UTC).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division — epoch nanos (~1.7e18) exceed double's 2^53;
            # truncate to micros exactly like DuckDB does when it reads ns.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        else:
            # timestamp[us] arrives as TIMESTAMP_NTZ (Spark infers NTZ for
            # isAdjustedToUTC=false); normalize to the session type under UTC
            # so downstream window/sessionize semantics are unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def parquet_rows(path: str) -> int:
    """Exact row count from the parquet footer — a driver-side metadata
    read (no Spark job). For plan-shaping decisions (block counts, bucket
    fan-out) where an eager ``df.count()`` would serialize a whole scan
    into every plan build. On a multi-file dataset this is one footer per
    file, still metadata-only."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` pipelines can
    address them by the same names the DuckDB oracle uses."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
