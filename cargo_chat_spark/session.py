"""SparkSession factory tuned for the target execution model.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the design
target is a multi-executor cluster at ~100 TB, so every knob set here is one
that scales: AQE (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for the Python batch-inference boundary, UTC timestamps
for oracle comparability, and shuffle partitions sized to the active
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cargo_chat_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # model-inference UDFs batch at the reference's embed batch size x4;
        # Arrow batches are the unit of pandas_udf work (SURVEY §2.8 M1)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # the driver's events table has shipped as parquet TIMESTAMP(NANOS)
        # in some fixture generations (and timestamp[us] in others); with
        # this conf the nanos generation reads as BIGINT and
        # sources.testdata.load_table branches on the loaded dtype
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
