"""Storage-layout gates: hive-partitioned sinks and partition-pruned reads.

The 100 TB lever this pins: a fact table laid out as
``.../event_type=X/...`` lets a predicate on the partition column prune
whole directories at PLANNING time — the scan never opens non-matching
files, so a 2-of-5-types query reads ~40% of the bytes regardless of
total size. ``tests/test_partition_pruning.py`` pins the physical
evidence (PartitionFilters in the scan, pruned InputFiles); this module's
gate pins the VALUES survive the layout round-trip.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

_PRUNED_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IN ('purchase', 'error')
GROUP BY 1, 2
"""


def partitioned_events_dir(sf_dir: str) -> str:
    """PID-keyed temp location (same concurrency rationale as
    index_roundtrip: stable within a process, never racing across)."""
    return os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_part_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )


def write_partitioned_events(spark, sf_dir: str) -> str:
    """Write events hive-partitioned by event_type; returns the path."""
    out = partitioned_events_dir(sf_dir)
    e = load_table(spark, sf_dir, "events")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    return out


@register("events_partitioned_pruned", sql=_PRUNED_SQL)
def events_partitioned_pruned(spark, sf_dir):
    """Round-trip through a hive-partitioned layout, then a pruned
    2-of-5-partitions aggregate. The oracle computes the same result from
    the raw table, so a partition lost/duplicated/mis-bucketed by the
    write, or a pruning bug dropping rows, is a value mismatch."""
    out = write_partitioned_events(spark, sf_dir)
    back = spark.read.parquet(out)
    return (
        back.where(F.col("event_type").isin("purchase", "error"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
