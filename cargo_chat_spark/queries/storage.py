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


# ------------------------------------------------------ JSONL round-trip
# The interchange-format gate: events written as JSON Lines (the lingua
# franca of crawl/LLM-pipeline handoffs) and read back under an EXPLICIT
# schema (schema inference is a full extra pass at 100 TB — never pay it
# on a known feed). The oracle aggregates the raw table, so any
# serialization loss (timestamp formatting, float round-trip, null
# handling) is a value mismatch.
_JSONL_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
       CAST(MAX(ts) AS TIMESTAMP) AS last_ts,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_props
FROM events
GROUP BY event_type
"""


@register("events_jsonl_roundtrip", sql=_JSONL_SQL)
def events_jsonl_roundtrip(spark, sf_dir):
    """Write events as JSONL, read back with the explicit schema, and
    aggregate — value parity proves the text round-trip is lossless."""
    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_jsonl_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    # default JSON timestamp format truncates to MILLIS — the oracle
    # caught the 589998us -> 589000us loss; write and read at full
    # microsecond precision
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    opts = {"timestampNTZFormat": fmt, "timestampFormat": fmt}
    e.write.mode("overwrite").options(**opts).json(out)
    back = spark.read.schema(e.schema).options(**opts).json(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.col("props").isNull().cast("int")).cast("bigint").alias("null_props"),
    )


# ------------------------------------------------------- CSV round-trip
# Same contract as the JSONL gate for the third interchange format. CSV
# needs two extra explicit decisions the gate pins: microsecond timestamp
# format (same truncation trap as JSON) and explicit null handling
# (nullValue/emptyValue disambiguation for the props column).
_CSV_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
       CAST(MAX(ts) AS TIMESTAMP) AS last_ts,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
FROM events
GROUP BY event_type
"""


@register("events_csv_roundtrip", sql=_CSV_SQL)
def events_csv_roundtrip(spark, sf_dir):
    """Write events as headered CSV, read back with the explicit schema,
    aggregate — value parity proves the text round-trip is lossless."""
    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_csv_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    opts = {
        "header": "true",
        "timestampFormat": fmt,
        "timestampNTZFormat": fmt,
    }
    e.write.mode("overwrite").options(**opts).csv(out)
    back = spark.read.schema(e.schema).options(**opts).csv(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.countDistinct("user_id").alias("users"),
    )


# --------------------------------------------------- schema evolution
# mergeSchema gate: an old batch written WITHOUT the props column and a
# new batch WITH it must union under the evolved schema, old rows reading
# props as NULL. This is how a long-lived 100 TB table absorbs additive
# schema changes without rewriting history. The oracle simulates the
# evolution relationally (props nulled for the old slice).
_EVOLVE_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN (CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                                THEN NULL ELSE props END) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@register("events_schema_merge", sql=_EVOLVE_SQL)
def events_schema_merge(spark, sf_dir):
    """Two-generation parquet layout (pre/post props column) read under
    mergeSchema; old rows surface props as NULL."""
    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_evolve_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    old = e.where(F.col("ts") < cut).drop("props")
    new = e.where(F.col("ts") >= cut)
    old.write.mode("overwrite").parquet(f"{out}/gen=0")
    new.write.mode("overwrite").parquet(f"{out}/gen=1")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen=0", f"{out}/gen=1"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("props").isNull().cast("int")).cast("bigint").alias("null_props"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


# --------------------------------------------------------- XML parsing
# The fourth interchange surface (Spark 4's built-in from_xml). XML rows
# are RENDERED from the events columns inside the query (deterministic
# markup, integer cents so no float-formatting round-trip exists), parsed
# back with an explicit struct schema, and aggregated; the oracle
# aggregates the raw table, so any parse/render asymmetry is a value
# mismatch.
_XML_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(MAX(event_id) AS BIGINT) AS max_id
FROM events
GROUP BY event_type
"""


@register("events_xml_parse", sql=_XML_SQL)
def events_xml_parse(spark, sf_dir):
    """Render events as XML, parse with from_xml, aggregate."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    xml = F.concat(
        F.lit("<e><id>"),
        F.col("event_id").cast("string"),
        F.lit("</id><t>"),
        F.col("event_type"),
        F.lit("</t><c>"),
        cents.cast("string"),
        F.lit("</c></e>"),
    )
    parsed = e.select(
        F.from_xml(xml, "id BIGINT, t STRING, c BIGINT").alias("p")
    )
    return (
        parsed.select("p.*")
        .groupBy(F.col("t").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").cast("bigint").alias("cents"),
            F.max("id").cast("bigint").alias("max_id"),
        )
    )


# -------------------------------------- min/max-manifest data skipping
# The layout lever for predicates on NON-partition columns
# (sources/sorted_layout.py): range-sorted files + a per-file min/max
# manifest, reader opens only overlapping files. The oracle aggregates
# the RAW table under the same predicate, so a file mis-binned by the
# range writer, a manifest recording wrong stats, or a boundary row lost
# by the overlap test (fmax < lo / fmin >= hi off-by-one) is a value
# mismatch. The physical only-overlapping-files claim is pinned by
# tests/test_sorted_layout.py.
_RANGE_PRUNED_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id >= 3 AND user_id < 10
GROUP BY event_type
"""


@register("events_range_pruned_scan", sql=_RANGE_PRUNED_SQL)
def events_range_pruned_scan(spark, sf_dir):
    """Round-trip events through a range-sorted 16-file layout, then a
    manifest-pruned scan of user_id in [3, 10) (populated at every sf) and a per-type
    aggregate over it."""
    from cargo_chat_spark.sources.sorted_layout import (
        read_range_pruned,
        write_range_sorted,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_rangesorted_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    write_range_sorted(e, out, "user_id", n_files=16)
    pruned = read_range_pruned(spark, out, "user_id", 3, 10)
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ------------------------------------------------ z-order data skipping
# 2-D extension of the range-pruned gate: the layout is z-ordered on
# (user_id, ts), so per-file min/max stay narrow on BOTH columns and the
# manifest prunes on a conjunctive band over both. The oracle aggregates
# the raw table under the same two-sided predicate — a row shuffled into
# the wrong rectangle, stats recorded wrong, or a boundary row lost by
# either overlap test is a value mismatch. Physical either-column
# pruning is pinned by tests/test_sorted_layout.py.
_ZORDER_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id >= 3 AND user_id < 10
  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
GROUP BY event_type
"""


@register("events_zorder_pruned_scan", sql=_ZORDER_SQL)
def events_zorder_pruned_scan(spark, sf_dir):
    """Round-trip events through a z-ordered (user_id, ts) 16-file
    layout, then a two-column manifest-pruned scan of the
    user [3,10) × week-2 band and a per-type aggregate over it."""
    import datetime

    from cargo_chat_spark.sources.sorted_layout import (
        read_zorder_pruned,
        write_zordered,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_zorder_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    write_zordered(e, out, "user_id", "ts", n_files=16)
    pruned = read_zorder_pruned(
        spark,
        out,
        "user_id",
        "ts",
        a_range=(3, 10),
        b_range=(
            datetime.datetime(2024, 1, 8),
            datetime.datetime(2024, 1, 15),
        ),
    )
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
