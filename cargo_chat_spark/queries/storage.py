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

from cargo_chat_spark.caching import register_memo as _memo_register
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


# --------------------------------------------- merge-on-read delete gate
# Full delete lifecycle in one externally-checkable run: write the base
# (range-sorted on user_id so the deleted users' rows are file-local),
# tombstone every event of users 7 and 11 (O(keys), base untouched),
# read merge-on-read, COMPACT (only the affected files rewritten), read
# again — both reads must equal the oracle's plain NOT-IN aggregate, so
# a row leaked past the anti-join, lost by compaction, or double-kept by
# the staged-file move is a value mismatch. Physical claims (base files
# untouched by delete, only affected files rewritten, log cleared) are
# pinned by tests/test_merge_on_read.py.
_MOR_SQL = """
WITH kept AS (
    SELECT * FROM events WHERE user_id NOT IN (7, 11)
),
agg AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM kept GROUP BY event_type
)
SELECT 'mor' AS stage, * FROM agg
UNION ALL
SELECT 'compacted' AS stage, * FROM agg
"""


@register("events_merge_on_read", sql=_MOR_SQL)
def events_merge_on_read(spark, sf_dir):
    """Tombstone-delete all events of users 7 and 11, aggregate through
    the merge-on-read view, compact, aggregate again: both stages must
    match the oracle's plain filtered aggregate."""
    from cargo_chat_spark.sources.deletes import (
        compact_deletes,
        delete_keys,
        read_merge_on_read,
    )
    from cargo_chat_spark.sources.sorted_layout import write_range_sorted

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_mor_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    write_range_sorted(e, out, "user_id", n_files=16)
    delete_keys(
        e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        out,
        "event_id",
    )

    def agg(df, stage):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        ).select(F.lit(stage).alias("stage"), "*")

    mor = agg(read_merge_on_read(spark, out, "event_id"), "mor")
    # the union forces the mor stage to evaluate against the PRE-compaction
    # layout: materialize it before mutating the files under the scan
    mor = local_frame(spark, mor.collect(), mor.schema)
    compact_deletes(spark, out, "event_id")
    post = agg(read_merge_on_read(spark, out, "event_id"), "compacted")
    return mor.unionByName(post)


# ------------------------------------------------- time-travel gate
# Snapshot lifecycle end to end: commit v0 (users < 50), v1 (append the
# rest), v2 (copy-on-write delete of users 7/11), then aggregate ALL
# THREE versions through time-travel reads. The oracle states each
# version as a plain filter over the raw table — a row bleeding between
# versions (a delete visible at v1, an append visible at v0, a CoW
# rewrite losing a survivor) is a value mismatch. Physical claims
# (immutability, file sharing, reader isolation, vacuum reachability)
# are pinned by tests/test_snapshots.py.
_TT_SQL = """
WITH agg0 AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id < 50
),
agg1 AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
),
agg2 AS (
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id NOT IN (7, 11)
)
SELECT 0 AS version, * FROM agg0
UNION ALL SELECT 1 AS version, * FROM agg1
UNION ALL SELECT 2 AS version, * FROM agg2
"""


@register("events_time_travel", sql=_TT_SQL)
def events_time_travel(spark, sf_dir):
    """Commit three snapshots (write / append / CoW-delete) and aggregate
    each through a time-travel read; every version must match the
    oracle's plain filtered aggregate over the raw table."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_append,
        snap_delete,
        snap_read,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_tt_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.where(F.col("user_id") < 50), out)
    snap_append(e.where(F.col("user_id") >= 50), out)
    snap_delete(
        spark, out, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )

    def agg(version):
        return snap_read(spark, out, version).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        ).select(F.lit(version).cast("int").alias("version"), "*")

    return agg(0).unionByName(agg(1)).unionByName(agg(2))


# -------------------------------------------------- snapshot CDC gate
# MERGE + change-feed lifecycle: v0 = the raw table; v1 = MERGE INTO
# (every row of users 3/5 updated via value+1.5, user 9's rows re-keyed
# +10^7 as inserts); v2 = CoW delete of users 7/11. The gate returns the
# ROW-LEVEL change feed v0→v2 — the oracle states it directly from the
# raw table, so a survivor misclassified as updated (CoW moved it but
# the row-hash tie-break failed), a lost insert, or a delete bleeding
# into the wrong version is a value mismatch. snap_changes reads ONLY
# the manifest-diff files (shared files are immutable, hence
# changeless) — CDC costs O(changed files), the property that makes
# incremental downstream recompute viable at 100 TB.
_CDC_SQL = """
SELECT 'updated' AS change, event_id FROM events WHERE user_id IN (3, 5)
UNION ALL
SELECT 'deleted' AS change, event_id FROM events WHERE user_id IN (7, 11)
UNION ALL
SELECT 'inserted' AS change, event_id + 10000000 AS event_id
FROM events WHERE user_id = 9
"""


@register("events_snapshot_cdc", sql=_CDC_SQL)
def events_snapshot_cdc(spark, sf_dir):
    """MERGE-then-delete over a snapshot table, returning the row-level
    v0→v2 change feed (change ∈ inserted/deleted/updated, keyed)."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_changes,
        snap_delete,
        snap_merge,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_cdc_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e, out)
    updates = e.where(F.col("user_id").isin(3, 5)).withColumn(
        "value", F.col("value") + F.lit(1.5)
    )
    inserts = e.where(F.col("user_id") == 9).withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000)
    )
    snap_merge(spark, out, updates.unionByName(inserts), "event_id")
    snap_delete(
        spark, out, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    return snap_changes(spark, out, 0, 2, "event_id")


# -------------------------------------- incremental rollup via CDC gate
# The payoff of the snapshot log: maintain a per-type rollup across
# versions WITHOUT re-aggregating the table. delta = agg(files only in
# v2) - agg(files only in v0): survivors that a CoW rewrite merely moved
# appear on BOTH sides and cancel EXACTLY (counts are ints, sums are
# decimal(18,2) — no float drift), so the delta is computed from the
# manifest-diff files alone; maintained = rollup(v0) + delta. The oracle
# aggregates the logical v2 content (updates applied, inserts added,
# deletes removed) directly from the raw table — any survivor that
# failed to cancel, any double-counted update, any missed delete is a
# value mismatch. At 100 TB: rollup refresh costs O(changed files), not
# O(table) — the incremental-recompute pattern every downstream consumer
# of a versioned corpus wants.
_INC_ROLLUP_SQL = """
WITH final AS (
    SELECT event_type,
           CASE WHEN user_id IN (3, 5) THEN value + 1.5 ELSE value END AS value
    FROM events WHERE user_id NOT IN (7, 11)
    UNION ALL
    SELECT event_type, value FROM events WHERE user_id = 9
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM final GROUP BY event_type
"""


# The write → MERGE → delete snapshot lifecycle is FIXTURE cost (the
# versioned table a production deployment already has); the operator
# this gate measures is the manifest-diff fold. Session-memoized and
# registered as a bench phase builder (the leakage_safe_split r10
# pattern) so the two are reported as build vs probe.
_INCROLL_MEMO: dict = {}
_memo_register(_INCROLL_MEMO)


def _incroll_fixture(spark, sf_dir) -> str:
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_delete,
        snap_merge,
        snap_write,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _INCROLL_MEMO.get(key)
    if cached is not None:
        return cached
    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_incroll_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e, out)
    updates = e.where(F.col("user_id").isin(3, 5)).withColumn(
        "value", F.col("value") + F.lit(1.5)
    )
    inserts = e.where(F.col("user_id") == 9).withColumn(
        "event_id", F.col("event_id") + F.lit(10_000_000)
    )
    snap_merge(spark, out, updates.unionByName(inserts), "event_id")
    snap_delete(
        spark, out, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    _INCROLL_MEMO[key] = out
    return out


@register("incremental_rollup_cdc", sql=_INC_ROLLUP_SQL)
def incremental_rollup_cdc(spark, sf_dir):
    """Maintain rollup(v0) to v2 using only the manifest-diff files
    (write → MERGE → delete lifecycle); must equal the oracle's direct
    aggregate of the final logical content."""
    from cargo_chat_spark.sources.snapshots import manifest, snap_read

    out = _incroll_fixture(spark, sf_dir)

    def signed_agg(df, sign):
        return df.groupBy("event_type").agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("dn"),
            (F.lit(sign) * F.sum(F.col("value").cast("decimal(18,2)")))
            .alias("dt"),
        )

    m0 = set(manifest(out, 0)["files"])
    m2 = set(manifest(out, 2)["files"])
    old_only = sorted(m0 - m2)
    new_only = sorted(m2 - m0)
    rollup0 = signed_agg(snap_read(spark, out, 0), 1)
    parts = [rollup0]
    if new_only:
        parts.append(signed_agg(
            spark.read.parquet(*(os.path.join(out, f) for f in new_only)), 1
        ))
    if old_only:
        parts.append(signed_agg(
            spark.read.parquet(*(os.path.join(out, f) for f in old_only)), -1
        ))
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return (
        acc.groupBy("event_type")
        .agg(
            F.sum("dn").cast("bigint").alias("n"),
            F.sum("dt").cast("double").alias("total_value"),
        )
        .where(F.col("n") > 0)
    )


# --------------------------------------- snapshot OPTIMIZE ZORDER gate
# Delta's OPTIMIZE ZORDER BY on the snapshot table: two fragmented,
# unclustered appends, then a layout-only optimize commit that z-orders
# (user_id, ts) and records per-file min/max stats IN THE MANIFEST
# (Iceberg data-file stats), then the user [3,10) × week-2 band answered
# through the stats-pruned time-travel read. The oracle is the plain
# two-sided filter aggregate over the raw table — a row lost or
# duplicated by the rewrite, a stats range recorded wrong (pruning a
# file it shouldn't), or a boundary error in the overlap test is a
# value mismatch. Empty-change-feed and strict-subset pruning are
# pinned physically by tests/test_snapshots.py.
_SNAP_OPT_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id >= 3 AND user_id < 10
  AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
GROUP BY event_type
"""


@register("events_snapshot_optimize", sql=_SNAP_OPT_SQL)
def events_snapshot_optimize(spark, sf_dir):
    """Fragmented snapshot appends → OPTIMIZE ZORDER commit with manifest
    column stats → stats-pruned band aggregate (must equal the plain
    filtered aggregate)."""
    import datetime
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_append,
        snap_optimize,
        snap_read_pruned,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_snapopt_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.where(F.col("event_id") % 2 == 0), out)
    snap_append(e.where(F.col("event_id") % 2 == 1), out)
    snap_optimize(spark, out, "user_id", "ts", n_files=16)
    pruned = snap_read_pruned(
        spark,
        out,
        {
            "user_id": (3, 10),
            "ts": (
                datetime.datetime(2024, 1, 8),
                datetime.datetime(2024, 1, 15),
            ),
        },
    )
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ------------------------------------------------ metadata-only count
# Delta/Iceberg answer SELECT COUNT(*) from the transaction log alone;
# same here: every commit records per-file row counts (parquet FOOTERS
# for new files — no data pages read — carried forward for shared
# files), and the gate answers all three lifecycle versions' counts
# without opening one data file. The oracle computes the same counts
# from the raw table, so a footer misread, a stale carry-forward, or a
# CoW survivor count drift is a value mismatch.
_META_COUNT_SQL = """
SELECT 0 AS version, COUNT(*) AS n_rows FROM events WHERE user_id < 50
UNION ALL
SELECT 1 AS version, COUNT(*) AS n_rows FROM events
UNION ALL
SELECT 2 AS version, COUNT(*) AS n_rows FROM events
WHERE user_id NOT IN (7, 11)
"""


@register("events_metadata_count", sql=_META_COUNT_SQL)
def events_metadata_count(spark, sf_dir):
    """Write/append/CoW-delete lifecycle, then COUNT(*) of every version
    answered purely from manifest metadata."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_append,
        snap_count,
        snap_delete,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_metacnt_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.where(F.col("user_id") < 50), out)
    snap_append(e.where(F.col("user_id") >= 50), out)
    snap_delete(
        spark, out, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    counts = [(v, snap_count(out, v)) for v in (0, 1, 2)]
    return local_frame(spark, 
        counts, "version int, n_rows bigint"
    )


# ------------------------------------------------------- RESTORE gate
# Rollback lifecycle: v0 write / v1 append / v2 CoW-delete / v3 =
# RESTORE to v1 — a metadata-only commit (one JSON rename, zero data
# copied) whose file list IS v1's. The gate aggregates the post-delete
# version AND the restored version through time-travel reads, plus each
# version's METADATA-ONLY row count (snap_count over carried manifest
# stats): a restore that lost rows, resurrected the wrong set, failed
# to share files, or carried stale row stats is a value mismatch. The
# oracle states both versions' content directly from the raw table.
_RESTORE_SQL = """
SELECT 2 AS version, COUNT(*) AS n, COUNT(*) AS n_meta,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events WHERE user_id NOT IN (7, 11)
UNION ALL
SELECT 3 AS version, COUNT(*) AS n, COUNT(*) AS n_meta,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
"""


@register("events_snapshot_restore", sql=_RESTORE_SQL)
def events_snapshot_restore(spark, sf_dir):
    """Write/append/CoW-delete, then RESTORE to the pre-delete version;
    value-check the rolled-back content and the preserved history."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_append,
        snap_count,
        snap_delete,
        snap_read,
        snap_restore,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_restore_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.where(F.col("user_id") < 50), out)
    snap_append(e.where(F.col("user_id") >= 50), out)
    snap_delete(
        spark, out, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    snap_restore(out, 1)

    def agg(version):
        return snap_read(spark, out, version).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        ).select(
            F.lit(version).cast("int").alias("version"),
            "n",
            F.lit(snap_count(out, version)).cast("bigint").alias("n_meta"),
            "total_value",
        )

    return agg(2).unionByName(agg(3))


# -------------------------------------------- schema-evolution gate
# Delta mergeSchema lifecycle: v0 = base-schema write; v1 = append that
# ADDS value_eur (exact-decimal 0.90 FX column) — old files are never
# rewritten, the evolved schema lives in the manifest and old rows
# surface the new column as NULL through it; v2 = CoW delete of two
# users, rewriting pre-evolution survivor files THROUGH the evolved
# schema. The gate aggregates the latest version per event_type over
# BOTH the old and the new column — a reader that dropped the new
# column for old files (footer-sniff first-file schema), silently cast,
# defaulted NULLs to zero, or lost rows in the cross-schema rewrite is
# a value mismatch. The oracle rebuilds the same table logically (new
# column only where it was appended) from raw events. Decimal
# arithmetic keeps both engines bit-exact.
_SCHEMA_EVO_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(CASE WHEN user_id >= 8 THEN 1 END) AS n_eur,
       CAST(SUM(CASE WHEN user_id >= 8 THEN
            CAST(value AS DECIMAL(18,2)) * CAST(0.90 AS DECIMAL(3,2))
       END) AS DOUBLE) AS total_eur
FROM events WHERE user_id NOT IN (3, 5)
GROUP BY event_type
"""


@register("events_snapshot_schema_evolution", sql=_SCHEMA_EVO_SQL)
def events_snapshot_schema_evolution(spark, sf_dir):
    """Additive schema evolution in the snapshot log: append a new
    column, CoW-delete across the evolution, aggregate both columns."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_append,
        snap_delete,
        snap_read,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_schevo_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.where(F.col("user_id") < 8), out)
    snap_append(
        e.where(F.col("user_id") >= 8).withColumn(
            "value_eur",
            F.expr(
                "CAST(value AS DECIMAL(18,2)) * CAST(0.90 AS DECIMAL(3,2))"
            ),
        ),
        out,
    )
    snap_delete(
        spark, out, e.where(F.col("user_id").isin(3, 5)).select("event_id"),
        "event_id",
    )
    return snap_read(spark, out).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.count("value_eur").alias("n_eur"),
        F.sum("value_eur").cast("double").alias("total_eur"),
    )


# ------------------------------------------------ retention-delete gate
# DELETE WHERE ts < cutoff resolved at FILE granularity: after a
# ts-clustering OPTIMIZE, the manifest stats prove most files entirely
# expired (dropped from the manifest without being opened — at 100 TB,
# retiring a month from a time-clustered table is metadata work) or
# entirely surviving (kept byte-identical); only the boundary files are
# rewritten with the row filter. The oracle aggregates the surviving
# rows straight off the raw table — a dropped file that should have
# straddled, a boundary row leaking through, or a stats misread is a
# value mismatch.
_RETENTION_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events WHERE ts >= TIMESTAMP '2024-01-12 00:00:00'
GROUP BY event_type
"""


@register("events_retention_delete", sql=_RETENTION_SQL)
def events_retention_delete(spark, sf_dir):
    """ts-clustering OPTIMIZE, then a stats-resolved retention delete;
    aggregate the surviving snapshot."""
    import datetime
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_delete_where,
        snap_optimize,
        snap_read,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_retention_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e, out)
    snap_optimize(spark, out, "ts", n_files=8)
    snap_delete_where(spark, out, "ts", datetime.datetime(2024, 1, 12))
    return snap_read(spark, out).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ------------------------------------------------ deletion-vector gate
# Delta deletion vectors / Iceberg position deletes: two row-level MOR
# delete waves land as (file, row_index) sidecars with ZERO data files
# rewritten; reads anti-join the positions; compaction then rewrites
# only the dirty files and drops the vector. The gate aggregates the
# table in BOTH states ('mor' and 'compacted' must be identical) and
# carries the metadata-only count per stage — a position leak, a
# resurrection during compaction, or a dv_rows accounting drift is a
# value mismatch. The oracle states the surviving rows directly.
_DV_SQL = """
SELECT 'mor' AS stage, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       (SELECT COUNT(*) FROM events
        WHERE user_id NOT IN (7, 11) AND event_id % 97 != 0) AS n_meta
FROM events WHERE user_id NOT IN (7, 11) AND event_id % 97 != 0
GROUP BY event_type
UNION ALL
SELECT 'compacted' AS stage, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       (SELECT COUNT(*) FROM events
        WHERE user_id NOT IN (7, 11) AND event_id % 97 != 0) AS n_meta
FROM events WHERE user_id NOT IN (7, 11) AND event_id % 97 != 0
GROUP BY event_type
"""


@register("events_deletion_vectors", sql=_DV_SQL)
def events_deletion_vectors(spark, sf_dir):
    """Two deletion-vector delete waves (zero rewrite), aggregate via
    the MOR read, compact the vector, aggregate again."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_compact_dv,
        snap_count,
        snap_delete_rows,
        snap_read,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_dv_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.repartition(8, F.col("user_id")), out)
    snap_delete_rows(
        spark, out, e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    snap_delete_rows(
        spark, out,
        e.where(F.col("event_id") % 97 == 0).select("event_id"),
        "event_id",
    )

    def agg(stage):
        return snap_read(spark, out).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        ).select(
            F.lit(stage).alias("stage"),
            "event_type",
            "n",
            "total_value",
            F.lit(snap_count(out)).cast("bigint").alias("n_meta"),
        )

    mor = agg("mor")
    mor.write.format("noop").mode("overwrite").save()  # materialize pre-compaction
    snap_compact_dv(spark, out)
    return mor.unionByName(agg("compacted"))


# ----------------------------------------------- MERGE-clauses gate
# Full conditional MERGE INTO (WHEN MATCHED AND cond THEN DELETE /
# WHEN MATCHED THEN UPDATE SET / WHEN NOT MATCHED THEN INSERT) over the
# snapshot log: users 3/5 are the matched set (their 'error' rows are
# DELETED by the conditional clause, the rest get value+1.00 via a
# decimal-exact t-expression), user 9's re-keyed rows insert. The
# oracle restates the final table relationally — a clause applied in
# the wrong order, an update leaking onto unmatched rows, or an insert
# duplicated into a rewritten file is a value mismatch.
_MERGE_CLAUSES_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM (
    SELECT event_type, value, user_id FROM events
    WHERE user_id NOT IN (3, 5)
    UNION ALL
    SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) + 1.00 AS DOUBLE) AS value,
           user_id
    FROM events WHERE user_id IN (3, 5) AND event_type <> 'error'
    UNION ALL
    SELECT event_type, value, user_id FROM events WHERE user_id = 9
)
GROUP BY event_type
"""


@register("events_merge_clauses", sql=_MERGE_CLAUSES_SQL)
def events_merge_clauses(spark, sf_dir):
    """Conditional MERGE INTO lifecycle, aggregated per event_type."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_merge_into,
        snap_read,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_mergecl_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.repartitionByRange(8, F.col("user_id")), out)
    src = e.where(F.col("user_id").isin(3, 5)).unionByName(
        e.where(F.col("user_id") == 9).withColumn(
            "event_id", F.col("event_id") + F.lit(10_000_000)
        )
    )
    snap_merge_into(
        spark, out, src, "event_id",
        matched_update={
            "value": "CAST(CAST(t.value AS DECIMAL(18,2)) + 1.00 AS DOUBLE)"
        },
        matched_delete="s.event_type = 'error'",
    )
    return snap_read(spark, out).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --------------------------------- incremental JOIN-view maintenance gate
# IVM for a JOIN, the step past incremental_rollup_cdc's single-table
# aggregate: a materialized orders ⋈ customer rollup follows BOTH base
# tables through their snapshot logs without ever re-executing the full
# join. Bag algebra with signed file-diff deltas (snap_file_deltas):
#
#   agg(A2 ⋈ B2) = agg(A0 ⋈ B0)              -- the view at v0
#                + agg(ΔA ⋈ B2, sign=ΔA.sgn)  -- order changes
#                + agg(A0 ⋈ ΔB, sign=ΔB.sgn)  -- customer changes
#
# (A2 = A0+ΔA and B2 = B0+ΔB make the identity exact; CoW survivors in a
# delta appear with both signs and cancel, counts are ints and sums go
# through decimal(18,2), so cancellation is EXACT). ΔA/ΔB come from
# manifest-diff files only and broadcast against the base scans — the
# maintained refresh never shuffles the big side and never re-joins
# A2 ⋈ B2; the oracle aggregates that full final join directly.
_INC_JOIN_SQL = """
WITH o2 AS (
    SELECT o_custkey,
           CASE WHEN o_custkey % 10 = 3 THEN o_totalprice + 100.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_custkey % 10 <> 4
    UNION ALL
    SELECT o_custkey, o_totalprice FROM orders WHERE o_custkey % 10 = 7
),
c2 AS (
    SELECT c_custkey, c_nationkey,
           CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 50.0
                ELSE c_acctbal END AS c_acctbal
    FROM customer WHERE c_nationkey <> 5
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS balance_weight
FROM o2 JOIN c2 ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


# Dual-table lifecycle = fixture (phase-built, the _incroll_fixture
# discipline); the measured operator is the signed-delta IVM fold.
_INCJOIN_MEMO: dict = {}
_memo_register(_INCJOIN_MEMO)


def _incjoin_fixture(spark, sf_dir) -> tuple[str, str]:
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_delete,
        snap_merge,
        snap_write,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _INCJOIN_MEMO.get(key)
    if cached is not None:
        return cached
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    po = os.path.join(
        tempfile.gettempdir(), f"ccs_orders_incjoin_{sf_tag}_{os.getpid()}"
    )
    pc = os.path.join(
        tempfile.gettempdir(), f"ccs_customer_incjoin_{sf_tag}_{os.getpid()}"
    )
    for p in (po, pc):
        if os.path.isdir(p):
            shutil.rmtree(p)

    # the orders and customer version chains are fully independent
    # (different tables, different commit logs) — run the whole customer
    # chain on a side thread overlapping the orders chain (guide §2.6)
    from cargo_chat_spark.functions.overlap import spawn_job

    def _customer_chain():
        snap_write(c, pc)
        # customer: MERGE first (acctbal bump for BUILDING — includes
        # some nation-5 rows), THEN delete nation 5, so the delete wins.
        upd_c = c.where(F.col("c_mktsegment") == "BUILDING").withColumn(
            "c_acctbal", F.col("c_acctbal") + F.lit(50.0)
        )
        snap_merge(spark, pc, upd_c, "c_custkey")
        snap_delete(
            spark, pc,
            c.where(F.col("c_nationkey") == 5).select("c_custkey"),
            "c_custkey",
        )

    side = spawn_job(_customer_chain)
    snap_write(o, po)
    # orders: MERGE (price bump for %10==3, new orders for %10==7), then
    # delete %10==4. Inserted keys are original+1e8 — never deleted.
    upd_o = o.where(F.col("o_custkey") % 10 == 3).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    ins_o = o.where(F.col("o_custkey") % 10 == 7).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100_000_000)
    )
    snap_merge(spark, po, upd_o.unionByName(ins_o), "o_orderkey")
    snap_delete(
        spark, po,
        o.where(F.col("o_custkey") % 10 == 4).select("o_orderkey"),
        "o_orderkey",
    )
    side.join()
    _INCJOIN_MEMO[key] = (po, pc)
    return po, pc


@register("incremental_join_cdc", sql=_INC_JOIN_SQL)
def incremental_join_cdc(spark, sf_dir):
    """Maintain the per-nation orders ⋈ customer rollup from v0 to v2 of
    BOTH tables using only their manifest-diff deltas; must equal the
    oracle's direct aggregate of the final joined state."""
    from cargo_chat_spark.sources.snapshots import (
        snap_file_deltas,
        snap_read,
    )

    from cargo_chat_spark.streaming.ivm_stream import _nation_rollup

    po, pc = _incjoin_fixture(spark, sf_dir)
    one = F.lit(1)
    a0 = snap_read(spark, po, 0).withColumn("sgn", one)
    b0 = snap_read(spark, pc, 0).withColumn("sgn", one)
    b2 = snap_read(spark, pc, 2).withColumn("sgn", one)
    d_a = snap_file_deltas(spark, po, 0, 2)
    d_b = snap_file_deltas(spark, pc, 0, 2)

    # every term pre-aggregates BOTH join sides by custkey before the
    # join (streaming/ivm_stream._nation_rollup, guide §2.3): the joins
    # probe key-cardinality signed aggregates in exact integer cents
    # instead of raw rows; the file-diff sides still broadcast. cents
    # long → /100.0 double is the same correctly-rounded rational the
    # decimal-sum → double cast produced.
    view0 = _nation_rollup(a0, b0)
    t_a = _nation_rollup(d_a, b2, bcast_orders=True)
    t_b = _nation_rollup(a0, d_b, bcast_cust=True)
    return (
        view0.unionByName(t_a).unionByName(t_b)
        .groupBy("c_nationkey")
        .agg(
            F.sum("dn").cast("bigint").alias("n_orders"),
            (F.sum("dr") / 100.0).alias("revenue"),
            (F.sum("db") / 100.0).alias("balance_weight"),
        )
        .where(F.col("n_orders") > 0)
    )


@register("ivm_view_follow", sql=_INC_JOIN_SQL)
def ivm_view_follow(spark, sf_dir):
    """The STREAMING-shaped twin of incremental_join_cdc: the same
    final state reached through SEQUENTIAL ivm_refresh calls (init →
    orders MERGE → orders delete + customer MERGE → customer delete),
    exercising refresh COMPOSITION (v0→v1 then v1→v2 == v0→v2) and the
    version-fenced sidecar state (streaming/ivm_stream.py) instead of
    the one-shot delta algebra. Must equal the same direct-join oracle."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        snap_delete,
        snap_merge,
        snap_write,
    )
    from cargo_chat_spark.streaming.ivm_stream import (
        _state_path,
        ivm_refresh,
        view_frame,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    po = os.path.join(
        tempfile.gettempdir(), f"ccs_orders_ivmf_{sf_tag}_{os.getpid()}"
    )
    pc = os.path.join(
        tempfile.gettempdir(), f"ccs_customer_ivmf_{sf_tag}_{os.getpid()}"
    )
    vp = os.path.join(
        tempfile.gettempdir(), f"ccs_view_ivmf_{sf_tag}_{os.getpid()}"
    )
    for p in (po, pc):
        if os.path.isdir(p):
            shutil.rmtree(p)
    if os.path.exists(_state_path(vp)):
        os.remove(_state_path(vp))

    # the two base-table writes are independent jobs — overlap them
    # (guide §2.6; the refresh below needs both, so join first)
    from cargo_chat_spark.functions.overlap import spawn_job

    wc = spawn_job(lambda: snap_write(c, pc))
    snap_write(o, po)
    wc.join()
    ivm_refresh(spark, vp, po, pc)  # materialize the v0 ⋈ v0 base

    upd_o = o.where(F.col("o_custkey") % 10 == 3).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    ins_o = o.where(F.col("o_custkey") % 10 == 7).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100_000_000)
    )
    snap_merge(spark, po, upd_o.unionByName(ins_o), "o_orderkey")
    ivm_refresh(spark, vp, po, pc)  # follow orders v0→v1

    # the orders CoW delete and the customer MERGE mutate DIFFERENT
    # tables — independent commit chains, overlapped (guide §2.6); the
    # dual-advance refresh below consumes both, so join first
    dl = spawn_job(
        lambda: snap_delete(
            spark, po,
            o.where(F.col("o_custkey") % 10 == 4).select("o_orderkey"),
            "o_orderkey",
        )
    )
    upd_c = c.where(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(50.0)
    )
    snap_merge(spark, pc, upd_c, "c_custkey")
    dl.join()
    ivm_refresh(spark, vp, po, pc)  # both tables advanced in one refresh

    snap_delete(
        spark, pc,
        c.where(F.col("c_nationkey") == 5).select("c_custkey"),
        "c_custkey",
    )
    ivm_refresh(spark, vp, po, pc)  # customer-only advance
    return view_frame(spark, vp)


# ------------------------------------------------------- ORC round-trip
# Fourth interchange format (the columnar sibling): unlike the text
# formats ORC carries its own schema and microsecond timestamps, so the
# gate pins binary-columnar fidelity (value doubles bit-exact, ts to the
# microsecond, props nulls preserved) rather than parse decisions. Same
# aggregate contract as the CSV/JSONL gates, same oracle.
_ORC_SQL = """
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


@register("events_orc_roundtrip", sql=_ORC_SQL)
def events_orc_roundtrip(spark, sf_dir):
    """Write events as ORC, read back, aggregate — value parity proves
    the columnar round-trip is lossless (including native-ORC timestamp
    microseconds and props nulls)."""
    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_orc_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    e.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.col("props").isNull().cast("int"))
        .cast("bigint")
        .alias("null_props"),
    )


# --------------------------------------- small-file compaction (binpack)
# The streaming-sink residue problem: per-batch commits accumulate many
# small files; plain OPTIMIZE (bin-packing) rewrites ONLY those, leaving
# large files byte-identical — O(small files), never O(table). The gate
# builds the residue shape (one base write + 4 small appends), lands a
# MoR delete so compaction must materialize the deletion vector for the
# rewritten files, compacts, and aggregates the result — any lost/dup
# row or resurrected delete is a value mismatch vs the logical oracle.
_COMPACT_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
FROM events WHERE user_id NOT IN (7, 11)
GROUP BY event_type
"""


@register("events_compact_small_files", sql=_COMPACT_SQL)
def events_compact_small_files(spark, sf_dir):
    """Streaming-residue table (base + 4 small appends + MoR delete) →
    snap_compact_files → aggregate of the compacted table."""
    import shutil

    from cargo_chat_spark.sources.snapshots import (
        manifest,
        snap_append,
        snap_compact_files,
        snap_delete_rows,
        snap_read,
        snap_write,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(
        tempfile.gettempdir(),
        f"ccs_events_compact_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    snap_write(e.where(F.col("user_id") % 5 == 0), out)
    for m in range(1, 5):  # the small-file residue: one file per wave
        snap_append(e.where(F.col("user_id") % 5 == m).coalesce(1), out)
    snap_delete_rows(
        spark, out,
        e.where(F.col("user_id").isin(7, 11)).select("event_id"),
        "event_id",
    )
    pre_files = len(manifest(out)["files"])
    v = snap_compact_files(spark, out, small_bytes=1 << 30,
                           target_bytes=1 << 21)
    assert len(manifest(out, v)["files"]) < pre_files
    return snap_read(spark, out, v).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("users"),
    )


# ------------------------------------------ HRW (rendezvous) sharding
# The data-placement member of the storage family: highest-random-
# weight hashing assigns each doc to the shard whose md5 weight
# h32('hrw|shard|doc') is largest. The property that matters at
# 100 TB: growing S shards to S+1 moves only ~1/(S+1) of the data —
# every unmoved doc's winning weight is unchanged — where mod-hash
# placement moves ~S/(S+1) (a full reshuffle). This gate measures BOTH
# on the same corpus so the card shows the gap directly, and because
# the weights are the shared engine-portable md5, the whole report
# value-hashes. Plan: one explode(S) + per-doc WindowGroupLimit argmax
# per shard count — map-side work, one small aggregate; no stored
# placement table (the assignment is re-derivable anywhere, the
# jl_projection discipline).
HRW_SHARDS = 8


def _hrw_assign_sql(n: int) -> str:
    from cargo_chat_spark.functions.hashing import h32_sql

    w = h32_sql(
        "'hrw|' || CAST(s.shard AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR)"
    )
    return f"""
    SELECT doc_id, shard FROM (
        SELECT d.doc_id, s.shard,
               row_number() OVER (
                   PARTITION BY d.doc_id ORDER BY {w} DESC, s.shard
               ) AS rk
        FROM (SELECT doc_id FROM documents) d,
             unnest(generate_series(0, {n - 1})) AS s(shard)
    ) WHERE rk = 1"""


_HRW_SQL = f"""
WITH a8 AS ({_hrw_assign_sql(HRW_SHARDS)}),
a9 AS ({_hrw_assign_sql(HRW_SHARDS + 1)})
SELECT a8.shard,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN a9.shard <> a8.shard THEN 1 ELSE 0 END)
         AS BIGINT) AS n_moved_hrw,
    CAST(SUM(CASE WHEN (a8.doc_id % {HRW_SHARDS})
                    <> (a8.doc_id % {HRW_SHARDS + 1}) THEN 1 ELSE 0 END)
         AS BIGINT) AS n_moved_mod
FROM a8 JOIN a9 USING (doc_id)
GROUP BY a8.shard
"""


def _hrw_assign(spark, sf_dir, n: int):
    from pyspark.sql import Window

    from cargo_chat_spark.functions.hashing import h32

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    shards = F.explode(
        F.array(*[F.lit(s) for s in range(n)])
    ).alias("shard")
    w = h32(
        F.concat(
            F.lit("hrw|"),
            F.col("shard").cast("string"),
            F.lit("|"),
            F.col("doc_id").cast("string"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        w.desc(), F.asc("shard")
    )
    return (
        d.select("doc_id", shards)
        .withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") == 1)
        .select("doc_id", "shard")
    )


@register("hrw_reshard_report", sql=_HRW_SQL)
def hrw_reshard_report(spark, sf_dir):
    """Per-shard movement when HRW placement grows 8 → 9 shards,
    against mod-hash movement on the same docs: the consistent-hashing
    guarantee (≈1/9 moved vs ≈8/9) as a value-hashed card."""
    a8 = _hrw_assign(spark, sf_dir, HRW_SHARDS)
    a9 = _hrw_assign(spark, sf_dir, HRW_SHARDS + 1).select(
        "doc_id", F.col("shard").alias("shard9")
    )
    return (
        a8.join(a9, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                (F.col("shard9") != F.col("shard")).cast("long")
            ).cast("bigint").alias("n_moved_hrw"),
            F.sum(
                (
                    (F.col("doc_id") % HRW_SHARDS)
                    != (F.col("doc_id") % (HRW_SHARDS + 1))
                ).cast("long")
            ).cast("bigint").alias("n_moved_mod"),
        )
    )


# bench phase split for the two IVM gates: lifecycle = build, fold = probe
from cargo_chat_spark.queries.registry import register_phase_builder as _rpb
from cargo_chat_spark.functions.localframe import local_frame

_rpb("incremental_rollup_cdc", _incroll_fixture)
_rpb("incremental_join_cdc", _incjoin_fixture)
