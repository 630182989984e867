"""Product/time-series analytics over the ``events`` table (round-5 wave 3).

Beyond-reference operators a training-data/product pipeline needs at scale:
calendar gap-fill with last-observation-carried-forward (the hypertable
rollup pattern), trailing-window distinct actives, co-occurrence mining,
statistical outlier flagging, and set-algebra cohort definitions.

Cross-engine rules follow ``queries/registry.py``: money-like sums routed
through DECIMAL (exact, shuffle-order-proof), floats rounded before any
filter that could straddle an ulp, every top-k under a total order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

# ----------------------------------------------------- gap-fill + LOCF
# Hypertable-style rollup: hourly per-type totals on a DENSE calendar spine
# (missing hours materialized), gaps filled by carrying the last observed
# value forward. Scale shape: the heavy stage is the hourly groupBy (map-side
# partial agg over the raw events); the spine explode and the LOCF window run
# AFTER aggregation, on O(types x hours) rows — bounded by calendar time, not
# data volume, so the per-type window state stays tiny even at 100 TB
# (10 years = 87,600 rows per type).
_GAP_FILL_SQL = """
WITH hourly AS (
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS hour_sum,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2),
bounds AS (
    SELECT event_type, MIN(hour_start) AS mn, MAX(hour_start) AS mx
    FROM hourly GROUP BY 1),
spine AS (
    SELECT event_type,
           unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS hour_start
    FROM bounds)
SELECT s.event_type, s.hour_start,
       last_value(h.hour_sum IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.hour_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
       h.hour_sum IS NOT NULL AS is_observed,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN hourly h USING (event_type, hour_start)
"""


@register("events_gap_fill_locf", sql=_GAP_FILL_SQL)
def events_gap_fill_locf(spark, sf_dir):
    """Dense hourly rollup per event type with LOCF gap filling.

    Spine bounds are each type's own [min, max] observed hour;
    ``filled_sum`` carries the last non-null hourly total forward (exact:
    hourly sums are decimal-routed before the double cast, so both engines
    carry bit-identical values)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_start").alias("mn"), F.max("hour_start").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("hour_start"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hour_start"], "left").select(
        "event_type",
        "hour_start",
        F.last("hour_sum", ignorenulls=True).over(w).alias("filled_sum"),
        F.col("hour_sum").isNotNull().alias("is_observed"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
    )


# ----------------------------------------------- trailing 7-day actives
# Rolling distinct-count via EXPLODE, not a range self-join: each (user, day)
# contributes itself to the 7 report days it is visible from, then a plain
# distinct-count groupBy. Map-side 7x inflation of the (already distinct)
# user-day set beats a per-day range join at scale — no broadcast, no skew,
# and Spark's window frames can't do COUNT(DISTINCT) anyway.
_ROLLING_7D_SQL = """
WITH user_days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
spine AS (SELECT DISTINCT CAST(ts AS DATE) AS report_day FROM events),
expanded AS (
    SELECT user_id,
           unnest(generate_series(d, d + INTERVAL '6 days',
                                  INTERVAL '1 day'))::DATE AS report_day
    FROM user_days)
SELECT s.report_day,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
FROM spine s JOIN expanded e USING (report_day)
GROUP BY 1
"""


@register("rolling_7d_actives", sql=_ROLLING_7D_SQL)
def rolling_7d_actives(spark, sf_dir):
    """Distinct users active in the trailing 7 days, per observed day."""
    e = load_table(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    spine = e.select(F.col("ts").cast("date").alias("report_day")).distinct()
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.sequence("d", F.date_add("d", 6), F.expr("interval 1 day"))
        ).alias("report_day"),
    )
    return (
        spine.join(expanded, "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users_7d"))
    )


# --------------------------------------------------- type co-occurrence
# Market-basket style: for each unordered pair of event types, how many
# users exhibit both. The self-join key is user_id over the DISTINCT
# (user, type) set, so each user contributes at most C(|types|, 2) pairs —
# bounded by type cardinality, not event volume. For open-ended item
# domains (e.g. SKUs) the same plan needs the hot-basket cap used by
# `operators/dedup.py::cap_hot_buckets`; with a closed enum it is exact.
_COOC_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


@register("event_type_cooccurrence", sql=_COOC_SQL)
def event_type_cooccurrence(spark, sf_dir):
    """Users-in-common count for every unordered event-type pair."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


# ------------------------------------------------------ z-score outliers
# Per-type population mean/std from EXACT decimal sums (value has 2 dp, so
# sum and sum-of-squares are both exactly representable); the double-domain
# math downstream is then bit-identical in both engines. The filter runs on
# the ROUNDED z so a boundary value can't straddle the threshold across
# engines. One scan + tiny stats broadcast — zero extra shuffles.
_ZSCORE_THRESHOLD = 2.0

_ZSCORE_SQL = f"""
WITH stats AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value AS DECIMAL(18,2))
                    * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
    FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6)
           AS zscore
FROM events e JOIN stats USING (event_type)
WHERE abs(round((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6))
      >= {_ZSCORE_THRESHOLD}
"""


@register("value_zscore_outliers", sql=_ZSCORE_SQL)
def value_zscore_outliers(spark, sf_dir):
    """Events whose value is >= 2 population std-devs from their type mean."""
    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = F.round((F.col("value") - mean) / std, 6)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .where(F.abs(F.col("zscore")) >= F.lit(_ZSCORE_THRESHOLD))
    )


# ------------------------------------------------- set-algebra cohorts
# INTERSECT / EXCEPT — the one relational-algebra family previously ungated.
# Cohort: high-value purchasers (per-user purchase total > 700, exact
# decimal) who signed up in week 1, minus error-prone users (> 15 errors).
# Each leg is a map-side-combinable aggregate; the set ops are hash
# semi/anti joins on a single bigint key.
_SET_OPS_SQL = """
SELECT user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    HAVING CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) > 700
    INTERSECT
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-08')
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
GROUP BY 1 HAVING COUNT(*) > 15
"""


@register("engaged_clean_users", sql=_SET_OPS_SQL)
def engaged_clean_users(spark, sf_dir):
    """High-value week-1 purchasers minus error-prone users (set algebra)."""
    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    high_value = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec).cast("double").alias("total"))
        .where(F.col("total") > 700)
        .select("user_id")
    )
    early_signup = (
        e.where(
            (F.col("event_type") == "signup")
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        )
        .select("user_id")
        .distinct()
    )
    error_prone = (
        e.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 15)
        .select("user_id")
    )
    return high_value.intersect(early_signup).subtract(error_prone)


# ------------------------------------------- cogrouped pandas alignment
# The cogroup → applyInPandas surface: two frames grouped on the same key,
# each key's pair of pandas frames handed to one Python function. The
# relational as-of join (operators/asof.py) is the PREFERRED form for this
# particular semantics — this entry exists to exercise (and gate) the
# cogroup machinery the engine offers for per-key merges SQL genuinely
# can't express (custom sequence alignment, per-entity model state, DTW).
# pandas merge_asof(allow_exact_matches=False) picks the last row strictly
# before the key in (ts, event_id) sort order == the oracle's ORDER BY
# ts DESC, event_id DESC LIMIT 1 lateral — deterministic on ties.
# Scale: one shuffle per side on user_id; Arrow batches per key group —
# BUT the per-group Python function call dominates with many small keys:
# measured 13.1 s at sf0.1 vs 0.92 s for the relational union-and-carry
# as-of (events_asof_join) on the same host — a ~14x Python-boundary tax.
# That contrast is the point: reach for cogroup only when the per-key
# logic is genuinely inexpressible relationally.
_COGROUP_ASOF_SQL = """
SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
       v.event_id AS view_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
FROM events p
LEFT JOIN LATERAL (
   SELECT event_id, ts FROM events v
   WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts
   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) v ON TRUE
WHERE p.event_type = 'purchase'
"""

_COGROUP_SCHEMA = (
    "user_id bigint, purchase_id bigint, purchase_ts timestamp, "
    "view_id bigint, gap_us bigint"
)


def _align_purchases_views(left, right):
    import pandas as pd

    left = left.sort_values(["ts", "event_id"]).reset_index(drop=True)
    out = pd.DataFrame(
        {
            "user_id": left["user_id"],
            "purchase_id": left["event_id"],
            "purchase_ts": left["ts"],
        }
    )
    if len(right) == 0:
        out["view_id"] = pd.Series([None] * len(left), dtype="object")
        out["gap_us"] = pd.Series([None] * len(left), dtype="object")
        return out
    right = right.sort_values(["ts", "event_id"]).reset_index(drop=True)
    merged = pd.merge_asof(
        left[["ts", "event_id"]].rename(columns={"event_id": "purchase_id"}),
        right[["ts", "event_id"]].rename(columns={"event_id": "view_id"}),
        on="ts",
        direction="backward",
        allow_exact_matches=False,
    )
    out["view_id"] = merged["view_id"].astype("object").where(
        merged["view_id"].notna(), None
    )
    # merge_asof keeps only the left key column — re-derive the matched
    # view's ts by mapping view_id back, then gap in integer microseconds
    view_ts = merged["view_id"].map(right.set_index("event_id")["ts"])
    gaps = (
        left["ts"].values.astype("datetime64[us]").astype("int64")
        - view_ts.values.astype("datetime64[us]").astype("int64")
    )
    out["gap_us"] = [
        int(g) if pd.notna(v) else None
        for g, v in zip(gaps, merged["view_id"])
    ]
    return out


@register("cogroup_purchase_view_asof", sql=_COGROUP_ASOF_SQL)
def cogroup_purchase_view_asof(spark, sf_dir):
    """Last view strictly before each purchase, per user — computed with
    cogroup().applyInPandas + pandas merge_asof (see note)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(_align_purchases_views, _COGROUP_SCHEMA)
    )


# --------------------------------------------------- Python UDTF spans
# Spark 4 user-defined TABLE function surface: one input row → N output
# rows from Python, invoked via SQL LATERAL join. The example emits
# token spans WITH CHARACTER OFFSETS — the shape span-level redaction /
# annotation pipelines need and plain explode() drops (explode gives the
# token, not where it was). Literal single-space split on both sides, so
# offsets are exact integers and the oracle (window-summed lengths) is
# bit-identical. Scale: the UDTF runs inside the scan's partitioning like
# any projection; no shuffle. Prefer built-in explode when offsets are
# not needed — the UDTF exists for the 1→N PYTHON row generator case.
_SPANS_SQL = """
WITH toks AS (
    SELECT doc_id, i AS ord, string_split(text, ' ')[i] AS tok
    FROM documents,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS u(i))
SELECT doc_id, CAST(ord AS BIGINT) AS ord, tok,
       CAST(COALESCE(SUM(len(tok) + 1) OVER (
           PARTITION BY doc_id ORDER BY ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_off,
       CAST(len(tok) AS BIGINT) AS tok_len
FROM toks
"""


@register("token_spans_udtf", sql=_SPANS_SQL)
def token_spans_udtf(spark, sf_dir):
    """Token spans with character offsets via a Python UDTF + LATERAL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ord bigint, tok string, start_off bigint, tok_len bigint")
    class TokenSpans:
        def eval(self, text: str):
            off = 0
            for i, tok in enumerate((text or "").split(" "), start=1):
                yield i, tok, off, len(tok)
                off += len(tok) + 1

    spark.udtf.register("token_spans", TokenSpans)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "docs_for_spans_v"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.ord, s.tok, s.start_off, s.tok_len
        FROM docs_for_spans_v d, LATERAL token_spans(d.text) s
        """
    )


# ------------------------------------------- time-interval window frames
# RANGE BETWEEN <interval> PRECEDING — the trailing-window form keyed by
# EVENT TIME, not row position (a rows-frame is wrong under irregular
# arrival gaps; events_moving_avg gates the rows-frame twin). The order
# key is integer epoch MICROS in both engines, so frame boundaries are
# exact and peer-row semantics (equal timestamps) agree. One shuffle on
# event_type; the running frame is maintained per partition in a single
# sort pass. The summed value is exact DECIMAL, so in-frame accumulation
# order cannot drift the hash.
_TRAILING_1H_SQL = """
SELECT event_id, event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h
FROM (SELECT event_id, event_type, value,
             CAST(epoch_us(ts) AS BIGINT) AS us FROM events)
WINDOW w AS (PARTITION BY event_type ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@register("events_trailing_1h_sum", sql=_TRAILING_1H_SQL)
def events_trailing_1h_sum(spark, sf_dir):
    """Per-event trailing-1-hour sum/count over event time (RANGE frame)."""
    e = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select("event_id", "event_type", "value", us.alias("us"))
        .select(
            "event_id",
            "event_type",
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("sum_1h"),
            F.count(F.lit(1)).over(w).alias("n_1h"),
        )
    )


# --------------------------------------------- bitmap-exact distinct counts
# Spark 4's bitmap aggregate family: user ids are folded into per-bucket
# bitmaps (bitmap_bucket_number / bitmap_bit_position), counted per
# bucket, and the per-day total is a SUM of bucket counts. This is the
# EXACT re-aggregatable distinct — at 100 TB the per-(day, bucket) bitmap
# is a tiny mergeable state (like a sketch, but lossless), where
# COUNT(DISTINCT) shuffles every id. The oracle is a plain
# COUNT(DISTINCT), so the whole bitmap path is value-checked.
_BITMAP_DAU_SQL = """
SELECT CAST(ts AS DATE) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM events
GROUP BY 1
"""


@register("daily_active_bitmap", sql=_BITMAP_DAU_SQL)
def daily_active_bitmap(spark, sf_dir):
    """Daily distinct actives via two-level bitmap aggregation
    (bucket bitmaps, then a sum of bucket cardinalities)."""
    e = load_table(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day", "bucket")
        .agg(
            F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("bucket_cnt")
        )
    )
    return per_bucket.groupBy("day").agg(
        F.sum("bucket_cnt").cast("bigint").alias("active_users")
    )


# --------------------------------------------------- HLL sketch rollup
# The Datasketches HLL surface (Spark 4): per-day sketches built once,
# then MERGED into weekly cardinalities with hll_union_agg — the
# re-aggregatable approximate rollup a 100 TB metrics store actually
# materializes (daily sketch partitions, any coarser window unioned on
# read, never re-scanning raw events). The sketch ESTIMATE is
# engine-specific (DuckDB has no compatible HLL), but the error-bound
# boolean is deterministic (r9 verdict item 4): Datasketches HLL union
# is register-max (merge-order independent), so est vs the exact weekly
# distinct is a fixed ratio per dataset — the gate hashes the exact
# count, the day count, and the <=5% bound the sketch must honor. The
# numeric margin stays pinned in tests/test_sketch_bounds.py.
_HLL_EPS = 0.05

_WEEKLY_HLL_SQL = """
SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       TRUE AS within_5pct
FROM events
GROUP BY 1
"""


@register("weekly_hll_rollup", sql=_WEEKLY_HLL_SQL)
def weekly_hll_rollup(spark, sf_dir):
    """Weekly distinct-user estimates by merging per-day HLL sketches,
    value-hash gated via the deterministic error bound against the exact
    weekly distinct (the production rollup is the sketch half alone; the
    exact half exists because this is the evaluation gate)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.date_trunc("week", "ts").alias("week"),
            F.to_date("ts").alias("day"),
            "user_id",
        )
        .groupBy("week", "day")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    )
    est = daily.groupBy("week").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    exact = (
        e.select(F.date_trunc("week", "ts").alias("week"), "user_id")
        .groupBy("week")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
    )
    return (
        est.join(exact, "week")
        .select(
            F.col("week").cast("date").alias("week"),
            "exact_users",
            "n_days",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= F.lit(_HLL_EPS) * F.col("exact_users")
            ).alias("within_5pct"),
        )
    )


# --------------------------------------------------- ordered funnel depth
# Classic conversion funnel with STRICT event ordering: a user converts a
# stage only if its first qualifying event happens AFTER the previous
# stage's first qualifying event (first-touch semantics — min timestamps
# chain). Scale shape: ONE shuffle (partition by user); the three stage
# timestamps are nested window minima over the SAME partitioning, so
# Catalyst runs them in one Window stage chain without re-exchanging;
# the per-user collapse is a map-side-combinable max; the final
# stage-count explode is a stack() over one aggregate row. The oracle
# spells the same semantics as a min-timestamp JOIN CHAIN — equality
# re-proves the nested-window and join-chain forms agree.
_FUNNEL_WINDOW = "24 HOURS"

_FUNNEL_SQL = f"""
WITH v AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN v ON v.user_id = e.user_id
     AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL {_FUNNEL_WINDOW}
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN c ON c.user_id = e.user_id
     AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL {_FUNNEL_WINDOW}
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'view' AS stage, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS users
UNION ALL
SELECT 'view_click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
UNION ALL
SELECT 'view_click_purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
"""


@register("funnel_conversion", sql=_FUNNEL_SQL)
def funnel_conversion(spark, sf_dir):
    """view → click → purchase funnel depth (first-touch, strictly
    increasing timestamps, each stage within _FUNNEL_WINDOW of the
    previous), one row per stage with converted-user counts."""
    e = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {_FUNNEL_WINDOW}")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + win),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + win),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    totals = per_user.agg(
        F.sum(F.col("t1").isNotNull().cast("long")).alias("v"),
        F.sum(F.col("t2").isNotNull().cast("long")).alias("c"),
        F.sum(F.col("t3").isNotNull().cast("long")).alias("p"),
    )
    return totals.selectExpr(
        "stack(3, 'view', v, 'view_click', c, 'view_click_purchase', p)"
        " AS (stage, users)"
    )
