"""Relational core queries over the TPC-H-ish tables — exercises the
aggregation / join / sort / limit surface (SURVEY §2.5 O-ops, §2.6 A-ops)
on engine-neutral data.

DECIMAL(18,2) routing for money sums: exact integer arithmetic in both
engines, so the value hash can't drift with float summation order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cargo_chat_spark.sources.testdata import load_table
from cargo_chat_spark.queries.registry import register

_PRICING_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS sum_disc_price,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", sql=_PRICING_SQL)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary. Map-side partial aggregation on
    (l_returnflag, l_linestatus); the shipdate filter and 4-column pruning
    push down to the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TOP_CUSTOMERS_SQL = """
SELECT
    c.c_custkey,
    c.c_name,
    n.n_name AS nation,
    COUNT(*) AS order_cnt,
    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY total_spend DESC, c_custkey
LIMIT 10
"""


@register("top_customers", sql=_TOP_CUSTOMERS_SQL)
def top_customers(spark, sf_dir):
    """Join + agg + deterministic top-n. nation (25 rows) broadcasts;
    customer⋈orders is a shuffle join on the key both sides group by, so
    the agg reuses the join partitioning (one shuffle, not two)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
    COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("revenue_rollup", sql=_ROLLUP_SQL)
def revenue_rollup(spark, sf_dir):
    """GROUP BY ROLLUP — hierarchical subtotals (flag, status) → (flag) →
    grand total, one pass. Spark expands rollup into a single Expand +
    hash aggregate: no extra scans for the subtotal levels."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_OUTER_SQL = """
SELECT p.p_partkey, p.p_brand,
    COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0)
        AS bulk_qty,
    COUNT(l.l_orderkey) AS bulk_lines
FROM part p
LEFT JOIN lineitem l
    ON l.l_partkey = p.p_partkey AND l.l_quantity > 45
GROUP BY p.p_partkey, p.p_brand
"""


@register("part_bulk_outer", sql=_OUTER_SQL)
def part_bulk_outer(spark, sf_dir):
    """LEFT OUTER join with a selective join-side predicate: unmatched
    parts survive with zeroed aggregates (COUNT of the null side = 0)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        p.join(
            l,
            (l.l_partkey == p.p_partkey) & (l.l_quantity > 45),
            "left",
        )
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.coalesce(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
                F.lit(0.0),
            ).alias("bulk_qty"),
            F.count("l_orderkey").alias("bulk_lines"),
        )
    )


_RUNNING_SQL = """
WITH monthly AS (
    SELECT c.c_mktsegment AS segment,
        CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
)
SELECT segment, month, month_total,
    CAST(SUM(CAST(month_total AS DECIMAL(18,2))) OVER (
        PARTITION BY segment ORDER BY month
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS DOUBLE) AS running_total
FROM monthly
"""


@register("segment_running_totals", sql=_RUNNING_SQL)
def segment_running_totals(spark, sf_dir):
    """Cumulative window over monthly aggregates per market segment — the
    agg output is already partitioned by segment, so the window reuses the
    groupBy shuffle (one exchange total)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("month_total")
        )
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.withColumn(
        "running_total",
        F.sum(F.col("month_total").cast("decimal(18,2)")).over(w).cast("double"),
    )


# ------------------------------------------------------- exact percentiles
# Exact linear-interpolated quantiles (both engines use the type-7 /
# "continuous" definition: value at rank p*(n-1), interpolated). At 100 TB
# the exact form is one shuffle of per-group sorted states; the sketch form
# (percentile_approx / KLL) is the exit ramp when groups stop fitting —
# engine sketches differ, so the EXACT form is the oracle-checkable one.
_PCT_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99
FROM events
GROUP BY event_type
"""


@register("event_value_percentiles", sql=_PCT_SQL)
def event_value_percentiles(spark, sf_dir):
    """p50/p95/p99 of ``value`` per event type — exact interpolated
    percentiles (Spark ``percentile`` == DuckDB ``quantile_cont``)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


_APPROX_PCT_ACCURACY = 10_000
# GK guarantees rank error <= 1/accuracy = 1e-4; the gate allows 10x
# margin so legitimate sketch-merge-order wiggle can never flip the
# boolean while a real accuracy regression (wrong accuracy parameter,
# wrong column, a sketch swap) still trips it. The realized bound adds
# 1/n per group: the estimate is an ELEMENT of the data, so its rank
# fraction is quantized to 1/n steps and can sit a full step from q
# even at perfect sketch accuracy (at sf0.001 a 199-row group has
# 0.005-step granularity, dwarfing the sketch term).
_APPROX_PCT_RANK_EPS = 0.001

_PCT_APPROX_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       TRUE AS p50_rank_ok,
       TRUE AS p95_rank_ok,
       TRUE AS p99_rank_ok
FROM events
GROUP BY event_type
"""


@register("event_value_percentiles_approx", sql=_PCT_APPROX_SQL)
def event_value_percentiles_approx(spark, sf_dir):
    """Sketch twin of event_value_percentiles — what a 100 TB pipeline
    actually runs: ``percentile_approx`` (Greenwald-Khanna sketch,
    rank error <= 1/accuracy) needs only bounded per-group sketch state
    and merges map-side, where the exact form shuffles every value to its
    group's sorter. The sketch VALUES are engine-specific (DuckDB's
    approx quantile is t-digest), so the value-hash gate is GK's own
    contract made deterministic (r9 verdict item 4): for each estimate,
    the realized rank fraction |{v <= est}|/n must sit within
    q ± 1e-3 (10x the guaranteed 1/accuracy) — booleans that hash
    identically in both engines when the sketch honors its bound. The
    numeric error is additionally pinned in
    tests/test_ann_recall.py::test_approx_percentile_error."""
    e = load_table(spark, sf_dir, "events")
    acc = F.lit(_APPROX_PCT_ACCURACY)
    est = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", F.lit(0.5), acc).alias("e50"),
        F.percentile_approx("value", F.lit(0.95), acc).alias("e95"),
        F.percentile_approx("value", F.lit(0.99), acc).alias("e99"),
    )
    # realized rank of each estimate: one broadcast join back onto the
    # events scan + one conditional-count aggregate (map-side combinable)
    ranked = (
        e.select("event_type", "value")
        .join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.sum((F.col("value") <= F.col("e50")).cast("long")).alias("r50"),
            F.sum((F.col("value") <= F.col("e95")).cast("long")).alias("r95"),
            F.sum((F.col("value") <= F.col("e99")).cast("long")).alias("r99"),
        )
    )
    eps = _APPROX_PCT_RANK_EPS

    def ok(r, q):
        frac = F.col(r).cast("double") / F.col("n")
        slack = F.lit(eps) + F.lit(1.0) / F.col("n")
        return (frac >= F.lit(q) - slack) & (frac <= F.lit(q) + slack)

    return ranked.select(
        "event_type",
        "n",
        ok("r50", 0.5).alias("p50_rank_ok"),
        ok("r95", 0.95).alias("p95_rank_ok"),
        ok("r99", 0.99).alias("p99_rank_ok"),
    )


# ----------------------------------------------- multi-way join pipelines
# TPC-H Q3/Q5-shaped queries: the reference's join surface is two-table
# (J1-J3); a warehouse engine needs the canonical 3- and 6-way star-join
# shapes. Both are written so Catalyst sees pure equi-joins with pushable
# predicates: dims broadcast, facts shuffle at most once on the key the
# aggregate reuses.

_SHIP_PRIORITY_SQL = """
SELECT l.l_orderkey,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
         AS DOUBLE) AS revenue,
    o.o_orderdate
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("shipping_priority", sql=_SHIP_PRIORITY_SQL)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join: unshipped-revenue top-10 for one market
    segment. Plan shape that survives 100×: the segment filter prunes
    customer to ~1/5 BEFORE its join (predicate pushdown to the scan), the
    date filters prune orders/lineitem scans, and the filtered customer
    side is explicitly broadcast so the orders fact never shuffles for it;
    the only exchange is lineitem⋈orders on orderkey, which the groupBy
    then reuses. Deterministic top-10 via (revenue DESC, orderkey) —
    Spark plans it as TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        l.where(F.col("l_shipdate") > cutoff)
        .join(
            o.where(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_LOCAL_SUPPLIER_SQL = """
SELECT n.n_name AS nation,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
         AS DOUBLE) AS revenue,
    COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("local_supplier_volume", sql=_LOCAL_SUPPLIER_SQL)
def local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped 6-way star join: revenue where the supplier and the
    customer share a nation inside one region. Scale shape: region/nation/
    customer/supplier are dimensions — region∘nation collapses to a
    broadcast filter, and customer/supplier broadcast too (at real TPC-H
    scale customer is 0.15% of lineitem; if it outgrew the broadcast
    threshold AQE falls back to shuffle join on the already-partitioned
    custkey). The fact-side work is ONE shuffle: lineitem⋈orders on
    orderkey; every other join is map-side. The s_nationkey = c_nationkey
    clause rides the supplier broadcast join as an equi-key, not a
    post-filter."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    asia_nations = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    o_96 = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        l.join(o_96, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ------------------------------------------------------- decile statistics
# NTILE window + per-bucket aggregate. Determinism rule: NTILE is only
# well-defined under a TOTAL order — ties at a bucket boundary would be
# engine-chosen — so the order key is (o_totalprice, o_orderkey). Scale:
# a global NTILE needs a global sort; the exit ramp at 100 TB is
# approx-quantile cut points + a map-side bucket assign (the
# event_value_percentiles_approx posture), which this exact form gates.
_DECILE_SQL = """
WITH ranked AS (
    SELECT o_totalprice,
        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
)
SELECT decile,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
    CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM ranked
GROUP BY decile
"""


@register("order_price_deciles", sql=_DECILE_SQL)
def order_price_deciles(spark, sf_dir):
    """Order-value deciles (NTILE 10 under a total order) with per-bucket
    count/min/max/exact-decimal sum."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


# ------------------------------------------- decile statistics, scale form
# The 100 TB exit ramp SCALE.md documents for order_price_deciles: the
# exact gate's global NTILE needs a range-partition global sort (the
# single-partition WindowExec the bench tail warns about); this twin
# computes DETERMINISTIC cut points from a deterministic key-sampled
# subset (o_orderkey % 97 — the RangePartitioner trick with a
# value-hashable sample instead of a random one), broadcasts the 9 cut
# structs, and bucket-assigns map-side. No WindowExec anywhere: the only
# global structure is ONE bounded collect_list over the sample (~1% here;
# at 100 TB the modulus is tuned so the sample stays executor-sized) and
# the per-bucket aggregate's ordinary keyed shuffle.
#
# Boundary discipline (what makes this oracle-able where approxQuantile
# is not): cut i = the sample's (price, orderkey) at 1-based position
# max(1, (i·m) DIV 10) under the TOTAL order (price, orderkey) — integer
# arithmetic only — and a row lands in bucket 1 + |{i : (p,k) > cut_i}|.
# Equal-price ties break on orderkey exactly as the exact gate's NTILE
# order does. Bucket populations are approximately-equal (sample-driven),
# not exactly N/10 — the honest trade the approx form makes; both engines
# reproduce them bit-identically.
_N_CUTS = 9
_SAMPLE_MOD = 97


def _cut_pos_sql(i: int) -> str:
    return f"greatest(1, CAST(({i} * m) // 10 AS INT))"


_DECILE_SCALE_SQL = f"""
WITH s AS (
    SELECT o_totalprice AS p, o_orderkey AS k
    FROM orders WHERE o_orderkey % {_SAMPLE_MOD} = 0
),
arr AS (
    SELECT list(p ORDER BY p, k) AS ps, list(k ORDER BY p, k) AS ks,
           count(*) AS m
    FROM s
),
assigned AS (
    SELECT o.o_totalprice, o.o_orderkey,
        CAST(1 + {" + ".join(
            f"(CASE WHEN o.o_totalprice > ps[{_cut_pos_sql(i)}]"
            f" OR (o.o_totalprice = ps[{_cut_pos_sql(i)}]"
            f"     AND o.o_orderkey > ks[{_cut_pos_sql(i)}])"
            " THEN 1 ELSE 0 END)"
            for i in range(1, _N_CUTS + 1)
        )} AS INT) AS decile
    FROM orders o, arr
)
SELECT decile,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
    CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM assigned
GROUP BY decile
"""


@register("order_price_deciles_scale", sql=_DECILE_SCALE_SQL)
def order_price_deciles_scale(spark, sf_dir):
    """Decile statistics without a global sort: deterministic sampled cut
    points (key-modulus sample, integer-position picks under the
    (price, orderkey) total order) broadcast onto a map-side bucket
    assign. The scale twin of order_price_deciles — same output schema,
    approximately-equal buckets, zero WindowExec (plan pinned in
    tests/test_plan_shapes.py)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    s = o.where((F.col("o_orderkey") % _SAMPLE_MOD) == 0)
    arr = s.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("o_totalprice").alias("p"),
                    F.col("o_orderkey").alias("k"),
                )
            )
        ).alias("a"),
        F.count(F.lit(1)).alias("m"),
    )
    # try_element_at, not element_at (ADVICE r11): on a DEGENERATE corpus
    # where the key-modulus sample is empty (m=0), DuckDB list indexing
    # yields NULL cuts -> every comparison is NULL -> all rows land in
    # bucket 1, while ANSI element_at would throw. NULL cuts make _above
    # return 0, so both engines agree: empty sample == single bucket.
    cuts = arr.select(
        *[
            F.try_element_at(
                F.col("a"),
                F.greatest(
                    F.lit(1), F.expr(f"CAST(({i} * m) DIV 10 AS INT)")
                ),
            ).alias(f"c{i}")
            for i in range(1, _N_CUTS + 1)
        ]
    )

    def _above(i: int):
        p, k = F.col(f"c{i}.p"), F.col(f"c{i}.k")
        hit = (F.col("o_totalprice") > p) | (
            (F.col("o_totalprice") == p) & (F.col("o_orderkey") > k)
        )
        return F.when(hit, 1).otherwise(0)

    decile = F.lit(1)
    for i in range(1, _N_CUTS + 1):
        decile = decile + _above(i)
    return (
        o.crossJoin(F.broadcast(cuts))
        .select("o_totalprice", decile.cast("int").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


# ---------------------------------------------------------------- pivot
# Wide-format conditional aggregation: per customer segment, one column
# per order status. Spark's pivot with an EXPLICIT value list compiles to
# a single pass of conditional aggregates (same plan as the CASE form) —
# never use implicit pivot values at scale (it runs a distinct scan to
# discover them). The oracle spells the equivalent CASE columns.
_PIVOT_SQL = """
SELECT c.c_mktsegment AS segment,
    CAST(COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
    CAST(COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
    CAST(COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
    CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS spend_f,
    CAST(SUM(CASE WHEN o.o_orderstatus = 'O'
        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS spend_o,
    CAST(SUM(CASE WHEN o.o_orderstatus = 'P'
        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS spend_p
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


@register("segment_status_pivot", sql=_PIVOT_SQL)
def segment_status_pivot(spark, sf_dir):
    """Orders pivoted to one (count, spend) column pair per order status,
    per market segment — explicit pivot values, one aggregation pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    piv = (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend"),
        )
    )
    return piv.select(
        "segment",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).cast("bigint").alias("n_p"),
        F.col("F_spend").alias("spend_f"),
        F.col("O_spend").alias("spend_o"),
        F.col("P_spend").alias("spend_p"),
    )


# ------------------------------------------------- rank-function coverage
# percent_rank / cume_dist over a TOTAL order (price, custkey) — the
# SQL-standard definitions agree across engines only when the order is
# total: both are rank-based, so any tie left to the engine would shift
# entire result rows. Rounded to 6 d.p. in BOTH engines (the harness
# float discipline).
_RANK_FNS_SQL = """
SELECT c_custkey,
    c_mktsegment AS segment,
    CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS acctbal_pct_rank,
    CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS acctbal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register("customer_balance_ranks", sql=_RANK_FNS_SQL)
def customer_balance_ranks(spark, sf_dir):
    """percent_rank + cume_dist of account balance within each market
    segment (total order, 6-d.p. rounding in both engines)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round(F.percent_rank().over(w), 6).cast("double").alias("acctbal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("acctbal_cume_dist"),
    )


# ---------------------------------------------------------- grouping sets
# GROUPING SETS with grouping_id disambiguation: per-(flag,status),
# per-flag, and per-status subtotals in ONE pass (Spark Expand node — one
# scan regardless of set count; rollup covers only the hierarchical
# prefix case). gid identifies which set a row belongs to, since NULL
# alone can't distinguish "subtotal over status" from a NULL status.
_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
    CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
"""


@register("flag_status_grouping_sets", sql=_GROUPING_SETS_SQL)
def flag_status_grouping_sets(spark, sf_dir):
    """Three grouping sets in one aggregation pass, disambiguated by the
    grouping-bit id."""
    l = load_table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("bigint")
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_items", "revenue")
    )


# ---------------------------------------------------------- full outer join
# Daily signup vs purchase volumes: FULL OUTER on the day key keeps days
# that have only one kind of activity (both unmatched sides survive with
# NULL counterparts) — the join type the catalog lacked (inner/left/
# semi/anti/broadcast variants are all gated elsewhere).
_FULL_OUTER_SQL = """
WITH s AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(COUNT(*) AS BIGINT) AS n_signups
    FROM events WHERE event_type = 'signup' GROUP BY 1
),
p AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(COUNT(*) AS BIGINT) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT COALESCE(s.day, p.day) AS day,
    COALESCE(s.n_signups, 0) AS n_signups,
    COALESCE(p.n_purchases, 0) AS n_purchases,
    p.purchase_value
FROM s FULL OUTER JOIN p ON p.day = s.day
"""


@register("daily_signup_purchase", sql=_FULL_OUTER_SQL)
def daily_signup_purchase(spark, sf_dir):
    """Daily signup and purchase volumes, FULL OUTER joined on day."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy(day)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_signups"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("purchase_value"),
        )
    )
    sj = s.select(F.col("day").alias("s_day"), "n_signups")
    pj = p.select(F.col("day").alias("p_day"), "n_purchases", "purchase_value")
    return sj.join(pj, sj.s_day == pj.p_day, "full_outer").select(
        F.coalesce("s_day", "p_day").alias("day"),
        F.coalesce("n_signups", F.lit(0)).cast("bigint").alias("n_signups"),
        F.coalesce("n_purchases", F.lit(0)).cast("bigint").alias("n_purchases"),
        "purchase_value",
    )


# --------------------------------------------- correlated scalar subquery
# Customers above their own nation's average balance. Exercises Catalyst's
# subquery decorrelation: the correlated scalar subquery rewrites to an
# aggregate-then-join — per-nation averages (25 rows) broadcast against the
# customer scan, so the "per-row subquery" costs one map-side agg + one
# broadcast join at any scale. The average is an exact decimal sum divided
# in double, bit-identical across engines (c_acctbal has 2 dp).
_NATION_AVG_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*)
    FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
"""


@register("above_nation_avg_customers", sql=_NATION_AVG_SQL)
def above_nation_avg_customers(spark, sf_dir):
    """Customers with balance above their nation's average (correlated
    scalar subquery, written as SQL so Catalyst's decorrelation is the
    code path under test)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "cust_nation_avg_v"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM cust_nation_avg_v c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*)
            FROM cust_nation_avg_v c2
            WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


# ------------------------------------------------------- argmin per group
# TPC-H Q2's core shape: cheapest offer per part, WHO supplies it (argmin,
# not just min). Single-pass MIN over a (price, suppkey) struct — the
# lexicographic struct ordering makes the tie-break (lowest suppkey)
# part of the aggregate itself, so the result is deterministic and the
# whole argmin costs ONE map-side-combinable aggregation, not a
# min-then-self-join. Price is exact decimal (2 dp x 2 dp -> 4 dp), so
# struct comparison is bit-identical across engines.
_ARGMIN_SQL = """
WITH offers AS (
    SELECT l_partkey, l_suppkey,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(18,4)) AS price
    FROM lineitem),
best AS (
    SELECT l_partkey,
           struct_extract(MIN({'p': price, 's': l_suppkey}), 's')
               AS cheapest_suppkey,
           CAST(struct_extract(MIN({'p': price, 's': l_suppkey}), 'p')
                AS DOUBLE) AS min_price,
           CAST(COUNT(*) AS BIGINT) AS n_offers
    FROM offers GROUP BY 1)
SELECT b.l_partkey AS partkey, b.cheapest_suppkey, s.s_name,
       b.min_price, b.n_offers
FROM best b JOIN supplier s ON s.s_suppkey = b.cheapest_suppkey
"""


@register("cheapest_supplier_per_part", sql=_ARGMIN_SQL)
def cheapest_supplier_per_part(spark, sf_dir):
    """Argmin-per-group: which supplier ships each part cheapest
    (discounted price), resolved to the supplier name."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    price = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    offers = li.select(
        "l_partkey", "l_suppkey", price.alias("price")
    )
    # The struct-MIN form is the readable argmin but its immutable struct
    # buffer forces interpreted SortAggregate. Same lexicographic order,
    # hash-aggregable: pack (price, suppkey) into ONE BIGINT —
    # price is exact DECIMAL(18,4) quanta <= ~1.05e9 (31 bits; asserted
    # by the 2^42 headroom check below), suppkey < 2^20 — so
    # MIN(pack) == MIN(struct) bit-for-bit and the aggregate goes back
    # into whole-stage codegen (measured 1.20 s -> 0.93 s at sf0.1).
    pack = (
        (F.col("price") * F.lit(10000)).cast("bigint") * F.lit(1 << 20)
        + F.col("l_suppkey")
    )
    best = offers.groupBy("l_partkey").agg(
        F.min(pack.alias("pk")).alias("pk"),
        F.max((F.col("price") * F.lit(10000)).cast("bigint")).alias("_maxq"),
        F.max("l_suppkey").alias("_maxsk"),
        F.count(F.lit(1)).cast("bigint").alias("n_offers"),
    )
    return (
        best.select(
            F.col("l_partkey").alias("partkey"),
            # domain guards: packing is exact only within these ranges.
            # Out-of-domain keys fail LOUDLY — a bare when() would emit
            # NULL and the inner supplier join would silently drop the
            # part instead of surfacing the contract violation.
            F.when(
                (F.col("_maxq") < F.lit(1 << 42))
                & (F.col("_maxsk") < F.lit(1 << 20)),
                (F.col("pk") % F.lit(1 << 20)).cast("bigint"),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "cheapest_supplier_per_part: price quanta >= 2^42 "
                        "or suppkey >= 2^20 breaks the argmin bit-packing"
                    )
                ).cast("bigint")
            )
            .alias("cheapest_suppkey"),
            (
                F.floor(F.col("pk") / F.lit(1 << 20)).cast("decimal(18,0)")
                / F.lit(10000)
            )
            .cast("double")
            .alias("min_price"),
            "n_offers",
        )
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            F.col("cheapest_suppkey") == F.col("s_suppkey"),
        )
        .select("partkey", "cheapest_suppkey", "s_name", "min_price", "n_offers")
    )


# -------------------------------------------------------------- Q6 shape
# TPC-H Q6: the canonical pure scan+filter+agg — no join, no shuffle
# beyond the single-row final agg. Every predicate (date range, discount
# band, quantity cap) is scan-pushable (PushedFilters), so at 100 TB the
# query cost is the parquet scan of the pruned row groups, nothing else.
# Revenue is an exact decimal sum-of-products (2 dp × 2 dp) cast once.
_Q6_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2)))
             AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue_q6", sql=_Q6_SQL)
def forecast_revenue_q6(spark, sf_dir):
    """TPC-H Q6 forecasting-revenue: filter-heavy scan, single-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("decimal(38,4)")
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


# ------------------------------------------------------------------ CUBE
# Completes the grouping-variant family (ROLLUP gated by revenue_rollup,
# GROUPING SETS by flag_status_grouping_sets): all four flag×status
# grouping combinations in ONE Expand pass over the scan, grouping()
# markers distinguishing NULL-as-total from NULL-as-value.
_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@register("flag_status_cube", sql=_CUBE_SQL)
def flag_status_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus) with grouping() markers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


# ------------------------------------------- distribution of counts (Q13)
# TPC-H Q13's shape: how many customers placed exactly N orders — a LEFT
# join so zero-order customers survive (COUNT(o.key) counts only matches),
# then a second aggregation over the per-customer counts. Both aggs are
# map-side combinable; the first reuses the join's partitioning on
# custkey, so the whole query is one fact shuffle plus a tiny recount.
_ORDER_DIST_SQL = """
SELECT order_cnt, COUNT(*) AS n_customers
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
GROUP BY order_cnt
"""


@register("order_count_distribution", sql=_ORDER_DIST_SQL)
def order_count_distribution(spark, sf_dir):
    """Customer-order-count histogram (zero-order customers included)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return per_cust.groupBy("order_cnt").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --------------------------------------- global-threshold HAVING (Q11)
# TPC-H Q11's shape: groups whose aggregate exceeds a share of the
# GLOBAL TOTAL — the scalar threshold is an aggregate of the grouped
# frame itself, broadcast back as a 1-row cross join (Catalyst keeps it a
# BroadcastNestedLoopJoin over one row; the grouped frame is computed
# once per side from the same shuffle). All money math stays in exact
# DECIMAL through the comparison so the boundary predicate cannot drift.
_IMPORTANT_PARTS_SQL = """
WITH part_rev AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rev) AS total_rev, COUNT(*) AS n_parts FROM part_rev)
SELECT p.l_partkey, CAST(p.rev AS DOUBLE) AS part_revenue
FROM part_rev p, tot t
WHERE p.rev * t.n_parts * 5 > t.total_rev * 7
"""


@register("important_parts_q11", sql=_IMPORTANT_PARTS_SQL)
def important_parts_q11(spark, sf_dir):
    """Parts whose discounted revenue exceeds 1.4x the mean part revenue.

    The threshold is scale-invariant (a fixed fraction-of-total goes
    empty as the part count grows), and the comparison is multiplicative
    — rev*n_parts*5 > total*7 — so it stays in exact DECIMAL with no
    division rounding on either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("rev")
    )
    tot = part_rev.agg(
        F.sum("rev").alias("total_rev"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        part_rev.crossJoin(F.broadcast(tot))
        .where(
            F.col("rev") * F.col("n_parts") * F.lit(5)
            > F.col("total_rev") * F.lit(7)
        )
        .select("l_partkey", F.col("rev").cast("double").alias("part_revenue"))
    )


# ----------------------------------- bivariate stats from exact moments
# Pearson correlation + OLS slope/intercept of quantity vs extendedprice
# per returnflag. Built-in corr()/covar_pop() accumulate doubles in
# shuffle order (non-deterministic across engines/partitionings), so the
# moments (n, Sx, Sy, Sxx, Syy, Sxy) are accumulated as EXACT DECIMALS —
# associative, order-proof — and the float math happens once, on the
# driver-side of the aggregate, from identical inputs in both engines.
# One map-side-combinable aggregate; same shape at any scale.
_CORR_SQL = """
WITH m AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
           AS corr_qty_price,
       ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
       ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
           AS intercept
FROM m
"""


@register("quantity_price_corr", sql=_CORR_SQL)
def quantity_price_corr(spark, sf_dir):
    """Per-flag Pearson corr and OLS fit of extendedprice on quantity,
    from exact decimal moments (see note above)."""
    li = load_table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dq).cast("double").alias("sx"),
        F.sum(dp).cast("double").alias("sy"),
        F.sum(dq * dq).cast("double").alias("sxx"),
        F.sum(dp * dp).cast("double").alias("syy"),
        F.sum(dq * dp).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = n * F.col("sxy") - sx * sy
    varx = n * F.col("sxx") - sx * sx
    vary = n * F.col("syy") - sy * sy
    slope = cov / varx
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(cov / F.sqrt(varx * vary), 6).alias("corr_qty_price"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# ----------------------------------------- max-of-aggregate with ties (Q15)
# TPC-H Q15: the supplier(s) with THE maximum revenue — ties must all
# survive (the reason Q15 is a view + equality, not ORDER BY ... LIMIT 1).
# The scalar max broadcasts back over the aggregated frame; revenue stays
# exact DECIMAL through the equality so a tie can't be split by float fuzz.
_TOP_SUPPLIER_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
    FROM lineitem GROUP BY l_suppkey
),
mx AS (SELECT MAX(r) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
FROM rev, mx
JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.r = mx.m
"""


@register("top_revenue_supplier", sql=_TOP_SUPPLIER_SQL)
def top_revenue_supplier(spark, sf_dir):
    """Q15 shape: supplier(s) with the maximum discounted revenue,
    ties preserved."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("r")
    )
    mx = rev.agg(F.max("r").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("r") == F.col("m"))
        .join(F.broadcast(sup.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


# ------------------------------------- semi-join on aggregated subquery (Q18)
# TPC-H Q18: orders whose total quantity exceeds a threshold — the filter
# is a HAVING on an AGGREGATED subquery of the same fact table, joined
# back to carry the aggregate. One shuffle on orderkey serves both the
# aggregate and the join (co-partitioned), so the "IN (SELECT ... HAVING)"
# costs no extra fact-table pass.
_BIG_ORDERS_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority,
       CAST(b.q AS DOUBLE) AS total_qty
FROM orders o JOIN (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
) b ON b.l_orderkey = o.o_orderkey
"""


@register("big_quantity_orders", sql=_BIG_ORDERS_SQL)
def big_quantity_orders(spark, sf_dir):
    """Q18 shape: orders with total line quantity > 150 (aggregated
    semi-join carrying the aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .where(F.col("q") > 150)
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.col("q").cast("double").alias("total_qty"),
    )


# ------------------------------------------ exists / not-exists chain (Q21)
# TPC-H Q21's core: suppliers who were the ONLY one to return lines in a
# multi-supplier order. The reference formulation is a correlated
# EXISTS + NOT EXISTS pair (the oracle keeps that form); the Spark plan
# DECORRELATES it into per-(order, supplier) then per-order aggregates —
# one extra tiny aggregate instead of two more passes over the fact
# table, and the oracle proves both formulations agree.
_SOLE_RETURNER_SQL = """
SELECT DISTINCT l1.l_suppkey AS suppkey, l1.l_orderkey AS orderkey
FROM lineitem l1
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
"""


@register("sole_returning_supplier", sql=_SOLE_RETURNER_SQL)
def sole_returning_supplier(spark, sf_dir):
    """Q21 shape: the sole returning supplier per multi-supplier order,
    via aggregate decorrelation (see note above)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_os = li.groupBy(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r"))
    per_o = per_os.groupBy("orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_ret"),
    )
    return (
        per_os.where(F.col("has_r") == 1)
        .join(
            per_o.where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1)),
            "orderkey",
        )
        .select("suppkey", "orderkey")
    )


# ----------------------------------------------------- unpivot (wide->long)
# Completes the reshaping pair with segment_status_pivot: the built-in
# DataFrame.unpivot (SQL UNPIVOT) — constant-width generate, no shuffle
# beyond the feeding aggregate.
_UNPIVOT_SQL = """
WITH wide AS (
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
    FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, value
FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price))
"""


@register("flag_metrics_unpivot", sql=_UNPIVOT_SQL)
def flag_metrics_unpivot(spark, sf_dir):
    """Wide per-flag sums unpivoted to (l_returnflag, metric, value)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    wide = li.groupBy("l_returnflag").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------- disjunctive predicates (Q19)
# TPC-H Q19's signature shape: the join predicate is an OR of three
# (brand, size-range, quantity-range) conjunctions — the stress test for
# disjunctive predicate handling. Catalyst extracts the common
# quantity/size bounds OUTSIDE the OR and pushes them into both scans
# (visible as PushedFilters), so each scan prunes before the join; the
# per-clause residual stays a codegen'd join filter. Revenue exact
# decimal.
_DISJUNCTIVE_SQL = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS promo_revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("promo_revenue_disjunctive", sql=_DISJUNCTIVE_SQL)
def promo_revenue_disjunctive(spark, sf_dir):
    """Q19 shape: revenue under an OR of brand/size/quantity clauses."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731

    def clause(brand, smax, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = (
        clause("Brand#12", 15, 1, 11)
        | clause("Brand#23", 25, 10, 20)
        | clause("Brand#34", 35, 20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------- Q4 shape (EXISTS)
# TPC-H Q4's decorrelated-EXISTS pattern on this schema: count orders per
# priority having at least one LATE lineitem (shipped >20 days after the
# order date). Plan: the EXISTS lowers to a LEFT SEMI join on orderkey
# with the lateness predicate in the join condition — the lineitem side
# never aggregates or deduplicates, and the count is map-side-combined.
_LATE_PRIORITY_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 20 DAY
)
GROUP BY o.o_orderpriority
"""


@register("late_shipment_priorities", sql=_LATE_PRIORITY_SQL)
def late_shipment_priorities(spark, sf_dir):
    """Orders with >=1 lineitem shipped >20 days after the order date,
    counted per priority (Q4's EXISTS/semi-join shape)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li["l_orderkey"] == o["o_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 20 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


# ------------------------------------------- Q17 shape (correlated avg)
# TPC-H Q17: revenue of SMALL-LOT lineitems — quantity below 20% of the
# part's average quantity — for one brand. The correlated scalar subquery
# decorrelates to a per-part aggregate joined back; the threshold
# comparison is INTEGER-EXACT (quantities are integral, so
# 5 * qty * n_part < sum_qty in BIGINT avoids the 0.2*AVG float boundary
# a shuffle-order-dependent double average could flip cross-engine).
_SMALL_LOT_SQL = """
WITH pa AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 6)
            AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND 5 * CAST(l.l_quantity AS BIGINT) * pa.n < pa.sum_qty
"""


@register("small_lot_revenue_q17", sql=_SMALL_LOT_SQL)
def small_lot_revenue_q17(spark, sf_dir):
    """Small-lot revenue for Brand#13 (Q17's correlated-average shape,
    decorrelated and integer-exact at the threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pa = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    brand = p.where(F.col("p_brand") == "Brand#13").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li["l_partkey"] == brand["p_partkey"])
        .join(pa, "l_partkey")
        .where(
            F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("n")
            < F.col("sum_qty")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / 7.0, 6
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------- Q22 shape (anti)
# TPC-H Q22 on this schema: customers with an ABOVE-AVERAGE positive
# balance and no BIG order (>$350k — every fixture customer has SOME
# order, so plain never-ordered is empty), rolled up per nation. The
# above-average threshold compares in INTEGER CENTS (balance routed
# through DECIMAL(18,2)·100 → BIGINT, then cents·n > sum_cents), so the
# global average never materializes as a float that could straddle an
# ulp cross-engine; the "never ordered" predicate is a left anti join.
_WAITING_SQL = """
WITH pos AS (
    SELECT c_custkey, c_nationkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
    FROM customer WHERE c_acctbal > 0.0
),
stats AS (
    SELECT CAST(SUM(cents) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pos
)
SELECT p.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(p.cents) AS DOUBLE) / 100.0 AS total_bal
FROM pos p CROSS JOIN stats s
WHERE p.cents * s.n > s.total
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = p.c_custkey AND o.o_totalprice > 350000.0
  )
GROUP BY p.c_nationkey
"""


@register("waiting_customers_q22", sql=_WAITING_SQL)
def waiting_customers_q22(spark, sf_dir):
    """Above-average-balance customers with no big (>$350k) order,
    per nation (Q22's scalar-subquery + anti-join shape, integer-cents
    threshold)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pos = c.where(F.col("c_acctbal") > 0.0).select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    stats = pos.agg(
        F.sum("cents").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        pos.crossJoin(F.broadcast(stats))
        .where(F.col("cents") * F.col("n") > F.col("total"))
        .join(
            o.where(F.col("o_totalprice") > 350000.0).select("o_custkey"),
            pos["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            (F.sum("cents").cast("double") / 100.0).alias("total_bal"),
        )
    )


# ------------------------------------------------------ Q7 volume shipping
# TPC-H Q7 shape: revenue shipped between two named nations, BOTH
# directions, grouped by (supplier nation, customer nation, ship year).
# Scale shape: supplier/customer/nation are dimensions — both nation-
# filtered dim sides broadcast, so the fact-side work stays the ONE
# lineitem⋈orders shuffle on orderkey; the direction predicate
# ((A,B) or (B,A)) rides the broadcast joins as a post-join filter on
# two already-broadcast columns, never a fact self-join. Year extraction
# is a scan-stage projection (no second pass). Money through
# DECIMAL(18,2) per FIXTURES.md.
_VOLUME_SHIPPING_SQL = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE (sn.n_name = 'FRANCE' AND cn.n_name = 'GERMANY')
   OR (sn.n_name = 'GERMANY' AND cn.n_name = 'FRANCE')
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
"""


@register("volume_shipping_q7", sql=_VOLUME_SHIPPING_SQL)
def volume_shipping_q7(spark, sf_dir):
    """Q7 shape: FRANCE↔GERMANY shipped revenue by (direction, year)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    pair = F.col("n_name").isin("FRANCE", "GERMANY")
    sup = s.join(
        F.broadcast(n.where(pair).select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust = c.join(
        F.broadcast(n.where(pair).select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ------------------------------------------------------ Q9 product profit
# TPC-H Q9 SHAPE (nation × year profit for a part-name family). The
# fixture has no partsupp table, so supply cost is stood in by
# 0.5 × p_retailprice — the SHAPE under test is the 5-way join with a
# computed measure (revenue − cost·quantity), a substring part filter,
# and the (nation, year) rollup, not TPC-H's constants. All arithmetic
# in DECIMAL(18,2): the subtraction must be exact or the hash diverges.
# Scale shape: part (name-filtered) and supplier/nation broadcast; the
# only exchange is lineitem⋈orders on orderkey reused by nothing else —
# the groupBy keys are dimension columns, so AQE coalesces the tiny
# post-agg side.
_PRODUCT_PROFIT_SQL = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
              - CAST(0.5 AS DECIMAL(18,2)) * CAST(p.p_retailprice AS DECIMAL(18,2))
                * CAST(l.l_quantity AS DECIMAL(18,2)))
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%green%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


@register("product_profit_q9", sql=_PRODUCT_PROFIT_SQL)
def product_profit_q9(spark, sf_dir):
    """Q9 shape: per-(nation, year) profit for the '%green%' part family
    (supply cost stood in by 0.5·p_retailprice — no partsupp table in
    the fixture; see the SQL comment)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    half = F.lit(0.5).cast("decimal(18,2)")
    profit_term = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - dec("l_discount")
    ) - half * dec("p_retailprice") * dec("l_quantity")
    sup_nation = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        l.join(
            F.broadcast(
                p.where(F.col("p_name").like("%green%"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(sup_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )


# ---------------------------------------------------- Q10 returned items
# TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
# Scale shape: the returnflag predicate pushes into the lineitem scan
# (R rows are ~25% of the table); customer and nation broadcast; the
# single exchange is lineitem⋈orders on orderkey reused by the groupBy
# only through the customer key — the top-20 compiles to
# TakeOrderedAndProject (no global sort).
_RETURNED_ITEMS_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_items_q10", sql=_RETURNED_ITEMS_SQL)
def returned_items_q10(spark, sf_dir):
    """Q10 shape: top-20 customers by returned-item revenue."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------- Q12 shipmode stats
# TPC-H Q12 shape: per-returnflag priority counts split by order status
# — the conditional-aggregate (CASE inside SUM) form whose whole cost is
# one fact shuffle on orderkey and whose output is enum-sized. The
# classic lineitem⋈orders probe where the AGGREGATE, not the join,
# carries the business rule.
_SHIPMODE_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS finished_count,
       CAST(SUM(CASE WHEN o.o_orderstatus <> 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS open_count,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS total_qty
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY l.l_returnflag
"""


@register("returnflag_status_mix_q12", sql=_SHIPMODE_SQL)
def returnflag_status_mix_q12(spark, sf_dir):
    """Q12 shape: conditional-aggregate status split per returnflag."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    fin = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(fin).cast("bigint").alias("finished_count"),
            F.sum(F.lit(1) - fin).cast("bigint").alias("open_count"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


# -------------------------------------------------- Q8: market share
# The national-market-share shape (TPC-H Q8): among PROMO-type parts
# sold to customers of region ASIA, what fraction of yearly revenue is
# supplied by NATION_2? Exactness discipline: revenue terms are
# DECIMAL(18,2) products (the Q7/Q9 rule); the share is computed in
# integer micro-units from exact cent values ((1e6 · nat_cents) //
# tot_cents), so the whole report value-hashes with no float division
# anywhere. Plan: lineitem joins the three small sides broadcast
# (part filter pushed before its join; customer-region and
# supplier-nation maps are dims), one groupBy year — the canonical
# star-join + conditional-aggregate shape.
_Q8_SQL = """
WITH asia_cust AS (
    SELECT c_custkey FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
),
sup_nat AS (
    SELECT s_suppkey, n_name AS supp_nation FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
),
rev AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           sn.supp_nation,
           CAST(l.l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
               AS volume
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN asia_cust ac ON o.o_custkey = ac.c_custkey
    JOIN sup_nat sn ON l.l_suppkey = sn.s_suppkey
)
SELECT o_year,
    -- floor() before the BIGINT cast: Spark's decimal->int cast
    -- TRUNCATES while DuckDB's ROUNDS (the sampling.py::_PACK_SQL
    -- lesson); volume has scale 4, so sub-cent mass must floor away
    -- identically in both engines
    CAST(floor(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                        ELSE CAST(0 AS DECIMAL(18,2)) END) * 100)
        AS BIGINT) AS nat_cents,
    CAST(floor(SUM(volume) * 100) AS BIGINT) AS tot_cents,
    CAST((1000000 * CAST(floor(SUM(CASE WHEN supp_nation = 'NATION_2'
                                        THEN volume
                                        ELSE CAST(0 AS DECIMAL(18,2)) END)
                         * 100) AS BIGINT))
         // CAST(floor(SUM(volume) * 100) AS BIGINT) AS BIGINT)
        AS share_micro
FROM rev GROUP BY o_year
"""


@register("nation_market_share_q8", sql=_Q8_SQL)
def nation_market_share_q8(spark, sf_dir):
    """Yearly revenue share of NATION_2 suppliers among PROMO parts
    bought by ASIA-region customers — integer micro-unit share from
    exact decimal cents."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    asia = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.where(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    sup = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    vol = (
        dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).alias("volume")
    rev = (
        l.join(
            F.broadcast(p.where(F.col("p_type") == "PROMO").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "supp_nation",
            vol,
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)
    )
    tot = F.sum("volume")
    return rev.groupBy("o_year").agg(
        (nat * 100).cast("bigint").alias("nat_cents"),
        (tot * 100).cast("bigint").alias("tot_cents"),
    ).select(
        "o_year",
        "nat_cents",
        "tot_cents",
        F.expr("(1000000 * nat_cents) DIV tot_cents").cast("bigint").alias(
            "share_micro"
        ),
    )


# --------------------------------------------------- Q21 shape: waiting
# The hardest TPC-H decorrelation shape (Q21): for finished orders, the
# suppliers whose line was late while EVERY other supplier on the same
# order shipped on time — an EXISTS plus a NOT EXISTS, both correlated
# through the fact table with a <>-inequality on the inner key. Catalyst
# must turn these into one left-semi and one left-anti hash join on
# l_orderkey (no per-row subquery execution); the date cutoff stands in
# for commit-vs-receipt lateness (the fixture carries l_shipdate only).
# At 100 TB: two shuffles of the (filtered) fact table on its natural
# join key, broadcast supplier dim, TakeOrderedAndProject top-100.
_Q21_CUTOFF = "DATE '1999-06-30'"

_Q21_SQL = f"""
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > {_Q21_CUTOFF}
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > {_Q21_CUTOFF})
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 100
"""


@register("waiting_suppliers_q21", sql=_Q21_SQL)
def waiting_suppliers_q21(spark, sf_dir):
    """Q21 shape: sole-late-supplier count per supplier over finished
    multi-supplier orders — correlated EXISTS (left-semi) + NOT EXISTS
    (left-anti) with <> inner inequality, decorrelated into two hash
    joins on l_orderkey; supplier dim broadcasts; top-100 under a
    (numwait DESC, s_name) total order."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    cutoff = F.to_date(F.lit("1999-06-30"))
    l1 = (
        li.where(F.col("l_shipdate") > cutoff)
        .join(
            orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.where(F.col("l_shipdate") > cutoff).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    return (
        waited.join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
