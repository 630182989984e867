"""Deterministic-guarantee sketch gates (Misra-Gries heavy hitters).

Companion family to the probabilistic sketches already gated
(approx_count_distinct / approx_percentile / HLL rollup in
queries/rerank.py & analytics.py): Misra-Gries carries a DETERMINISTIC
guarantee — every item with true frequency > n/(k+1) is reported, and
estimates underestimate by at most n/(k+1) under any partitioning and
any merge order — so the whole report value-hashes without an epsilon
argument. The reference has no sketch surface (its corpus is one
repo); this extends SURVEY §2.7 A-family aggregation to the unbounded
domains a 100 TB pipeline profiles (token vocab, URLs, join keys).

The oracle is the definition itself: exact token counts filtered at
the same threshold, with the two guarantee booleans as literal TRUE —
exactly the distinct_counts_approx conversion pattern (r9 verdict
item 4), except here the bound is a theorem, not a confidence
envelope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D
from cargo_chat_spark.operators import sketches
from cargo_chat_spark.queries.registry import register
from cargo_chat_spark.sources.testdata import load_table

# 30 counters over the documents token stream: the n/(k+1) threshold
# lands mid-distribution on this corpus (~31-word vocab, counts
# 850-980 at sf0.01 against a threshold of ~876), so the gate's rowset
# genuinely discriminates — some tokens qualify, some don't — at every
# test sf.
MG_K = 30

_HH_SQL = f"""
WITH t AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS item
    FROM documents
),
tot AS (SELECT count(*) AS n_total FROM t)
SELECT item,
       CAST(count(*) AS BIGINT) AS exact_cnt,
       TRUE AS found_by_sketch,
       TRUE AS within_bound
FROM t
GROUP BY item
HAVING count(*) * {MG_K + 1} > (SELECT n_total FROM tot)
"""


@register("heavy_hitters_mg", sql=_HH_SQL)
def heavy_hitters_mg(spark, sf_dir):
    """Misra-Gries heavy hitters over the documents token stream
    (k=30): tokens with true count > n/31, each carrying the sketch's
    two deterministic guarantees as booleans (candidate-set membership
    and the n/(k+1) underestimate bound). The sketch pass is map-only
    Arrow-batched state (operators/sketches.py); only the candidate
    set — never the stream — is exact-counted at scale. A dropped
    candidate or an overcounting merge flips a boolean / loses a row
    and hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(D.tokens(F.col("text")).alias("tk")).select(
        F.explode("tk").alias("item")
    )
    return sketches.heavy_hitters_verified(toks, "item", MG_K)


# ------------------------------------------------------ Count-Min gate
# The overestimating dual (operators/sketches.py CM section): both
# engines rebuild the identical D×W md5-hashed grid, so the gate
# value-hashes the ESTIMATES themselves — est(x) = min over rows of
# the item's cells — plus the ≥-exact theorem as a boolean. W is set
# LOW (16) on purpose: with a ~31-token vocabulary a roomy grid would
# make every estimate exact and the gate couldn't tell a working
# sketch from a pass-through; at W=16 collisions are guaranteed and
# the realized overestimates pin the full bucket arithmetic.
CM_WIDTH = 16
CM_TOP = 50

_CM_CELLS = {
    d: sketches.cm_cell_sql("item", d, CM_WIDTH)
    for d in range(sketches.CM_DEPTH)
}
_CM_CELLS_I = {
    d: sketches.cm_cell_sql("i.item", d, CM_WIDTH)
    for d in range(sketches.CM_DEPTH)
}

_CM_SQL = f"""
WITH t AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS item
    FROM documents
),
cells AS (
    SELECT seed,
           CASE seed WHEN 0 THEN {_CM_CELLS[0]}
                     WHEN 1 THEN {_CM_CELLS[1]}
                     ELSE {_CM_CELLS[2]} END AS cell,
           CAST(count(*) AS BIGINT) AS c
    FROM t, unnest([0, 1, 2]) AS s(seed)
    GROUP BY 1, 2
),
items AS (
    SELECT item, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM t GROUP BY item
    ORDER BY exact_cnt DESC, item ASC
    LIMIT {CM_TOP}
)
SELECT i.item, i.exact_cnt,
    LEAST(
        COALESCE((SELECT c FROM cells
                  WHERE seed = 0 AND cell = {_CM_CELLS_I[0]}), 0),
        COALESCE((SELECT c FROM cells
                  WHERE seed = 1 AND cell = {_CM_CELLS_I[1]}), 0),
        COALESCE((SELECT c FROM cells
                  WHERE seed = 2 AND cell = {_CM_CELLS_I[2]}), 0)
    ) AS cm_est,
    LEAST(
        COALESCE((SELECT c FROM cells
                  WHERE seed = 0 AND cell = {_CM_CELLS_I[0]}), 0),
        COALESCE((SELECT c FROM cells
                  WHERE seed = 1 AND cell = {_CM_CELLS_I[1]}), 0),
        COALESCE((SELECT c FROM cells
                  WHERE seed = 2 AND cell = {_CM_CELLS_I[2]}), 0)
    ) >= i.exact_cnt AS overestimates
FROM items i
"""


@register("countmin_word_counts", sql=_CM_SQL)
def countmin_word_counts(spark, sf_dir):
    """Count-Min estimates for the top-50 tokens, value-hashed EXACTLY
    (the md5 grid is engine-reproducible), alongside the exact counts
    and the est ≥ exact theorem. Plan: one map-side-combinable D×W
    aggregate for the grid + one exact top-50 aggregate; estimates come
    from broadcasting the bounded grid onto the item frame."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(D.tokens(F.col("text")).alias("tk")).select(
        F.explode("tk").alias("item")
    )
    grid = sketches.count_min_sketch(toks, "item", CM_WIDTH)
    # the rank column is dropped — this is a pure top-CM_TOP selection,
    # so TakeOrderedAndProject replaces the single-partition rank window
    items = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("item"))
        .limit(CM_TOP)
    )
    est = sketches.cm_estimates(items, grid, "item", CM_WIDTH)
    return items.join(est, "item").select(
        "item",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("overestimates"),
    )


# ------------------------------------- CM join-cardinality estimation
# The optimizer-facing use of the grid: |A ⋈ B| on a key equals the
# inner product of the two keys' frequency vectors, and the Count-Min
# row inner product Σ_c a_d[c]·b_d[c] OVERestimates it (collision
# terms only add), so est = min over rows d is a one-sided
# cardinality bound — the classic sketch a CBO consults before
# picking a join strategy, at O(D·W) state per table regardless of
# table size. Everything md5-deterministic, so the gate value-hashes
# the ESTIMATES (and the exact sizes, and the ≥ theorem).
CM_JOIN_WIDTH = 64

_JOIN_PAIRS = [
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
]


def _cm_cells_sql(tbl: str, key: str) -> str:
    cases = " ".join(
        f"WHEN {d} THEN "
        + sketches.cm_cell_sql(f"CAST({key} AS VARCHAR)", d, CM_JOIN_WIDTH)
        for d in range(sketches.CM_DEPTH)
    )
    return f"""
    SELECT seed, CASE seed {cases} END AS cell,
           CAST(count(*) AS BIGINT) AS c
    FROM {tbl}, unnest([0, 1, 2]) AS s(seed)
    GROUP BY 1, 2"""


def _join_size_sql(name, ta, ka, tb, kb) -> str:
    return f"""
SELECT '{name}' AS pair,
    (SELECT CAST(count(*) AS BIGINT)
     FROM {ta} a JOIN {tb} b ON a.{ka} = b.{kb}) AS exact_size,
    (SELECT CAST(MIN(p) AS BIGINT) FROM (
        SELECT ga.seed, SUM(ga.c * gb.c) AS p
        FROM ({_cm_cells_sql(ta, ka)}) ga
        JOIN ({_cm_cells_sql(tb, kb)}) gb
          ON ga.seed = gb.seed AND ga.cell = gb.cell
        GROUP BY ga.seed)) AS cm_est,
    (SELECT CAST(MIN(p) AS BIGINT) FROM (
        SELECT ga.seed, SUM(ga.c * gb.c) AS p
        FROM ({_cm_cells_sql(ta, ka)}) ga
        JOIN ({_cm_cells_sql(tb, kb)}) gb
          ON ga.seed = gb.seed AND ga.cell = gb.cell
        GROUP BY ga.seed))
      >= (SELECT count(*)
          FROM {ta} a JOIN {tb} b ON a.{ka} = b.{kb}) AS overestimates
"""


_CM_JOIN_SQL = "\nUNION ALL\n".join(
    _join_size_sql(*p) for p in _JOIN_PAIRS
)


@register("cm_join_size_report", sql=_CM_JOIN_SQL)
def cm_join_size_report(spark, sf_dir):
    """Join-cardinality estimates from Count-Min row inner products for
    three star-schema joins, next to the exact sizes and the one-sided
    ≥ bound. Sketches cost one D×W aggregate per table side; the
    estimate is a D-row join of the two grids — the O(1)-state
    cardinality oracle a CBO consults, exactly reproducible here."""
    # One partial-agg scan per (table, key) side: both downstream facts
    # are functions of the per-key multiplicities — the CM grid cell
    # count is the count-WEIGHTED cell sum over distinct keys, and the
    # exact equi-join size is sum(cnt_a * cnt_b) over matching keys.
    # The raw-row form scanned every table twice (once into the sketch,
    # once into a row-level join) and executed the full sketch pipeline
    # inside a low-parallelism broadcast build; here raw rows are
    # touched exactly once per side and everything downstream runs at
    # key cardinality. The key-count frames are checkpointed because
    # each feeds two consumers (grid + join).
    def _key_counts(tbl: str, key: str):
        return (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(key).cast("string").alias("item"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )

    def _weighted_grid(kc):
        h = F.md5(F.concat(F.lit("cm|"), F.col("item")))
        cells = F.array(
            *[
                F.conv(F.substring(F.col("h"), 1 + 8 * d, 8), 16, 10)
                .cast("bigint")
                % CM_JOIN_WIDTH
                for d in range(sketches.CM_DEPTH)
            ]
        )
        return (
            kc.select(h.alias("h"), "cnt")
            .select(F.posexplode(cells).alias("seed", "cell"), "cnt")
            .groupBy("seed", "cell")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )

    kcs: dict[tuple[str, str], DataFrame] = {}
    for _, ta, ka, tb, kb in _JOIN_PAIRS:
        for t, k in ((ta, ka), (tb, kb)):
            if (t, k) not in kcs:
                kcs[(t, k)] = _key_counts(t, k)
    parts = []
    for name, ta, ka, tb, kb in _JOIN_PAIRS:
        kc_a, kc_b = kcs[(ta, ka)], kcs[(tb, kb)]
        ga = _weighted_grid(kc_a)
        gb = _weighted_grid(kc_b).select(
            "seed", "cell", F.col("c").alias("cb")
        )
        est = (
            ga.join(gb, ["seed", "cell"])
            .groupBy("seed")
            .agg(F.sum(F.col("c") * F.col("cb")).alias("p"))
            .agg(F.min("p").cast("bigint").alias("cm_est"))
        )
        exact = (
            kc_a.join(
                kc_b.select(F.col("item"), F.col("cnt").alias("cnt_b")),
                "item",
            )
            .agg(
                # coalesce: an empty key intersection must report 0 the
                # way the row-level count did, not NULL
                F.coalesce(
                    F.sum(F.col("cnt") * F.col("cnt_b")), F.lit(0)
                )
                .cast("bigint")
                .alias("exact_size")
            )
        )
        parts.append(
            exact.crossJoin(F.broadcast(est)).select(
                F.lit(name).alias("pair"),
                "exact_size",
                "cm_est",
                (F.col("cm_est") >= F.col("exact_size")).alias(
                    "overestimates"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ----------------------------------------- KMV distinct-count sketch
# k-minimum-values (Bar-Yossef et al.): keep the k smallest md5 hash
# values of a column; with h uniform on [0, 2^32), the k-th smallest
# h_(k) estimates the distinct count as (k-1)·2^32 / h_(k). Unlike
# HLL++ (whose register state is engine-private, gated via bounds in
# distinct_counts_approx), the KMV state IS just k integers from the
# shared md5 — both engines derive the identical sketch and the
# identical integer estimate, so the gate value-hashes estimates and
# their realized errors exactly. When a column has ≤ k distinct
# values the sketch holds them all and the estimate is exact by
# definition — the c_mktsegment row pins that branch. Scale shape:
# one TakeOrdered(k) over distinct hashes per column (O(parts·k)
# driver traffic), mergeable by keeping the k smallest of a union.
KMV_K = 64

_KMV_COLS = [
    ("documents", "text"),
    ("orders", "o_custkey"),
    ("lineitem", "l_partkey"),
    ("events", "user_id"),
    ("customer", "c_mktsegment"),
]


def _kmv_sql(t: str, c: str) -> str:
    from cargo_chat_spark.functions.hashing import h32_sql

    h = h32_sql(f"CAST({c} AS VARCHAR)")
    return f"""
SELECT '{t}.{c}' AS col,
    CAST(count(DISTINCT {c}) AS BIGINT) AS exact_distinct,
    CAST(CASE WHEN count(DISTINCT {c}) <= {KMV_K}
              THEN count(DISTINCT {c})
              ELSE ({KMV_K - 1} * 4294967296)
                   // (SELECT h FROM (
                          SELECT DISTINCT ({h}) AS h FROM {t})
                       ORDER BY h LIMIT 1 OFFSET {KMV_K - 1})
         END AS BIGINT) AS kmv_est
FROM {t}"""


_KMV_SQL = (
    "SELECT col, exact_distinct, kmv_est,\n"
    "    CAST(abs(kmv_est - exact_distinct) * 1000000 // exact_distinct\n"
    "         AS BIGINT) AS rel_err_micro\nFROM (\n"
    + "\nUNION ALL\n".join(_kmv_sql(t, c) for t, c in _KMV_COLS)
    + "\n)"
)


@register("kmv_distinct_report", sql=_KMV_SQL)
def kmv_distinct_report(spark, sf_dir):
    """KMV distinct-count estimates for five columns next to the exact
    counts and realized integer relative errors — the engine-portable
    distinct sketch (the HLL++ twin whose STATE, not just its error
    envelope, cross-checks)."""
    from cargo_chat_spark.functions.hashing import h32

    parts = []
    for t, c in _KMV_COLS:
        df = load_table(spark, sf_dir, t)
        hashes = df.select(
            h32(F.col(c).cast("string")).alias("h"), F.col(c).alias("v")
        )
        exact = hashes.agg(
            F.countDistinct("v").cast("bigint").alias("exact_distinct")
        )
        kth = (
            hashes.select("h")
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
            .agg(
                F.max("h").alias("kth"),
                F.count(F.lit(1)).alias("n_in_sketch"),
            )
        )
        parts.append(
            exact.crossJoin(F.broadcast(kth)).select(
                F.lit(f"{t}.{c}").alias("col"),
                "exact_distinct",
                F.when(
                    F.col("exact_distinct") <= KMV_K,
                    F.col("exact_distinct"),
                )
                .otherwise(
                    F.expr(f"({KMV_K - 1} * 4294967296) DIV kth")
                )
                .cast("bigint")
                .alias("kmv_est"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "col",
        "exact_distinct",
        "kmv_est",
        F.expr(
            "CAST(abs(kmv_est - exact_distinct) * 1000000"
            " DIV exact_distinct AS BIGINT)"
        ).alias("rel_err_micro"),
    )


# --------------------------------------------- KMV set-operation card
# The mergeable payoff of KMV: two sketches combine by keeping the k
# smallest of their union (the same "k smallest of a union" rule that
# merges partitions), and from the MERGED sketch both |A ∪ B| and —
# via the fraction of its k values present in both sets — |A ∩ B|
# estimate at O(k) state. Set pair here: distinct customer keys of
# URGENT vs HIGH orders (each ~1300 distinct at sf0.01, heavy
# overlap). Estimators are pure integers over the shared md5 scale:
#   union_est = (k−1)·2³² // h₍ₖ₎ of the merged sketch
#   inter_est = (shared_in_sketch · union_est) // k
# so estimates AND realized errors value-hash exactly in both engines.
KMV_SET_K = 64

_SET_A = "SELECT DISTINCT o_custkey AS v FROM orders WHERE o_orderpriority = '1-URGENT'"
_SET_B = "SELECT DISTINCT o_custkey AS v FROM orders WHERE o_orderpriority = '2-HIGH'"


def _kmv_set_sql() -> str:
    from cargo_chat_spark.functions.hashing import h32_sql

    h = h32_sql("CAST(v AS VARCHAR)")
    return f"""
WITH a AS ({_SET_A}), b AS ({_SET_B}),
ha AS (SELECT DISTINCT ({h}) AS h FROM a),
hb AS (SELECT DISTINCT ({h}) AS h FROM b),
merged AS (
    SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
    ORDER BY h LIMIT {KMV_SET_K}
),
kth AS (SELECT max(h) AS kh, count(*) AS nk FROM merged),
flags AS (
    SELECT m.h,
           CASE WHEN EXISTS (SELECT 1 FROM ha WHERE ha.h = m.h)
                 AND EXISTS (SELECT 1 FROM hb WHERE hb.h = m.h)
                THEN 1 ELSE 0 END AS in_both
    FROM merged m
),
est AS (
    SELECT CAST(({KMV_SET_K - 1} * 4294967296) // (SELECT kh FROM kth)
                AS BIGINT) AS union_est,
           CAST((SELECT SUM(in_both) FROM flags) AS BIGINT) AS shared_k
)
SELECT
    CAST((SELECT count(*) FROM (SELECT v FROM a UNION SELECT v FROM b))
         AS BIGINT) AS exact_union,
    CAST((SELECT count(*) FROM (SELECT v FROM a INTERSECT SELECT v FROM b))
         AS BIGINT) AS exact_inter,
    union_est,
    CAST((shared_k * union_est) // {KMV_SET_K} AS BIGINT) AS inter_est,
    shared_k
FROM est
"""


@register("kmv_set_ops_report", sql=_kmv_set_sql())
def kmv_set_ops_report(spark, sf_dir):
    """Union/intersection cardinality estimates from MERGED KMV
    sketches of two order-priority customer sets, next to the exact
    answers — the O(k)-state set-operation card, exactly reproducible
    in both engines."""
    from pyspark.sql import Window

    from cargo_chat_spark.functions.hashing import h32

    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("v")
    ).distinct()
    b = o.where(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("v")
    ).distinct()
    ha = a.select(h32(F.col("v").cast("string")).alias("h")).distinct()
    hb = b.select(h32(F.col("v").cast("string")).alias("h")).distinct()
    merged = (
        ha.unionByName(hb).distinct().orderBy("h").limit(KMV_SET_K)
    )
    flags = (
        merged.join(ha.withColumnRenamed("h", "h").select(F.col("h")), "h", "semi")
        .join(hb, "h", "semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_k"))
    )
    kth = merged.agg(F.max("h").alias("kh"))
    exact_union = a.unionByName(b).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union")
    )
    exact_inter = a.join(b, "v", "semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_inter")
    )
    return (
        exact_union.crossJoin(F.broadcast(exact_inter))
        .crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(flags))
        .select(
            "exact_union",
            "exact_inter",
            F.expr(f"CAST(({KMV_SET_K - 1} * 4294967296) DIV kh AS BIGINT)")
            .alias("union_est"),
            F.expr(
                f"CAST((shared_k * (({KMV_SET_K - 1} * 4294967296) DIV kh))"
                f" DIV {KMV_SET_K} AS BIGINT)"
            ).alias("inter_est"),
            "shared_k",
        )
    )


# ------------------------------------------------------------ AMS F2 gate
# The unbiased dual of Count-Min's one-sided bound: the AMS (tug-of-war)
# sketch estimates the second frequency moment F2 = sum(f_i^2) — the
# self-join size, the quantity a CBO needs for skew-aware join planning
# — from D counters Z_j = sum_i sign_j(i) * f_i, where sign_j is a
# md5-derived ±1 draw per item. E[Z^2] = F2 exactly; the gate rebuilds
# the identical sketch in both engines — ONE md5 digest per item, the
# D sign rows reading DISJOINT 4-hex-char windows (the Count-Min
# md5-once discipline: the hot-path cost at scale is the hash; the r11
# re-bar measured the per-seed-digest form 2x slower) — so the
# ESTIMATES value-hash: the per-row mean, the median-of-rows (integer
# midpoint of the sorted even count), and the micro-unit relative
# error. Bounded mergeable state — D running sums, map-side-
# combinable; the sign aggregate runs over the VOCAB-bounded
# word-count frame, never the raw stream.
#
# Integer domain (documented bound): the squared terms c*c and Z^2 are
# BIGINT-exact while per-type counts and |Z_j| stay <= ~3.03e9 (sqrt of
# int64 max) — ample for the gate fixtures and for per-shard sketches.
# A corpus-wide 100 TB deployment where one type exceeds 3e9
# occurrences computes the squares in 128-bit (HUGEINT / DECIMAL(38,0))
# and emits DOUBLE — the documented exit in SCALE.md; the gate keeps
# the BIGINT spelling because the harness canonicalization downcasts
# HUGEINT to float64 (the driver-sim failure mode FIXTURES.md records).
AMS_DEPTH = 6


def _ams_sign_sql(item_sql: str, seed: int) -> str:
    # parity of the seed-th disjoint 4-hex window of the ONE digest
    return (
        f"(CASE WHEN (('0x' || substring(md5('ams|' || {item_sql}),"
        f" {1 + 4 * seed}, 4))::BIGINT) % 2 = 0 THEN 1 ELSE -1 END)"
    )


_AMS_SQL = f"""
WITH freq AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents
    ) WHERE w <> '' GROUP BY w
),
z AS (
    SELECT
        {", ".join(
            f"CAST(SUM({_ams_sign_sql('w', j)} * c) AS BIGINT) AS z{j}"
            for j in range(AMS_DEPTH)
        )},
        CAST(SUM(c * c) AS BIGINT) AS f2_exact
    FROM freq
),
est AS (
    SELECT f2_exact,
        list_sort([{", ".join(f"z{j} * z{j}" for j in range(AMS_DEPTH))}])
            AS z2
    FROM z
)
SELECT f2_exact,
    CAST((z2[1] + z2[2] + z2[3] + z2[4] + z2[5] + z2[6]) // {AMS_DEPTH}
         AS BIGINT) AS ams_mean,
    CAST((z2[{AMS_DEPTH // 2}] + z2[{AMS_DEPTH // 2 + 1}]) // 2 AS BIGINT)
        AS ams_median,
    CAST((1000000 * abs((z2[{AMS_DEPTH // 2}] + z2[{AMS_DEPTH // 2 + 1}]) // 2
                        - f2_exact)) // f2_exact AS BIGINT)
        AS median_err_micro
FROM est
"""


@register("ams_f2_report", sql=_AMS_SQL)
def ams_f2_report(spark, sf_dir):
    """AMS tug-of-war F2 (self-join size) estimates over the documents
    token stream, next to the exact moment: per-row Z_j from md5 ±1
    sign draws, mean / median-of-rows estimates and the integer
    micro-unit relative error — all exactly engine-reproducible. One
    vocab-bounded aggregate; D=6 running sums of state."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(F.explode(D.tokens(F.col("text"))).alias("w")).where(
        F.col("w") != ""
    )
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def sign(j: int):
        # seed-th disjoint 4-hex window of the single per-item digest
        h = F.conv(
            F.substring(F.col("h"), 1 + 4 * j, 4), 16, 10
        ).cast("bigint")
        return F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1))

    freq = freq.withColumn(
        "h", F.md5(F.concat(F.lit("ams|"), F.col("w")))
    )
    z = freq.agg(
        *[
            F.sum(sign(j) * F.col("c")).cast("bigint").alias(f"z{j}")
            for j in range(AMS_DEPTH)
        ],
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"),
    )
    z2 = F.array_sort(
        F.array(*[F.col(f"z{j}") * F.col(f"z{j}") for j in range(AMS_DEPTH)])
    )
    mid = AMS_DEPTH // 2
    est = z.select(
        "f2_exact",
        z2.alias("z2"),
    ).select(
        "f2_exact",
        F.expr(
            f"CAST(aggregate(z2, 0L, (a, x) -> a + x) DIV {AMS_DEPTH}"
            " AS BIGINT)"
        ).alias("ams_mean"),
        F.expr(
            f"CAST((z2[{mid - 1}] + z2[{mid}]) DIV 2 AS BIGINT)"
        ).alias("ams_median"),
    )
    return est.select(
        "f2_exact",
        "ams_mean",
        "ams_median",
        F.expr(
            "CAST((1000000 * abs(ams_median - f2_exact)) DIV f2_exact"
            " AS BIGINT)"
        ).alias("median_err_micro"),
    )
