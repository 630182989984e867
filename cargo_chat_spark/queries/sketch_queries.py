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
        (SELECT c FROM cells WHERE seed = 0 AND cell = {_CM_CELLS_I[0]}),
        (SELECT c FROM cells WHERE seed = 1 AND cell = {_CM_CELLS_I[1]}),
        (SELECT c FROM cells WHERE seed = 2 AND cell = {_CM_CELLS_I[2]})
    ) AS cm_est,
    LEAST(
        (SELECT c FROM cells WHERE seed = 0 AND cell = {_CM_CELLS_I[0]}),
        (SELECT c FROM cells WHERE seed = 1 AND cell = {_CM_CELLS_I[1]}),
        (SELECT c FROM cells WHERE seed = 2 AND cell = {_CM_CELLS_I[2]})
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
    items = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("exact_cnt"), F.asc("item"))
            ),
        )
        .where(F.col("rk") <= CM_TOP)
        .drop("rk")
    )
    est = sketches.cm_estimates(items, grid, "item", CM_WIDTH)
    return items.join(est, "item").select(
        "item",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("overestimates"),
    )
