"""Bucketed range (interval) join — the other time-proximity operator a
training-data pipeline needs alongside the as-of join (operators/asof.py):
all pairs of rows whose timestamps fall within a tolerance of each other
(co-occurrence mining, near-duplicate event collapse, label windows).

A naive ``a.key = b.key AND abs(a.ts - b.ts) <= tol`` is an equi-join on
key followed by a per-key cartesian filter — quadratic in the hot keys and
exactly the skew bomb AQE can't split (one key, one task). The bucketed
shape makes the *candidate* stage an equi-join on (key, bucket):

1. bucket both sides into tol-sized bins: ``bin = floor(epoch / tol)``;
2. the left probes its own bin and the next (b in {bin, bin+1}) — any pair
   within tol spans at most one bin boundary, so candidates are complete
   by construction (left probes forward; pair orientation ``a.id < b.id``
   is enforced on the *timestamp* order, see below);
3. exact ``[0, tol]`` filter on the candidates.

Candidate traffic is O(rows x 2) instead of O(per-key n²), shuffles hash
on (key, bin) — hot keys spread across bins, the usual skew lever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def within_tolerance_pairs(
    df: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    id_col: str,
    tol_seconds: int,
    payload: tuple[str, ...] = (),
) -> DataFrame:
    """Self interval join: unordered pairs of rows with the same ``key``
    whose ``ts`` differ by at most ``tol_seconds``. The pair is oriented
    a→b with (ts_a, id_a) <= (ts_b, id_b) lexicographically, each pair
    emitted exactly once.

    Output: key, id_a, id_b, ts_a, ts_b, gap_seconds (+ ``payload``
    columns from each side as <col>_a / <col>_b).
    """
    us = F.unix_micros(F.col(ts))
    tol_us = int(tol_seconds) * 1_000_000
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(ts).alias("__ts"),
        us.alias("__us"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    # Exact integer FLOOR division for the bin id. The float form
    # (us / tol).cast('bigint') truncates instead of flooring (pre-1970
    # bin 0 doubles in width) and loses exactness as epochs approach
    # 2^53. `div` truncates toward zero, so shift negative non-multiples
    # down one to get floor semantics for any epoch.
    q = F.expr(f"__us div {tol_us}")
    base = base.withColumn(
        "__bin", F.when(F.col("__us") % tol_us < 0, q - 1).otherwise(q)
    )
    # left probes its own bin and the next: a forward-looking candidate set
    # (b at or after a's bin) that still sees backward partners because THEY
    # probe forward into a's bin.
    probe = base.select(
        "*", F.explode(F.array(F.col("__bin"), F.col("__bin") + 1)).alias("__pbin")
    )
    right = base.select(
        F.col("__k"),
        F.col("__id").alias("__id_b"),
        F.col("__ts").alias("__ts_b"),
        F.col("__us").alias("__us_b"),
        F.col("__bin").alias("__pbin"),
        *[F.col(f"__p_{c}").alias(f"__pb_{c}") for c in payload],
    )
    pairs = (
        probe.join(right, ["__k", "__pbin"])
        # orientation on (ts, id): every unordered pair exactly once, and
        # only b's at-or-after a (the forward probe supplies exactly these;
        # backward partners appear with roles swapped)
        .where(
            (F.col("__us_b") > F.col("__us"))
            | ((F.col("__us_b") == F.col("__us")) & (F.col("__id_b") > F.col("__id")))
        )
        .where(F.col("__us_b") - F.col("__us") <= tol_us)
        # no dedup needed: a pair (a, b) matches only the single probe row
        # whose __pbin equals b's bin (b's bin is one value, and a's two
        # probe bins are distinct) — candidates are exactly-once by
        # construction
    )
    return pairs.select(
        F.col("__k").alias(key),
        F.col("__id").alias("id_a"),
        F.col("__id_b").alias("id_b"),
        F.col("__ts").alias("ts_a"),
        F.col("__ts_b").alias("ts_b"),
        ((F.col("__us_b") - F.col("__us")) / F.lit(1_000_000.0)).alias("gap_seconds"),
        *[F.col(f"__p_{c}").alias(f"{c}_a") for c in payload],
        *[F.col(f"__pb_{c}").alias(f"{c}_b") for c in payload],
    )
