"""Misra-Gries heavy hitters as a mergeable distributed summary.

The deterministic-guarantee frequent-items sketch (Misra & Gries 1982;
mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012): k
counters per partition guarantee every item's estimate underestimates
its true partition count by at most n_p/(k+1). Summed across partitions
WITHOUT a truncating merge (the summed summary is at most
partitions × k rows — trivially small next to the stream), the total
underestimate is at most Σ n_p/(k+1) = n/(k+1), so every item whose
true count exceeds n/(k+1) necessarily survives into the candidate set.

This is the 100 TB shape for "what are the frequent tokens/URLs/keys"
when the domain is unbounded and an exact groupBy would shuffle the
full stream: the sketch pass is map-only (one bounded dict per
partition, maintained across Arrow batches inside mapInPandas), the
merge is an aggregate over ≤ partitions·k rows, and only the CANDIDATE
set — not the stream — is counted exactly in a verification pass
(semi-join + groupBy on a set the size of k).

Why mapInPandas and not a SQL expression: Misra-Gries is genuinely
per-partition imperative state (counter decrement on overflow is a
data-dependent branch over a bounded dict) — the documented case (c)
where the built-in operators can't express the semantics. The kernel
is Arrow-batched; no row-at-a-time Python anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(
    df: DataFrame, col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``df[col]`` with ``k``
    counters: (item, est) rows, at most k per partition. est
    underestimates the item's true count in that partition by at most
    n_partition/(k+1)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Weighted Misra-Gries: per Arrow batch, collapse to
        # (item, count) with vectorized value_counts, then fold counts
        # into the bounded dict — the Python loop runs over the batch
        # VOCABULARY, not its rows. Each reduction round subtracts m
        # from k+1 entries (k counters + the overflowing insert), i.e.
        # removes (k+1)·m stream mass, so total per-item underestimate
        # stays ≤ n/(k+1) — the standard MG bound, weight-folded.
        counters: dict[str, int] = {}
        for batch in batches:
            for w, c in batch[col].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
                while len(counters) > k:
                    m = min(counters.values())
                    counters = {
                        key: v - m for key, v in counters.items() if v > m
                    }
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    return df.select(F.col(col).alias(col)).mapInPandas(
        kernel, "item string, est long"
    )


def merged_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """(item, est) summed across partition summaries — the candidate
    set. No truncating merge: keeping all ≤ partitions·k rows keeps the
    global underestimate bound at n/(k+1) with zero extra slack."""
    return (
        misra_gries_summaries(df, col, k)
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )


def heavy_hitters_verified(
    df: DataFrame, col: Column | str, k: int
) -> DataFrame:
    """End-to-end verified heavy hitters: items whose EXACT count
    exceeds n/(k+1), with the sketch's guarantees surfaced as boolean
    columns (found_by_sketch: the item was in the candidate set;
    within_bound: exact − est ≤ n/(k+1) and est ≤ exact). Both are
    theorems for a correct implementation — a sketch bug flips one.

    The exact pass is confined to the candidate set at scale; here the
    domain is small enough that the verification groupBy doubles as the
    ground-truth side of the gate.
    """
    stream = df.select(F.col(col).alias("item") if isinstance(col, str) else col.alias("item"))
    cand = merged_candidates(stream, "item", k)
    exact = stream.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    total = stream.agg(F.count(F.lit(1)).alias("n_total"))
    heavy = (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("exact_cnt") * (k + 1) > F.col("n_total"))
        .join(F.broadcast(cand), "item", "left")
    )
    return heavy.select(
        "item",
        "exact_cnt",
        F.col("est").isNotNull().alias("found_by_sketch"),
        (
            F.col("est").isNotNull()
            & (F.col("est") <= F.col("exact_cnt"))
            & (
                (F.col("exact_cnt") - F.col("est")) * (k + 1)
                <= F.col("n_total")
            )
        ).alias("within_bound"),
    )


# ------------------------------------------------------ Count-Min sketch
# The overestimating dual of Misra-Gries: a fixed D×W counter grid;
# est(x) = min over rows d of cell[d][h_d(x)] ≥ true(x) always, with
# excess bounded by colliding mass. Because the hash rows are the
# shared md5-derived h32 (functions/hashing.py) and cells are plain
# SUMs, the WHOLE sketch — and therefore every estimate — is exactly
# reproducible in any engine: the gate value-hashes the estimates
# themselves, not just bound booleans. Mergeability is trivial
# (cell-wise addition), which is what makes it the streaming/mapside
# companion: partial sketches combine under any partitioning.

CM_DEPTH = 3
# md5-once discipline (the MinHash-family precedent): ONE digest per
# item, the D hash rows read DISJOINT 8-hex-char windows of it — a
# 32-char digest fits at most 4 independent 32-bit rows.
assert CM_DEPTH <= 4, "CM rows must fit disjoint windows of one md5"


def _cm_cell(item: Column, seed: int, width: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cm|"), item)), 1 + 8 * seed, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cm_cell_sql(item_sql: str, seed: int, width: int) -> str:
    return (
        f"((('0x' || substring(md5('cm|' || {item_sql}), {1 + 8 * seed}, 8))"
        f"::BIGINT) % {width})"
    )


def count_min_sketch(df: DataFrame, col: str, width: int) -> DataFrame:
    """(seed, cell, c): the D×W grid as rows — one map-side-combinable
    aggregate; at most CM_DEPTH·width output rows regardless of stream
    size. The digest is computed ONCE per input row (the hot-path cost
    at 100 TB is the hash, not the explode): each row materializes its
    md5, posexplode fans it into the D (seed, cell) rows by substring
    windows, and the aggregate combines map-side."""
    h = F.md5(F.concat(F.lit("cm|"), F.col(col)))
    cells = F.array(
        *[
            F.conv(F.substring(F.col("h"), 1 + 8 * d, 8), 16, 10)
            .cast("bigint")
            % width
            for d in range(CM_DEPTH)
        ]
    )
    return (
        df.select(h.alias("h"))
        .select(F.posexplode(cells).alias("seed", "cell"))
        .groupBy("seed", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cm_estimates(
    items: DataFrame, sketch: DataFrame, col: str, width: int
) -> DataFrame:
    """Append ``cm_est`` = min over rows of the item's cell counts. The
    sketch is bounded (D×W) — broadcast onto the item frame.

    An absent grid cell is a KNOWN zero (no stream row hashed into it),
    not an unknown: a probe item the stream never touched coalesces its
    unpopulated cells to 0 and so estimates 0, the textbook CM
    convention. The DuckDB twin applies the same COALESCE to its scalar
    subqueries (ADVICE r11 — the earlier NULL-skipping LEAST matched an
    oracle quirk instead of fixing the oracle). For probes drawn from
    the sketched stream — every gate's case — all cells are populated
    and the two conventions coincide, so gate hashes are unchanged."""
    probes = items.select(
        F.col(col).alias("item"),
        *[
            _cm_cell(F.col(col), d, width).alias(f"cell{d}")
            for d in range(CM_DEPTH)
        ],
    )
    out = probes
    for d in range(CM_DEPTH):
        sd = sketch.where(F.col("seed") == d).select(
            F.col("cell").alias(f"cell{d}"), F.col("c").alias(f"c{d}")
        )
        out = out.join(F.broadcast(sd), f"cell{d}", "left")
    est = F.least(
        *[
            F.coalesce(F.col(f"c{d}"), F.lit(0).cast("bigint"))
            for d in range(CM_DEPTH)
        ]
    )
    return out.select("item", est.alias("cm_est"))
