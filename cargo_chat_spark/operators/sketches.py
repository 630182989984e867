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
