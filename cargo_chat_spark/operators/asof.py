"""As-of (point-in-time) join — a training-data-pipeline operator Spark
has no native form of (feature lookup "latest value at or before event
time": label joins, feature-store reads, session enrichment).

The naive formulation is a range join (``l.key = r.key AND r.ts <= l.ts``
+ keep the max r.ts), which Spark plans as a broadcast/cartesian range
join — O(|L|·|R|) within each key and a skew bomb at 100 TB. The scalable
shape used here is the UNION-AND-CARRY pattern:

1. union the right rows into the left stream, tagged;
2. one window over ``partitionBy(key) orderBy(ts, tag, id)`` carrying the
   last-seen right-row payload forward (``last(..., ignorenulls=True)``
   with an unbounded-preceding frame);
3. keep only left rows.

One shuffle on the join key, one sort within partitions — the same cost
as a groupBy over the same key, with no range-explosion. Ties at equal
``ts`` sort the right row FIRST (as-of is inclusive: a right row at
exactly the left row's timestamp is visible), then by id so equal-ts
right rows resolve deterministically to the largest id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: dict[str, str],
    right_id: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the most
    recent ``right`` row with the same ``on`` key and ``right_ts`` <=
    ``left_ts`` (NULLs when no such row).

    ``payload`` maps right-side column -> output alias. ``right_id`` is the
    deterministic tie-break id among equal-timestamp right rows (largest
    wins, matching "latest write wins").
    """
    lcols = left.columns
    # The whole payload is carried as ONE struct (not per-column last):
    # per-column ignorenulls would splice a legitimately-NULL payload field
    # from an OLDER right row onto the newer row's other fields — torn
    # cross-row enrichment for feature-store-style lookups. A struct is
    # NULL only for left rows, so last(ignorenulls) always lands on one
    # intact right row.
    ptype = StructType(
        [StructField(alias, right.schema[src].dataType)
         for src, alias in payload.items()]
    )
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),  # right rows first at equal ts (inclusive)
        F.col(right_id).cast("long").alias("__rid"),
        F.struct(
            *[F.col(src).alias(alias) for src, alias in payload.items()]
        ).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__rid"),
        F.lit(None).cast(ptype).alias("__p"),
        *[F.col(c) for c in lcols if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag", "__rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__carried")
    )
    return carried.where(F.col("__tag") == 1).select(
        *lcols,
        *[F.col("__carried").getField(a).alias(a) for a in payload.values()],
    )
