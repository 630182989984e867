"""Skew mitigation utilities (SURVEY §4 / 100 TB posture).

AQE's skew-join splitting covers joins; for aggregations over hot keys
(one key holding a large fraction of rows — e.g. boilerplate dedup
buckets, a dominant language), ``salted_aggregate`` does the classic
two-phase rewrite:

    groupBy(keys + salt) partial-agg  →  groupBy(keys) final-agg

The hot key's rows spread over ``n_salts`` reducers in phase 1; phase 2
combines ``n_salts`` rows per key. Only decomposable aggregates qualify
(sum/count/min/max — avg must be expressed as sum/count by the caller).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_fn, final_fn) per supported aggregate
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """aggs: output_name -> (agg_fn_name, input_col). Salt is derived
    deterministically from ``salt_on`` (default: the first non-key column)
    so reruns produce identical partial groupings."""
    for name, (fn, _col) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: '{fn}' is not decomposable; use sum/count/min/max")
    salt_src = salt_on or next(c for c in df.columns if c not in keys)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _DECOMPOSABLE[fn][0](F.col(col)).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
