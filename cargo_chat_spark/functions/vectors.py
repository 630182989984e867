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
