"""Focused pins for functions/localframe.py — the r14 replacement for
``createDataFrame(list_of_tuples)`` at 42 driver-literal call sites.

Two contracts matter: (1) the Arrow path returns exactly the rows the
original Python-RDD path would (including NULLs and array columns), and
(2) every input the pandas path cannot faithfully represent falls back
to ``createDataFrame`` rather than mangling values."""

from __future__ import annotations

import datetime

from cargo_chat_spark.functions.localframe import local_frame

_SCHEMA = "cell int, score double, name string, vec array<double>"
_ROWS = [
    (0, 1.5, "a", [1.0, 2.0]),
    (1, -0.25, None, [0.0]),
    (2, 0.0, "c", None),
]


def _collect_sorted(df):
    return sorted([tuple(r) for r in df.collect()])


def test_arrow_path_matches_createdataframe(spark):
    got = local_frame(spark, _ROWS, _SCHEMA)
    ref = spark.createDataFrame(_ROWS, _SCHEMA)
    assert got.schema == ref.schema
    assert _collect_sorted(got) == _collect_sorted(ref)


def test_arrow_path_plans_without_python_rdd(spark):
    plan = local_frame(spark, _ROWS, _SCHEMA)._jdf.queryExecution() \
        .executedPlan().toString()
    # the whole point: no parallelize()-backed scan, no Python workers
    assert "Scan ExistingRDD" not in plan
    assert "LocalTableScan" in plan


def test_empty_rows_fall_back_with_schema(spark):
    df = local_frame(spark, [], _SCHEMA)
    assert df.schema == spark.createDataFrame([], _SCHEMA).schema
    assert df.count() == 0


def test_unsafe_ddl_tokens_fall_back_faithfully(spark):
    # timestamp is on the unsafe list: pandas would ns-coerce it.  The
    # fallback must return the original path's exact values.
    schema = "id int, ts timestamp"
    rows = [(1, datetime.datetime(2024, 1, 2, 3, 4, 5))]
    got = local_frame(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert got.schema == ref.schema
    assert _collect_sorted(got) == _collect_sorted(ref)


def test_non_ddl_schema_and_arity_mismatch_fall_back(spark):
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    st = StructType([StructField("x", IntegerType())])
    got = local_frame(spark, [(7,)], st)  # non-string schema object
    assert _collect_sorted(got) == [(7,)]

    # row arity != schema arity: the original path RAISES; local_frame
    # must surface the same error, not silently truncate via pandas
    import pytest
    from pyspark.errors.exceptions.base import PySparkValueError

    rows = [(1, 2.0, "extra")]
    with pytest.raises(PySparkValueError):
        spark.createDataFrame(rows, "a int, b double").collect()
    with pytest.raises(PySparkValueError):
        local_frame(spark, rows, "a int, b double").collect()


def test_structtype_schema_takes_arrow_path(spark):
    # r15: collected-Row re-framing (local_frame(spark, df.collect(),
    # df.schema)) must use the Arrow path for safe types — it previously
    # fell back to the 32-task parallelize scan.
    ref = spark.createDataFrame(_ROWS, _SCHEMA)
    rows = ref.collect()
    got = local_frame(spark, rows, ref.schema)
    assert got.schema == ref.schema
    assert _collect_sorted(got) == _collect_sorted(ref)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    assert "LocalTableScan" in plan


def test_nan_cells_fall_back_and_stay_nan(spark):
    # pandas->Arrow would silently turn a genuine NaN double into NULL;
    # local_frame must keep the tuple path's NaN (r14 ADVICE pin).
    import math

    rows = [(1, float("nan")), (2, 0.5)]
    got = {r["a"]: r["b"] for r in local_frame(spark, rows, "a int, b double").collect()}
    assert math.isnan(got[1]) and got[2] == 0.5


def test_mistyped_float_in_int_column_is_not_truncated(spark):
    # a float landing in a bigint column must behave like the tuple
    # path (which raises on verification), never silently floor via an
    # unsafe Arrow cast (r14 ADVICE pin).
    import pytest

    rows = [(1.7, "x")]
    try:
        ref = spark.createDataFrame(rows, "a bigint, s string").collect()
    except Exception:
        ref = None
    if ref is None:
        with pytest.raises(Exception):
            local_frame(spark, rows, "a bigint, s string").collect()
    else:
        got = local_frame(spark, rows, "a bigint, s string").collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in ref]
