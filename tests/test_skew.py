"""salted_aggregate must be value-identical to the direct groupBy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.operators.skew import salted_aggregate
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL


def test_salted_aggregate_matches_direct(spark):
    # lineitem with a skew-prone key (l_returnflag: 3 hot values)
    l = load_table(spark, SF_DIR_SMALL, "lineitem")
    direct = {
        tuple(r[k] for k in ("l_returnflag",)) + (r["n"], r["qty"], r["mx"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count("l_orderkey").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        tuple(r[k] for k in ("l_returnflag",)) + (r["n"], r["qty"], r["mx"])
        for r in salted_aggregate(
            l.withColumn("l_quantity", F.col("l_quantity").cast("decimal(18,2)")),
            keys=["l_returnflag"],
            aggs={
                "n": ("count", "l_orderkey"),
                "qty": ("sum", "l_quantity"),
                "mx": ("max", "l_extendedprice"),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_rejects_non_decomposable(spark):
    l = load_table(spark, SF_DIR_SMALL, "lineitem")
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(l, ["l_returnflag"], {"a": ("avg", "l_quantity")})
