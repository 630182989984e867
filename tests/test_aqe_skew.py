"""AQE runtime-re-plan pins — the BEYOND-salting skew lever SCALE.md
leans on: adaptive execution must (a) split a skewed sort-merge-join
partition at runtime ("skew=true" in the executed plan) and (b) coalesce
tiny shuffle partitions (AQEShuffleRead coalesced). operators/skew.py
gates the explicit salting rewrite; this pins that the DECLARATIVE plan
gets the same protection for free when AQE owns the decision."""

from __future__ import annotations

from pyspark.sql import functions as F


def _with_conf(spark, overrides):
    old = {}
    for k, v in overrides.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # shrink thresholds so the fixture-scale hot key counts as skew
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = _with_conf(spark, overrides)
    try:
        # hot key 0 carries 150k rows with a fat payload; keys 1..40 are tiny
        left = spark.range(0, 160_000).select(
            F.when(F.col("id") < 150_000, 0)
            .otherwise((F.col("id") % 40) + 1)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 41).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        # NB: the skewed join must be the TERMINAL exchange consumer — a
        # groupBy on the join key downstream reuses the join's
        # partitioning, and AQE then (correctly) refuses to split the
        # skewed partition rather than break the required distribution.
        # That suppression is itself part of what this pin documents.
        joined = left.join(right, "k")
        rows = joined.collect()
        assert len(rows) == 160_000  # correctness unaffected by the split
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not mark the hot partition for skew split:\n"
            + plan[:2000]
        )
    finally:
        _restore(spark, old)


def test_aqe_coalesces_tiny_partitions(spark):
    overrides = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }
    old = _with_conf(spark, overrides)
    try:
        df = (
            spark.range(0, 1000)
            .groupBy((F.col("id") % 7).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # collect() (not count()) — count() builds a SEPARATE query
        # execution, leaving this df's adaptive plan unfinalized
        assert len(df.collect()) == 7
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:1500]
    finally:
        _restore(spark, old)
