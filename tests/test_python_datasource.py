"""Pins for the Spark 4 Python DataSource connector (sources/pyds.py):
determinism, partitioned parallel reads, and Python-side filter pushdown
parity (pushed == post-filtered)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cargo_chat_spark.sources import pyds


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)
    yield spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def _load(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_deterministic_and_partitioned(registered):
    a = _load(registered, n_rows=500, n_partitions=4).collect()
    b = _load(registered, n_rows=500, n_partitions=7).collect()
    assert len(a) == 500
    # same rows regardless of split count
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    parts = _load(registered, n_rows=500, n_partitions=4).rdd.getNumPartitions()
    assert parts == 4


def test_filter_pushdown_matches_post_filter(registered):
    df = _load(registered, n_rows=2000, n_partitions=4)
    pushed = df.where(
        (F.col("event_type") == "purchase") & (F.col("user_id") >= 50)
    )
    # reference: same predicate applied AFTER a full unfiltered read
    full = _load(registered, n_rows=2000, n_partitions=4).collect()
    expected = sorted(
        tuple(r) for r in full if r[3] == "purchase" and r[2] >= 50
    )
    assert sorted(tuple(r) for r in pushed.collect()) == expected
    assert len(expected) > 0


def test_unsupported_filters_stay_with_spark(registered):
    df = _load(registered, n_rows=1000, n_partitions=2)
    # value-range predicates are NOT pushed (reader yields them back);
    # Spark must still apply them
    got = df.where(F.col("value") > 50.0).collect()
    full = df.collect()
    assert sorted(tuple(r) for r in got) == sorted(
        tuple(r) for r in full if r[4] > 50.0
    )


@pytest.mark.slow
def test_streaming_source_reads_deterministic_batches(registered, tmp_path):
    from cargo_chat_spark.sources import pyds

    pyds.register_all(registered)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # a SimpleDataSourceStreamReader exposes one prefetched batch per
    # availableNow run; three runs resume from the SAME checkpoint —
    # proving offset persistence across restarts (the property that
    # matters for a real service-shaped source)
    for _ in range(3):
        stream = (
            registered.readStream.format("synthetic_events")
            .option("rows_per_batch", 40)
            .option("max_rows", 120)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(tuple(r) for r in registered.read.parquet(out).collect())
    expected = sorted(pyds._row(i, 100) for i in range(120))
    assert got == expected


def test_jsonl_shard_sink_writes_manifest(registered, tmp_path):
    import json
    import os

    from cargo_chat_spark.sources import pyds

    pyds.register_all(registered)
    path = str(tmp_path / "shards")
    df = _load(registered, n_rows=200, n_partitions=3)
    df.write.format("jsonl_shards").option("path", path).mode("append").save()
    manifest = json.load(open(os.path.join(path, "_MANIFEST")))
    assert manifest["rows"] == 200
    assert len(manifest["shards"]) == 3
    # every manifest shard exists and total lines == rows
    lines = 0
    for shard in manifest["shards"]:
        with open(os.path.join(path, shard)) as f:
            lines += sum(1 for _ in f)
    assert lines == 200


def test_conjunctive_same_column_filters_tighten(registered):
    """Two pushed filters on one column must BOTH apply (round-6 advice:
    the last-wins overwrite silently widened the scan)."""
    df = _load(registered, n_rows=2000, n_partitions=4)
    out = df.where((F.col("user_id") > 10) & (F.col("user_id") > 50))
    rows = out.collect()
    assert rows, "tightened range should still match rows"
    assert all(r["user_id"] > 50 for r in rows)
    # symmetric: two upper bounds
    out2 = df.where((F.col("user_id") < 90) & (F.col("user_id") <= 40))
    assert all(r["user_id"] <= 40 for r in out2.collect())
    # bounded band from both sides
    band = df.where(
        (F.col("user_id") >= 30) & (F.col("user_id") >= 35) & (F.col("user_id") < 37)
    ).collect()
    assert band and all(35 <= r["user_id"] < 37 for r in band)


def test_contradictory_pushed_equalities_yield_empty(registered):
    """Two different required event_type equalities are provably empty —
    the reader must return nothing rather than rows for the later value."""
    df = _load(registered, n_rows=2000, n_partitions=4)
    out = df.where(
        (F.col("event_type") == "view") & (F.col("event_type") == "purchase")
    )
    assert out.count() == 0
