"""Ingest-robustness pins — what a 100 TB feed actually throws at the
engine: corrupt files, malformed records, and batch-size control.

- ignoreCorruptFiles: a truncated/garbage parquet part must not kill the
  job; the scan yields every healthy row.
- PERMISSIVE JSON + columnNameOfCorruptRecord: malformed lines are
  quarantined into the corrupt-record column, healthy rows parse, and
  the bad rows are countable (the quarantine-and-alert pattern).
- maxFilesPerTrigger under availableNow: a backlog drains in bounded
  micro-batches (admission control), with the SAME final result as one
  big batch.
"""

from __future__ import annotations

import pytest

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMALL


def test_ignore_corrupt_files(spark, tmp_path):
    out = str(tmp_path / "mixed")
    e = spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet")
    n = e.count()
    e.coalesce(2).write.mode("overwrite").parquet(out)
    # drop a garbage "parquet" part into the directory
    with open(os.path.join(out, "part-corrupt.snappy.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    good = (
        spark.read.option("ignoreCorruptFiles", "true").parquet(out).count()
    )
    assert good == n

    # and without the option the corrupt file is a hard error
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError):
        spark.read.option("ignoreCorruptFiles", "false").parquet(out).count()


def test_permissive_json_quarantines_bad_records(spark, tmp_path):
    src = tmp_path / "feed"
    src.mkdir()
    good = [
        '{"event_id": 1, "value": 1.5}',
        '{"event_id": 2, "value": 2.5}',
        '{"event_id": 3, "value": 3.5}',
    ]
    bad = ['{"event_id": 4, "value": ', "not json at all"]
    (src / "a.jsonl").write_text("\n".join(good[:2] + bad[:1]) + "\n")
    (src / "b.jsonl").write_text("\n".join(good[2:] + bad[1:]) + "\n")

    schema = "event_id bigint, value double, _bad string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(src) + "/*.jsonl")
    )
    rows = df.collect()
    assert len(rows) == 5
    ok = [r for r in rows if r["_bad"] is None]
    quarantined = [r for r in rows if r["_bad"] is not None]
    assert {r["event_id"] for r in ok} == {1, 2, 3}
    assert len(quarantined) == 2
    # quarantined rows carry the raw line for the dead-letter sink
    assert any("not json" in r["_bad"] for r in quarantined)


@pytest.mark.slow
def test_max_files_per_trigger_bounded_batches(spark, tmp_path):
    src = str(tmp_path / "backlog")
    e = spark.read.parquet(f"{SF_DIR_SMALL}/events.parquet").limit(400)
    e.repartition(4).write.mode("overwrite").parquet(src)
    n_files = len(glob.glob(f"{src}/*.parquet"))
    assert n_files >= 4
    schema = spark.read.parquet(src).schema

    batch_sizes = []

    def sink(batch_df, _bid):
        batch_sizes.append(batch_df.count())

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.foreachBatch(
            lambda b, i: batch_sizes.append(b.agg(F.sum("n")).first()[0])
        )
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # one micro-batch per file, monotone cumulative counts in complete mode
    assert len(batch_sizes) == n_files
    assert batch_sizes == sorted(batch_sizes)
    assert batch_sizes[-1] == e.count()
