"""Version-fenced word-frequency follower — the production wiring for
``wordfreq_cdc_dict`` (queries/bpe_queries.py): keep the tokenizer's
word-frequency dict current against a MUTATING snapshot corpus without
ever rescanning it.

State layout (the ivm_stream discipline adapted to a vocabulary-sized
payload that cannot live in a JSON sidecar):

- ``<state>/dict_v{N}/`` — the dict at corpus version N, plain parquet
  (word, freq). Dict dirs are immutable once written.
- ``<state>.wf_state.json`` — the FENCE: {"version": N, "dict":
  "dict_v{N}"}, atomically os.replace'd. The fence is the only commit
  point: a crash between the dict write and the fence publish leaves an
  orphan dict dir that the re-run simply overwrites — refreshes
  converge, replays no-op on the fence.

Refresh algebra: freq_new = freq_old + Σ sgn per word over the signed
file-diff delta (snap_file_deltas — including the round-8 DV-diff pass,
so merge-on-read deletes are seen). Cost is O(changed files +
DV-touched files + vocab); the corpus is never rescanned after the
first build. Composition (v0→v1 then v1→v2 == v0→v2) holds because bag
addition is associative and every delta is exact.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.operators.bpe import word_freqs
from cargo_chat_spark.sources.snapshots import (
    manifest,
    snap_file_deltas,
    snap_read,
)


def _fence_path(state_path: str) -> str:
    return state_path.rstrip("/") + ".wf_state.json"


def read_wordfreq_state(state_path: str) -> dict | None:
    try:
        with open(_fence_path(state_path)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _publish(state_path: str, version: int) -> None:
    tmp = _fence_path(state_path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "dict": f"dict_v{version}"}, fh)
    os.replace(tmp, _fence_path(state_path))


def _dict_dir(state_path: str, version: int) -> str:
    return os.path.join(state_path, f"dict_v{version}")


def _write_dict(df: DataFrame, state_path: str, version: int) -> None:
    out = _dict_dir(state_path, version)
    if os.path.isdir(out):  # crash-window orphan from a failed publish
        shutil.rmtree(out)
    df.select("word", F.col("freq").cast("long").alias("freq")).write.mode(
        "overwrite"
    ).parquet(out)


def read_wordfreq(spark: SparkSession, state_path: str) -> DataFrame:
    st = read_wordfreq_state(state_path)
    if st is None:
        raise ValueError(f"no word-freq state at {state_path}")
    return spark.read.parquet(os.path.join(state_path, st["dict"]))


def _delta_words(delta: DataFrame) -> DataFrame:
    return (
        delta.select(
            F.explode(F.split(F.col("text"), " +")).alias("word"),
            F.col("sgn").cast("long").alias("w"),
        )
        .where(F.length("word") > 0)
    )


def wordfreq_refresh(
    spark: SparkSession, state_path: str, table_path: str
) -> int:
    """Advance the dict to the table's CURRENT version; returns it.
    First call scans the corpus once; every later call folds only the
    signed delta. Idle/replayed calls are fenced no-ops."""
    cur = int(manifest(table_path)["version"])
    st = read_wordfreq_state(state_path)
    if st is not None and int(st["version"]) == cur:
        return cur
    if st is None:
        base = word_freqs(snap_read(spark, table_path, cur))
        _write_dict(base, state_path, cur)
        _publish(state_path, cur)
        return cur
    old_v = int(st["version"])
    old = spark.read.parquet(os.path.join(state_path, st["dict"]))
    delta = snap_file_deltas(spark, table_path, old_v, cur)
    merged = (
        old.select("word", F.col("freq").cast("long").alias("w"))
        .unionByName(_delta_words(delta))
        .groupBy("word")
        .agg(F.sum("w").alias("freq"))
        .where(F.col("freq") > 0)
    )
    _write_dict(merged, state_path, cur)
    _publish(state_path, cur)
    # old dict dirs are reclaimable once the fence moved past them; keep
    # the previous one for debuggability, drop anything older
    for d in os.listdir(state_path):
        if d.startswith("dict_v"):
            try:
                v = int(d[len("dict_v"):])
            except ValueError:
                continue
            if v not in (cur, old_v):
                shutil.rmtree(os.path.join(state_path, d),
                              ignore_errors=True)
    return cur
