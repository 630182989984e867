"""Merge-on-read deletes over a plain-parquet table: tombstones + compaction.

The 100 TB problem this pins: deleting rows from an immutable columnar
table (GDPR "remove this user", dedup "drop these doc_ids", retraction of
a bad source) cannot afford a table rewrite per request. The lakehouse
answer (Iceberg equality-delete files, Delta deletion vectors) is
MERGE-ON-READ: a delete appends only the deleted KEYS (cost
O(deleted keys), base files untouched); every read anti-joins the
tombstone set (a broadcast for any realistic delete backlog); a periodic
COMPACTION folds the tombstones into the data by rewriting ONLY the files
that contain deleted keys, leaving the rest of the table byte-identical.

Guarantees (pinned physically by ``tests/test_merge_on_read.py`` and by
value in the ``events_merge_on_read`` gate):

- ``delete_keys`` never touches base files — it appends under the
  underscore-prefixed ``_tombstones/`` subdirectory, which Spark's file
  listing ignores, so plain readers of the directory are unaffected and
  the tombstone log rides inside the table path like Delta's ``_delta_log``.
- ``read_merge_on_read`` equals full-scan-minus-deleted-keys exactly
  (the anti-join is by key, so re-inserting a previously deleted key via
  a later append is visible again — equality-delete semantics apply to
  the files present when the read runs, matching Iceberg sequence rules
  for a single-writer maintenance model).
- ``compact_deletes`` rewrites only AFFECTED files (the bounded
  file-level semi-join decides which), deletes the tombstone log, and is
  a no-op when there is nothing to fold. Replaying a delete of already
  -absent keys after compaction is harmless: the anti-join removes
  nothing and the next compaction folds the stale tombstones away.

Scale posture: the tombstone set is broadcast (delete backlogs are MBs
against TBs of base data; if a backlog ever outgrew the broadcast limit
the same plan runs as a shuffled anti-join — semantics identical). The
affected-file discovery is one column-pruned scan of the key column
grouped by ``input_file_name`` — at 100 TB this reads one column, and a
range-sorted base layout (``sorted_layout.write_range_sorted``) keeps the
affected set small when deletes are key-local.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOMB_DIR = "_tombstones"


def _local(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _tomb_path(path: str) -> str:
    return os.path.join(_local(path), _TOMB_DIR)


def delete_keys(keys: DataFrame, path: str, key_col: str) -> None:
    """Record the keys as deleted: append one small parquet file of
    distinct keys under ``path/_tombstones``. O(deleted keys) I/O; base
    files are not opened, moved, or rewritten."""
    (
        keys.select(key_col)
        .distinct()
        .coalesce(1)  # a delete request is small by contract
        .write.mode("append")
        .parquet(_tomb_path(path))
    )


def read_tombstones(
    spark: SparkSession, path: str, key_col: str
) -> DataFrame | None:
    """The distinct deleted-key set, or None when no log exists."""
    tomb = _tomb_path(path)
    if not os.path.isdir(tomb) or not any(
        f.endswith(".parquet") for f in os.listdir(tomb)
    ):
        return None
    return spark.read.parquet(tomb).select(key_col).distinct()


def read_merge_on_read(
    spark: SparkSession, path: str, key_col: str
) -> DataFrame:
    """The live view of the table: base scan minus tombstoned keys.
    Spark's listing skips the underscore-named tombstone directory, so
    the base scan stays a plain pruned parquet read; the anti-join
    broadcasts the (small) key set onto it."""
    base = spark.read.parquet(_local(path))
    tomb = read_tombstones(spark, path, key_col)
    if tomb is None:
        return base
    return base.join(F.broadcast(tomb), on=key_col, how="left_anti")


def compact_deletes(
    spark: SparkSession, path: str, key_col: str
) -> list[str]:
    """Fold the tombstone log into the data: rewrite ONLY the base files
    containing deleted keys (survivor rows re-written, files whose rows
    are all deleted simply removed), leave every other file untouched,
    then clear the log. Returns the basenames of the files rewritten or
    removed (empty = no-op). Single-writer maintenance pass, like
    ``index_io.compact_index_cells``."""
    root = _local(path)
    tomb = read_tombstones(spark, path, key_col)
    if tomb is None:
        return []
    base = spark.read.parquet(root)
    affected = [
        _local(r["f"])
        for r in (
            base.select(key_col, F.input_file_name().alias("f"))
            .join(F.broadcast(tomb), on=key_col, how="left_semi")
            .select("f")
            .distinct()
            .collect()  # bounded: one row per affected FILE
        )
    ]
    if affected:
        survivors = spark.read.parquet(*affected).join(
            F.broadcast(tomb), on=key_col, how="left_anti"
        )
        staging = os.path.join(root, "_compact_staging")
        survivors.write.mode("overwrite").parquet(staging)
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(staging, f),
                    os.path.join(root, f"compact-{f}"),
                )
        shutil.rmtree(staging)
        for f in affected:
            os.remove(f)
            crc = os.path.join(
                os.path.dirname(f), f".{os.path.basename(f)}.crc"
            )
            if os.path.exists(crc):
                os.remove(crc)
    shutil.rmtree(_tomb_path(path))
    return sorted(os.path.basename(f) for f in affected)
