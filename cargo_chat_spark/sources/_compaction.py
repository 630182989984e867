"""Crash-safe journaled dirty-file swap, shared by every persisted
store's tombstone compaction (band store, lexical postings, forest
postings — sources/band_store.py, inverted_index.py, forest_store.py).

The unjournaled swap (delete dirty files, then move staged survivors)
loses every surviving row if the process dies between the deletes and
the moves — the round-8 ADVICE finding on the forest, and the same
latent window in the two older stores it mirrored. Protocol here:

1. survivors are FULLY staged first (a Spark write to a fresh
   ``_compact_staging.*`` dir) — the store is untouched;
2. a JOURNAL (staging dir + dirty files + the tombstone files being
   folded + layout params) publishes atomically (tmp + rename) — the
   commit point;
3. only then do dirty files get removed and staged parts move in; every
   post-journal step is idempotent, so a crash at ANY point resumes to
   completion on the next maintenance run (``recover_compaction`` runs
   on entry), and a pre-journal crash rolls the orphan staging back.

Only the JOURNALED tombstone files are cleared, so tombstones appended
after the journal was cut stay pending for the next run. Single-writer
per store (the CDC applier's scheduler slot), as before.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.sources._paths import strip_scheme


def journal_path(store_path: str) -> str:
    return os.path.join(strip_scheme(store_path), "_compact_journal.json")


def complete_swap(store_path: str, journal: dict) -> None:
    """Execute (or resume) a JOURNALED swap — every step idempotent."""
    data_root = journal["data_root"]
    part_prefix = journal["part_prefix"]
    for f in journal["dirty"]:
        if os.path.exists(f):
            os.remove(f)
    staging = journal["staging"]
    if os.path.isdir(staging):
        for part_dir in os.listdir(staging):
            src = os.path.join(staging, part_dir)
            if not (os.path.isdir(src) and part_dir.startswith(part_prefix)):
                continue
            dst = os.path.join(strip_scheme(data_root), part_dir)
            os.makedirs(dst, exist_ok=True)
            for part in os.listdir(src):
                if part.endswith(".parquet"):
                    os.replace(
                        os.path.join(src, part), os.path.join(dst, part)
                    )
        shutil.rmtree(staging)
    for tf in journal["tombstone_files"]:
        if os.path.exists(tf):
            os.remove(tf)
    tdir = journal["tombstones_dir"]
    if os.path.isdir(tdir) and not any(
        n.endswith(".parquet") for n in os.listdir(tdir)
    ):
        shutil.rmtree(tdir)
    os.remove(journal_path(store_path))


def recover_compaction(store_path: str) -> None:
    """Crash recovery, run on compaction entry: complete a leftover
    journal (post-commit crash), then roll back any un-journaled
    ``_compact_staging.*`` orphans (pre-commit crash — store untouched)."""
    jp = journal_path(store_path)
    journaled = None
    if os.path.isfile(jp):
        with open(jp) as fh:
            journaled = json.load(fh)
        complete_swap(store_path, journaled)
    root = strip_scheme(store_path)
    if os.path.isdir(root):
        for name in os.listdir(root):
            if name.startswith("_compact_staging."):
                orphan = os.path.join(root, name)
                if journaled is None or orphan != journaled["staging"]:
                    shutil.rmtree(orphan)


def compact_tombstoned_store(
    spark: SparkSession,
    store_path: str,
    data_root: str,
    tombstones_dir: str,
    id_col: str,
    sort_col: str,
    part_col: str,
    complete_fn=None,
) -> int:
    """The full journaled compaction flow over a (id, ver)-generation
    store with merge-on-read ``(id, cutoff)`` tombstones: find dirty
    files, stage survivors, commit via journal, swap. Returns the
    number of files rewritten. ``complete_fn`` lets the owning module
    route the post-commit phase through its own patchable symbol (crash
    tests monkeypatch it)."""
    if complete_fn is None:
        complete_fn = complete_swap
    recover_compaction(store_path)
    if not os.path.isdir(tombstones_dir):
        return 0
    tomb_files = sorted(
        os.path.join(tombstones_dir, n)
        for n in os.listdir(tombstones_dir)
        if n.endswith(".parquet")
    )
    if not tomb_files:
        shutil.rmtree(tombstones_dir)
        return 0
    t = (
        spark.read.parquet(*tomb_files)
        .groupBy(id_col)
        .agg(F.max("cutoff").alias("cutoff"))
    )
    scan = (
        spark.read.option("basePath", data_root)
        .parquet(data_root)
        .withColumn("_f", F.col("_metadata.file_path"))
    )
    dead = scan.alias("p").join(
        F.broadcast(t).alias("t"),
        on=[
            F.col(f"p.{id_col}") == F.col(f"t.{id_col}"),
            F.col("p.ver") < F.col("t.cutoff"),
        ],
    )
    dirty = sorted(
        strip_scheme(r["_f"])
        for r in dead.select("_f").distinct().collect()
    )  # bounded: one row per dirty file
    if not dirty:
        for tf in tomb_files:
            os.remove(tf)
        if not any(
            n.endswith(".parquet") for n in os.listdir(tombstones_dir)
        ):
            shutil.rmtree(tombstones_dir)
        return 0
    staging = os.path.join(
        strip_scheme(store_path),
        f"_compact_staging.{os.getpid()}.{uuid.uuid4().hex}",
    )
    survivors = (
        spark.read.option("basePath", data_root)
        .parquet(*dirty)
        .alias("p")
        .join(
            F.broadcast(t).alias("t"),
            on=[
                F.col(f"p.{id_col}") == F.col(f"t.{id_col}"),
                F.col("p.ver") < F.col("t.cutoff"),
            ],
            how="left_anti",
        )
    )
    (
        survivors.sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(staging)
    )
    journal = {
        "staging": staging,
        "dirty": dirty,
        "tombstone_files": tomb_files,
        "data_root": data_root,
        "part_prefix": f"{part_col}=",
        "tombstones_dir": tombstones_dir,
    }
    tmp = journal_path(store_path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(journal, fh)
    os.replace(tmp, journal_path(store_path))  # COMMIT POINT
    complete_fn(store_path, journal)
    return len(dirty)
