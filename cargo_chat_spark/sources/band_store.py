"""Persisted MinHash band-signature store — INCREMENTAL near-duplicate
detection against the full historical corpus.

The batch near-dup pipeline (`queries/dedup.py::minhash_lsh_pairs`)
recomputes signatures for the whole corpus per run. A production
training-data pipeline ingests documents in waves and must answer "is
this new batch a near-dup of ANYTHING seen before" without touching the
history again — the standard answer is to PERSIST the banded LSH state
(doc_id, band, key) and probe it per wave:

- probe cost is O(new docs × bands) signature work plus one join whose
  STORE side never shuffles: the new batch's band rows broadcast, so
  the store scan is a map-side hash join (plan-pinned) — at 100 TB the
  store is petabyte-scale state and moving it per wave is the thing
  this module exists to avoid;
- the store layout is partitioned by `band` and range-clustered +
  sorted by `key` within each band partition, so parquet row-group
  min/max stats line up with the probe keys — Spark's runtime Bloom
  filter injection (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  then skips row groups the batch cannot touch;
- appending a wave is an O(wave) partition append (no rewrite of
  existing band files);
- hot-bucket capping (`operators/dedup.py::BUCKET_CAP`) applies WITHIN
  each ingested wave (a wave cannot know future doc_ids): every wave
  contributes at most CAP rows per (band, key), so a degenerate
  boilerplate bucket stays linear in waves, never quadratic in docs.

This is beyond-reference training-pipeline machinery (the reference's
index maintenance analog is the JSON-blob rebuild, main.rs:365-368);
the same incremental pattern as `index_io.upsert_index_cells`, applied
to dedup state instead of ANN state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cargo_chat_spark.operators import dedup as D

_BANDS_SUBDIR = "bands"


def bands_of(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, band, key) band rows for ``docs`` — the same 16-perm /
    4-band MinHash pipeline as the batch dedup family, hot-bucket-capped
    within this frame (per-wave capping; see module docstring)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), D.tokens(F.col(text_col)).alias("toks")
    )
    hashes = toks.select(
        "doc_id", D.shingle_hashes_from_tokens(F.col("toks")).alias("h")
    )
    sigs = hashes.select(
        "doc_id", F.expr(D.minhash_signature_spark_sql("h")).alias("mh")
    )
    bands = sigs.select(
        "doc_id", F.explode(D.band_keys(F.col("mh"))).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    return D.cap_hot_buckets(bands)


def _bands_path(path: str) -> str:
    return os.path.join(path, _BANDS_SUBDIR)


def _write(bands: DataFrame, path: str, mode: str, n_key_files: int) -> None:
    (
        bands.repartitionByRange(n_key_files, "key")
        .sortWithinPartitions("key")
        .write.mode(mode)
        .partitionBy("band")
        .parquet(_bands_path(path))
    )


def write_band_store(
    docs: DataFrame, path: str, n_key_files: int = 4
) -> None:
    """Create (or replace) the store from ``docs``. Layout: partitioned
    by band, key-range-clustered and key-sorted files within each band
    so probe-side runtime filters get aligned row-group stats."""
    _write(bands_of(docs), path, "overwrite", n_key_files)


def append_band_store(
    docs: DataFrame, path: str, n_key_files: int = 4
) -> None:
    """Ingest a wave: append its band rows. O(wave) — existing band
    files are immutable and untouched."""
    _write(bands_of(docs), path, "append", n_key_files)


def read_band_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(_bands_path(path))


def probe_band_store(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    include_new_new: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs between ``new_docs`` and everything in
    the store (plus, by default, within the new batch itself): docs
    sharing any (band, signature-slice) bucket. Returns canonical
    (doc_a < doc_b) distinct pairs.

    Plan shape: the new batch's band rows BROADCAST; the store side is
    scanned map-side without an exchange — the store never shuffles no
    matter how large the history grows (pinned by
    tests/test_band_store.py::test_probe_plan_store_never_shuffles)."""
    new_bands = bands_of(new_docs)
    if os.path.isdir(_bands_path(path)):
        targets = read_band_store(spark, path)
        if include_new_new:
            targets = targets.unionByName(new_bands)
    elif include_new_new:
        # empty store (first wave): within-batch pairs only
        targets = new_bands
    else:
        return (
            new_docs.sparkSession.createDataFrame(
                [], "doc_a bigint, doc_b bigint"
            )
        )
    n = F.broadcast(new_bands).alias("n")
    return (
        targets.alias("t")
        .join(n, ["band", "key"])
        .where(F.col("t.doc_id") != F.col("n.doc_id"))
        .select(
            F.least(F.col("t.doc_id"), F.col("n.doc_id")).alias("doc_a"),
            F.greatest(F.col("t.doc_id"), F.col("n.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
