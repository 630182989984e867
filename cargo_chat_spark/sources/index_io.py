"""Index persistence (SURVEY §2.1 S4-S7).

The reference serializes the whole ANN (vectors ∥ metadata parallel arrays)
to ONE JSON file (/root/reference/src/main.rs:365-368 — pathological for
float arrays) and a pretty-printed profile.json (main.rs:373-376).

Spark-native replacement: a partitioned **parquet** index table with an
explicit chunk_id key (columnar float arrays, predicate pushdown, partition
pruning) + a JSON sidecar with table metadata (dim, count) standing in for
the DynamicAnn dim dispatch (ann.rs:92-113 → just metadata here).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_SCHEMA = (
    "chunk_id bigint, file string, code string, language string, "
    "extension string, embedding array<double>"
)


def write_index(df: DataFrame, index_dir: str, dim: int) -> None:
    """S6: persist the index table + sidecar metadata. Repartitions by
    chunk_id range so downstream kNN scans parallelize evenly."""
    df.write.mode("overwrite").parquet(os.path.join(index_dir, "index"))
    meta = {"dim": dim, "format": "parquet", "version": 1}
    with open(os.path.join(index_dir, "index_meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)


def read_index(spark: SparkSession, index_dir: str) -> tuple[DataFrame, dict]:
    """S4: load index + metadata; validates stored dim like the reference's
    load-time dim sniffing (ann.rs:128-161) but from metadata, with a
    cheap runtime assert query on size(embedding)."""
    with open(os.path.join(index_dir, "index_meta.json")) as fh:
        meta = json.load(fh)
    df = spark.read.parquet(os.path.join(index_dir, "index"))
    bad = df.where(F.size("embedding") != meta["dim"]).limit(1).count()
    if bad:
        raise ValueError(f"index contains vectors with dim != {meta['dim']}")
    return df, meta


def _assign_cells(df: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (cell_id, cvec) dim
    table, argmin Euclidean per row (deterministic cell_id tie-break)."""
    from pyspark.sql import Window

    from cargo_chat_spark.functions.vectors import euclidean

    w = Window.partitionBy("chunk_id").orderBy("cdist", "cell_id")
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("cdist", euclidean(F.col("cvec"), F.col("embedding")))
        .withColumn("_cr", F.row_number().over(w))
        .where(F.col("_cr") == 1)
        .drop("cvec", "cdist", "_cr")
    )


def write_index_partitioned(
    df: DataFrame, index_dir: str, dim: int, centroids: DataFrame
) -> None:
    """S6 at scale: assign each vector to its nearest centroid and write
    the index PARTITIONED BY cell_id. ANN queries then probe a subset of
    cells → Spark partition pruning turns each query into a scan of
    nprobe/ncells of the data (SCALE.md, IVF section). ``centroids``:
    (cell_id, cvec) — persisted in the sidecar so maintenance
    (``upsert_index_cells``) assigns with the exact centroids the index
    was built with."""
    assigned = _assign_cells(df, centroids)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(
        os.path.join(index_dir, "index")
    )
    meta = {
        "dim": dim,
        "format": "parquet",
        "version": 1,
        "partitioned_by": "cell_id",
        "centroids": [
            [r["cell_id"], [float(x) for x in r["cvec"]]]
            for r in centroids.orderBy("cell_id").collect()  # k rows, bounded
        ],
    }
    with open(os.path.join(index_dir, "index_meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)


def upsert_index_cells(spark: SparkSession, index_dir: str, updates: DataFrame) -> None:
    """Incremental maintenance of the cell-partitioned index: new/changed
    vectors land WITHOUT rewriting the table — only the touched cells'
    partitions rewrite (dynamic partition overwrite, the same idempotent
    primitive as streaming/upsert_sink).

    Upsert-by-chunk_id semantics: an updated vector REPLACES its old row
    even when the new embedding assigns to a DIFFERENT cell, so touched =
    cells receiving new rows ∪ cells holding old versions of the updated
    ids. Locating old versions is a (cell_id, chunk_id) column-pruned
    scan with a broadcast semi-join — no embedding bytes move; at 100 TB
    a chunk→cell manifest (or parquet column-stat file skipping on
    chunk_id) would prune that scan to the affected files, which is the
    documented next lever, not a semantics change.

    The touched-cell list collects to the driver: bounded by the number
    of IVF cells (k), never by data volume.
    """
    with open(os.path.join(index_dir, "index_meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("partitioned_by") != "cell_id" or "centroids" not in meta:
        raise ValueError("upsert requires a cell-partitioned index with stored centroids")
    bad = updates.where(F.size("embedding") != meta["dim"]).limit(1).count()
    if bad:
        raise ValueError(f"updates contain vectors with dim != {meta['dim']}")
    centroids = spark.createDataFrame(
        [(int(c), v) for c, v in meta["centroids"]],
        "cell_id int, cvec array<double>",
    )
    assigned = _assign_cells(updates, centroids)
    data_dir = os.path.join(index_dir, "index")
    idx = spark.read.parquet(data_dir)
    upd_ids = updates.select("chunk_id").distinct()
    old_cells = (
        idx.join(F.broadcast(upd_ids), "chunk_id").select("cell_id").distinct()
    )
    new_cells = assigned.select("cell_id").distinct()
    touched = [
        r["cell_id"] for r in old_cells.union(new_cells).distinct().collect()
    ]
    merged = (
        idx.where(F.col("cell_id").isin(touched))
        .join(F.broadcast(upd_ids), "chunk_id", "left_anti")
        .unionByName(assigned.select(*idx.columns))
    )
    # the plan reads the files the overwrite replaces — materialize first
    merged = merged.localCheckpoint(eager=True)
    old_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("cell_id").parquet(data_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    # dynamic overwrite cannot express "this partition is now EMPTY": a
    # cell whose only rows all moved elsewhere keeps its stale files.
    # Drop such partitions explicitly (k-bounded loop; with a
    # transactional table format this is the commit's delete set).
    import shutil

    present = {r["cell_id"] for r in merged.select("cell_id").distinct().collect()}
    for c in touched:
        if c not in present:
            p = os.path.join(data_dir, f"cell_id={c}")
            if os.path.isdir(p):
                shutil.rmtree(p)


def read_index_cells(spark: SparkSession, index_dir: str, cell_ids: list[int]) -> DataFrame:
    """Partition-pruned read: only the probed cells' files are scanned
    (PartitionFilters in the plan — asserted in tests)."""
    df = spark.read.parquet(os.path.join(index_dir, "index"))
    return df.where(F.col("cell_id").isin(cell_ids))


def import_reference_index(
    spark: SparkSession, index_bin_path: str, out_dir: str
) -> tuple[DataFrame, dict]:
    """One-way migration from the reference's ``index.bin`` JSON
    (main.rs:365-368: ``{"index": ..., "vectors": [[f32,..],..],
    "metadata": [{file, code, language, extension},..]}`` — parallel
    arrays, ann.rs:165-172) into the parquet index layout, so an existing
    cargo-chat user can point this engine at their index unchanged.

    Mirrors the reference loader's contract (ann.rs:128-161): dimension is
    sniffed from the first vector, every vector must match it, and
    ``vectors``/``metadata`` lengths must agree. The reference only accepts
    512/1024 (its two ONNX models); we import any consistent dim and record
    it in the sidecar. Chunk ids are the positional indices the reference's
    in-memory Vec implies (ann.rs:263-268 returns positions).

    The JSON blob is inherently single-file/single-node (that's WHY the
    parquet layout replaces it) — parsing happens driver-side once, then the
    rows distribute via createDataFrame; fine for migration-sized indexes.
    """
    with open(index_bin_path, encoding="utf-8") as fh:
        raw = json.load(fh)
    vectors = raw.get("vectors")
    if not isinstance(vectors, list) or not vectors:
        raise ValueError("Missing or invalid 'vectors' field")  # ann.rs:133-139
    metadata = raw.get("metadata")
    if not isinstance(metadata, list) or len(metadata) != len(vectors):
        raise ValueError("vectors and metadata length mismatch")  # ann.rs:223-225
    dim = len(vectors[0])
    for i, v in enumerate(vectors):
        if len(v) != dim:
            raise ValueError(
                f"Expected vector of length {dim} but got {len(v)}"
            )  # ann.rs:200-204
    rows = [
        (
            i,
            m.get("file"),
            m.get("code"),
            m.get("language"),
            m.get("extension"),
            [float(x) for x in v],
        )
        for i, (v, m) in enumerate(zip(vectors, metadata))
    ]
    df = spark.createDataFrame(rows, INDEX_SCHEMA)
    write_index(df, out_dir, dim)
    return read_index(spark, out_dir)


def write_profile(profile_row: dict, index_dir: str) -> None:
    """S7 (main.rs:373-376): pretty JSON sidecar."""
    with open(os.path.join(index_dir, "profile.json"), "w") as fh:
        json.dump(profile_row, fh, indent=2, default=str)


def read_profile(index_dir: str) -> dict | None:
    """S5 (main.rs:183-237): cached profile, None if absent (caller
    recomputes via the profiling aggregates)."""
    p = os.path.join(index_dir, "profile.json")
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)
