"""Persisted RP-LSH forest index — the scale path for the forest ANN.

The batch gate (queries/ann_lsh.py::rp_lsh_forest_topk) recomputes every
corpus vector's 12 table keys PER QUERY RUN — the round-8 decade probe
measured that as the most data-proportional headline kernel (exponent
0.78: 10x corpus → 6.1x wall). This store materializes the keys once:

- Layout: (vec_id, t, bkey) POSTING rows — the vector itself is NOT
  duplicated into the 12 tables (12x key storage, 1x vector storage —
  the production forest trade; the reference's RP forest keeps 16 full
  trees, ann.rs:254). Partitioned by table id ``t``, bkey-range-
  clustered and bkey-sorted files within each partition so probe-side
  runtime filters land on aligned row-group stats (the band_store
  discipline, sources/band_store.py).
- Probe: the query batch's keys (same NumPy kernel, bit-identical to
  the HOF/SQL forms) BROADCAST; the store side reaches the (t, bkey)
  equi-join unshuffled; candidate ids dedup and fetch their vectors
  from the base embeddings table for the exact re-rank. Per-probe cost
  is O(|Q| keys + matching buckets + candidate fetch), independent of
  how the corpus keys were produced.
- Append: a new vector wave appends its posting rows — existing files
  immutable, O(wave).

Results are BIT-IDENTICAL to the batch forest gate (same keys, same
distances, same tie-breaks), so the persisted gate shares its DuckDB
oracle verbatim — the bm25_topk_persisted precedent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cargo_chat_spark.functions import vectors
from cargo_chat_spark.queries.ann_lsh import _forest_keys_numpy

_FOREST_SUBDIR = "forest"
_META_NAME = "_forest_meta.json"


def _forest_path(path: str) -> str:
    return os.path.join(path, _FOREST_SUBDIR)


def read_forest_meta(path: str) -> dict:
    """(n_tables, n_planes) the store was keyed with. The plane count is
    the occupancy lever (SCALE.md round-9: per-bucket occupancy =
    corpus / 2^planes — size planes with log2(corpus)); recording it in
    the store makes probes self-describing, so a probe can never key a
    store with the wrong hyperplanes. Stores written before the sidecar
    existed (no file) read as the oracle-pinned defaults they were built
    with; a sidecar that EXISTS but cannot be parsed raises — silently
    defaulting would let a store keyed with non-default planes be probed
    with wrong-length bkeys and return zero candidates without error."""
    import json as _json

    meta_file = os.path.join(path, _META_NAME)
    if not os.path.exists(meta_file):
        from cargo_chat_spark.queries.ann_lsh import (
            N_PLANES_FOREST,
            N_TABLES_FOREST,
        )

        return {"n_tables": N_TABLES_FOREST, "n_planes": N_PLANES_FOREST}
    try:
        with open(meta_file) as fh:
            m = _json.load(fh)
        return {"n_tables": int(m["n_tables"]), "n_planes": int(m["n_planes"])}
    except (OSError, ValueError, KeyError, TypeError) as e:
        raise ValueError(
            f"forest meta sidecar {meta_file} exists but is unreadable "
            f"({e!r}); refusing to default the keying configuration — "
            "repair or remove the sidecar explicitly"
        ) from e


def _write_meta(path: str, n_tables: int, n_planes: int) -> None:
    import json as _json

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, _META_NAME + f".tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        _json.dump({"n_tables": int(n_tables), "n_planes": int(n_planes)}, fh)
    os.replace(tmp, os.path.join(path, _META_NAME))


def write_forest_store(
    emb: DataFrame,
    path: str,
    n_key_files: int = 4,
    mode: str = "overwrite",
    n_tables: int | None = None,
    n_planes: int | None = None,
) -> None:
    """Materialize the forest postings for ``emb`` (vec_id, embedding).
    ``n_planes``/``n_tables`` default to the oracle-pinned configuration
    on overwrite and to the store's own meta on append."""
    if mode == "append":
        meta = read_forest_meta(path)
        n_tables = meta["n_tables"] if n_tables is None else n_tables
        n_planes = meta["n_planes"] if n_planes is None else n_planes
    else:
        from cargo_chat_spark.queries.ann_lsh import (
            N_PLANES_FOREST,
            N_TABLES_FOREST,
        )

        n_tables = N_TABLES_FOREST if n_tables is None else n_tables
        n_planes = N_PLANES_FOREST if n_planes is None else n_planes
        # Meta BEFORE the data swap: a crash between the two leaves
        # meta/new-config + data/old-config, which the probe-side bkey
        # length validation catches loudly; the old order (data first)
        # left the store silently probe-able with wrong-length keys.
        _write_meta(path, n_tables, n_planes)
    keys = _forest_keys_numpy(
        emb.select("vec_id", "embedding"),
        "embedding", "vec_id", "vec_id", "embedding",
        n_tables=n_tables, n_planes=n_planes,
    ).select("vec_id", "t", "bkey")
    (
        keys.repartitionByRange(n_key_files, "bkey")
        .sortWithinPartitions("bkey")
        .write.mode(mode)
        .partitionBy("t")
        .parquet(_forest_path(path))
    )


def append_forest_store(
    emb: DataFrame, path: str, n_key_files: int = 4
) -> None:
    """Ingest a vector wave: append its posting rows (O(wave)), keyed
    with the store's own recorded configuration."""
    write_forest_store(emb, path, n_key_files, mode="append")


def read_forest_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(_forest_path(path))


def probe_forest_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    emb: DataFrame,
    k: int = 10,
    prune_scan_max_buckets: int = 2048,
) -> DataFrame:
    """Top-``k`` neighbors for ``queries`` (query_id, qvec) against the
    persisted forest, exact re-rank over the union of the queries'
    bucket candidates. ``emb`` is the base vector table the candidate
    ids fetch from (the store holds postings, not vectors).

    Scan pruning (SCALE.md round-9 lever follow-up): the store scan is
    the probe's residual linear term once the plane count controls
    bucket occupancy — at production |Q| (tens-hundreds of queries) the
    probed (t, bkey) set is tiny relative to the bucket space, so it is
    collected (bounded: ≤ |Q|·n_tables rows, capped) and pushed into
    the scan as per-table ``bkey IN`` predicates. Files are bkey-sorted
    within each t partition, so the pushed filter skips whole row
    groups; t is the partition column, so untouched tables prune at
    directory level. When the probed set exceeds the cap (dense
    coverage — e.g. the sf-fixture's 600-query gate set over a 2^5
    space) the filter is skipped: it could not prune and would only
    bloat the plan. Results are identical either way (the (t, bkey)
    equi-join re-applies the exact condition)."""
    meta = read_forest_meta(path)
    qkeys = _forest_keys_numpy(
        queries.select(
            F.col("query_id").alias("vec_id"),
            F.col("qvec").alias("embedding"),
        ),
        "embedding", "vec_id", "query_id", "qvec",
        n_tables=meta["n_tables"], n_planes=meta["n_planes"],
    )
    # tombstone-aware when the store is CDC-maintained; identical to the
    # raw read otherwise
    store = read_forest_store_live(spark, path).select(
        "vec_id", "t", "bkey"
    )
    # Meta↔data validation (one-row probe): a crash between the meta and
    # data writes, or a hand-copied store, can leave postings keyed with
    # a different plane count than the sidecar records — the (t, bkey)
    # equi-join would then silently return zero candidates. bkey is a
    # bit-string of exactly n_planes characters; fail loudly on mismatch.
    first = store.select(F.length("bkey").alias("n")).limit(1).collect()
    if first and first[0]["n"] != meta["n_planes"]:
        raise ValueError(
            f"forest store at {path}: stored bkey length {first[0]['n']} "
            f"does not match meta n_planes={meta['n_planes']} — the data "
            "and the meta sidecar disagree (partial overwrite?); rebuild "
            "the store"
        )
    if prune_scan_max_buckets and prune_scan_max_buckets > 0:
        # bounded collect: the probed bucket set, capped
        probed = (
            qkeys.select("t", "bkey").distinct()
            .limit(prune_scan_max_buckets + 1).collect()
        )
        if len(probed) <= prune_scan_max_buckets:
            from collections import defaultdict

            per_t: dict[int, list[str]] = defaultdict(list)
            for r in probed:
                per_t[r["t"]].append(r["bkey"])
            cond = None
            for t in sorted(per_t):
                c = (F.col("t") == t) & F.col("bkey").isin(
                    sorted(per_t[t])
                )
                cond = c if cond is None else (cond | c)
            if cond is not None:
                store = store.where(cond)
    cand = (
        store.join(F.broadcast(qkeys), ["t", "bkey"])
        .select("query_id", "qvec", "vec_id")
        .distinct()
    )
    dim = vectors.infer_dim(emb, "embedding")
    dist = F.expr(vectors.euclidean_fixed_sql("`qvec`", "`embedding`", dim))
    scored = cand.join(emb.select("vec_id", "embedding"), "vec_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dist.alias("distance"),
    )
    w = Window.partitionBy("query_id").orderBy("distance", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ------------------------------------------------ snapshot-CDC maintenance
# The forest member of the persisted-state CDC family (the band store's
# discipline, sources/band_store.py:164-376, applied to posting rows):
# the store FOLLOWS a mutating vector snapshot through its O(changed
# files) change feed — inserted/updated vectors append re-keyed postings
# stamped with the synced version (a moved vector lands in its NEW
# buckets); deleted vectors and updated vectors' old generations become
# merge-on-read tombstones ((vec_id, cutoff) — posting files are
# immutable, reads anti-join the bounded broadcast tombstone set, and a
# reinserted id's newer generation outlives old tombstones via
# ver >= cutoff). Compaction rewrites only the dirty files.

import json as _json

from pyspark.sql import functions as _F

_SYNC_SUFFIX = ".sync.json"


def _sync_path(path: str) -> str:
    return path.rstrip("/") + _SYNC_SUFFIX


def _tombstones_path(path: str) -> str:
    return os.path.join(path, "tombstones")


def synced_forest_version(path: str) -> int:
    try:
        with open(_sync_path(path)) as fh:
            return int(_json.load(fh)["synced_version"])
    except (OSError, ValueError, KeyError):
        return -1


def _write_sync(path: str, version: int) -> None:
    tmp = _sync_path(path) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        _json.dump({"synced_version": version}, fh)
    os.replace(tmp, _sync_path(path))


def _write_versioned(emb: DataFrame, path: str, version: int,
                     mode: str, n_key_files: int) -> None:
    meta = read_forest_meta(path)
    keys = _forest_keys_numpy(
        emb.select("vec_id", "embedding"),
        "embedding", "vec_id", "vec_id", "embedding",
        n_tables=meta["n_tables"], n_planes=meta["n_planes"],
    ).select("vec_id", "t", "bkey").withColumn(
        "ver", _F.lit(int(version))
    )
    (
        keys.repartitionByRange(n_key_files, "bkey")
        .sortWithinPartitions("bkey")
        .write.mode(mode)
        .partitionBy("t")
        .parquet(_forest_path(path))
    )


def sync_forest_from_snapshot(
    spark: SparkSession, store_path: str, table_path: str,
    n_key_files: int = 4,
) -> int:
    """Initial full build from the vector table's LATEST snapshot;
    postings are stamped with the synced version (the tombstone
    generation axis). Returns the synced version."""
    from cargo_chat_spark.sources.snapshots import manifest, snap_read

    v = int(manifest(table_path)["version"])
    # Materialize the (possibly defaulted) keying config in the sidecar
    # BEFORE the data swap — same ordering discipline as
    # write_forest_store; the probe's bkey-length check backstops the
    # crash window between the two writes.
    meta = read_forest_meta(store_path)
    _write_meta(store_path, meta["n_tables"], meta["n_planes"])
    _write_versioned(
        snap_read(spark, table_path), store_path, v, "overwrite",
        n_key_files,
    )
    _write_sync(store_path, v)
    return v


def apply_forest_cdc(
    spark: SparkSession, store_path: str, table_path: str,
    to_version: int | None = None, n_key_files: int = 4,
) -> int:
    """Advance the store from its synced version via the row-level
    change feed: O(changed files + changed vectors' keys), never
    O(corpus)."""
    from cargo_chat_spark.sources.snapshots import (
        manifest,
        snap_changes,
        snap_read,
    )

    from_v = synced_forest_version(store_path)
    if from_v < 0:
        raise ValueError(
            f"forest store at {store_path} was not built by "
            "sync_forest_from_snapshot"
        )
    to_v = (
        int(manifest(table_path)["version"])
        if to_version is None
        else int(to_version)
    )
    if to_v == from_v:
        return to_v
    ch = snap_changes(spark, table_path, from_v, to_v, "vec_id")
    dead = (
        ch.where(_F.col("change").isin("deleted", "updated"))
        .select("vec_id").distinct()
    )
    fresh = (
        ch.where(_F.col("change").isin("inserted", "updated"))
        .select("vec_id").distinct()
    )
    (
        dead.withColumn("cutoff", _F.lit(to_v).cast("int"))
        .coalesce(1)
        .write.mode("append")
        .parquet(_tombstones_path(store_path))
    )
    new_vecs = snap_read(spark, table_path, to_v).join(
        _F.broadcast(fresh), "vec_id", "semi"
    )
    _write_versioned(new_vecs, store_path, to_v, "append", n_key_files)
    _write_sync(store_path, to_v)
    return to_v


def read_forest_store_live(spark: SparkSession, path: str) -> DataFrame:
    """Posting rows with merge-on-read tombstones applied (a CDC-deleted
    vector's rows vanish; a reinserted id's newer generation survives
    via ver >= cutoff). Non-CDC stores (no tombstones dir) read as-is."""
    p = read_forest_store(spark, path)
    if os.path.isdir(_tombstones_path(path)):
        t = (
            spark.read.parquet(_tombstones_path(path))
            .groupBy("vec_id")
            .agg(_F.max("cutoff").alias("cutoff"))
        )
        p = p.alias("p").join(
            _F.broadcast(t).alias("t"),
            on=[
                _F.col("p.vec_id") == _F.col("t.vec_id"),
                _F.col("p.ver") < _F.col("t.cutoff"),
            ],
            how="left_anti",
        )
    return p


from cargo_chat_spark.sources import _compaction as _C

_journal_path = _C.journal_path


def _complete_compaction_swap(path: str, journal: dict) -> None:
    """Post-commit phase of the journaled swap (sources/_compaction.py);
    module-level so crash tests can intercept it."""
    _C.complete_swap(path, journal)


def compact_forest_tombstones(spark: SparkSession, path: str) -> int:
    """Materialize the tombstones: rewrite ONLY the dirty posting files,
    then clear the folded tombstone files — O(dirty files), clean files
    untouched byte-for-byte. Returns the number of files rewritten.
    Single-writer maintenance op (run from the CDC applier's scheduler
    slot).

    Crash-windowed via the shared journaled swap
    (sources/_compaction.py): survivors fully staged, journal as the
    atomic commit point, idempotent completion, orphan rollback — a
    crash at any point either leaves the store untouched or resumes to
    completion on the next run."""
    return _C.compact_tombstoned_store(
        spark,
        path,
        data_root=_forest_path(path),
        tombstones_dir=_tombstones_path(path),
        id_col="vec_id",
        sort_col="bkey",
        part_col="t",
        complete_fn=lambda p, j: _complete_compaction_swap(p, j),
    )
