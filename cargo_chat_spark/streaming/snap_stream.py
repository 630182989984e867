"""Streaming ingest into the snapshot-versioned table.

Closes the loop between Structured Streaming and the snapshot log
(``sources/snapshots.py``): each micro-batch lands as ONE new snapshot
version via ``snap_append`` — so the table gains exactly the Delta-style
transactional-stream properties: readers always see a complete version
(the manifest rename is the atomic commit point, never a half-written
batch), every micro-batch boundary is a time-travelable version, and the
change feed (``snap_changes``) doubles as the downstream CDC of the
stream.

``foreachBatch`` is at-least-once, and ``snap_append`` is NOT naturally
idempotent (appending twice duplicates rows), so replays are fenced the
same way ``streaming/upsert_sink.py`` fences its rollup log: each commit
records its ``batch_id`` in the manifest, and a batch at or below the
highest committed id is a no-op. This is exactly Delta's
``txn``/``setTransaction`` idempotent-writer protocol expressed on the
JSON manifest.

Scale posture: per micro-batch cost is O(batch rows) — the append writes
only the batch's files and one manifest; nothing existing is read or
rewritten. Version count grows with batch count; ``expire_snapshots``
bounds history and a periodic ``snap_merge``-style compaction can fold
small batch files (both existing primitives). Run vacuum only while the
stream is stopped with its checkpoint committed (the same stopped-stream
precondition as ``upsert_sink.compact_rollup``): expiring every
``batch_id``-bearing manifest while a crash-replay of that batch is
still possible would drop the fence with it.

``tests/test_snap_stream.py`` pins batch-build equivalence, replay
fencing (a re-delivered micro-batch cannot double-append), and per-batch
time travel.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cargo_chat_spark.sources.snapshots import (
    _commit,
    _merge_schema,
    _write_new_files,
    manifest,
    snap_compact_files,
    versions,
)


def append_batch(batch_df, table_path: str, batch_id: int) -> int | None:
    """Commit one micro-batch as a new snapshot version, fenced by
    ``batch_id``: replays (id <= the highest committed id) are no-ops.
    The fence travels INSIDE the manifest and lands with the same atomic
    rename as the version itself — a crash can leave orphan data files
    (unreferenced by any manifest, invisible to readers and reclaimable)
    but never a committed-yet-unfenced version, so the replay check and
    the commit can't disagree. Returns the committed version, or None
    for a fenced replay."""
    vs = versions(table_path)
    if vs:
        prev = manifest(table_path)
        # the fence is the max batch_id over ALL manifests, not just the
        # latest: an interleaved non-stream commit (snap_delete /
        # snap_merge / compaction) writes a manifest WITHOUT a batch_id,
        # and reading only that one would erase the fence — a replayed
        # micro-batch would then double-append. Scanning the log keeps
        # the watermark alive across unrelated commits (Delta's per-app
        # setTransaction semantics); cost is O(versions) tiny JSON reads,
        # bounded by expire_snapshots.
        txns = [
            m.get("batch_id")
            for m in (manifest(table_path, x) for x in vs)
        ]
        committed = [t for t in txns if t is not None]
        if committed and batch_id <= max(committed):
            return None  # at-least-once replay; already committed
        v = prev["version"] + 1
        files = prev["files"]
        schema = _merge_schema(prev.get("schema"), batch_df.schema)
        # carry the deletion vector verbatim: every previous file
        # survives an append, so the previous DV stays valid in full —
        # dropping it here would resurrect MoR-deleted rows on the very
        # next micro-batch (the same append ∘ DV interaction the model
        # test caught in snap_append, round 7)
        carry = {
            k: prev[k] for k in ("dv", "dv_rows") if k in prev
        }
    else:
        v, files = 0, []
        schema = batch_df.schema.jsonValue()
        carry = {}
    new = _write_new_files(batch_df, table_path, v)
    _commit(
        table_path, v, files + new,
        extra={"batch_id": batch_id, "schema": schema, **carry},
    )
    return v


def run_snapshot_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    table_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
    small_bytes: int = 1 << 20,
    target_bytes: int = 1 << 27,
) -> None:
    """Drain ``source_dir`` (availableNow), committing each micro-batch
    as one snapshot version of the table at ``table_path``.
    ``max_files_per_trigger`` bounds batch size (and hence per-version
    file count) — availableNow still drains everything, in more,
    smaller commits.

    ``compact_every=N`` heals the sink's own small-file residue: after
    every Nth COMMITTED batch, ``snap_compact_files`` bin-packs files
    under ``small_bytes`` into ~``target_bytes`` outputs as a
    layout-only version. Replay-safe by construction: a fenced
    (re-delivered) batch never triggers compaction, compaction itself
    is content-preserving and idempotent, and a crash between append
    and compaction just defers the repack to a later trigger."""

    def _apply(batch_df, batch_id: int) -> None:
        v = append_batch(batch_df, table_path, batch_id)
        if (
            v is not None
            and compact_every
            and (batch_id + 1) % compact_every == 0
        ):
            snap_compact_files(
                spark, table_path,
                small_bytes=small_bytes, target_bytes=target_bytes,
            )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates on its own; unbounded wait so the caller
    # never reads a half-drained table
    q.awaitTermination()
