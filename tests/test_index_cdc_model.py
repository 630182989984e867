"""Model-based randomized verification of the CDC-maintained inverted
index: drive random snapshot-op sequences (append / MERGE update / CoW
delete, with compaction interleaved at random points) against a plain
dict model of the table, advancing the index ONLY through
apply_index_cdc, and after EVERY step check that live postings equal a
from-scratch build over the model and that the stats sidecar is exact.

The composition surface (tombstone generations ∘ reinserts ∘ compaction
∘ stats arithmetic) is exactly the kind of mechanism-A∘mechanism-B
space where tests/test_snapshots_model.py caught a real data-loss bug
on its first run; this is the same standing guard for index state."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cargo_chat_spark.sources import snapshots as S
from cargo_chat_spark.sources.inverted_index import (
    _doc_stats,
    apply_index_cdc,
    compact_index_tombstones,
    read_index_stats,
    read_postings,
    sync_index_from_snapshot,
    write_inverted_index,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

import pytest

WORDS = ["spark", "join", "window", "filter", "scan", "merge", "delta"]


def _live(spark, path):
    return sorted(
        map(
            tuple,
            read_postings(spark, path)
            .select("token", "doc_id", "tf", "dl")
            .collect(),
        )
    )


def _fresh(spark, model, tmp_path, tag):
    ref = str(tmp_path / f"ref_{tag}")
    df = spark.createDataFrame(
        list(model.items()) or [(None, None)], "doc_id bigint, text string"
    ).where(F.col("doc_id").isNotNull())
    write_inverted_index(df, ref)
    return _live(spark, ref), _doc_stats(df)


@pytest.mark.slow
def test_random_lifecycles_track_model(spark, tmp_path):
    for seed in (11, 23):
        rng = random.Random(seed)
        table = str(tmp_path / f"t{seed}")
        idx = str(tmp_path / f"i{seed}")
        next_id = 100
        model = {i: " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 8))) for i in range(8)}
        S.snap_write(
            spark.createDataFrame(
                list(model.items()), "doc_id bigint, text string"
            ),
            table,
        )
        sync_index_from_snapshot(spark, idx, table)

        for step in range(8):
            op = rng.choice(["append", "merge", "delete", "compact"])
            if op == "append":
                rows = {
                    next_id + j: " ".join(
                        rng.choice(WORDS) for _ in range(rng.randint(1, 8))
                    )
                    for j in range(rng.randint(1, 3))
                }
                next_id += len(rows)
                model.update(rows)
                S.snap_append(
                    spark.createDataFrame(
                        list(rows.items()), "doc_id bigint, text string"
                    ),
                    table,
                )
            elif op == "merge":
                keys = rng.sample(sorted(model), min(2, len(model)))
                # upsert: one existing key mutated + possibly a new key
                rows = {
                    k: model[k] + " " + rng.choice(WORDS) for k in keys
                }
                if rng.random() < 0.5:
                    rows[next_id] = rng.choice(WORDS)
                    next_id += 1
                model.update(rows)
                S.snap_merge(
                    spark,
                    table,
                    spark.createDataFrame(
                        list(rows.items()), "doc_id bigint, text string"
                    ),
                    "doc_id",
                )
            elif op == "delete" and model:
                keys = rng.sample(sorted(model), min(2, len(model)))
                for k in keys:
                    model.pop(k)
                S.snap_delete(
                    spark,
                    table,
                    spark.createDataFrame(
                        [(k,) for k in keys], "doc_id bigint"
                    ),
                    "doc_id",
                )
            else:
                compact_index_tombstones(spark, idx)
                # compaction is index-local: no table version advanced
            apply_index_cdc(spark, idx, table)

            want_rows, want_stats = _fresh(
                spark, model, tmp_path, f"{seed}_{step}"
            )
            assert _live(spark, idx) == want_rows, (
                f"seed {seed} step {step} op {op}: postings diverged"
            )
            assert read_index_stats(idx) == want_stats, (
                f"seed {seed} step {step} op {op}: stats diverged"
            )

        # final compaction must be a pure layout change
        before = _live(spark, idx)
        compact_index_tombstones(spark, idx)
        assert _live(spark, idx) == before
