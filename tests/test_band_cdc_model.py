"""Model-based randomized verification of the CDC-maintained band store
(sources/band_store.py) — the same standing guard test_snapshots_model /
test_index_cdc_model give the other two persisted states: drive random
snapshot-op sequences (append / MERGE re-sign / CoW delete, tombstone
compaction interleaved) against a plain dict model of the corpus,
advance the store ONLY through apply_band_cdc, and after EVERY step
check that the live band rows equal a from-scratch signing of the
model. Fixture sizes keep every (band, key) bucket far below the
per-wave hot-bucket cap, so the live-vs-fresh identity is exact (the
cap's per-wave semantics are pinned separately in test_band_store.py).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cargo_chat_spark.sources import snapshots as S
from cargo_chat_spark.sources.band_store import (
    apply_band_cdc,
    bands_of,
    compact_band_tombstones,
    read_band_store_live,
    sync_band_store_from_snapshot,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

import pytest

WORDS = [
    "spark", "join", "window", "filter", "scan", "merge", "delta",
    "shuffle", "broadcast", "codegen",
]


def _text(rng):
    # >= 6 tokens so every doc has 5-gram shingles to sign
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(6, 14)))


def _live(spark, path):
    return sorted(
        map(
            tuple,
            read_band_store_live(spark, path)
            .select("doc_id", "band", "key")
            .collect(),
        )
    )


def _fresh(spark, model):
    if not model:
        return []
    df = spark.createDataFrame(
        list(model.items()), "doc_id bigint, text string"
    )
    return sorted(
        map(tuple, bands_of(df).select("doc_id", "band", "key").collect())
    )


@pytest.mark.slow
def test_random_lifecycles_track_model(spark, tmp_path):
    for seed in (7, 31):
        rng = random.Random(seed)
        table = str(tmp_path / f"t{seed}")
        store = str(tmp_path / f"b{seed}")
        next_id = 100
        model = {i: _text(rng) for i in range(8)}
        S.snap_write(
            spark.createDataFrame(
                list(model.items()), "doc_id bigint, text string"
            ),
            table,
        )
        sync_band_store_from_snapshot(spark, store, table)

        for step in range(8):
            op = rng.choice(["append", "merge", "delete", "compact"])
            if op == "append":
                rows = {
                    next_id + j: _text(rng)
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
                rows = {k: _text(rng) for k in keys}  # re-sign under new text
                if rng.random() < 0.5:
                    rows[next_id] = _text(rng)
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
                compact_band_tombstones(spark, store)
            apply_band_cdc(spark, store, table)

            assert _live(spark, store) == _fresh(spark, model), (
                f"seed {seed} step {step} op {op}: band rows diverged"
            )

        # final compaction must be a pure layout change
        before = _live(spark, store)
        compact_band_tombstones(spark, store)
        assert _live(spark, store) == before
