"""Model-based randomized verification of the CDC-maintained forest
store (sources/forest_store.py) — the standing interaction guard the
other three persisted states already carry (test_snapshots_model /
test_index_cdc_model / test_band_cdc_model), extended to the quartet's
fourth member: drive random snapshot-op sequences (append / MERGE
re-vector / CoW delete, journaled tombstone compaction interleaved)
against a plain dict model of the vector table, advance the store ONLY
through apply_forest_cdc, and after EVERY step check that the live
posting rows equal a from-scratch keying of the model."""

from __future__ import annotations

import random

from cargo_chat_spark.queries.ann_lsh import _forest_keys_numpy
from cargo_chat_spark.sources import snapshots as S
from cargo_chat_spark.sources.forest_store import (
    apply_forest_cdc,
    compact_forest_tombstones,
    read_forest_store_live,
    sync_forest_from_snapshot,
)
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401

import pytest

_DIM = 8


def _vec(rng):
    # signed values so MERGE re-vectors genuinely move buckets
    return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(_DIM)]


def _df(spark, rows: dict):
    return spark.createDataFrame(
        [(k, v) for k, v in rows.items()],
        "vec_id bigint, embedding array<double>",
    )


def _live(spark, path):
    return sorted(
        map(
            tuple,
            read_forest_store_live(spark, path)
            .select("vec_id", "t", "bkey")
            .collect(),
        )
    )


def _fresh(spark, model: dict):
    if not model:
        return []
    keys = _forest_keys_numpy(
        _df(spark, model), "embedding", "vec_id", "vec_id", "embedding"
    ).select("vec_id", "t", "bkey")
    return sorted(map(tuple, keys.collect()))


@pytest.mark.slow
def test_random_lifecycles_track_model(spark, tmp_path):
    for seed in (11, 47):
        rng = random.Random(seed)
        table = str(tmp_path / f"t{seed}")
        store = str(tmp_path / f"f{seed}")
        next_id = 100
        model = {i: _vec(rng) for i in range(8)}
        S.snap_write(_df(spark, model), table)
        sync_forest_from_snapshot(spark, store, table)

        for step in range(8):
            op = rng.choice(["append", "merge", "delete", "compact"])
            if op == "append":
                rows = {
                    next_id + j: _vec(rng) for j in range(rng.randint(1, 3))
                }
                next_id += len(rows)
                model.update(rows)
                S.snap_append(_df(spark, rows), table)
            elif op == "merge":
                keys = rng.sample(sorted(model), min(2, len(model)))
                rows = {k: _vec(rng) for k in keys}  # bucket moves
                if rng.random() < 0.5:
                    rows[next_id] = _vec(rng)
                    next_id += 1
                model.update(rows)
                S.snap_merge(spark, table, _df(spark, rows), "vec_id")
            elif op == "delete" and model:
                keys = rng.sample(sorted(model), min(2, len(model)))
                for k in keys:
                    model.pop(k)
                S.snap_delete(
                    spark,
                    table,
                    spark.createDataFrame(
                        [(k,) for k in keys], "vec_id bigint"
                    ),
                    "vec_id",
                )
            else:
                compact_forest_tombstones(spark, store)
            apply_forest_cdc(spark, store, table)

            assert _live(spark, store) == _fresh(spark, model), (
                f"seed {seed} step {step} op {op}: posting rows diverged"
            )

        # final compaction must be a pure layout change
        before = _live(spark, store)
        compact_forest_tombstones(spark, store)
        assert _live(spark, store) == before
