"""Persisted RP-LSH forest store (sources/forest_store.py): the probe
must equal the recompute-everything batch forest bit for bit, appends
must compose, and the store side must reach the probe join UNSHUFFLED
(the band_store plan discipline)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cargo_chat_spark.queries.ann_lsh import rp_forest_persisted, rp_lsh_forest_topk
from cargo_chat_spark.sources.forest_store import (
    append_forest_store,
    probe_forest_store,
    read_forest_store,
    write_forest_store,
)
from cargo_chat_spark.sources.testdata import load_table
from tests.conftest import SF_DIR_SMALL, spark  # noqa: F401


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], round(r["distance"], 9), r["rank"])
        for r in df.collect()
    )


def test_persisted_probe_equals_batch_forest(spark):
    got = _rows(rp_forest_persisted(spark, SF_DIR_SMALL))
    want = _rows(rp_lsh_forest_topk(spark, SF_DIR_SMALL))
    assert got and got == want


@pytest.mark.slow
def test_append_waves_equal_single_build(spark, tmp_path):
    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    single = str(tmp_path / "single")
    waved = str(tmp_path / "waved")
    write_forest_store(emb, single)
    write_forest_store(emb.where(F.col("vec_id") % 3 == 0), waved)
    append_forest_store(emb.where(F.col("vec_id") % 3 == 1), waved)
    append_forest_store(emb.where(F.col("vec_id") % 3 == 2), waved)
    a = sorted(map(tuple, read_forest_store(spark, single).collect()))
    b = sorted(map(tuple, read_forest_store(spark, waved).collect()))
    assert a == b
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pa = _rows(probe_forest_store(spark, single, q, emb))
    pb = _rows(probe_forest_store(spark, waved, q, emb))
    assert pa == pb


def test_probe_plan_store_side_unshuffled(spark, tmp_path):
    """No Exchange may sit between the store scan and the (t, bkey)
    join: the query keys broadcast, the postings stream map-side."""
    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "store")
    write_forest_store(emb, path)
    q = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cand_plan = (
        probe_forest_store(spark, path, q, emb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in cand_plan
    # the ONLY hash exchanges allowed are the re-rank window's and the
    # candidate dedup/fetch — never one feeding the store scan directly
    import re

    scan_to_exchange = re.search(
        r"Exchange hashpartitioning\((t|bkey)", cand_plan
    )
    assert scan_to_exchange is None, "store postings must not shuffle on key"


# ------------------------------------------------ snapshot-CDC lifecycle


def _fs_rows(spark, store):
    from cargo_chat_spark.sources.forest_store import read_forest_store_live

    return sorted(
        map(
            tuple,
            read_forest_store_live(spark, store)
            .select("vec_id", "t", "bkey")
            .collect(),
        )
    )


def _fs_fresh(spark, table, tmp_path, tag):
    from cargo_chat_spark.sources.forest_store import (
        read_forest_store,
        write_forest_store,
    )
    from cargo_chat_spark.sources.snapshots import snap_read

    ref = str(tmp_path / f"fsref_{tag}")
    write_forest_store(snap_read(spark, table), ref)
    return sorted(
        map(
            tuple,
            read_forest_store(spark, ref)
            .select("vec_id", "t", "bkey")
            .collect(),
        )
    )


@pytest.mark.slow
def test_forest_cdc_lifecycle_tracks_snapshot(spark, tmp_path):
    """update-moves-buckets, delete, reinsert-over-tombstone, compaction
    as pure layout change, idle no-op — the store equals a from-scratch
    key build after EVERY lifecycle step."""
    from cargo_chat_spark.sources.forest_store import (
        apply_forest_cdc,
        compact_forest_tombstones,
        sync_forest_from_snapshot,
        synced_forest_version,
    )
    from cargo_chat_spark.sources.snapshots import (
        snap_delete,
        snap_merge,
        snap_write,
    )

    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    ).limit(60)
    table = str(tmp_path / "t")
    store = str(tmp_path / "s")
    snap_write(emb, table)
    sync_forest_from_snapshot(spark, store, table)
    assert _fs_rows(spark, store) == _fs_fresh(spark, table, tmp_path, 0)

    # update: negate -> every projection sign flips -> bucket moves
    upd = emb.where(F.col("vec_id") % 5 == 2).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    snap_merge(spark, table, upd, "vec_id")
    apply_forest_cdc(spark, store, table)
    assert _fs_rows(spark, store) == _fs_fresh(spark, table, tmp_path, 1)

    # delete
    snap_delete(
        spark, table,
        emb.where(F.col("vec_id") % 5 == 0).select("vec_id"), "vec_id",
    )
    apply_forest_cdc(spark, store, table)
    assert _fs_rows(spark, store) == _fs_fresh(spark, table, tmp_path, 2)

    # reinsert a deleted id (new generation must outlive old tombstones)
    back = emb.where(F.col("vec_id") % 5 == 0).limit(3)
    snap_merge(spark, table, back, "vec_id")
    apply_forest_cdc(spark, store, table)
    assert _fs_rows(spark, store) == _fs_fresh(spark, table, tmp_path, 3)

    # compaction: pure layout change, tombstones cleared, idempotent
    before = _fs_rows(spark, store)
    n = compact_forest_tombstones(spark, store)
    assert n > 0
    assert _fs_rows(spark, store) == before
    assert compact_forest_tombstones(spark, store) == 0
    assert _fs_rows(spark, store) == before

    # idle apply: fenced no-op
    v = synced_forest_version(store)
    assert apply_forest_cdc(spark, store, table) == v


# ------------------------------------------------ compaction crash windows


def _dirty_store(spark, tmp_path, tag):
    """A CDC-maintained store with live tombstones and dirty files."""
    from cargo_chat_spark.sources.forest_store import (
        apply_forest_cdc,
        sync_forest_from_snapshot,
    )
    from cargo_chat_spark.sources.snapshots import snap_merge, snap_write

    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    ).limit(60)
    table = str(tmp_path / f"ct_{tag}")
    store = str(tmp_path / f"cs_{tag}")
    snap_write(emb, table)
    sync_forest_from_snapshot(spark, store, table)
    upd = emb.where(F.col("vec_id") % 4 == 1).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    snap_merge(spark, table, upd, "vec_id")
    apply_forest_cdc(spark, store, table)
    return table, store


@pytest.mark.slow
def test_compaction_crash_after_commit_recovers(spark, tmp_path, monkeypatch):
    """The ADVICE-r8 window: crash AFTER dirty posting files are removed
    but BEFORE staged survivors move in. The journal (published before
    any destructive step) must let the next run complete the swap — no
    surviving posting is ever lost."""
    import cargo_chat_spark.sources.forest_store as fs

    table, store = _dirty_store(spark, tmp_path, "crash")
    want = _fs_rows(spark, store)

    real_complete = fs._complete_compaction_swap

    def crash_mid_swap(path, journal):
        # the worst window: every dirty file removed, nothing moved in
        import os as _os

        for f in journal["dirty"]:
            if _os.path.exists(f):
                _os.remove(f)
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(fs, "_complete_compaction_swap", crash_mid_swap)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        fs.compact_forest_tombstones(spark, store)
    monkeypatch.setattr(fs, "_complete_compaction_swap", real_complete)

    # next maintenance run resumes the journaled swap before anything else
    assert fs.compact_forest_tombstones(spark, store) == 0
    assert _fs_rows(spark, store) == want
    import os

    assert not os.path.exists(fs._journal_path(store))
    assert not os.path.isdir(fs._tombstones_path(store))
    # and the store stays healthy for further maintenance
    assert fs.compact_forest_tombstones(spark, store) == 0


def test_compaction_precommit_orphan_rolls_back(spark, tmp_path):
    """A staging dir with NO journal is a pre-commit crash: the store is
    untouched; the orphan must be deleted, then compaction proceeds."""
    import os

    import cargo_chat_spark.sources.forest_store as fs

    table, store = _dirty_store(spark, tmp_path, "orphan")
    want = _fs_rows(spark, store)
    orphan = os.path.join(store, "_compact_staging.999.deadbeef")
    os.makedirs(os.path.join(orphan, "t=0"))
    with open(os.path.join(orphan, "t=0", "junk.parquet"), "w") as fh:
        fh.write("not parquet")
    n = fs.compact_forest_tombstones(spark, store)
    assert n > 0
    assert not os.path.isdir(orphan)
    assert _fs_rows(spark, store) == want
    assert fs.compact_forest_tombstones(spark, store) == 0


# ------------------------------------------------ plane-count lever (r9)


@pytest.mark.slow
def test_plane_count_lever_scales_bucket_space(spark, tmp_path):
    """SCALE.md round-9: per-bucket occupancy = corpus / 2^planes, so
    the plane count is how a bigger corpus keeps probe cost flat. Pins:
    the store records its configuration (meta sidecar), appends key
    with the STORE's planes (not the caller's defaults), occupancy
    strictly shrinks with more planes, and the probe against a
    non-default store equals a from-first-principles recomputation with
    the same kernel parameters."""
    import numpy as np

    from cargo_chat_spark.queries.ann_lsh import _forest_keys_numpy
    from cargo_chat_spark.sources.forest_store import read_forest_meta

    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    s8 = str(tmp_path / "p8")
    write_forest_store(emb.where(F.col("vec_id") % 3 != 2), s8, n_planes=8)
    assert read_forest_meta(s8) == {"n_tables": 12, "n_planes": 8}
    assert all(
        len(r["bkey"]) == 8
        for r in read_forest_store(spark, s8).limit(20).collect()
    )
    # append keys with the store's meta, not the module default
    append_forest_store(emb.where(F.col("vec_id") % 3 == 2), s8)
    lens = {
        len(r["bkey"]) for r in read_forest_store(spark, s8).collect()
    }
    assert lens == {8}, f"append used wrong plane count: {lens}"

    s5 = str(tmp_path / "p5")
    write_forest_store(emb, s5)

    def occ(p):
        return (
            read_forest_store(spark, p)
            .groupBy("t", "bkey")
            .count()
            .agg(F.avg("count"))
            .first()[0]
        )

    assert occ(s8) < occ(s5), "more planes must shrink bucket occupancy"

    # probe equality vs a from-first-principles recomputation at planes=8
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], round(r["distance"], 9), r["rank"])
        for r in probe_forest_store(spark, s8, q, emb, k=5).collect()
    )
    ck = _forest_keys_numpy(
        emb, "embedding", "vec_id", "vec_id", "embedding", n_planes=8
    ).select("vec_id", "t", "bkey").toPandas()
    qk = _forest_keys_numpy(
        q.select(
            F.col("query_id").alias("vec_id"), F.col("qvec").alias("embedding")
        ),
        "embedding", "vec_id", "query_id", "qvec", n_planes=8,
    ).select("query_id", "t", "bkey").toPandas()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    qvecs = {
        r["query_id"]: np.array(r["qvec"], dtype=np.float64)
        for r in q.collect()
    }
    cand = qk.merge(ck, on=["t", "bkey"])[["query_id", "vec_id"]].drop_duplicates()
    want = []
    for qid, grp in cand.groupby("query_id"):
        scored = sorted(
            (
                float(np.sqrt(((qvecs[qid] - vecs[nid]) ** 2).sum())),
                int(nid),
            )
            for nid in grp["vec_id"]
        )
        for rank, (d, nid) in enumerate(scored[:5], start=1):
            want.append((int(qid), nid, round(d, 9), rank))
    assert got == sorted(want)


def test_probe_scan_pruning_identical_and_pushed(spark, tmp_path):
    """Small-|Q| probes (the production shape) push per-table bkey IN
    predicates into the posting scan — results identical to the
    unpruned probe, and the filter reaches the parquet scan
    (PushedFilters), where bkey-sorted files turn it into row-group
    skips. Over-cap probes skip the filter entirely (same results)."""
    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "store")
    write_forest_store(emb, path)
    q = emb.where(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pruned = probe_forest_store(spark, path, q, emb, k=5)
    unpruned = probe_forest_store(
        spark, path, q, emb, k=5, prune_scan_max_buckets=0
    )
    assert _rows(pruned) == _rows(unpruned) and _rows(pruned)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(bkey" in plan, (
        "bucket predicate did not reach the posting scan"
    )
    # forcing a tiny cap must fall back to the unpruned plan, same rows
    capped = probe_forest_store(
        spark, path, q, emb, k=5, prune_scan_max_buckets=3
    )
    assert _rows(capped) == _rows(unpruned)


@pytest.mark.slow
def test_compaction_crash_at_every_step_recovers(spark, tmp_path, monkeypatch):
    """Sweep the crash point through the journaled swap: the completion
    is allowed N filesystem mutations (remove/replace/rmtree) before a
    simulated crash, for increasing N until it completes. After EVERY
    crash point, the next maintenance run must recover to exactly the
    pre-compaction logical rows — including crashes mid-rmtree that
    leave partially deleted staging/tombstone dirs."""
    import os
    import shutil

    import cargo_chat_spark.sources.forest_store as fs

    table, store = _dirty_store(spark, tmp_path, "sweep")
    want = _fs_rows(spark, store)
    backup = str(tmp_path / "sweep_backup")
    shutil.copytree(store, backup)
    shutil.copyfile(store + ".sync.json", backup + ".sync.json")

    real_complete = fs._complete_compaction_swap

    def instrumented(budget):
        """Completion wrapper allowing ``budget`` FS mutations before a
        simulated crash; returns the op counter dict."""
        used = {"n": 0}

        def wrapper(path, journal):
            orig_remove, orig_replace = os.remove, os.replace
            orig_rmtree = shutil.rmtree

            def gate():
                if used["n"] >= budget:
                    raise RuntimeError("simulated crash")
                used["n"] += 1

            with monkeypatch.context() as m:
                m.setattr(os, "remove",
                          lambda p: (gate(), orig_remove(p))[1])
                m.setattr(os, "replace",
                          lambda a, b: (gate(), orig_replace(a, b))[1])
                m.setattr(shutil, "rmtree",
                          lambda p, **kw: (gate(), orig_rmtree(p, **kw))[1])
                real_complete(path, journal)

        return wrapper, used

    def restore():
        shutil.rmtree(store)
        shutil.copytree(backup, store)
        shutil.copyfile(backup + ".sync.json", store + ".sync.json")

    # dry pass: measure the swap's total FS-mutation count
    wrapper, used = instrumented(10**9)
    monkeypatch.setattr(fs, "_complete_compaction_swap", wrapper)
    assert fs.compact_forest_tombstones(spark, store) > 0
    total_ops = used["n"]
    assert total_ops > 0

    # crash at a spread of points across the real op count, including
    # total_ops - 1 (crash ON the final journal remove) — recovery must
    # converge every time
    points = sorted({0, 1, 2, total_ops // 3, total_ops // 2,
                     2 * total_ops // 3, total_ops - 1})
    for budget in points:
        restore()
        wrapper, used = instrumented(budget)
        monkeypatch.setattr(fs, "_complete_compaction_swap", wrapper)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="simulated crash"):
            fs.compact_forest_tombstones(spark, store)
        monkeypatch.setattr(fs, "_complete_compaction_swap", real_complete)
        fs.compact_forest_tombstones(spark, store)  # recover
        assert _fs_rows(spark, store) == want, f"crash after {budget} ops"
        assert not os.path.exists(fs._journal_path(store))

    # and one run past the total must complete crash-free
    restore()
    wrapper, used = instrumented(total_ops + 1)
    monkeypatch.setattr(fs, "_complete_compaction_swap", wrapper)
    assert fs.compact_forest_tombstones(spark, store) > 0
    assert _fs_rows(spark, store) == want


def test_meta_corrupt_sidecar_raises_and_mismatch_probe_fails_loud(
    spark, tmp_path
):
    """ADVICE r9: a store keyed with non-default planes must never be
    probed with wrong-length bkeys silently. Three pins: (a) a sidecar
    that EXISTS but is unreadable raises on read (no silent default);
    (b) the meta sidecar is written BEFORE the data swap on overwrite;
    (c) a meta/data plane-count mismatch fails the probe loudly instead
    of returning zero candidates."""
    import os

    import pytest

    from cargo_chat_spark.sources.forest_store import (
        _META_NAME,
        read_forest_meta,
    )

    emb = load_table(spark, SF_DIR_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    store = str(tmp_path / "s")
    write_forest_store(emb, store, n_planes=8)
    assert read_forest_meta(store)["n_planes"] == 8

    # (a) corrupt sidecar raises
    with open(os.path.join(store, _META_NAME), "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="unreadable"):
        read_forest_meta(store)

    # (b) meta lands before data: crash the data write, meta must
    # already describe the new config
    store2 = str(tmp_path / "s2")
    bad = emb.withColumn("embedding", F.expr("slice(embedding, 1, 0)"))
    try:
        write_forest_store(bad, store2, n_planes=7)
    except Exception:
        pass
    assert read_forest_meta(store2)["n_planes"] == 7

    # (c) mismatch: data keyed at 8 planes, sidecar claiming 5 — the
    # probe must raise, not return empty
    import json

    with open(os.path.join(store, _META_NAME), "w") as fh:
        json.dump({"n_tables": 12, "n_planes": 5}, fh)
    q = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="does not match meta"):
        probe_forest_store(spark, store, q, emb).collect()
