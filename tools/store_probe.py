"""Probe-only decade scaling for the persisted retrieval stores (r8
verdict item 6): the round-8 claim "store probes are O(wave/|Q|), the
store BUILD is the data-proportional term" was design-argued; this
measures it. For each store-backed gate the tool, at 1x and at 10x
(the sf1_probe decorrelated replication):

- times the store BUILD (the registered phase builder, cold), then
- times 3 PROBE repetitions with the store memo warm (probe-only —
  exactly what bench.py's phase split reports per round),

and prints build/probe exponent tables. The probe query sets are
corpus-independent by construction (embeddings replicas offset by
non-multiples of 100 keep |Q| fixed; BM25 probes two fixed terms), so a
probe exponent near 0 IS the O(|Q| + matched-postings) claim.

incremental_neardup gets a special fixed-wave leg: its registered gate
derives the probe batch from the same sf_dir, so at 10x the wave itself
is 10x — correct for the gate, wrong for the "probe independent of
HISTORY size" question. The extra leg probes the UNSCALED base batch
against the 1x and 10x history stores.

Usage: python tools/store_probe.py [base_sf_dir] [factor]
"""

from __future__ import annotations

import math
import os
import shutil
import statistics
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from sf1_probe import _replicate  # noqa: E402

STORE_QUERIES = [
    "rp_forest_persisted",
    "bm25_topk_persisted",
    "ivf_topk_persisted",
    "incremental_neardup",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from cargo_chat_spark import caching
    from cargo_chat_spark.queries import catalog
    from cargo_chat_spark.queries.registry import PHASE_BUILDERS
    from cargo_chat_spark.session import get_spark
    from cargo_chat_spark.sources.band_store import probe_band_store
    from cargo_chat_spark.sources.testdata import load_table

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="store_probe")
    work = tempfile.mkdtemp(prefix="store_probe_")
    big = f"{work}/x{factor}"
    t0 = time.time()
    _replicate(spark, base, big, factor)
    print(f"[replicate x{factor}] {round(time.time() - t0, 1)}s", flush=True)

    # JIT warm pass at 1x (build + probe once, then drop the stores)
    for q in STORE_QUERIES:
        _noop(catalog.SPARK_QUERIES[q](spark, base))
    caching.invalidate_all()

    builds: dict[str, dict[int, float]] = {q: {} for q in STORE_QUERIES}
    probes: dict[str, dict[int, float]] = {q: {} for q in STORE_QUERIES}
    fixed_wave: dict[int, float] = {}
    base_batch = load_table(spark, base, "documents").where(
        F.col("doc_id") % 4 == 0
    )
    for f, d in ((1, base), (factor, big)):
        caching.invalidate_all()  # cold stores at this scale
        for q in STORE_QUERIES:
            t0 = time.perf_counter()
            PHASE_BUILDERS[q](spark, d)
            builds[q][f] = round(time.perf_counter() - t0, 3)
            reps = []
            for _ in range(3):  # memo warm: probe-only
                t0 = time.perf_counter()
                _noop(catalog.SPARK_QUERIES[q](spark, d))
                reps.append(time.perf_counter() - t0)
            probes[q][f] = round(statistics.median(reps), 3)
            print(
                f"  [{f}x] {q}: build {builds[q][f]}s, "
                f"probe {[round(r, 2) for r in reps]}",
                flush=True,
            )
        # fixed-wave leg: the UNSCALED base batch vs this scale's history
        store = PHASE_BUILDERS["incremental_neardup"](spark, d)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _noop(probe_band_store(spark, store, base_batch))
            reps.append(time.perf_counter() - t0)
        fixed_wave[f] = round(statistics.median(reps), 3)
        print(
            f"  [{f}x] incremental_neardup(fixed 1x wave): "
            f"{[round(r, 2) for r in reps]}",
            flush=True,
        )

    # ---- the plane-count lever, demonstrated (SCALE.md round-9): the
    # forest probe's linear term is bucket occupancy = corpus/2^planes,
    # so probing the 10x corpus from a store keyed with log2(10)≈3 more
    # planes should cost ≈ the 1x probe at the default 5 planes.
    from cargo_chat_spark.sources.forest_store import (
        probe_forest_store,
        write_forest_store,
    )

    lever: dict[str, float] = {}
    emb10 = load_table(spark, big, "embeddings").select("vec_id", "embedding")
    q10 = emb10.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    s8 = os.path.join(work, "forest_p8")
    t0 = time.perf_counter()
    write_forest_store(emb10, s8, n_planes=8)
    lever["build_10x_p8"] = round(time.perf_counter() - t0, 3)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        _noop(probe_forest_store(spark, s8, q10, emb10, k=10))
        reps.append(time.perf_counter() - t0)
    lever["probe_10x_p8"] = round(statistics.median(reps), 3)
    print(
        f"  [lever] 10x corpus, 8-plane store: build "
        f"{lever['build_10x_p8']}s, probe {[round(r, 2) for r in reps]}",
        flush=True,
    )

    # ---- production-|Q| leg: a FIXED ~24-query set (the steady-state
    # shape: |Q| is an application constant and tiny next to the bucket
    # space, so the per-table bkey IN pushdown prunes the posting scan).
    # Flatness of [1x,p5] -> [10x,p8] is the composed claim: plane count
    # controls occupancy, pruning controls the scan.
    emb1 = load_table(spark, base, "embeddings").select("vec_id", "embedding")
    qsmall = emb1.where(F.col("vec_id") % 2500 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    smallq: dict[str, float] = {}
    s5_1x = PHASE_BUILDERS["rp_forest_persisted"](spark, base)
    s5_10x = PHASE_BUILDERS["rp_forest_persisted"](spark, big)
    for tag, store, e in (
        ("1x_p5", s5_1x, emb1),
        ("10x_p5", s5_10x, emb10),
        ("10x_p8", s8, emb10),
    ):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _noop(probe_forest_store(spark, store, qsmall, e, k=10))
            reps.append(time.perf_counter() - t0)
        smallq[tag] = round(statistics.median(reps), 3)
        print(
            f"  [smallQ {tag}] probe {[round(r, 2) for r in reps]}",
            flush=True,
        )

    def _row(name, d):
        r1, rf = d[1], d[factor]
        ratio = rf / r1 if r1 else float("nan")
        expo = math.log(ratio, factor) if r1 and ratio > 0 else float("nan")
        print(f"| {name} | {r1} | {rf} | {round(ratio, 2)} | {round(expo, 2)} |")

    print(f"\n| store phase | 1x (s) | {factor}x (s) | ratio | exponent |")
    print("|---|---|---|---|---|")
    for q in STORE_QUERIES:
        _row(f"{q} BUILD", builds[q])
    for q in STORE_QUERIES:
        _row(f"{q} probe", probes[q])
    _row("incremental_neardup probe (fixed 1x wave)", fixed_wave)
    print(
        f"| rp_forest probe, 10x corpus, planes 5→8 | "
        f"{probes['rp_forest_persisted'][1]} (1x,p5) | "
        f"{lever['probe_10x_p8']} (10x,p8) | "
        f"{round(lever['probe_10x_p8'] / probes['rp_forest_persisted'][1], 2)}"
        f" | — |"
    )
    print(
        f"| rp_forest probe, |Q|=24 (pruned scan) | "
        f"{smallq['1x_p5']} (1x,p5) | "
        f"{smallq['10x_p5']} (10x,p5) / {smallq['10x_p8']} (10x,p8) | "
        f"{round(smallq['10x_p8'] / smallq['1x_p5'], 2)} (p8) | — |"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
